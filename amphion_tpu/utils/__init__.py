from amphion_tpu.utils.config import JsonHParams, load_config, override_config, save_config
from amphion_tpu.utils.logging import ValueWindow, get_logger
