from amphion_tpu.visualization.singvisio.server import (
    dump_diffusion_steps,
    select_key_steps,
    serve,
)
