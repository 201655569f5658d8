from amphion_tpu.evaluation.metrics import METRIC_REGISTRY, calc_metric
