from redgnn_tpu.utils.config import TrainConfig, DATASET_CONFIGS, dataset_config
from redgnn_tpu.utils.metrics import combine_metric_sums

__all__ = [
    "TrainConfig",
    "DATASET_CONFIGS",
    "dataset_config",
    "combine_metric_sums",
]
