from redgnn_tpu.train.loop import StaticTrainer
from redgnn_tpu.train.temporal_loop import TemporalTrainer
from redgnn_tpu.train.xerte_loop import XErteTrainer

__all__ = ["StaticTrainer", "TemporalTrainer", "XErteTrainer"]
