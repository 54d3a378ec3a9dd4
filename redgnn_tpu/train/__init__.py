from redgnn_tpu.train.loop import StaticTrainer

__all__ = ["StaticTrainer"]
