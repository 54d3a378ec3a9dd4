from redgnn_tpu.models.layers import RelAttnLayer, GRUGate, ACTIVATIONS
from redgnn_tpu.models.redgnn import RedGNN, ModelConfig
from redgnn_tpu.models.temporal import (
    TRedGNN,
    TemporalModelConfig,
    PeriodicTimeEmbedding,
)
from redgnn_tpu.models.xerte import XErte, XErteConfig
from redgnn_tpu.models.baselines import SimplE

__all__ = [
    "RelAttnLayer", "GRUGate", "ACTIVATIONS",
    "RedGNN", "ModelConfig",
    "TRedGNN", "TemporalModelConfig", "PeriodicTimeEmbedding",
    "XErte", "XErteConfig",
    "SimplE",
]
