from redgnn_tpu.models.layers import RelAttnLayer, GRUGate, ACTIVATIONS
from redgnn_tpu.models.redgnn import RedGNN, ModelConfig

__all__ = ["RelAttnLayer", "GRUGate", "ACTIVATIONS", "RedGNN", "ModelConfig"]
