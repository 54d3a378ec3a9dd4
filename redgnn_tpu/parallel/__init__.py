from redgnn_tpu.parallel.mesh import make_mesh
from redgnn_tpu.parallel.shard import make_dp_train_step

__all__ = ["make_mesh", "make_dp_train_step"]
