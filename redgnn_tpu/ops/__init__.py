from redgnn_tpu.ops.segment import (
    segment_sum,
    segment_max,
    segment_softmax,
    segment_normalize_l1,
)
from redgnn_tpu.ops.frontier import (
    SENTINEL,
    Frontier,
    expand_frontier,
    align_old_to_new,
)

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_softmax",
    "segment_normalize_l1",
    "SENTINEL",
    "Frontier",
    "expand_frontier",
    "align_old_to_new",
]
