"""redgnn_tpu — a TPU-native relational message-passing framework.

Re-implements the capability set of LARS-research/RED-GNN (query-dependent
relational digraph reasoning over knowledge graphs: static transductive,
static inductive, temporal interpolation and temporal extrapolation) as a
from-scratch JAX/XLA/Pallas framework:

- ``redgnn_tpu.ops``      — device kernels: segment reductions, fixed-shape
                            frontier expansion, filtered ranking.
- ``redgnn_tpu.graph``    — immutable device-resident knowledge graphs (CSR).
- ``redgnn_tpu.models``   — flax propagation networks (RED-GNN family).
- ``redgnn_tpu.train``    — jit-compiled train/eval steps and epoch drivers.
- ``redgnn_tpu.parallel`` — mesh/shard_map data- and edge-parallel execution.
- ``redgnn_tpu.utils``    — configs, metrics, memory accounting, reports.

Unlike the reference (which round-trips GPU->CPU->GPU every propagation hop
for scipy SpMM frontier expansion, `Static/transductive/models.py:78`), the
whole L-hop propagation here is a single XLA program with static shapes.
"""

__version__ = "0.1.0"
