"""Non-propagation baselines shipped with the reference.

  * SimplE (`Temporal/extrapolation/simple.py`): bilinear embedding
    scorer over all entities — two MXU matmuls per batch, the textbook
    TPU-friendly workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimplE(nn.Module):
    """score(h, r, t) = ( <eh_h, rf_r, et_t> + <eh_t, ri_r, et_h> ) / 2
    evaluated against every candidate tail at once (`simple.py:38-45`)."""

    n_ent: int
    n_rel: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, heads: jnp.ndarray, rels: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.xavier_uniform()
        d = self.hidden_dim
        ent_h = self.param("ent_embs_h", init, (self.n_ent, d))
        ent_t = self.param("ent_embs_t", init, (self.n_ent, d))
        rel_f = self.param("rel_embs_f", init, (self.n_rel, d))
        rel_i = self.param("rel_embs_i", init, (self.n_rel, d))

        # (B, d) * (d, n_ent) contractions hit the MXU directly
        fwd = (ent_h[heads] * rel_f[rels]) @ ent_t.T      # (B, n_ent)
        inv = (ent_t[heads] * rel_i[rels]) @ ent_h.T
        return (fwd + inv) / 2.0
