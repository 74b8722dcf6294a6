"""Meta (hypernetwork) fusion layer (Flax).

Equivalent of reference modeling/layers/meta.py:9-57: the flattened
fundamental matrix between the two views feeds an MLP that emits per-sample
1x1 conv weights applied to the other view's features, plus a shared 1x1
conv residual.  The per-sample conv is an einsum here (no python batch loop).

Faithful quirk: the reference's `self.bias = torch.zeros(...)` is never
registered as an nn.Parameter, so the bias is a constant zero — preserved.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.camera import fundamental_matrix


class Meta(nn.Module):
    in_channels: int
    hidden_size: int = 100

    @nn.compact
    def __call__(self, KRT: jnp.ndarray, other_KRT: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """
        Args:
            KRT, other_KRT: (N, 3, 4).
            x: (N, H, W, C) other-view features.
        """
        C = self.in_channels
        F = fundamental_matrix(KRT, other_KRT)  # (N, 3, 3)
        hidden = nn.Dense(self.hidden_size, name="fc0")(F.reshape(-1, 9))
        hidden = nn.relu(hidden)
        weight = nn.Dense(C * C, name="fc1")(hidden).reshape(-1, C, C)  # (N, Cout, Cin)
        out = jnp.einsum("nhwc,noc->nhwo", x, weight)
        share = nn.Conv(C, (1, 1), name="share")(x)
        return out + share
