"""FiLM conditioning layer (reference src/models/tfgridnet_realtime/
film.py:4-23 — imported by the reference separator but not
instantiated in the default config).

The reference computes gamma and beta with two Conv1d(k=1) maps of the
conditioning vector; note its bias path reuses the gamma conv by
mistake (film.py:21). This implementation is the corrected semantics:
out = gamma(cond) * x + beta(cond).
"""

from __future__ import annotations

from flax import linen as nn


class FiLM(nn.Module):
    """x: [B, C, *spatial], cond: [B, E] -> x modulated per channel."""

    channels: int

    @nn.compact
    def __call__(self, x, cond):
        gamma = nn.Dense(self.channels, name="gamma")(cond)
        beta = nn.Dense(self.channels, name="beta")(cond)
        shape = (x.shape[0], self.channels) + (1,) * (x.ndim - 2)
        return gamma.reshape(shape) * x + beta.reshape(shape)
