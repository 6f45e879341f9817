"""Result container returned by every sampler entry point.

The reference returns draws through an out-parameter matrix and writes
``n_accept_draws`` back into the caller's settings struct
(reference src/rwmh.cpp:165-167); here both — plus richer diagnostics the
reference lacks (SURVEY.md §5) — travel in one immutable result object.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax.numpy as jnp

__all__ = ["SamplerResult"]


@dataclass
class SamplerResult:
    """Output of one sampling run.

    Attributes:
        draws: kept draws in *constrained* space. Shape ``(n_keep, n_vals)``
            for a single chain, ``(n_keep, n_chains, n_vals)`` for vmapped
            chains, ``(n_keep, n_pop, n_vals)`` for DE populations.
        n_accept_draws: post-burn-in acceptance count (per chain when
            chains > 1), the reference's write-back field.
        diagnostics: sampler-specific extras (step sizes, tree depths,
            divergence counts, adaptation traces, ...).
    """

    draws: Any
    n_accept_draws: Any
    diagnostics: Dict[str, Any] = field(default_factory=dict)

    @property
    def accept_rate(self):
        """``n_accept_draws / n_keep_draws`` (reference convention,
        README.md:274, src/rwmh.cpp:140-142)."""
        n_keep = self.draws.shape[0]
        return jnp.asarray(self.n_accept_draws) / n_keep

    @property
    def mean(self):
        """Posterior mean over draws (and chains, if present)."""
        d = jnp.asarray(self.draws)
        axes = tuple(range(d.ndim - 1))
        return d.mean(axis=axes)

    @property
    def var(self):
        d = jnp.asarray(self.draws)
        axes = tuple(range(d.ndim - 1))
        return d.var(axis=axes)
