"""Step-size / scale adaptation shared by the fixed-step samplers.

The reference's only adaptation is NUTS's dual averaging (src/nuts.cpp:
294-302); RWMH/MALA/HMC take a fixed ``par_scale``/``step_size``. This
module provides the same Nesterov dual-averaging primal recursion as a
reusable state machine so those samplers can optionally tune themselves
toward standard target acceptance rates during burn-in
(RWMH 0.234, MALA 0.574, HMC 0.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DualAveraging", "da_init", "da_update", "TARGET_ACCEPT"]

TARGET_ACCEPT = {"rwmh": 0.234, "mala": 0.574, "hmc": 0.8}


class DualAveraging(NamedTuple):
    log_eps: jax.Array      # current (tuned) log step size
    log_eps_bar: jax.Array  # averaged iterate, used after adaptation ends
    h: jax.Array
    t: jax.Array            # adaptation step counter
    mu: jax.Array           # shrink target log(10 * eps_0)


def da_init(eps0):
    eps0 = jnp.asarray(eps0)
    return DualAveraging(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.log(eps0),
        h=jnp.zeros_like(eps0),
        t=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
    )


def da_update(state: DualAveraging, accept_stat, target,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveraging:
    """One dual-averaging step (same recursion as reference src/nuts.cpp:
    294-302, with the step counter inside the state)."""
    t = state.t + 1.0
    h = state.h + (1.0 / (t + t0)) * (target - accept_stat - state.h)
    log_eps = state.mu - h * jnp.sqrt(t) / gamma
    w = t ** (-kappa)
    log_eps_bar = (1.0 - w) * state.log_eps_bar + w * log_eps
    return DualAveraging(log_eps=log_eps, log_eps_bar=log_eps_bar,
                         h=h, t=t, mu=state.mu)
