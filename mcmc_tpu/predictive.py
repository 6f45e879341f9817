"""Generated quantities and posterior-predictive sampling.

The reference stops at the draw matrix — anything downstream (predictive
checks, derived quantities) is the user's loop.  Here the post-processing
step is a first-class vectorized map over the kept draws (the analog of
Stan's ``generated quantities`` block): one ``vmap``/``lax.map`` over the
flattened ``(n_keep [, n_chains], n_vals)`` draw array, jitted, optionally
chunked so a large predictive (e.g. one sample per held-out row per draw)
never materializes more than ``batch_size`` draws of intermediates at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mcmc_tpu.results import SamplerResult

__all__ = ["generated_quantities", "posterior_predictive"]


def _flat_draws(draws):
    if isinstance(draws, SamplerResult):
        draws = draws.draws
    d = jnp.asarray(draws)
    if d.ndim == 1:
        d = d[:, None]
    lead = d.shape[:-1]
    return d.reshape(-1, d.shape[-1]), lead


def _mapped(fn, args, batch_size):
    """vmap fn over the leading axis of every arg; chunk with an outer scan
    when batch_size caps the live batch."""
    n = args[0].shape[0]
    if batch_size is None or batch_size >= n:
        return jax.jit(jax.vmap(fn))(*args)
    b = int(batch_size)
    n_pad = (-n) % b
    padded = [jnp.concatenate([a, jnp.broadcast_to(a[:1],
                                                   (n_pad,) + a.shape[1:])])
              for a in args] if n_pad else list(args)
    chunked = [a.reshape(-1, b, *a.shape[1:]) for a in padded]

    def body(_, chunk):
        return None, jax.vmap(fn)(*chunk)

    _, out = jax.jit(lambda *c: lax.scan(body, None, c))(*chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:])[:n], out)


def generated_quantities(draws, fn, *, key=None, batch_size=None):
    """Map a pure function over every kept draw.

    ``draws`` is a :class:`SamplerResult` or a draw array
    (``(n_keep, n_vals)`` or ``(n_keep, n_chains, n_vals)``, constrained
    space).  ``fn(params) -> pytree`` computes any derived quantity; with
    ``key`` given, ``fn(key, params) -> pytree`` additionally gets an
    independent PRNG key per draw (for stochastic quantities — see
    :func:`posterior_predictive`).  Returns the pytree with each leaf led
    by the draw axes of the input (``(n_keep, ...)`` or
    ``(n_keep, n_chains, ...)``).

    ``batch_size`` bounds how many draws are mapped at once (an outer
    ``lax.scan`` over chunks) — use it when ``fn`` produces large
    intermediates.
    """
    flat, lead = _flat_draws(draws)
    if key is not None:
        keys = jax.random.split(key, flat.shape[0])
        out = _mapped(fn, (keys, flat), batch_size)
    else:
        out = _mapped(fn, (flat,), batch_size)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(lead + x.shape[1:]), out)


def posterior_predictive(draws, predictive_fn, key, *, batch_size=None):
    """Posterior-predictive sampling: one simulated dataset (or statistic)
    per kept draw.  ``predictive_fn(key, params) -> pytree`` simulates new
    data given one posterior draw; each call gets an independent key.
    Equivalent to ``generated_quantities(draws, predictive_fn, key=key)``
    — provided as the named entry point of the workflow
    (``fit`` -> ``posterior_predictive`` -> predictive checks).
    """
    if key is None:
        raise ValueError("posterior_predictive requires a PRNG key")
    return generated_quantities(draws, predictive_fn, key=key,
                                batch_size=batch_size)
