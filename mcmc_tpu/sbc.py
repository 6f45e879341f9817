"""Simulation-based calibration (Talts, Betancourt, Simpson, Vehtari &
Gelman 2018, arXiv:1804.06788).

The reference has no sampler-validation machinery at all (SURVEY.md §4: no
tests, statistical-by-inspection examples).  SBC is the modern standard:
for a generative model ``theta ~ prior``, ``data ~ simulator(theta)``, the
rank of the true ``theta`` among L (near-independent) posterior draws is
*exactly* uniform on {0, ..., L} when the sampler targets the correct
posterior — any bias, wrong scale, or unconverged adaptation shows up as a
non-uniform rank histogram.  This turns "the sampler looks right on one
target" into a calibrated frequentist check over the model's whole prior.

Protocol notes baked in:

- Ranks need near-independent draws (Talts §5.1): pass ``thin`` so
  ``n_rank_draws`` survive; the harness asserts enough draws arrive.
- Uniformity is scored per dimension with a chi-squared statistic over
  ``n_bins`` equiprobable rank bins and its survival p-value
  (``jax.scipy.special.gammaincc``).  Small p across dimensions =>
  miscalibration; with ``n_sims`` simulations the test resolves biases of
  order ``sqrt(n_bins / n_sims)`` in rank-CDF units.

The posterior runs are a host loop, not a ``vmap``: each simulation is an
entire MCMC run whose data changes.  Because the log-kernel closure is
rebuilt per dataset, each simulation re-traces the sampler (~1 s/sim for a
small RWMH on CPU) — calibration cost is ``n_sims x (trace + run)``, so
budget ``n_sims`` accordingly (100 resolves rank-CDF biases of a few
percent, per Talts §5).  A cache-friendly ``posterior_sampler`` (its own
``jax.jit`` with data as an argument) removes the re-trace if needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sbc"]


def sbc(key, prior_sampler, simulator, posterior_sampler, *,
        n_sims=100, n_rank_draws=31, thin=1, n_bins=8):
    """Run simulation-based calibration of a posterior sampler.

    Args:
        key: PRNG key; split into independent (prior, simulate, fit)
            streams per simulation.
        prior_sampler: ``f(key) -> theta`` — one draw from the prior,
            shape ``(d,)`` (or scalar).
        simulator: ``f(key, theta) -> data`` — one synthetic dataset.
        posterior_sampler: ``f(key, data) -> draws`` — the sampler under
            test, returning kept draws with leading draw axis (chain axes,
            if any, are flattened); **constrained** space, same
            parameterization as ``prior_sampler``.
        n_sims: number of independent calibration simulations.
        n_rank_draws: L — posterior draws ranked against the truth per
            simulation (after thinning). Ranks are uniform on {0..L}.
        thin: keep every ``thin``-th posterior draw before ranking (SBC
            requires near-independent draws; autocorrelation skews ranks
            toward the extremes even for an exact sampler).
        n_bins: equiprobable rank bins for the chi-squared uniformity
            statistic; must divide L + 1.

    Returns dict with ``ranks`` (``(n_sims, d)`` int array), ``chi2`` and
    ``p_value`` (``(d,)``, chi-squared against uniformity with
    ``n_bins - 1`` dof), plus the protocol constants.
    """
    L = int(n_rank_draws)
    if (L + 1) % int(n_bins) != 0:
        raise ValueError(
            f"n_bins={n_bins} must divide n_rank_draws + 1 = {L + 1} "
            f"(equiprobable bins need equal rank mass)")
    ranks = []
    for i in range(int(n_sims)):
        k_prior, k_sim, k_fit = jax.random.split(
            jax.random.fold_in(key, i), 3)
        theta = jnp.atleast_1d(prior_sampler(k_prior))
        data = simulator(k_sim, theta)
        draws = jnp.asarray(posterior_sampler(k_fit, data))
        draws = draws[:: int(thin)]   # thin the draw axis (autocorrelation)
        draws = draws.reshape(-1, theta.shape[-1])  # then pool chains
        if draws.shape[0] < L:
            raise ValueError(
                f"posterior_sampler returned {draws.shape[0]} draws after "
                f"thin={thin}, need n_rank_draws={L}")
        draws = draws[:L]
        ranks.append(np.asarray(jnp.sum(draws < theta[None, :], axis=0)))
    ranks = np.stack(ranks)                       # (n_sims, d)

    # chi-squared over equiprobable bins, per dimension
    bin_width = (L + 1) // int(n_bins)
    binned = ranks // bin_width                   # values in 0..n_bins-1
    counts = np.stack([np.bincount(binned[:, j], minlength=int(n_bins))
                       for j in range(ranks.shape[1])])   # (d, n_bins)
    expected = n_sims / int(n_bins)
    chi2 = ((counts - expected) ** 2 / expected).sum(axis=1)
    dof = int(n_bins) - 1
    p_value = np.asarray(jax.scipy.special.gammaincc(
        dof / 2.0, jnp.asarray(chi2) / 2.0))

    return {"ranks": ranks, "chi2": chi2, "p_value": p_value,
            "n_rank_draws": L, "n_bins": int(n_bins), "n_sims": int(n_sims)}
