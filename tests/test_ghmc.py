"""Generalized HMC (persistent momentum, Horowitz 1991) tests.

The load-bearing checks are the two KS-exactness tests run WITH high
persistence and frequent rejections: the momentum flip on rejection is
precisely the term a naive implementation drops. On a symmetric target
the flip is undetectable (p -> -p symmetry), so the skewed-target test
is the one with power over a forgot-the-flip bug.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _ks_stat_vs_normal(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    return max(d_plus, d_minus)


LK = lambda v: -0.5 * jnp.sum(v ** 2)


def test_ghmc_exact_on_standard_normal():
    """Fixed large step + high persistence (alpha=0.9): rejections are
    frequent enough to exercise the flip, and the chain must still be
    exactly N(0,1)-invariant."""
    out = mcmc_tpu.ghmc(
        jnp.zeros(1), LK,
        mcmc_tpu.GHMCSettings(n_burnin_draws=500, n_keep_draws=4000,
                              step_size=1.1, momentum_persistence=0.9,
                              jitter=0.0),
        n_chains=16, key=jax.random.PRNGKey(0), adapt_step_size=False)
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.3 < rate < 0.95
    samples = np.asarray(out.draws)[::4].reshape(-1)
    ks = _ks_stat_vs_normal(samples)
    assert ks < 1.95 / math.sqrt(len(samples)), ks


def test_ghmc_exact_on_skewed_target():
    """KS exactness on a SKEWED 1-d density (Exp(1) through the box
    transform, so the unconstrained target z - e^z is asymmetric). For
    symmetric targets the Horowitz flip is undetectable by p -> -p
    symmetry; skewness is what gives this test power over a
    forgot-the-flip bug."""
    lk = lambda v: -jnp.sum(v)   # Exp(1) on (0, inf) with the box bounds
    s = mcmc_tpu.AlgoSettings(
        vals_bound=True, lower_bounds=jnp.zeros(1),
        upper_bounds=jnp.full((1,), jnp.inf),
        ghmc_settings=mcmc_tpu.GHMCSettings(
            n_burnin_draws=500, n_keep_draws=4000, step_size=0.9,
            momentum_persistence=0.9, jitter=0.0))
    out = mcmc_tpu.ghmc(jnp.ones(1), lk, s, n_chains=16,
                        key=jax.random.PRNGKey(1), adapt_step_size=False,
                        bounded_grad="exact")
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.3 < rate < 0.995, rate
    x = np.sort(np.asarray(out.draws)[::6].reshape(-1).astype(np.float64))
    n = len(x)
    cdf = 1.0 - np.exp(-x)       # Exp(1) CDF
    ks = max(np.max(np.arange(1, n + 1) / n - cdf),
             np.max(cdf - np.arange(0, n) / n))
    assert ks < 1.95 / math.sqrt(n), ks


def test_ghmc_adapted_correlated_gaussian():
    """Adapted GHMC on a correlated 3-d Gaussian: acceptance near the
    0.95 target, moments recovered."""
    A = jnp.asarray([[1.0, 0.8, 0.0], [0.8, 1.0, 0.3], [0.0, 0.3, 1.0]])
    P = jnp.linalg.inv(A)
    lk = lambda v: -0.5 * v @ (P @ v)
    out = mcmc_tpu.ghmc(
        jnp.zeros(3), lk,
        mcmc_tpu.GHMCSettings(n_burnin_draws=1500, n_keep_draws=4000),
        n_chains=64, key=jax.random.PRNGKey(2))
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.85 < rate <= 1.0
    d = np.asarray(out.draws).reshape(-1, 3)
    cov = np.cov(d.T)
    assert np.abs(d.mean(axis=0)).max() < 0.08
    assert np.abs(cov - np.asarray(A)).max() < 0.15
    assert float(out.diagnostics["adapted_step_size"].mean()) > 0.0
    assert 0.0 < out.diagnostics["momentum_persistence"] < 1.0


def test_ghmc_alpha_zero_is_hmc():
    """alpha=0, jitter=0, fixed step: the partial refresh degenerates to
    a full refresh — bitwise-identical positions to build_hmc_kernel
    under the same keys would require identical key-split trees, so
    check the distributional property instead: both recover N(0,1)."""
    out = mcmc_tpu.ghmc(
        jnp.zeros(2), LK,
        mcmc_tpu.GHMCSettings(n_burnin_draws=300, n_keep_draws=2000,
                              step_size=0.9, momentum_persistence=1e-9,
                              jitter=0.0, n_leap_steps=3),
        n_chains=16, key=jax.random.PRNGKey(3), adapt_step_size=False)
    d = np.asarray(out.draws).reshape(-1)
    assert abs(d.mean()) < 0.05
    assert abs(d.var() - 1.0) < 0.1


def test_ghmc_bounded_and_determinism():
    # exponential-like target on (0, inf): box transform + reference
    # bounded-gradient convention must stay finite and in-support
    lk = lambda v: -jnp.sum(v)
    s = mcmc_tpu.AlgoSettings(
        vals_bound=True, lower_bounds=jnp.zeros(2),
        upper_bounds=jnp.full((2,), jnp.inf),
        ghmc_settings=mcmc_tpu.GHMCSettings(n_burnin_draws=300,
                                            n_keep_draws=1500,
                                            step_size=0.3))
    kw = dict(n_chains=8, key=jax.random.PRNGKey(5))
    out = mcmc_tpu.ghmc(jnp.ones(2), lk, s, **kw)
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert abs(d.mean() - 1.0) < 0.12   # Exp(1) mean
    out2 = mcmc_tpu.ghmc(jnp.ones(2), lk, s, **kw)
    np.testing.assert_array_equal(d, np.asarray(out2.draws))


def test_ghmc_validation_and_dispatcher():
    with pytest.raises(ValueError, match="momentum_persistence"):
        mcmc_tpu.ghmc(jnp.zeros(2), LK,
                      mcmc_tpu.GHMCSettings(momentum_persistence=1.5))
    with pytest.raises(ValueError, match="jitter"):
        mcmc_tpu.ghmc(jnp.zeros(2), LK,
                      mcmc_tpu.GHMCSettings(jitter=-0.1))
    out = mcmc_tpu.sample(
        "ghmc", jnp.zeros(2), LK,
        mcmc_tpu.GHMCSettings(n_burnin_draws=50, n_keep_draws=40),
        n_chains=3, thin=2, key=jax.random.PRNGKey(7))
    assert out.draws.shape == (40, 3, 2)
