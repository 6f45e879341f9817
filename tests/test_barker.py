"""Barker proposal: KS exactness, adaptation targets, robustness to
step-size mis-tuning (its design property), bounds, and fit() integration."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings, BarkerSettings


def _ks_stat_vs_normal(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    return max(d_plus, d_minus)


LOG_KERNEL = lambda v: -0.5 * jnp.sum(v**2)


def test_barker_exact_on_standard_normal():
    """KS test against N(0,1): the skew-kick proposal density and its
    softplus MH correction must cancel exactly for the chain to be
    invariant."""
    out = mcmc_tpu.barker(jnp.zeros(1), LOG_KERNEL,
                          BarkerSettings(n_burnin_draws=500,
                                         n_keep_draws=4000, step_size=1.5),
                          n_chains=16, key=jax.random.PRNGKey(0))
    samples = np.asarray(out.draws[:, :, 0])[::6].reshape(-1)
    ks = _ks_stat_vs_normal(samples)
    assert ks < 1.95 / math.sqrt(len(samples)), ks
    assert 0.3 < float(out.accept_rate.mean()) < 0.95


def test_barker_adaptation_hits_target():
    """Dual averaging lands acceptance near 0.574 and the windowed
    preconditioner recovers heterogeneous coordinate scales."""
    scales = jnp.asarray([0.05, 1.0, 20.0])
    lk = lambda v: -0.5 * jnp.sum((v / scales) ** 2)
    out = mcmc_tpu.barker(jnp.zeros(3), lk,
                          BarkerSettings(n_burnin_draws=1500,
                                         n_keep_draws=1500, step_size=0.5),
                          n_chains=32, key=jax.random.PRNGKey(1),
                          adapt_step_size=True, adapt_precond=True,
                          pooled_adaptation=True)
    acc = float(out.accept_rate.mean())
    assert 0.45 < acc < 0.7, acc
    sd = np.sqrt(np.asarray(out.draws).reshape(-1, 3).var(axis=0))
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.25)


@pytest.mark.parametrize("step", [0.05, 10.0])
def test_barker_robust_to_mistuned_step(step):
    """The design property (Livingstone & Zanella 2022): a 20x-too-large
    step leaves the chain ergodic (acceptance degrades gracefully, no
    freeze), where MALA's drift would overshoot and pin acceptance at ~0.
    From a far-out start both extremes still find the mode region."""
    out = mcmc_tpu.barker(jnp.full((2,), 6.0), LOG_KERNEL,
                          BarkerSettings(n_burnin_draws=2000,
                                         n_keep_draws=2000, step_size=step),
                          n_chains=16, key=jax.random.PRNGKey(2))
    acc = float(out.accept_rate.mean())
    assert acc > 0.02, acc          # never frozen
    m = np.asarray(out.draws).reshape(-1, 2).mean(axis=0)
    assert np.abs(m).max() < 0.6, m


def test_barker_vs_mala_heavy_overshoot():
    """Head-to-head at a step size 8x MALA's stable range on a sharp
    target: MALA's acceptance collapses to ~0 (drift overshoot), Barker
    keeps moving — the quantitative robustness claim."""
    lk = lambda v: -0.5 * jnp.sum((4.0 * v) ** 2)
    kw = dict(n_chains=16, key=jax.random.PRNGKey(3))
    b = mcmc_tpu.barker(jnp.zeros(2), lk,
                        BarkerSettings(n_burnin_draws=500, n_keep_draws=1000,
                                       step_size=2.0), **kw)
    m = mcmc_tpu.mala(jnp.zeros(2), lk,
                      mcmc_tpu.MALASettings(n_burnin_draws=500,
                                            n_keep_draws=1000,
                                            step_size=2.0), **kw)
    acc_b = float(b.accept_rate.mean())
    acc_m = float(m.accept_rate.mean())
    assert acc_b > 5 * max(acc_m, 1e-4), (acc_b, acc_m)
    assert acc_b > 0.05


def test_barker_bounded_truncated_normal():
    """Truncated N(1, 1) on [0, inf): posterior mean 1.288 (the exact-
    gradient box kernel — no reference quirk exists for this sampler)."""
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.barker_settings = BarkerSettings(n_burnin_draws=1500,
                                       n_keep_draws=4000, step_size=1.0)
    out = mcmc_tpu.barker(jnp.ones(1), lk, s, n_chains=32,
                          key=jax.random.PRNGKey(4))
    draws = np.asarray(out.draws)
    assert draws.min() >= 0.0
    # E[X | X>0], X~N(1,1) = 1 + phi(1)/Phi(1)
    exact = 1.0 + math.exp(-0.5) / math.sqrt(2 * math.pi) / \
        (0.5 * (1 + math.erf(1 / math.sqrt(2))))
    assert abs(draws.mean() - exact) < 0.03, (draws.mean(), exact)


def test_barker_thin_resume_determinism():
    """thin composes; fixed key is bitwise deterministic; resume continues."""
    kw = dict(n_chains=4, key=jax.random.PRNGKey(5))
    s = BarkerSettings(n_burnin_draws=100, n_keep_draws=200, step_size=1.0)
    a = mcmc_tpu.barker(jnp.zeros(2), LOG_KERNEL, s, **kw)
    b = mcmc_tpu.barker(jnp.zeros(2), LOG_KERNEL, s, **kw)
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    t = mcmc_tpu.barker(jnp.zeros(2), LOG_KERNEL, s, thin=3, **kw)
    assert t.draws.shape == (200, 4, 2)
    assert t.diagnostics["thin"] == 3

    r = mcmc_tpu.barker(jnp.zeros(2), LOG_KERNEL, s, return_resume=True, **kw)
    r2 = r.diagnostics["resume"](jax.random.PRNGKey(6), 50)
    assert r2.draws.shape == (50, 4, 2)


def test_fit_barker():
    """fit(algorithm='barker') converges with gates."""
    cov = jnp.asarray([[2.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    lk = lambda v: -0.5 * v @ prec @ v
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="barker", n_chains=16,
                       n_warmup=1000, n_draws=1000,
                       key=jax.random.PRNGKey(7))
    summ = out.diagnostics["summary"]
    assert float(np.asarray(summ["rhat"]).max()) < 1.02
    got = np.asarray(out.draws).reshape(-1, 2)
    np.testing.assert_allclose(got.var(axis=0),
                               np.diagonal(np.asarray(cov)), rtol=0.2)
