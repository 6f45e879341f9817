"""RWMH statistical parity tests against the reference's Gaussian-mean
example (reference examples/eigen/rwmh_normal_mean.cpp, README.md:244-274).

Parity is distributional, not bitwise (SURVEY.md §7 hard part 3): mt19937_64
vs threefry make identical streams impossible, so we check posterior moments
against the analytic conjugate posterior within Monte-Carlo error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


@pytest.fixture(scope="module")
def gaussian_data():
    key = jax.random.PRNGKey(7)
    mu_true, sigma = 2.0, 1.0
    x = mu_true + sigma * jax.random.normal(key, (100,))
    return x, sigma


def analytic_posterior(x, sigma, mu_0=1.0, sigma_0=2.0):
    n = x.shape[0]
    prec = n / sigma**2 + 1.0 / sigma_0**2
    mean = (x.sum() / sigma**2 + mu_0 / sigma_0**2) / prec
    return float(mean), float(1.0 / prec)


def test_rwmh_posterior_mean(gaussian_data):
    x, sigma = gaussian_data
    log_kernel = models.gaussian_mean_model(x, sigma=sigma)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=42)
    settings.rwmh_settings.par_scale = 0.4
    settings.rwmh_settings.n_burnin_draws = 2000
    settings.rwmh_settings.n_keep_draws = 2000

    out = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, settings)

    post_mean, post_var = analytic_posterior(x, sigma)
    assert out.draws.shape == (2000, 1)
    assert float(out.mean[0]) == pytest.approx(post_mean, abs=4 * np.sqrt(post_var))
    assert 0.05 < float(out.accept_rate) < 0.99
    # acceptance counted only post burn-in (reference src/rwmh.cpp:140-142)
    assert 0 <= int(out.n_accept_draws) <= 2000


def test_rwmh_many_chains(gaussian_data):
    x, sigma = gaussian_data
    log_kernel = models.gaussian_mean_model(x, sigma=sigma)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=3)
    settings.rwmh_settings.par_scale = 0.4
    settings.rwmh_settings.n_burnin_draws = 500
    settings.rwmh_settings.n_keep_draws = 500

    out = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, settings, n_chains=32)
    assert out.draws.shape == (500, 32, 1)
    assert out.n_accept_draws.shape == (32,)

    post_mean, post_var = analytic_posterior(x, sigma)
    pooled = float(out.draws.mean())
    assert pooled == pytest.approx(post_mean, abs=3 * np.sqrt(post_var))

    from mcmc_tpu import diagnostics
    rhat = diagnostics.split_rhat(out.draws)
    assert float(rhat[0]) < 1.1


def test_rwmh_deterministic_for_fixed_key(gaussian_data):
    x, sigma = gaussian_data
    log_kernel = models.gaussian_mean_model(x, sigma=sigma)
    s = mcmc_tpu.RWMHSettings(n_burnin_draws=50, n_keep_draws=50, par_scale=0.4)
    key = jax.random.PRNGKey(0)
    out1 = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, s, key=key)
    out2 = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, s, key=key)
    np.testing.assert_array_equal(np.asarray(out1.draws), np.asarray(out2.draws))


def test_rwmh_bounded(gaussian_data):
    """Sampling with a two-sided box must stay inside and still find the
    posterior mode region (reference docs/source/box_constraints.rst)."""
    x, sigma = gaussian_data
    log_kernel = models.gaussian_mean_model(x, sigma=sigma)

    settings = mcmc_tpu.AlgoSettings(
        rng_seed_value=11, vals_bound=True,
        lower_bounds=jnp.array([0.5]), upper_bounds=jnp.array([10.0]),
    )
    settings.rwmh_settings.par_scale = 0.5
    settings.rwmh_settings.n_burnin_draws = 1000
    settings.rwmh_settings.n_keep_draws = 1000

    out = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, settings)
    d = np.asarray(out.draws)
    assert (d >= 0.5).all() and (d <= 10.0).all()
    post_mean, post_var = analytic_posterior(x, sigma)
    assert float(out.mean[0]) == pytest.approx(post_mean, abs=5 * np.sqrt(post_var))


def test_delayed_rejection_exactness_ks():
    """DR invariance: at a deliberately overshooting scale the stage-2
    ratio must keep N(0,1) exactly invariant (KS), and the fallback must
    carry acceptance well above the plain chain's."""
    import math
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.RWMHSettings(n_burnin_draws=500, n_keep_draws=4000,
                              par_scale=6.0)
    kw = dict(n_chains=16, key=jax.random.PRNGKey(20))
    dr = mcmc_tpu.rwmh(jnp.zeros(1), lk, s, delayed_rejection=True, **kw)
    plain = mcmc_tpu.rwmh(jnp.zeros(1), lk, s, **kw)
    acc_dr = float(dr.accept_rate.mean())
    acc_plain = float(plain.accept_rate.mean())
    assert acc_dr > 2.0 * acc_plain, (acc_dr, acc_plain)

    x = np.sort(np.asarray(dr.draws[:, :, 0])[::8].reshape(-1).astype(np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    ks = max(np.max(np.arange(1, n + 1) / n - cdf),
             np.max(cdf - np.arange(0, n) / n))
    assert ks < 1.95 / math.sqrt(n), ks


def test_dram_composition():
    """DRAM = dense adaptive covariance + delayed rejection: converges on
    a correlated target and recovers its covariance."""
    cov = np.array([[2.0, 0.9], [0.9, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    lk = lambda v: -0.5 * v @ prec @ v
    out = mcmc_tpu.rwmh(jnp.zeros(2), lk,
                        mcmc_tpu.RWMHSettings(n_burnin_draws=2000,
                                              n_keep_draws=3000),
                        n_chains=32, key=jax.random.PRNGKey(21),
                        adapt_scale=True, adapt_precond="dense",
                        pooled_adaptation=True, delayed_rejection=True)
    d = np.asarray(out.draws).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(d.T), cov, rtol=0.2, atol=0.1)
    assert 0.1 < float(out.accept_rate.mean()) < 0.9


def test_delayed_rejection_deterministic_and_bounded():
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    s = mcmc_tpu.AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.rwmh_settings = mcmc_tpu.RWMHSettings(n_burnin_draws=300,
                                            n_keep_draws=500, par_scale=2.0)
    kw = dict(n_chains=8, key=jax.random.PRNGKey(22), delayed_rejection=True)
    a = mcmc_tpu.rwmh(jnp.ones(1), lk, s, **kw)
    b = mcmc_tpu.rwmh(jnp.ones(1), lk, s, **kw)
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))
    assert np.asarray(a.draws).min() >= 0.0
