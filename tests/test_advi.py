"""ADVI: exact Gaussian recovery (mean-field + full-rank), ELBO as a log-Z
lower bound tight at Gaussianity, bounds, and the mean-field
correlation-blindness it is documented to have."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings
from mcmc_tpu.advi import advi


def test_full_rank_recovers_correlated_gaussian():
    cov = np.array([[2.0, 0.9], [0.9, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0])
    c = -4.0
    lk = lambda x: c - 0.5 * (x - mu) @ prec @ (x - mu)
    logZ = c + np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(cov)[1]

    r = advi(jnp.zeros(2), lk, full_rank=True, n_steps=3000,
             key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(r.mean), np.asarray(mu), atol=0.1)
    L = np.asarray(r.chol)
    np.testing.assert_allclose(L @ L.T, cov, atol=0.2)
    # for a Gaussian target the optimal q is exact, so ELBO -> log Z
    assert abs(float(r.elbo) - logZ) < 0.1
    d = np.asarray(r.draw(jax.random.PRNGKey(1), 40000))
    np.testing.assert_allclose(np.cov(d.T), cov, atol=0.25)


def test_mean_field_marginals_vs_correlation_blindness():
    """Mean-field on a correlated Gaussian: means exact, but the learned
    scales are the PRECISION-matched ones (smaller than the marginal
    sd) — the documented mean-field failure mode, asserted as such."""
    rho = 0.8
    cov = np.array([[1.0, rho], [rho, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    lk = lambda x: -0.5 * x @ prec @ x
    r = advi(jnp.zeros(2), lk, n_steps=3000, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(r.mean_z), 0.0, atol=0.08)
    # KL(q||p) optimum for diagonal q: sd_i = 1/sqrt(prec_ii) = sqrt(1-rho^2)
    expect = np.sqrt(1 - rho ** 2)
    np.testing.assert_allclose(np.asarray(r.sd_z), expect, rtol=0.15)


def test_bounded_gamma():
    lk = lambda x: 2.0 * jnp.log(x[0]) - 2.0 * x[0]
    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    r = advi(jnp.ones(1), lk, s, n_steps=2000, key=jax.random.PRNGKey(3))
    d = np.asarray(r.draw(jax.random.PRNGKey(4), 20000))
    assert d.min() > 0.0
    assert abs(d.mean() - 1.5) < 0.2       # E[Gamma(3,2)] = 1.5
    assert float(r.mean[0]) > 0.0


def test_elbo_trace_monotone_trend():
    lk = lambda x: -0.5 * jnp.sum((x - 3.0) ** 2)
    r = advi(jnp.zeros(3), lk, n_steps=1000, key=jax.random.PRNGKey(5))
    tr = np.asarray(r.elbo_trace)
    assert tr.shape == (1000,)
    assert tr[-100:].mean() > tr[:100].mean()


def test_validation():
    with pytest.raises(TypeError, match="settings"):
        advi(jnp.zeros(2), lambda x: -x @ x, settings=5)


def test_partial_support_still_moves():
    """A target whose gradient NaNs outside support (no declared bounds):
    per-sample masking must keep the finite samples' gradients alive so
    the fit still converges — a naive summed gradient would NaN and the
    guard would freeze every step."""
    lk = lambda x: 2.0 * jnp.log(x[0]) - 2.0 * x[0]   # NaN grad for x<0
    r = advi(jnp.full((1,), 0.5), lk, n_steps=2000,
             key=jax.random.PRNGKey(6))
    # Gamma(3,2): box-free VI fits the constrained density directly; the
    # mean must move from 0.5 toward the bulk (~1.3-1.5)
    assert float(r.mean[0]) > 1.0, float(r.mean[0])
    assert np.isfinite(float(r.elbo))
