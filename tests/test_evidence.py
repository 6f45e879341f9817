"""Evidence estimation: power-posterior TI/stepping-stone vs exact conjugate
marginal likelihoods, the Laplace shortcut, and estimator agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings, EvidenceSettings
from mcmc_tpu.evidence import power_schedule, estimate_from_ll


def _conjugate_normal(key, d=2, n=20, m0=0.5, v0=4.0, v=1.0):
    """y_i ~ N(theta, v I), theta ~ N(m0 1, v0 I): returns (y, log_prior,
    log_lik, exact log Z) — dimensions independent, so log Z sums the 1-d
    normal-normal marginals."""
    theta_true = np.full(d, 1.2)
    y = np.asarray(
        theta_true + np.sqrt(v) * np.asarray(
            jax.random.normal(key, (n, d))), np.float64)

    vn = 1.0 / (1.0 / v0 + n / v)
    mn = vn * (m0 / v0 + y.sum(axis=0) / v)
    log_z = (
        -0.5 * n * np.log(2 * np.pi * v)
        + 0.5 * np.log(vn / v0)
        - 0.5 * ((y ** 2).sum(axis=0) / v + m0 ** 2 / v0 - mn ** 2 / vn)
    ).sum()

    yj = jnp.asarray(y, jnp.float32)

    def log_prior(th):
        return (-0.5 * ((th - m0) ** 2) / v0
                - 0.5 * jnp.log(2 * jnp.pi * v0)).sum()

    def log_lik(th):
        r = yj - th[None, :]
        return (-0.5 * (r ** 2) / v - 0.5 * jnp.log(2 * jnp.pi * v)).sum()

    return yj, log_prior, log_lik, float(log_z)


def test_power_schedule_shape():
    b = power_schedule(8, 5.0, jnp.float32)
    assert b.shape == (8,)
    assert float(b[0]) == 0.0 and float(b[-1]) == 1.0
    assert bool(jnp.all(b[1:] > b[:-1]))
    with pytest.raises(ValueError):
        power_schedule(1, 5.0, jnp.float32)


def test_thermo_evidence_conjugate_normal():
    """Stepping-stone and corrected-TI both hit the exact normal-normal
    log Z within a few cross-chain standard errors, and agree with each
    other."""
    _, log_prior, log_lik, log_z_exact = _conjugate_normal(
        jax.random.PRNGKey(7))
    s = AlgoSettings()
    s.evidence_settings = EvidenceSettings(
        n_burnin_draws=600, n_keep_draws=600, n_temps=16, n_leap_steps=6)
    res = mcmc_tpu.thermo_evidence(
        jnp.zeros(2), log_prior, log_lik, s, n_chains=8,
        key=jax.random.PRNGKey(1))

    assert res.n_chains == 8
    assert res.log_z_per_chain.shape == (8,)
    se = max(float(res.log_z_se), 1e-3)
    assert abs(float(res.log_z) - log_z_exact) < max(5 * se, 0.25), \
        (float(res.log_z), log_z_exact, se)
    se_ti = max(float(res.log_z_ti_se), 1e-3)
    assert abs(float(res.log_z_ti) - log_z_exact) < max(5 * se_ti, 0.25), \
        (float(res.log_z_ti), log_z_exact, se_ti)
    # internal consistency of the two estimators
    assert abs(float(res.log_z) - float(res.log_z_ti)) < 0.3
    # the per-rung mean log-lik curve is increasing in beta for this target
    e = np.asarray(res.expected_log_lik)
    assert e[-1] > e[0]
    # adaptation hit sane acceptance on every rung
    acc = np.asarray(res.accept_rate)
    assert acc.min() > 0.3 and acc.max() <= 1.0
    # DEO swaps are exercised and mostly accepted on a smooth path
    assert float(np.asarray(res.swap_accept_rate).min()) > 0.2


def test_thermo_evidence_rwmh_inner():
    """The gradient-free inner kernel reaches the same answer."""
    _, log_prior, log_lik, log_z_exact = _conjugate_normal(
        jax.random.PRNGKey(7))
    s = AlgoSettings()
    s.evidence_settings = EvidenceSettings(
        n_burnin_draws=800, n_keep_draws=800, n_temps=16, inner="rwmh")
    res = mcmc_tpu.thermo_evidence(
        jnp.zeros(2), log_prior, log_lik, s, n_chains=8,
        key=jax.random.PRNGKey(2))
    se = max(float(res.log_z_se), 1e-3)
    assert abs(float(res.log_z) - log_z_exact) < max(6 * se, 0.4), \
        (float(res.log_z), log_z_exact, se)


def test_thermo_evidence_bounded_gamma_exponential():
    """y ~ Exp(lam), lam ~ Gamma(a, b) with a hard lower bound at 0:
    Z = b^a/Gamma(a) * Gamma(a+n)/(b+sum y)^{a+n}. Exercises the
    Jacobian-to-prior split on the unconstrained space."""
    a, b, n = 3.0, 2.0, 15
    y = np.asarray(jax.random.exponential(
        jax.random.PRNGKey(3), (n,)), np.float64) / 1.5
    import math
    log_z_exact = (a * math.log(b) - math.lgamma(a)
                   + math.lgamma(a + n)
                   - (a + n) * math.log(b + y.sum()))
    yj = jnp.asarray(y, jnp.float32)

    def log_prior(lam):
        return (a * jnp.log(b) - jax.scipy.special.gammaln(a)
                + (a - 1.0) * jnp.log(lam[0]) - b * lam[0])

    def log_lik(lam):
        return n * jnp.log(lam[0]) - lam[0] * yj.sum()

    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.evidence_settings = EvidenceSettings(
        n_burnin_draws=800, n_keep_draws=800, n_temps=16, n_leap_steps=6,
        step_size=0.1)
    res = mcmc_tpu.thermo_evidence(
        jnp.ones(1), log_prior, log_lik, s, n_chains=8,
        key=jax.random.PRNGKey(4))
    se = max(float(res.log_z_se), 1e-3)
    assert abs(float(res.log_z) - log_z_exact) < max(6 * se, 0.3), \
        (float(res.log_z), log_z_exact, se)


def test_laplace_log_evidence_gaussian_exact():
    """For kernel(x) = c - (x-mu)^T P (x-mu)/2 the integral is
    c + d/2 log 2pi + 1/2 log|P^{-1}| — Laplace is exact for Gaussians."""
    mu = np.array([0.7, -1.1], np.float32)
    cov = np.array([[1.5, 0.4], [0.4, 0.8]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    c = -3.25

    def kern(x):
        d = x - jnp.asarray(mu)
        return c - 0.5 * d @ prec @ d

    exact = c + 0.5 * 2 * np.log(2 * np.pi) \
        + 0.5 * np.linalg.slogdet(cov)[1]
    lap = mcmc_tpu.map_laplace(jnp.zeros(2), kern, n_steps=800,
                               learning_rate=0.1, key=jax.random.PRNGKey(0))
    assert abs(float(lap.log_evidence) - exact) < 2e-2


def test_laplace_vs_thermo_cross_check():
    """On the conjugate normal joint, the Laplace evidence (exact there)
    matches the thermodynamic estimate."""
    _, log_prior, log_lik, log_z_exact = _conjugate_normal(
        jax.random.PRNGKey(7))
    lap = mcmc_tpu.map_laplace(
        jnp.zeros(2), lambda th: log_prior(th) + log_lik(th),
        n_steps=800, learning_rate=0.1, key=jax.random.PRNGKey(0))
    assert abs(float(lap.log_evidence) - log_z_exact) < 5e-2


def test_estimate_from_ll_exact_flat_curve():
    """With ll constant = c the evidence must be exactly c (both
    estimators, zero variance)."""
    betas = power_schedule(8, 5.0, jnp.float32)
    ll = jnp.full((50, 4, 8), -3.0, jnp.float32)
    ss, ti, e, v = estimate_from_ll(ll, betas)
    np.testing.assert_allclose(np.asarray(ss), -3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ti), -3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_evidence_settings_validation():
    with pytest.raises(ValueError, match="inner"):
        s = AlgoSettings()
        s.evidence_settings = EvidenceSettings(inner="nope")
        mcmc_tpu.thermo_evidence(jnp.zeros(2), lambda x: -x @ x / 2,
                                 lambda x: -x @ x, s, n_chains=2)


def test_prior_rung_samples_full_prior_with_hard_constraint():
    """With log_lik = -inf outside a constraint region, the beta = 0 rung
    must sample the WHOLE prior (0 * -inf guard) — otherwise the first
    stepping-stone factor is computed under the wrong distribution. Exact
    model: prior N(0,1), lik = indicator(x > 0) * c. Then
    Z = c * P(x > 0) = c/2 exactly, and E_0[lik^db] over the full prior
    drives the SS estimate; the buggy restricted-prior version converges
    to c instead."""
    c = -1.3
    log_prior = lambda th: jnp.sum(-0.5 * th**2 - 0.5 * jnp.log(2 * jnp.pi))
    log_lik = lambda th: jnp.where(th[0] > 0.0, c, -jnp.inf)
    logZ_exact = c + jnp.log(0.5)

    s = AlgoSettings()
    s.evidence_settings = EvidenceSettings(
        n_burnin_draws=600, n_keep_draws=1200, n_temps=12, inner="rwmh",
        par_scale=0.8)
    res = mcmc_tpu.thermo_evidence(
        jnp.full((1,), -0.5), log_prior, log_lik, s, n_chains=8,
        key=jax.random.PRNGKey(11))
    assert np.isfinite(float(res.log_z))
    assert abs(float(res.log_z) - float(logZ_exact)) < 0.1, \
        (float(res.log_z), float(logZ_exact))


def test_ti_curves_finite_under_hard_constraint():
    """With a hard-constraint likelihood the per-rung curves and TI stay
    FINITE (conditional-on-feasible statistics), and TI's documented bias
    is exactly +(-log P(lik>0)): it misses the beta=0 atom the stepping
    stone captures."""
    c = -1.3
    log_prior = lambda th: jnp.sum(-0.5 * th**2 - 0.5 * jnp.log(2 * jnp.pi))
    log_lik = lambda th: jnp.where(th[0] > 0.0, c, -jnp.inf)
    s = AlgoSettings()
    s.evidence_settings = EvidenceSettings(
        n_burnin_draws=400, n_keep_draws=800, n_temps=12, inner="rwmh",
        par_scale=0.8)
    res = mcmc_tpu.thermo_evidence(
        jnp.full((1,), -0.5), log_prior, log_lik, s, n_chains=8,
        key=jax.random.PRNGKey(12))
    assert np.isfinite(np.asarray(res.expected_log_lik)).all()
    assert np.isfinite(np.asarray(res.var_log_lik)).all()
    assert np.isfinite(float(res.log_z_ti))
    # conditional on feasibility ll == c everywhere, so TI == c (biased
    # high by -log 0.5 vs the true log Z = c + log 0.5), SS is exact
    assert abs(float(res.log_z_ti) - c) < 0.05
    assert abs(float(res.log_z) - (c + np.log(0.5))) < 0.1
