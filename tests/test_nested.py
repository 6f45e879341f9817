"""Nested sampling: exact conjugate evidence, multimodal mass recovery,
posterior moments, cross-validation against thermo_evidence, termination."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu.nested import nested_sampling


def _phi(x):
    return 0.5 * (1 + math.erf(x / math.sqrt(2)))


def test_gaussian_evidence_exact():
    """Gaussian likelihood on a uniform box prior: log Z has a closed
    form; the estimate must land within a few sqrt(H/N) error bars and
    posterior draws must match the (essentially untruncated) moments."""
    d, a, s = 4, 5.0, 0.6
    m = np.array([0.5, -0.8, 1.2, 0.0])
    logZ_exact = float(sum(
        math.log((_phi((a - mi) / s) - _phi((-a - mi) / s)) / (2 * a))
        for mi in m))
    mj = jnp.asarray(m, jnp.float32)
    res = nested_sampling(
        lambda u: -a + 2 * a * u,
        lambda th: jnp.sum(-0.5 * ((th - mj) / s) ** 2 - jnp.log(s)
                           - 0.5 * jnp.log(2 * jnp.pi)),
        d, n_live=512, key=jax.random.PRNGKey(0))
    assert res.converged
    err = max(float(res.log_z_err), 1e-3)
    assert abs(float(res.log_z) - logZ_exact) < 4 * err, \
        (float(res.log_z), logZ_exact, err)
    pd = np.asarray(res.posterior_draws(jax.random.PRNGKey(1), 2000))
    assert np.abs(pd.mean(0) - m).max() < 0.08
    np.testing.assert_allclose(pd.std(0), s, rtol=0.15)
    # weights normalized
    lw = np.asarray(res.log_w, np.float64)
    assert abs(np.exp(lw).sum() - 1.0) < 0.02
    assert 0.1 < float(res.accept_rate) < 0.9


def test_multimodal_mass_recovery():
    """Two well-separated modes with 3:1 weights: NS counts both (the
    failure mode of any single-chain/mode-seeking evidence estimator)."""
    d, a, s = 2, 8.0, 0.4
    mu1 = jnp.asarray([-3.0, -3.0])
    mu2 = jnp.asarray([3.0, 3.0])

    def ll(th):
        l1 = jnp.sum(-0.5 * ((th - mu1) / s) ** 2) + jnp.log(0.75)
        l2 = jnp.sum(-0.5 * ((th - mu2) / s) ** 2) + jnp.log(0.25)
        return (jnp.logaddexp(l1, l2) - d * jnp.log(s)
                - 0.5 * d * jnp.log(2 * jnp.pi))

    logZ_exact = -d * math.log(2 * a)   # both modes inside the box
    res = nested_sampling(lambda u: -a + 2 * a * u, ll, d, n_live=1024,
                          key=jax.random.PRNGKey(0))
    assert res.converged
    err = max(float(res.log_z_err), 1e-3)
    assert abs(float(res.log_z) - logZ_exact) < 4 * err
    pd = np.asarray(res.posterior_draws(jax.random.PRNGKey(1), 4000))
    frac1 = float((pd[:, 0] < 0).mean())
    assert abs(frac1 - 0.75) < 0.08, frac1


def test_cross_validates_thermo_evidence():
    """Same conjugate normal-normal model through nested sampling and the
    power-posterior ladder: the two independent estimators agree."""
    n, v0, v, m0 = 15, 4.0, 1.0, 0.5
    y = np.asarray(1.0 + np.random.default_rng(3).normal(size=n))
    vn = 1.0 / (1.0 / v0 + n / v)
    mn = vn * (m0 / v0 + y.sum() / v)
    logZ_exact = float(
        -0.5 * n * np.log(2 * np.pi * v) + 0.5 * np.log(vn / v0)
        - 0.5 * ((y ** 2).sum() / v + m0 ** 2 / v0 - mn ** 2 / vn))
    yj = jnp.asarray(y, jnp.float32)

    def log_lik(th):
        return jnp.sum(-0.5 * (yj - th[0]) ** 2 / v
                       - 0.5 * jnp.log(2 * jnp.pi * v))

    # prior N(m0, v0) via the unit cube (ndtri transform)
    from jax.scipy.special import ndtri
    res = nested_sampling(
        lambda u: m0 + jnp.sqrt(v0) * ndtri(u), log_lik, 1,
        n_live=512, key=jax.random.PRNGKey(4))
    assert res.converged
    err = max(float(res.log_z_err), 1e-3)
    assert abs(float(res.log_z) - logZ_exact) < 4 * err

    s = mcmc_tpu.AlgoSettings()
    s.evidence_settings = mcmc_tpu.EvidenceSettings(
        n_burnin_draws=500, n_keep_draws=500, n_temps=12)
    te = mcmc_tpu.thermo_evidence(
        jnp.zeros(1),
        lambda th: jnp.sum(-0.5 * (th - m0) ** 2 / v0
                           - 0.5 * jnp.log(2 * jnp.pi * v0)),
        log_lik, s, n_chains=8, key=jax.random.PRNGKey(5))
    assert abs(float(res.log_z) - float(te.log_z)) < 0.3


def test_round_cap_and_validation():
    """An unconverged run (tiny round cap) reports converged=False; bad
    kill_frac raises."""
    ll = lambda th: jnp.sum(-0.5 * (th / 0.05) ** 2)
    res = nested_sampling(lambda u: -5 + 10 * u, ll, 2, n_live=128,
                          max_rounds=3, key=jax.random.PRNGKey(6))
    assert not res.converged
    assert res.n_rounds == 3
    with pytest.raises(ValueError, match="kill_frac"):
        nested_sampling(lambda u: u, ll, 2, n_live=16, kill_frac=1.0)


def test_hard_constraint_likelihood_no_nan():
    """A likelihood that is -inf on half the prior (hard constraint) must
    not NaN-poison H / log_z_err (softmax 0 * -inf guard). Exact check:
    L = indicator(x > 0) * N(x; 1, s) on uniform [-a, a]."""
    a, s = 4.0, 0.5
    def ll(th):
        base = (-0.5 * ((th[0] - 1.0) / s) ** 2 - jnp.log(s)
                - 0.5 * jnp.log(2 * jnp.pi))
        return jnp.where(th[0] > 0.0, base, -jnp.inf)

    logZ_exact = math.log(
        (_phi((a - 1.0) / s) - _phi((0.0 - 1.0) / s)) / (2 * a))
    res = nested_sampling(lambda u: -a + 2 * a * u, ll, 1, n_live=512,
                          key=jax.random.PRNGKey(7))
    assert np.isfinite(float(res.h)), "H NaN-poisoned by -inf likelihoods"
    assert np.isfinite(float(res.log_z_err))
    err = max(float(res.log_z_err), 1e-3)
    assert abs(float(res.log_z) - logZ_exact) < 5 * err
