"""Elliptical slice sampling — validated against exact conjugate
posteriors (the Gaussian-prior x Gaussian-likelihood closed form) and
cross-checked against NUTS on a non-Gaussian likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _conjugate_posterior(Sigma0, Sigma_l, y):
    """Exact posterior of x ~ N(0, Sigma0), y | x ~ N(x, Sigma_l)."""
    P = np.linalg.inv(np.linalg.inv(Sigma0) + np.linalg.inv(Sigma_l))
    m = P @ np.linalg.solve(Sigma_l, y)
    return m, P


def test_correlated_conjugate_posterior_exact_moments():
    """2-d correlated prior, Gaussian likelihood: posterior mean and
    covariance must match the closed form — wrong if the ellipse uses an
    uncentered nu, a mis-scaled prior Cholesky, or a biased slice level."""
    Sigma0 = np.array([[2.0, 1.4], [1.4, 1.5]])
    Sigma_l = np.array([[0.5, 0.0], [0.0, 1.0]])
    y = np.array([1.0, -0.5])
    m_exact, P_exact = _conjugate_posterior(Sigma0, Sigma_l, y)

    Sl_inv = jnp.asarray(np.linalg.inv(Sigma_l), jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    def log_lik(x):
        r = x - yj
        return -0.5 * r @ (Sl_inv @ r)

    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=500, n_keep_draws=3000)
    out = mcmc_tpu.elliptical_slice(
        jnp.zeros(2), log_lik, s, prior_cov=jnp.asarray(Sigma0, jnp.float32),
        n_chains=32, key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws).reshape(-1, 2)

    assert float(out.accept_rate.mean()) == 1.0   # a slice sampler moves
    assert np.allclose(d.mean(0), m_exact, atol=0.03)
    assert np.allclose(np.cov(d.T), P_exact, atol=0.04)
    ms = out.diagnostics["mean_shrink_steps"]
    assert 1.0 <= float(np.asarray(ms).mean()) <= 10.0


def test_prior_mean_and_diag_cov():
    """Nonzero prior mean + diagonal prior cov: 1-d conjugate posterior
    N((mu0/s0 + y/sl)/(1/s0 + 1/sl), 1/(1/s0 + 1/sl))."""
    mu0, s0, sl, y = 2.0, 4.0, 1.0, -1.0
    post_var = 1.0 / (1.0 / s0 + 1.0 / sl)
    post_mean = post_var * (mu0 / s0 + y / sl)

    log_lik = lambda x: -0.5 * (x[0] - y) ** 2 / sl
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=300, n_keep_draws=2000)
    out = mcmc_tpu.elliptical_slice(
        jnp.zeros(1), log_lik, s, prior_mean=mu0, prior_cov=jnp.full((1,), s0),
        n_chains=16, key=jax.random.PRNGKey(1))
    d = np.asarray(out.draws)
    assert float(d.mean()) == pytest.approx(post_mean, abs=0.05)
    assert float(d.var()) == pytest.approx(post_var, rel=0.1)


def test_non_gaussian_likelihood_matches_nuts():
    """Poisson-count likelihood with log link (a 1-d latent-GP leaf):
    elliptical slice and NUTS on prior+lik must agree on the posterior
    mean within MC error."""
    counts = jnp.asarray([3.0, 5.0, 2.0, 4.0])

    def log_lik(x):
        lam = jnp.exp(x[0])
        return jnp.sum(counts * x[0] - lam)

    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=500, n_keep_draws=4000)
    out = mcmc_tpu.elliptical_slice(jnp.zeros(1), log_lik, s,
                                    prior_cov=jnp.full((1,), 2.0),
                                    n_chains=16, key=jax.random.PRNGKey(2))
    es_mean = float(np.asarray(out.draws).mean())

    log_kernel = lambda x: log_lik(x) - 0.25 * x[0] ** 2
    ns = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=4000,
                               n_adapt_draws=500)
    ref = mcmc_tpu.nuts(jnp.zeros(1), log_kernel, ns, n_chains=8,
                        key=jax.random.PRNGKey(3))
    nuts_mean = float(np.asarray(ref.draws).mean())
    assert es_mean == pytest.approx(nuts_mean, abs=0.03)


def test_determinism_composition_and_validation(tmp_path):
    log_lik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=20, n_keep_draws=40)

    a = mcmc_tpu.elliptical_slice(jnp.zeros(2), log_lik, s, n_chains=4,
                                  key=jax.random.PRNGKey(7))
    b = mcmc_tpu.elliptical_slice(jnp.zeros(2), log_lik, s, n_chains=4,
                                  key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    # thin + checkpoint composition through the common run loop
    out = mcmc_tpu.elliptical_slice(jnp.zeros(2), log_lik, s, n_chains=4,
                                    key=jax.random.PRNGKey(8), thin=3,
                                    checkpoint_dir=tmp_path / "ck")
    assert out.draws.shape == (40, 4, 2)
    assert float(out.accept_rate.mean()) == 1.0   # thin-aware
    assert float(np.asarray(
        out.diagnostics["mean_shrink_steps"]).mean()) >= 1.0

    # warm resume
    r = mcmc_tpu.elliptical_slice(jnp.zeros(2), log_lik, s,
                                  key=jax.random.PRNGKey(9),
                                  return_resume=True)
    r2 = r.diagnostics["resume"](jax.random.PRNGKey(10), 15)
    assert r2.draws.shape == (15, 2)

    with pytest.raises(ValueError, match="vals_bound"):
        mcmc_tpu.elliptical_slice(
            jnp.zeros(2), log_lik,
            mcmc_tpu.AlgoSettings(vals_bound=True,
                                  lower_bounds=jnp.zeros(2)))
    with pytest.raises(ValueError, match="diagonal matrix"):
        mcmc_tpu.elliptical_slice(jnp.zeros(2), log_lik, s,
                                  prior_cov=jnp.ones(3))
    with pytest.raises(TypeError, match="log_kernel"):
        mcmc_tpu.elliptical_slice(jnp.zeros(2), None, s)
    with pytest.raises(ValueError, match="max_shrink_steps"):
        mcmc_tpu.elliptical_slice(
            jnp.zeros(2), log_lik,
            mcmc_tpu.EllipticalSettings(max_shrink_steps=0))


def test_impossible_likelihood_caps_out_in_place():
    """log_lik == -inf everywhere: the bracket can never find a point
    above the slice level, so the cap binds — the chain stays put, stays
    finite, and accept_rate == 0 signals the failure."""
    log_lik = lambda x: jnp.asarray(-jnp.inf)
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=0, n_keep_draws=10,
                                    max_shrink_steps=8)
    out = mcmc_tpu.elliptical_slice(jnp.ones(2) * 0.3, log_lik, s,
                                    key=jax.random.PRNGKey(4))
    d = np.asarray(out.draws)
    assert np.isfinite(d).all()
    x0 = np.asarray(jnp.ones(2) * 0.3)   # the f32 initial position
    np.testing.assert_array_equal(d, np.broadcast_to(x0, d.shape))
    assert float(out.accept_rate) == 0.0


def test_elliptical_via_sample_dispatcher():
    out = mcmc_tpu.sample(
        "elliptical", jnp.zeros(1), lambda x: -0.5 * jnp.sum(x**2),
        mcmc_tpu.EllipticalSettings(n_burnin_draws=5, n_keep_draws=10),
        key=jax.random.PRNGKey(0))
    assert out.draws.shape == (10, 1)


def test_elliptical_mesh_sharded_chains():
    """Chain axis sharded over the virtual device mesh: same distribution
    (moments within MC error of the exact conjugate posterior)."""
    from mcmc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    log_lik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=200, n_keep_draws=1000)
    out = mcmc_tpu.elliptical_slice(jnp.zeros(1), log_lik, s, n_chains=16,
                                    key=jax.random.PRNGKey(11), mesh=mesh)
    d = np.asarray(out.draws)
    assert float(d.mean()) == pytest.approx(0.5, abs=0.05)   # N(0.5, 0.5)
    assert float(d.var()) == pytest.approx(0.5, rel=0.15)
