"""Model-zoo sanity: every built-in target samples correctly with an
appropriate sampler, plus the sample() dispatcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


def test_eight_schools_noncentered():
    lk = models.eight_schools_model()
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=800, n_keep_draws=1000,
                              n_adapt_draws=800, target_accept_rate=0.8)
    out = mcmc_tpu.nuts(jnp.zeros(10), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_mass_matrix=True)
    d = np.asarray(out.draws).reshape(-1, 10)
    mu = d[:, 0]
    # known posterior: mu around 4-5 with sd ~3
    assert 2.0 < mu.mean() < 7.0
    assert 2.0 < mu.std() < 5.0


def test_funnel_runs_and_covers_v():
    lk = models.neals_funnel(dim=6)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=1000, n_keep_draws=1500,
                              n_adapt_draws=1000, target_accept_rate=0.9)
    out = mcmc_tpu.nuts(jnp.zeros(6), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(1))
    v = np.asarray(out.draws)[:, :, 0].ravel()
    # v ~ N(0, 9): the sampler must reach both wide and narrow regions
    assert v.std() > 1.5
    assert v.min() < -2.0 and v.max() > 2.0


def test_poisson_regression_recovers_beta():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (300, 3)) * 0.5
    beta_true = jnp.array([0.5, -0.3, 0.8])
    lam = jnp.exp(X @ beta_true)
    y = jax.random.poisson(k2, lam).astype(jnp.float32)
    lk = models.poisson_regression_model(X, y)
    out = mcmc_tpu.nuts(jnp.zeros(3), lk,
                        mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=800,
                                              n_adapt_draws=500),
                        n_chains=4, key=jax.random.PRNGKey(3))
    est = np.asarray(out.draws).reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(est, np.asarray(beta_true), atol=0.3)


def test_student_t_regression_robust_to_outliers():
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (200, 2))
    beta_true = jnp.array([1.0, -2.0])
    y = X @ beta_true + 0.5 * jax.random.normal(k2, (200,))
    y = y.at[:5].add(50.0)  # gross outliers
    lk = models.student_t_regression_model(X, y, df=3.0, scale=0.5)
    out = mcmc_tpu.mala(jnp.zeros(2), lk,
                        mcmc_tpu.MALASettings(n_burnin_draws=1500, n_keep_draws=1500,
                                              step_size=0.05),
                        n_chains=4, key=jax.random.PRNGKey(5),
                        adapt_step_size=True)
    est = np.asarray(out.draws).reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(est, np.asarray(beta_true), atol=0.25)


def test_sample_dispatcher():
    lk = lambda v: -0.5 * jnp.sum(v**2)
    out = mcmc_tpu.sample("rwmh", jnp.zeros(2), lk,
                          mcmc_tpu.RWMHSettings(n_burnin_draws=100, n_keep_draws=100),
                          key=jax.random.PRNGKey(0))
    assert out.draws.shape == (100, 2)
    with pytest.raises(ValueError, match="unknown algorithm"):
        mcmc_tpu.sample("zigzag", jnp.zeros(2), lk)
    with pytest.raises(ValueError, match="metric_fn"):
        mcmc_tpu.sample("rmhmc", jnp.zeros(2), lk)
    with pytest.raises(ValueError, match="blocks"):
        mcmc_tpu.sample("gibbs", jnp.zeros(2), lk)


def test_fit_one_call():
    """mcmc_tpu.fit: automatic warmup lands a correct posterior with healthy
    diagnostics on an ill-conditioned target, no tuning inputs."""
    lk = models.ill_conditioned_gaussian(6, condition_number=300.0)
    out = mcmc_tpu.fit(jnp.zeros(6), lk, n_chains=8, n_warmup=600, n_draws=600,
                       key=jax.random.PRNGKey(0))
    summ = out.diagnostics["summary"]
    assert float(np.asarray(summ["rhat"]).max()) < 1.1
    mean = np.abs(np.asarray(summ["mean"]))
    tol = 4 * np.asarray(summ["mcse"]) + 0.3
    assert (mean <= tol).all(), (mean, tol)
    emp_var = np.asarray(out.draws).reshape(-1, 6).var(axis=0)
    np.testing.assert_allclose(emp_var / np.asarray(lk.variances), 1.0, atol=0.5)


def test_fit_stretch_derivative_free():
    """mcmc_tpu.fit(algorithm='stretch'): the derivative-free path — walker
    count is rounded up to max(2*dim, 32) and even, and the posterior of a
    correlated Gaussian is recovered without gradients."""
    cov = np.array([[1.0, 0.8], [0.8, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    lk = lambda v: -0.5 * v @ prec @ v
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="stretch", n_chains=8,
                       n_warmup=400, n_draws=800, key=jax.random.PRNGKey(0))
    assert out.draws.shape == (800, 32, 2)
    summ = out.diagnostics["summary"]
    assert float(np.asarray(summ["rhat"]).max()) < 1.05
    emp_cov = np.cov(np.asarray(out.draws).reshape(-1, 2).T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.15)
    with pytest.raises(ValueError, match="fit algorithm"):
        mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="bogus")


def test_fit_with_bounds():
    """fit(lower_bounds=...) applies the box-constraint stack: draws respect
    the bound and match the truncated-normal moments for X~N(1,1) | X>0:
    mean = 1 + phi(-1)/(1 - Phi(-1)) ~= 1.2876, sd ~= 0.7935.

    Tolerance is ~3 MC sigma: NUTS on the log-transformed half-line runs at
    ~10% ESS efficiency (measured), so 12k draws give ESS ~1.2k and
    MCSE(mean) ~= 0.023."""
    lk = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    out = mcmc_tpu.fit(jnp.ones(1) * 0.5, lk, n_chains=8, n_warmup=400,
                       n_draws=1500, key=jax.random.PRNGKey(2),
                       lower_bounds=jnp.zeros(1))
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert float(d.mean()) == pytest.approx(1.2876, abs=0.07)
    assert float(d.std()) == pytest.approx(0.7935, abs=0.08)


def test_horseshoe_regression_recovers_sparsity():
    """Horseshoe sparse regression: NUTS with mass adaptation recovers the
    two large true coefficients and shrinks the rest toward zero — the
    per-coefficient funnel geometry stress test."""
    rng = np.random.default_rng(0)
    n, p = 200, 8
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    beta_true = np.zeros(p, np.float32)
    beta_true[0], beta_true[3] = 3.0, -2.5
    y = jnp.asarray(X @ beta_true + 0.5 * rng.normal(size=n), jnp.float32)

    lk = models.horseshoe_regression_model(X, y, sigma=0.5)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=800, n_keep_draws=800,
                              n_adapt_draws=800, target_accept_rate=0.9)
    out = mcmc_tpu.nuts(jnp.zeros(lk.dim), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_mass_matrix=True)
    d = np.asarray(out.draws)
    beta_t = d[..., :p]
    lam = np.exp(d[..., p:2 * p])
    tau = np.exp(d[..., 2 * p:2 * p + 1])
    beta = (beta_t * lam * tau).reshape(-1, p)
    post_mean = beta.mean(axis=0)
    # signal coefficients recovered
    assert abs(post_mean[0] - 3.0) < 0.4, post_mean
    assert abs(post_mean[3] + 2.5) < 0.4, post_mean
    # noise coefficients shrunk hard
    noise = np.delete(post_mean, [0, 3])
    assert (np.abs(noise) < 0.35).all(), post_mean


def test_gp_regression_exact_posterior_anchors_elliptical():
    """The GP helpers close the loop: elliptical slice draws of the latent
    field must match models.gp_regression_exact_posterior's closed-form
    mean AND pointwise variance."""
    xs = jnp.linspace(0.0, 3.0, 12)
    K = models.rbf_kernel(xs, length_scale=0.7)
    assert K.shape == (12, 12)
    # PSD + unit diagonal (amplitude 1, f32-sized default jitter)
    evals = np.linalg.eigvalsh(np.asarray(K))
    assert evals.min() > 0
    assert np.allclose(np.diag(np.asarray(K)), 1.0 + 1e-4)

    y = jnp.sin(2.0 * xs)
    noise = 0.05
    m_exact, P_exact = models.gp_regression_exact_posterior(K, y, noise)

    log_lik = lambda f: -0.5 * jnp.sum((y - f) ** 2) / noise
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=400, n_keep_draws=2500)
    out = mcmc_tpu.elliptical_slice(jnp.zeros(12), log_lik, s, prior_cov=K,
                                    n_chains=16, key=jax.random.PRNGKey(6))
    d = np.asarray(out.draws).reshape(-1, 12)
    assert np.abs(d.mean(0) - np.asarray(m_exact)).max() < 0.03
    assert np.allclose(d.var(0), np.diag(np.asarray(P_exact)), atol=0.01)


def test_latent_gp_poisson_model_samples():
    """Poisson-count latent GP: the sampled field's rate reproduces the
    observed counts at high-count locations."""
    xs = jnp.linspace(0.0, 2.0, 16)
    rate_true = jnp.exp(jnp.sin(3.0 * xs) + 1.0)
    counts = jax.random.poisson(jax.random.PRNGKey(7), rate_true)
    log_lik, K = models.latent_gp_poisson_model(xs, counts,
                                                length_scale=0.5)
    s = mcmc_tpu.EllipticalSettings(n_burnin_draws=500, n_keep_draws=2000)
    out = mcmc_tpu.elliptical_slice(jnp.zeros(16), log_lik, s, prior_cov=K,
                                    n_chains=8, key=jax.random.PRNGKey(8))
    f_hat = np.asarray(out.draws).reshape(-1, 16).mean(0)
    # posterior rate correlates strongly with the truth
    c = np.corrcoef(np.exp(f_hat), np.asarray(rate_true))[0, 1]
    assert c > 0.9
    assert float(out.accept_rate.mean()) == 1.0
