"""HMC and MALA statistical tests against the reference's (mu, sigma) normal
example (reference examples/eigen/{hmc,mala}_normal.cpp) and a standard
Gaussian sanity target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


@pytest.fixture(scope="module")
def normal_data():
    key = jax.random.PRNGKey(123)
    mu, sigma = 2.0, 2.0
    x = mu + sigma * jax.random.normal(key, (1000,))
    return x


def test_hmc_mean_scale(normal_data):
    """Reference config: step 0.08, 2000+2000 draws -> mean ~ (2, 2)
    (examples/eigen/hmc_normal.cpp:99-103, BASELINE.md)."""
    log_kernel = models.gaussian_mean_scale_model(normal_data)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=5)
    settings.hmc_settings.step_size = 0.08
    settings.hmc_settings.n_burnin_draws = 2000
    settings.hmc_settings.n_keep_draws = 2000

    out = mcmc_tpu.hmc(jnp.array([3.0, 3.0]), log_kernel, settings)
    mean = np.asarray(out.mean)
    x = np.asarray(normal_data)
    assert mean[0] == pytest.approx(x.mean(), abs=0.2)
    assert mean[1] == pytest.approx(x.std(), abs=0.2)
    assert float(out.accept_rate) > 0.5


def test_hmc_multistep_standard_normal():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    # trajectory angle L*eps ~ pi/2 so successive draws decorrelate (an
    # angle near pi makes the chain antithetic and second moments mix slowly)
    s = mcmc_tpu.HMCSettings(
        n_burnin_draws=500, n_keep_draws=2000, n_leap_steps=5, step_size=0.3
    )
    out = mcmc_tpu.hmc(jnp.zeros(4), log_kernel, s, n_chains=16,
                       key=jax.random.PRNGKey(0))
    assert out.draws.shape == (2000, 16, 4)
    mean = np.asarray(out.draws).mean(axis=(0, 1))
    var = np.asarray(out.draws).var(axis=(0, 1))
    np.testing.assert_allclose(mean, 0.0, atol=0.1)
    np.testing.assert_allclose(var, 1.0, atol=0.15)


def test_hmc_diag_precond_matches_identity_statistics():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2 / jnp.array([1.0, 25.0]))
    s = mcmc_tpu.HMCSettings(
        n_burnin_draws=500, n_keep_draws=3000, n_leap_steps=8, step_size=0.3,
        precond_mat=jnp.array([1.0, 25.0]),  # diag M matched to target scales
    )
    out = mcmc_tpu.hmc(jnp.zeros(2), log_kernel, s, n_chains=8,
                       key=jax.random.PRNGKey(1))
    var = np.asarray(out.draws).var(axis=(0, 1))
    np.testing.assert_allclose(var, [1.0, 25.0], rtol=0.2)
    assert float(np.mean(np.asarray(out.accept_rate))) > 0.6


def test_mala_standard_normal():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.MALASettings(n_burnin_draws=1000, n_keep_draws=4000, step_size=0.9)
    out = mcmc_tpu.mala(jnp.zeros(3), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(2))
    mean = np.asarray(out.draws).mean(axis=(0, 1))
    var = np.asarray(out.draws).var(axis=(0, 1))
    np.testing.assert_allclose(mean, 0.0, atol=0.1)
    np.testing.assert_allclose(var, 1.0, atol=0.15)


def test_mala_mean_scale(normal_data):
    log_kernel = models.gaussian_mean_scale_model(normal_data)
    settings = mcmc_tpu.AlgoSettings(rng_seed_value=9)
    settings.mala_settings.step_size = 0.04
    settings.mala_settings.n_burnin_draws = 2000
    settings.mala_settings.n_keep_draws = 2000

    out = mcmc_tpu.mala(jnp.array([3.0, 3.0]), log_kernel, settings)
    mean = np.asarray(out.mean)
    x = np.asarray(normal_data)
    assert mean[0] == pytest.approx(x.mean(), abs=0.25)
    assert mean[1] == pytest.approx(x.std(), abs=0.25)


def test_hmc_bounded_positive_sigma(normal_data):
    """sigma constrained positive via the box-constraint stack; both gradient
    conventions (reference vs exact) must recover the target."""
    log_kernel = models.gaussian_mean_scale_model(normal_data)
    x = np.asarray(normal_data)

    for mode in ("reference", "exact"):
        settings = mcmc_tpu.AlgoSettings(
            rng_seed_value=21, vals_bound=True,
            lower_bounds=jnp.array([-jnp.inf, 0.1]),
            upper_bounds=jnp.array([jnp.inf, jnp.inf]),
        )
        settings.hmc_settings.step_size = 0.015
        settings.hmc_settings.n_leap_steps = 4
        settings.hmc_settings.n_burnin_draws = 1000
        settings.hmc_settings.n_keep_draws = 1500

        out = mcmc_tpu.hmc(jnp.array([3.0, 3.0]), log_kernel, settings,
                           bounded_grad=mode)
        d = np.asarray(out.draws)
        assert (d[:, 1] > 0.1).all()
        assert d[:, 0].mean() == pytest.approx(x.mean(), abs=0.3)
        assert d[:, 1].mean() == pytest.approx(x.std(), abs=0.3)


def test_step_size_adaptation_hits_targets():
    """Dual-averaging scale/step adaptation (no reference analog) must land
    near the standard target acceptance rates."""
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    kw = dict(n_chains=16, key=jax.random.PRNGKey(0))

    out = mcmc_tpu.rwmh(jnp.zeros(10), log_kernel,
                        mcmc_tpu.RWMHSettings(n_burnin_draws=1500, n_keep_draws=1000,
                                              par_scale=5.0),
                        adapt_scale=True, **kw)
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.15 < rate < 0.35, rate
    assert out.diagnostics["adapted_scale"].shape == (16,)

    out = mcmc_tpu.mala(jnp.zeros(10), log_kernel,
                        mcmc_tpu.MALASettings(n_burnin_draws=1500, n_keep_draws=1000,
                                              step_size=3.0),
                        adapt_step_size=True, **kw)
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.45 < rate < 0.75, rate

    out = mcmc_tpu.hmc(jnp.zeros(10), log_kernel,
                       mcmc_tpu.HMCSettings(n_burnin_draws=1500, n_keep_draws=1000,
                                            step_size=2.0, n_leap_steps=4),
                       adapt_step_size=True, **kw)
    rate = float(np.asarray(out.accept_rate).mean())
    assert 0.65 < rate < 0.95, rate
    # sanity: posterior still right
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.12)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.2)


def test_hmc_mass_adaptation_ill_conditioned():
    """HMC with windowed diagonal mass adaptation (shared NUTS machinery)
    must learn the scales and sample the ill-conditioned target well."""
    from mcmc_tpu import models, diagnostics as diag
    lk = models.ill_conditioned_gaussian(6, condition_number=1e3)
    s = mcmc_tpu.HMCSettings(n_burnin_draws=1200, n_keep_draws=2000,
                             step_size=0.5, n_leap_steps=8)
    out = mcmc_tpu.hmc(jnp.zeros(6), lk, s, n_chains=8,
                       key=jax.random.PRNGKey(0),
                       adapt_step_size=True, adapt_mass_matrix=True)
    inv_mass = np.asarray(out.diagnostics["inv_mass_diag"])
    ratio = inv_mass[0] / np.asarray(lk.variances)
    assert (ratio > 0.2).all() and (ratio < 5.0).all(), ratio
    emp_var = np.asarray(out.draws).reshape(-1, 6).var(axis=0)
    np.testing.assert_allclose(emp_var / np.asarray(lk.variances), 1.0,
                               atol=0.5)
    assert float(np.asarray(diag.split_rhat(out.draws)).max()) < 1.15


def test_mala_precond_adaptation_ill_conditioned():
    """Windowed diagonal preconditioner adaptation (drift + proposal
    covariance) must learn the scales of an ill-conditioned Gaussian and
    beat the unpreconditioned sampler decisively on min-ESS."""
    from mcmc_tpu import diagnostics
    lk = models.ill_conditioned_gaussian(16, condition_number=1e4)
    s = mcmc_tpu.MALASettings(n_burnin_draws=1000, n_keep_draws=1000,
                              step_size=0.1)
    base = mcmc_tpu.mala(jnp.zeros(16), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(0), adapt_step_size=True)
    ada = mcmc_tpu.mala(jnp.zeros(16), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_step_size=True,
                        adapt_precond=True, pooled_adaptation=True)
    ess_base = float(np.asarray(diagnostics.ess(base.draws)).min())
    ess_ada = float(np.asarray(diagnostics.ess(ada.draws)).min())
    assert ess_ada > 10 * ess_base, (ess_base, ess_ada)

    # learned variance tracks the marginals; posterior variances correct
    pv = np.asarray(ada.diagnostics["precond_var"])[0]
    ratio = pv / np.asarray(lk.variances)
    assert (ratio > 0.5).all() and (ratio < 2.0).all(), ratio
    d = np.asarray(ada.draws).reshape(-1, 16)
    vr = d.var(axis=0) / np.asarray(lk.variances)
    assert (vr > 0.6).all() and (vr < 1.5).all(), vr


def test_rwmh_precond_adaptation():
    """RWMH proposal-covariance adaptation improves min-ESS on the
    ill-conditioned target."""
    from mcmc_tpu import diagnostics
    lk = models.ill_conditioned_gaussian(16, condition_number=1e4)
    s = mcmc_tpu.RWMHSettings(n_burnin_draws=1000, n_keep_draws=1000,
                              par_scale=0.5)
    base = mcmc_tpu.rwmh(jnp.zeros(16), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(0), adapt_scale=True)
    ada = mcmc_tpu.rwmh(jnp.zeros(16), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_scale=True,
                        adapt_precond=True, pooled_adaptation=True)
    ess_base = float(np.asarray(diagnostics.ess(base.draws)).min())
    ess_ada = float(np.asarray(diagnostics.ess(ada.draws)).min())
    assert ess_ada > 2 * ess_base, (ess_base, ess_ada)


def test_hmc_dense_mass_correlated_gaussian():
    """Dense mass adaptation for HMC must learn the full covariance of a
    strongly correlated Gaussian and beat the diagonal metric on min-ESS
    (mirrors the NUTS dense-mass test)."""
    from mcmc_tpu import diagnostics
    rho = 0.95
    dim = 6
    cov = (1 - rho) * np.eye(dim) + rho * np.ones((dim, dim))
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    lk = lambda v: -0.5 * v @ prec @ v

    # n_leap=4: with the metric whitened, eps adapts to ~0.7, so 8 leaps
    # is ~a full oscillation period (trajectories loop back, killing ESS);
    # 4 leaps is near the optimal half period
    s = mcmc_tpu.HMCSettings(n_burnin_draws=800, n_keep_draws=800,
                             step_size=0.2, n_leap_steps=4)
    dense = mcmc_tpu.hmc(jnp.zeros(dim), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(0), adapt_step_size=True,
                         adapt_mass_matrix="dense")
    diag = mcmc_tpu.hmc(jnp.zeros(dim), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_step_size=True,
                        adapt_mass_matrix="diag")
    ess_dense = float(np.asarray(diagnostics.ess(dense.draws)).min())
    ess_diag = float(np.asarray(diagnostics.ess(diag.draws)).min())
    assert ess_dense > 1.5 * ess_diag, (ess_dense, ess_diag)
    d = np.asarray(dense.draws).reshape(-1, dim)
    np.testing.assert_allclose(np.cov(d.T), cov, atol=0.4)


def test_rwmh_mala_dense_precond_correlated():
    """Dense learned proposal covariance / preconditioner: RWMH and MALA
    must beat their diagonal variants decisively on a rho=0.9 Gaussian."""
    from mcmc_tpu import diagnostics
    rho, dim = 0.9, 6
    cov = (1 - rho) * np.eye(dim) + rho * np.ones((dim, dim))
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    lk = lambda v: -0.5 * v @ prec @ v

    s = mcmc_tpu.RWMHSettings(n_burnin_draws=2000, n_keep_draws=3000,
                              par_scale=0.5)
    ess = {}
    for mode in ("diag", "dense"):
        out = mcmc_tpu.rwmh(jnp.zeros(dim), lk, s, n_chains=8,
                            key=jax.random.PRNGKey(0), adapt_scale=True,
                            adapt_precond=mode, pooled_adaptation=True)
        ess[mode] = float(np.asarray(diagnostics.ess(out.draws)).min())
        if mode == "dense":
            pv = np.asarray(out.diagnostics["proposal_var"])[0]
            np.testing.assert_allclose(pv, cov, atol=0.35)
    assert ess["dense"] > 5 * ess["diag"], ess

    sm = mcmc_tpu.MALASettings(n_burnin_draws=1500, n_keep_draws=2000,
                               step_size=0.3)
    essm = {}
    for mode in ("diag", "dense"):
        out = mcmc_tpu.mala(jnp.zeros(dim), lk, sm, n_chains=8,
                            key=jax.random.PRNGKey(1), adapt_step_size=True,
                            adapt_precond=mode, pooled_adaptation=True)
        essm[mode] = float(np.asarray(diagnostics.ess(out.draws)).min())
    assert essm["dense"] > 2 * essm["diag"], essm

    # dense + bounds is rejected with a clear error (the bounded dense
    # proposal matrix is asymmetric)
    sb = mcmc_tpu.AlgoSettings(vals_bound=True,
                               lower_bounds=jnp.zeros(dim),
                               upper_bounds=jnp.full(dim, 9.0))
    with pytest.raises(ValueError, match="unbounded-only"):
        mcmc_tpu.mala(jnp.ones(dim), lk, sb, n_chains=4,
                      key=jax.random.PRNGKey(2), adapt_precond="dense")


def test_mala_dense_asymmetry_triangular_identity():
    """The dense-mode asymmetry term is computed from the carried Cholesky
    via triangular solves (mala.py step); verify the identity it relies on:
    logN(a; m1, e2*M) - logN(b; m2, e2*M) == 0.5*(||L^-1 r2||^2 - ||L^-1 r1||^2)
    with L = eps * chol(M) (the log-dets cancel)."""
    from mcmc_tpu import stats
    rng = np.random.default_rng(7)
    for _ in range(5):
        d = int(rng.integers(2, 8))
        A = rng.normal(size=(d, d))
        eps = float(rng.uniform(0.1, 1.5))
        with jax.enable_x64():
            M = jnp.asarray(A @ A.T + d * np.eye(d), jnp.float64)
            a, b, m1, m2 = (jnp.asarray(rng.normal(size=d)) for _ in range(4))
            sigma = eps**2 * M
            ref = stats.dmvnorm(a, m1, sigma, log=True) \
                - stats.dmvnorm(b, m2, sigma, log=True)
            L = jnp.linalg.cholesky(M)
            r1 = jax.scipy.linalg.solve_triangular(L, a - m1, lower=True) / eps
            r2 = jax.scipy.linalg.solve_triangular(L, b - m2, lower=True) / eps
            fast = 0.5 * (r2 @ r2 - r1 @ r1)
            np.testing.assert_allclose(float(fast), float(ref), rtol=1e-9)
