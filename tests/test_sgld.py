"""SGLD — validated against the EXACT unadjusted-Langevin closed form.

For the standard normal target, full-batch SGLD is ULA:
``x' = x (1 - h/2) + sqrt(h) xi``, an AR(1) whose stationary variance is
exactly ``h / (1 - (1 - h/2)^2) = 1 / (1 - h/4)`` — so the O(h) bias is a
*prediction* to verify, not a nuisance to tolerate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _zero_lik(_params, batch):
    # touches the batch so the gather stays in the graph, contributes 0
    return 0.0 * jnp.sum(batch)


def test_full_batch_ula_matches_exact_stationary_variance():
    """N(0,1) target, h = 0.5: stationary variance must be 1/(1 - h/4)
    = 8/7 — the wrong answer by O(h) if the update rule mis-scales either
    the drift or the noise."""
    h = 0.5
    s = mcmc_tpu.SGLDSettings(step_size=h, batch_size=4,
                              n_burnin_draws=1000, n_keep_draws=4000)
    out = mcmc_tpu.sgld(jnp.zeros(1), lambda x: -0.5 * jnp.sum(x**2),
                        _zero_lik, jnp.zeros((4, 1)), s, n_chains=64,
                        key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert float(out.accept_rate.mean()) == 1.0
    expected = 1.0 / (1.0 - h / 4.0)
    assert float(d.var()) == pytest.approx(expected, rel=0.03)
    assert float(d.mean()) == pytest.approx(0.0, abs=0.02)


def test_minibatch_conjugate_posterior():
    """y ~ N(theta, 1), flat-ish prior: SGLD with B=64 of N=1024 recovers
    the N(ybar, 1/N) posterior (small h => small bias; the minibatch
    gradient noise is O(h^2) relative to the injected N(0, h) noise)."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(0.7 + rng.standard_normal(1024), jnp.float32)

    log_prior = lambda th: -0.5 * jnp.sum(th**2) / 100.0
    log_lik = lambda th, batch: -0.5 * jnp.sum((batch - th[0]) ** 2)

    s = mcmc_tpu.SGLDSettings(step_size=1e-5, batch_size=64,
                              n_burnin_draws=2000, n_keep_draws=15000)
    out = mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik, y, s, n_chains=16,
                        key=jax.random.PRNGKey(1))
    d = np.asarray(out.draws)
    post_mean = float(y.mean()) * (1024 / (1024 + 0.01))
    post_var = 1.0 / (1024 + 0.01)
    assert float(d.mean()) == pytest.approx(post_mean, abs=4 * np.sqrt(post_var / 100))
    assert float(d.var()) == pytest.approx(post_var, rel=0.25)


def test_sgld_bounded_halfline():
    """Box constraints run through the same transform stack: lower bound 0
    on the N(1,1) prior target => truncated-normal mean 1.2876, every
    draw positive. The unconstrained-space chain relaxes in ~1/h steps,
    so the MC budget comes from the chain axis (256 vmapped chains —
    cheap on the accelerator, the design point of this framework); ULA
    bias at h = 4e-3 is below the MC tolerance (verified by h-refinement
    at calibration time: h = 8e-3 and 2e-3 agree within 0.011)."""
    s = mcmc_tpu.AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.sgld_settings.step_size = 4e-3
    s.sgld_settings.batch_size = 2
    s.sgld_settings.n_burnin_draws = 2000
    s.sgld_settings.n_keep_draws = 8000
    out = mcmc_tpu.sgld(jnp.ones(1) * 0.5,
                        lambda x: -0.5 * jnp.sum((x - 1.0) ** 2),
                        _zero_lik, jnp.zeros((2, 1)), s, n_chains=256,
                        key=jax.random.PRNGKey(2))
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert float(d.mean()) == pytest.approx(1.2876, abs=0.035)


def test_sgld_decay_schedule_and_resume():
    """decay_gamma shrinks steps over time (late-chain increments smaller
    than early ones); return_resume continues with draw_ind (and so the
    schedule) carried forward."""
    s = mcmc_tpu.SGLDSettings(step_size=0.25, batch_size=2,
                              n_burnin_draws=0, n_keep_draws=400,
                              decay_gamma=1.0, decay_b=10.0)
    out = mcmc_tpu.sgld(jnp.zeros(1), lambda x: -0.5 * jnp.sum(x**2),
                        _zero_lik, jnp.zeros((2, 1)), s,
                        key=jax.random.PRNGKey(3), return_resume=True)
    d = np.asarray(out.draws)[:, 0]
    inc = np.abs(np.diff(d))
    assert inc[:50].mean() > 3 * inc[-50:].mean()   # schedule bites
    out2 = out.diagnostics["resume"](jax.random.PRNGKey(4), 100)
    d2 = np.asarray(out2.draws)
    assert d2.shape == (100, 1)
    inc2 = np.abs(np.diff(d2[:, 0]))
    assert inc2.mean() < inc[:50].mean()            # continued, not reset


def test_sgld_determinism_and_validation():
    lk = lambda x: -0.5 * jnp.sum(x**2)
    data = jnp.zeros((8, 1))
    s = mcmc_tpu.SGLDSettings(step_size=0.1, batch_size=4,
                              n_burnin_draws=10, n_keep_draws=20)
    a = mcmc_tpu.sgld(jnp.zeros(2), lk, _zero_lik, data, s,
                      key=jax.random.PRNGKey(7))
    b = mcmc_tpu.sgld(jnp.zeros(2), lk, _zero_lik, data, s,
                      key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    with pytest.raises(ValueError, match="batch_size"):
        mcmc_tpu.sgld(jnp.zeros(2), lk, _zero_lik, jnp.zeros((2, 1)),
                      mcmc_tpu.SGLDSettings(batch_size=4))
    with pytest.raises(ValueError, match="leading observation axis"):
        mcmc_tpu.sgld(jnp.zeros(2), lk, _zero_lik,
                      (jnp.zeros((8, 1)), jnp.zeros((6,))),
                      mcmc_tpu.SGLDSettings(batch_size=2))
    with pytest.raises(TypeError, match="log_lik"):
        mcmc_tpu.sgld(jnp.zeros(2), lk, None, data, s)


def test_sgld_nonfinite_guard():
    """An exploding gradient must not crash or NaN the chain: the draw is
    rejected in place and accept_rate drops below 1."""
    # log-prior with a pole: gradient blows up near x = 0
    lk = lambda x: jnp.sum(jnp.log(jnp.abs(x)))   # grad ~ 1/x
    s = mcmc_tpu.SGLDSettings(step_size=1e30, batch_size=2,
                              n_burnin_draws=0, n_keep_draws=50)
    out = mcmc_tpu.sgld(jnp.ones(1) * 1e-30, lk, _zero_lik,
                        jnp.zeros((2, 1)), s, key=jax.random.PRNGKey(9))
    assert np.isfinite(np.asarray(out.draws)).all()
    assert float(out.accept_rate) < 1.0


def test_sgld_via_sample_dispatcher():
    out = mcmc_tpu.sample(
        "sgld", jnp.zeros(1), lambda x: -0.5 * jnp.sum(x**2),
        mcmc_tpu.SGLDSettings(step_size=0.1, batch_size=2,
                              n_burnin_draws=5, n_keep_draws=10),
        log_lik=_zero_lik, data=jnp.zeros((4, 1)),
        key=jax.random.PRNGKey(0))
    assert out.draws.shape == (10, 1)
    with pytest.raises(ValueError, match="sgld requires"):
        mcmc_tpu.sample("sgld", jnp.zeros(1), lambda x: 0.0)


def test_psgld_equilibrates_badly_scaled_model():
    """pSGLD (adapt_precond='rmsprop'): the RMSprop preconditioner lets
    burn-in traverse a coordinate whose gradient is 400x smaller. Model:
    z_i ~ N(theta, diag(1, 400)), theta start at 0, true theta2 ~ 15 —
    at a step size stable for dim 1, plain SGLD's dim-2 relaxation takes
    ~800 steps/e-fold and cannot reach the mode in budget, while pSGLD's
    learned G ~ 20 gets there."""
    rng = np.random.default_rng(0)
    N = 512
    z = jnp.asarray(np.stack([0.5 + rng.standard_normal(N),
                              15.0 + 20.0 * rng.standard_normal(N)], 1),
                    jnp.float32)
    zbar2 = float(z[:, 1].mean())
    log_prior = lambda th: -0.5 * jnp.sum(th**2) / 1e4

    def log_lik(th, batch):
        return -0.5 * jnp.sum((batch[:, 0] - th[0]) ** 2) \
            - 0.5 * jnp.sum((batch[:, 1] - th[1]) ** 2) / 400.0

    s = mcmc_tpu.SGLDSettings(step_size=1e-3, batch_size=64,
                              n_burnin_draws=600, n_keep_draws=1500)
    means = {}
    for ap in (False, "rmsprop"):
        out = mcmc_tpu.sgld(jnp.zeros(2), log_prior, log_lik, z, s,
                            n_chains=32, key=jax.random.PRNGKey(1),
                            adapt_precond=ap)
        means[ap] = np.asarray(out.draws).reshape(-1, 2).mean(0)
    assert abs(means["rmsprop"][1] - zbar2) < 1.5, means
    assert abs(means[False][1] - zbar2) > 4.0, means        # plain is stuck
    assert abs(means["rmsprop"][0] - 0.5) < 0.2

    with pytest.raises(ValueError, match="adapt_precond"):
        mcmc_tpu.sgld(jnp.zeros(2), log_prior, log_lik, z, s,
                      adapt_precond="adam")
    with pytest.raises(ValueError, match="precond_mat"):
        s2 = mcmc_tpu.SGLDSettings(batch_size=64,
                                   precond_mat=jnp.ones(2))
        mcmc_tpu.sgld(jnp.zeros(2), log_prior, log_lik, z, s2,
                      adapt_precond=True)


def test_psgld_huge_gradient_rejected_not_frozen():
    """Regression: a FINITE-but-huge gradient (one outlier data row)
    squares to inf in the RMSprop accumulator V, making G = 0 — with the
    position guard alone the draw looks fine (prop = x + 0 is finite),
    V wedges at inf, and the coordinate silently freezes forever while
    accept_rate reports 1.0. The guard must also check V: such draws are
    rejected (accept_rate < 1) and the chain keeps moving afterwards."""
    rng = np.random.default_rng(0)
    y = np.asarray(rng.standard_normal(64), np.float32)
    y[0] = 1e21   # finite in f32; (g/N)**2 overflows to inf
    log_prior = lambda th: -0.5 * jnp.sum(th**2) / 100.0
    log_lik = lambda th, batch: -0.5 * jnp.sum((batch - th[0]) ** 2)

    s = mcmc_tpu.SGLDSettings(step_size=1e-4, batch_size=2,
                              n_burnin_draws=0, n_keep_draws=300)
    out = mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik,
                        jnp.asarray(y), s, key=jax.random.PRNGKey(5),
                        adapt_precond="rmsprop")
    d = np.asarray(out.draws)[:, 0]
    assert np.isfinite(d).all()
    assert float(out.accept_rate) < 1.0        # outlier batches rejected
    # no freeze: the tail of the chain still moves on all but the rare
    # rejected outlier draws (an inf-wedged V would pin the position
    # exactly — zero drift AND zero noise — from the first hit onwards)
    assert np.count_nonzero(np.diff(d[-50:])) >= 40


def test_sgld_shared_minibatch_posterior_and_composition(tmp_path):
    """minibatch='shared' (one gather per draw for all chains) targets the
    same distribution: conjugate posterior recovered; composes with thin
    and checkpoint_dir; bitwise deterministic for a fixed key."""
    rng = np.random.default_rng(3)
    y = jnp.asarray(0.7 + rng.standard_normal(1024), jnp.float32)
    log_prior = lambda th: -0.5 * jnp.sum(th**2) / 100.0
    log_lik = lambda th, batch: -0.5 * jnp.sum((batch - th[0]) ** 2)

    s = mcmc_tpu.SGLDSettings(step_size=1e-5, batch_size=64,
                              n_burnin_draws=2000, n_keep_draws=10000)
    out = mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik, y, s, n_chains=16,
                        key=jax.random.PRNGKey(1), minibatch="shared")
    d = np.asarray(out.draws)
    post_mean = float(y.mean()) * (1024 / (1024 + 0.01))
    post_var = 1.0 / (1024 + 0.01)
    assert float(d.mean()) == pytest.approx(post_mean,
                                            abs=5 * np.sqrt(post_var / 16))
    assert float(d.var()) == pytest.approx(post_var, rel=0.3)

    out2 = mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik, y, s, n_chains=16,
                         key=jax.random.PRNGKey(1), minibatch="shared")
    np.testing.assert_array_equal(d, np.asarray(out2.draws))

    s3 = mcmc_tpu.SGLDSettings(step_size=1e-5, batch_size=64,
                               n_burnin_draws=20, n_keep_draws=30)
    out3 = mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik, y, s3,
                         n_chains=4, key=jax.random.PRNGKey(2),
                         minibatch="shared", thin=3,
                         checkpoint_dir=tmp_path / "ck")
    assert out3.draws.shape == (30, 4, 1)
    assert float(out3.accept_rate.mean()) == 1.0  # thin-aware: /(30*3)

    with pytest.raises(ValueError, match="minibatch"):
        mcmc_tpu.sgld(jnp.zeros(1), log_prior, log_lik, y, s,
                      minibatch="epoch")


# ---------------------------------------------------------------- SGHMC


def _lyapunov_var_x(eta, alpha, sigma2=1.0, iters=200000):
    """Exact stationary Var(x) of full-batch SGHMC on N(0, sigma2):
    the (x, v) update is linear, z' = A z + w, so the stationary
    covariance solves the discrete Lyapunov equation Sigma = A Sigma A^T
    + Q (fixed-point iteration)."""
    q = eta / sigma2
    A = np.array([[1.0 - q, 1.0 - alpha], [-q, 1.0 - alpha]])
    Q = 2.0 * alpha * eta * np.ones((2, 2))
    S = np.zeros((2, 2))
    for _ in range(iters):
        S_new = A @ S @ A.T + Q
        if np.abs(S_new - S).max() < 1e-14:
            S = S_new
            break
        S = S_new
    return S[0, 0]


def test_sghmc_matches_exact_lyapunov_variance():
    """Full-batch SGHMC on N(0,1): the empirical stationary variance must
    match the EXACT discrete-Lyapunov solution — wrong by O(1) if the
    friction, gradient scale, or the 2(alpha-beta)eta noise variance is
    mis-implemented (at eta=0.3, alpha=0.8 the exact value is 1.1429, 14% above
    the continuous limit, so the test distinguishes the discrete truth
    from sigma2=1 too)."""
    eta, alpha = 0.3, 0.8
    expected = _lyapunov_var_x(eta, alpha)
    assert abs(expected - 1.0) > 0.02   # the test has teeth
    s = mcmc_tpu.SGHMCSettings(step_size=eta, friction_alpha=alpha,
                               batch_size=4, n_burnin_draws=1000,
                               n_keep_draws=4000)
    out = mcmc_tpu.sghmc(jnp.zeros(1), lambda x: -0.5 * jnp.sum(x**2),
                         _zero_lik, jnp.zeros((4, 1)), s, n_chains=64,
                         key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert float(out.accept_rate.mean()) == 1.0
    assert float(d.var()) == pytest.approx(expected, rel=0.04)
    assert float(d.mean()) == pytest.approx(0.0, abs=0.03)


def test_sghmc_minibatch_conjugate_posterior():
    """Minibatch SGHMC recovers the conjugate normal posterior; shared
    minibatch mode agrees; momentum beats SGLD mixing at equal eta (the
    point of the friction formulation)."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(0.7 + rng.standard_normal(1024), jnp.float32)
    log_prior = lambda th: -0.5 * jnp.sum(th**2) / 100.0
    log_lik = lambda th, batch: -0.5 * jnp.sum((batch - th[0]) ** 2)
    post_mean = float(y.mean()) * (1024 / (1024 + 0.01))
    post_var = 1.0 / (1024 + 0.01)

    s = mcmc_tpu.SGHMCSettings(step_size=2e-7, friction_alpha=0.1,
                               batch_size=64, n_burnin_draws=3000,
                               n_keep_draws=12000)
    for mb in ("per-chain", "shared"):
        out = mcmc_tpu.sghmc(jnp.zeros(1), log_prior, log_lik, y, s,
                             n_chains=16, key=jax.random.PRNGKey(1),
                             minibatch=mb)
        d = np.asarray(out.draws)
        assert float(d.mean()) == pytest.approx(
            post_mean, abs=5 * np.sqrt(post_var / 16)), mb
        assert float(d.var()) == pytest.approx(post_var, rel=0.35), mb


def test_sghmc_validation_and_dispatcher():
    lk = lambda x: -0.5 * jnp.sum(x**2)
    data = jnp.zeros((8, 1))
    with pytest.raises(ValueError, match="friction_alpha"):
        mcmc_tpu.sghmc(jnp.zeros(1), lk, _zero_lik, data,
                       mcmc_tpu.SGHMCSettings(friction_alpha=1.5,
                                              batch_size=2))
    with pytest.raises(ValueError, match="beta_hat"):
        mcmc_tpu.sghmc(jnp.zeros(1), lk, _zero_lik, data,
                       mcmc_tpu.SGHMCSettings(friction_alpha=0.1,
                                              beta_hat=0.2, batch_size=2))
    out = mcmc_tpu.sample(
        "sghmc", jnp.zeros(1), lk,
        mcmc_tpu.SGHMCSettings(step_size=1e-3, batch_size=2,
                               n_burnin_draws=5, n_keep_draws=10),
        log_lik=_zero_lik, data=data, key=jax.random.PRNGKey(0))
    assert out.draws.shape == (10, 1)
