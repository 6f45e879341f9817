"""DE-MC(Z) tests: small-population/high-dimension capability (the regime
plain DE cannot reach), snooker-move exactness (the Jacobian factor is the
easy thing to get wrong — a pure-snooker chain is only invariant if it is
right), bounded/checkpoint/resume composition, and archive mechanics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import diagnostics, models
from mcmc_tpu.samplers.demcz import DEMCZState, build_demcz_sweep


def _ks_stat_vs_normal(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    return max(d_plus, d_minus)


def test_smallpop_highdim_correlated():
    """8 walkers in 20 dimensions, strongly correlated target — impossible
    for plain DE (current-population differences span at most an 8-dim
    subspace); the archive makes it work."""
    d = 20
    rho = 0.8
    cov = rho * jnp.ones((d, d)) + (1 - rho) * jnp.eye(d)
    P = jnp.linalg.inv(cov)
    out = mcmc_tpu.demcz(
        jnp.zeros(d), lambda x: -0.5 * x @ P @ x,
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=4000,
                               n_keep_draws=6000),
        key=jax.random.PRNGKey(0))
    assert out.draws.shape == (6000, 8, d)
    pooled = np.asarray(out.draws).reshape(-1, d)
    assert np.abs(pooled.mean(0)).max() < 0.2
    assert 0.8 < pooled.var(0).min() and pooled.var(0).max() < 1.25
    corr = np.corrcoef(pooled[:, 0], pooled[:, 1])[0, 1]
    assert abs(corr - rho) < 0.08
    assert float(diagnostics.split_rhat(out.draws).max()) < 1.06


def test_snooker_exactness_ks():
    """Pure-snooker chain (snooker_prob=1) KS-exact on N(0, 1)^2: the
    (|x*-z| / |x-z|)^(d-1) Jacobian factor is load-bearing — dropping it
    visibly skews the stationary distribution."""
    out = mcmc_tpu.demcz(
        jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=2000,
                               n_keep_draws=8000, snooker_prob=1.0),
        key=jax.random.PRNGKey(1))
    samples = np.asarray(out.draws)[::8, :, 0].reshape(-1)
    ks = _ks_stat_vs_normal(samples)
    assert ks < 1.95 / math.sqrt(len(samples)), ks
    # and the second moment of both coordinates
    pooled = np.asarray(out.draws).reshape(-1, 2)
    assert np.allclose(pooled.var(0), 1.0, atol=0.08)


def test_snooker_variance_exact_moderate_dim():
    """Pure-snooker at d=6, where the (d-1) log-ratio term is large: without
    the Jacobian factor the line moves contract toward the anchors and the
    stationary variance lands visibly below 1; with it, exact."""
    d = 6
    out = mcmc_tpu.demcz(
        jnp.zeros(d), lambda v: -0.5 * jnp.sum(v * v),
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=2000,
                               n_keep_draws=6000, snooker_prob=1.0),
        key=jax.random.PRNGKey(2))
    pooled = np.asarray(out.draws).reshape(-1, d)
    assert np.allclose(pooled.var(0), 1.0, atol=0.1), pooled.var(0)


def test_gaussian_mean_posterior():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.demcz(jnp.array([1.0]), lk,
                         mcmc_tpu.DEMCZSettings(n_pop=8,
                                                n_burnin_draws=1000,
                                                n_keep_draws=3000),
                         key=jax.random.PRNGKey(3))
    post_mean = (x.sum() + 0.25) / (100 + 0.25)
    assert abs(float(out.mean[0]) - float(post_mean)) < 0.1
    acc = out.diagnostics["accept_rate_per_walker"]
    assert 0.05 < float(acc.mean()) < 0.95


def test_bounded_draws_inside():
    out = mcmc_tpu.demcz(
        jnp.array([0.5]), lambda v: -8.0 * (v[0] - 0.3) ** 2,
        mcmc_tpu.AlgoSettings(
            vals_bound=True, lower_bounds=jnp.array([0.0]),
            upper_bounds=jnp.array([1.0]),
            demcz_settings=mcmc_tpu.DEMCZSettings(
                n_pop=8, n_burnin_draws=500, n_keep_draws=1500)),
        key=jax.random.PRNGKey(4))
    d = np.asarray(out.draws)
    assert (d > 0.0).all() and (d < 1.0).all()
    assert 0.2 < d.mean() < 0.45


def test_determinism():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    s = mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=50, n_keep_draws=100)
    a = mcmc_tpu.demcz(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(5))
    b = mcmc_tpu.demcz(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))


def test_archive_stride_and_fill():
    """The archive is appended exactly every archive_stride generations and
    the fill counter tracks it; nothing is overwritten in the default
    (paper-exact) capacity mode."""
    s = mcmc_tpu.DEMCZSettings(n_pop=4, n_initial_archive=6,
                               archive_stride=3, n_burnin_draws=0,
                               n_keep_draws=9)
    capacity = 6 + 4 * (9 // 3)
    sweep = build_demcz_sweep(lambda v: -0.5 * jnp.sum(v * v), s, 2,
                              capacity)
    Z0 = jnp.zeros((capacity, 2)).at[:6].set(1.0)
    state = DEMCZState(X=jnp.ones((4, 2)), kernel_vals=jnp.full((4,), -1.0),
                       Z=Z0, m_total=jnp.asarray(6, jnp.int32),
                       gen_ind=jnp.asarray(0, jnp.int32))
    key = jax.random.PRNGKey(6)
    fills = []
    for i in range(9):
        key, sub = jax.random.split(key)
        state, _ = sweep(sub, state)
        fills.append(int(state.m_total))
    # appends after generations 3, 6, 9 (1-indexed)
    assert fills == [6, 6, 10, 10, 10, 14, 14, 14, 18]
    assert int(state.gen_ind) == 9


def test_ring_archive_bounded_memory():
    """An explicit archive_size caps memory as a ring; sampling statistics
    stay correct."""
    out = mcmc_tpu.demcz(
        jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=2000,
                               n_keep_draws=6000, archive_size=128),
        key=jax.random.PRNGKey(7))
    pooled = np.asarray(out.draws).reshape(-1, 2)
    assert np.abs(pooled.mean(0)).max() < 0.1
    assert np.allclose(pooled.var(0), 1.0, atol=0.1)


def test_checkpointed_run(tmp_path):
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.demcz(
        jnp.array([1.0]), lk,
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=100,
                               n_keep_draws=300),
        key=jax.random.PRNGKey(8), checkpoint_dir=str(tmp_path),
        checkpoint_every=100)
    assert out.draws.shape == (300, 8, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.5


def test_warm_resume():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.demcz(
        jnp.array([1.0]), lk,
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=200,
                               n_keep_draws=200),
        key=jax.random.PRNGKey(9), return_resume=True)
    more = out.diagnostics["resume"](jax.random.PRNGKey(10), 200)
    assert more.draws.shape == (200, 8, 1)
    assert abs(float(more.mean[0]) - 2.0) < 0.5


def test_sample_dispatcher():
    out = mcmc_tpu.sample(
        "demcz", jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=200,
                               n_keep_draws=400),
        key=jax.random.PRNGKey(11))
    assert out.draws.shape == (400, 8, 2)


def test_n_runs_independent_replicas():
    """n_runs replicas each carry their own archive; pooled draws come back
    as (n_keep, n_runs * n_pop, d) and cross-run R-hat (honest — no shared
    archive across runs) converges."""
    out = mcmc_tpu.demcz(
        jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=1500,
                               n_keep_draws=3000),
        n_runs=4, key=jax.random.PRNGKey(20))
    assert out.draws.shape == (3000, 32, 2)
    pooled = np.asarray(out.draws).reshape(-1, 2)
    assert np.abs(pooled.mean(0)).max() < 0.1
    assert np.allclose(pooled.var(0), 1.0, atol=0.1)
    assert float(diagnostics.split_rhat(out.draws).max()) < 1.05


def test_n_runs_mesh_sharded():
    from mcmc_tpu.parallel import make_mesh
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.demcz(jnp.array([1.0]), lk,
                         mcmc_tpu.DEMCZSettings(n_pop=6,
                                                n_burnin_draws=500,
                                                n_keep_draws=1000),
                         n_runs=8, mesh=make_mesh(8),
                         key=jax.random.PRNGKey(21))
    assert out.draws.shape == (1000, 48, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.1
    with pytest.raises(ValueError, match="replica"):
        mcmc_tpu.demcz(jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
                       mesh=make_mesh(8))


def test_n_runs_checkpointed(tmp_path):
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.demcz(
        jnp.array([1.0]), lk,
        mcmc_tpu.DEMCZSettings(n_pop=6, n_burnin_draws=100,
                               n_keep_draws=300),
        n_runs=4, key=jax.random.PRNGKey(22),
        checkpoint_dir=str(tmp_path), checkpoint_every=100)
    assert out.draws.shape == (300, 24, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.5


def test_fit_demcz():
    """fit(algorithm='demcz'): derivative-free one-call path with the
    convergence gate and Laplace-box initialization."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.fit(jnp.array([1.0]), lk, algorithm="demcz", n_chains=8,
                       n_warmup=500, n_draws=1000,
                       key=jax.random.PRNGKey(12), init="laplace",
                       rhat_target=1.05)
    assert out.diagnostics["converged"]
    post_mean = (x.sum() + 0.25) / (100 + 0.25)
    assert abs(float(np.asarray(out.draws).mean()) - float(post_mean)) < 0.1
    assert "summary" in out.diagnostics
    with pytest.raises(ValueError, match="mesh"):
        mcmc_tpu.fit(jnp.zeros(2), lambda v: -0.5 * jnp.sum(v * v),
                     algorithm="demcz", mesh="dummy")


def test_fit_demcz_laplace_bounded_box():
    """Regression: the Laplace initial box must be built in unconstrained
    space and mapped back — building it in constrained space from the
    unconstrained sd collapses the box for scale-like parameters (a
    sigma ~ 50 posterior got a box spanning ~0.1% of its mass)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (200,)) * 50.0
    lk = lambda p: jnp.sum(-jnp.log(p[0]) - 0.5 * (x / p[0]) ** 2)
    out = mcmc_tpu.fit(jnp.array([10.0]), lk, algorithm="demcz",
                       n_chains=8, n_warmup=500, n_draws=1000,
                       key=jax.random.PRNGKey(1), init="laplace",
                       lower_bounds=jnp.array([0.0]))
    m = float(np.asarray(out.draws).mean())
    assert 44 < m < 56, m
    # and the box itself is a sane constrained-space interval
    lap = mcmc_tpu.map_laplace(
        jnp.array([10.0]), lk,
        mcmc_tpu.AlgoSettings(vals_bound=True,
                              lower_bounds=jnp.array([0.0]),
                              upper_bounds=jnp.array([jnp.inf])),
        key=jax.random.PRNGKey(2))
    lo, hi = lap.init_box(2.0)
    assert 0 < float(lo[0]) < float(lap.mode[0]) < float(hi[0])


def test_validation_errors():
    lk = lambda v: -0.5 * jnp.sum(v * v)
    with pytest.raises(ValueError, match="n_pop"):
        mcmc_tpu.demcz(jnp.zeros(2), lk, mcmc_tpu.DEMCZSettings(n_pop=3))
    with pytest.raises(ValueError, match="snooker_prob"):
        mcmc_tpu.demcz(jnp.zeros(2), lk,
                       mcmc_tpu.DEMCZSettings(snooker_prob=1.5))
    with pytest.raises(ValueError, match="archive_stride"):
        mcmc_tpu.demcz(jnp.zeros(2), lk,
                       mcmc_tpu.DEMCZSettings(archive_stride=0))
    with pytest.raises(ValueError, match="archive_size"):
        mcmc_tpu.demcz(jnp.zeros(2), lk,
                       mcmc_tpu.DEMCZSettings(archive_size=4,
                                              n_initial_archive=16))
    with pytest.raises(ValueError, match="single center point"):
        mcmc_tpu.demcz(jnp.zeros((4, 2)), lk)
    with pytest.raises(TypeError):
        mcmc_tpu.demcz(jnp.zeros(2), lk, mcmc_tpu.DESettings())
