"""RM-HMC, DE-MCMC, and AEES statistical tests against the reference
examples (reference examples/eigen/{rmhmc_normal,de_normal_mean,
aees_mixture}.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


def test_rmhmc_mean_scale():
    """Reference rmhmc_normal.cpp: step 0.2, Fisher metric, (mu, sigma)."""
    key = jax.random.PRNGKey(8)
    x = 2.0 + 2.0 * jax.random.normal(key, (1000,))
    log_kernel = models.gaussian_mean_scale_model(x)
    metric_fn = models.normal_fisher_metric(1000)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=13)
    settings.rmhmc_settings.step_size = 0.2
    settings.rmhmc_settings.n_leap_steps = 4
    settings.rmhmc_settings.n_burnin_draws = 1500
    settings.rmhmc_settings.n_keep_draws = 1500

    out = mcmc_tpu.rmhmc(jnp.array([3.0, 3.0]), log_kernel, metric_fn, settings)
    mean = np.asarray(out.mean)
    xd = np.asarray(x)
    assert mean[0] == pytest.approx(xd.mean(), abs=0.2)
    assert mean[1] == pytest.approx(xd.std(), abs=0.2)
    assert float(out.accept_rate) > 0.3


def test_rmhmc_constant_metric_matches_standard_normal():
    """With a constant identity metric, RM-HMC must sample the target like
    plain HMC (the fixed-point iterations collapse)."""
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    metric_fn = lambda v: jnp.eye(2)
    s = mcmc_tpu.RMHMCSettings(
        n_burnin_draws=300, n_keep_draws=1500, step_size=0.5, n_leap_steps=3
    )
    out = mcmc_tpu.rmhmc(jnp.zeros(2), log_kernel, metric_fn, s, n_chains=8,
                         key=jax.random.PRNGKey(3))
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.12)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.2)


def test_de_normal_mean():
    """Reference de_normal_mean.cpp: posterior mean of mu ~ 2.0."""
    key = jax.random.PRNGKey(17)
    x = 2.0 + jax.random.normal(key, (100,))
    log_kernel = models.gaussian_mean_model(x, sigma=1.0)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=1)
    settings.de_settings.n_pop = 100
    settings.de_settings.n_burnin_draws = 1000
    settings.de_settings.n_keep_draws = 1000

    out = mcmc_tpu.de(jnp.array([1.0]), log_kernel, settings)
    assert out.draws.shape == (1000, 100, 1)
    post_mean = float(np.asarray(x).mean() * 100 / (100 + 0.25) + 1.0 * 0.25 / 100.25)
    assert float(out.draws.mean()) == pytest.approx(post_mean, abs=0.1)
    # reference convention: acceptance over n_keep * n_pop
    rate = int(out.n_accept_draws) / (1000 * 100)
    assert 0.05 < rate < 0.9


def test_de_jumps_mode():
    key = jax.random.PRNGKey(23)
    x = 2.0 + jax.random.normal(key, (100,))
    log_kernel = models.gaussian_mean_model(x, sigma=1.0)
    s = mcmc_tpu.DESettings(n_pop=50, n_burnin_draws=500, n_keep_draws=500, jumps=True)
    out = mcmc_tpu.de(jnp.array([1.0]), log_kernel, s, key=jax.random.PRNGKey(0))
    assert float(out.draws.mean()) == pytest.approx(2.0, abs=0.3)


def test_de_distinct_indices():
    from mcmc_tpu.samplers.de import _distinct_pair_indices
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    i = jnp.full((), 3)
    c1, c2 = jax.vmap(lambda k: _distinct_pair_indices(k, i, 10))(keys)
    c1, c2 = np.asarray(c1), np.asarray(c2)
    assert (c1 != 3).all() and (c2 != 3).all() and (c1 != c2).all()
    assert set(c1) == set(range(10)) - {3}


def test_aees_bimodal_mixture():
    """Reference aees_mixture.cpp:74-145: T=(60,9)+1, 11 rings, ee_prob 0.05;
    sign-filtered mode means ~ (+2,+2) and (-2,-2)."""
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5])
    )

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=2)
    settings.aees_settings.n_initial_draws = 500
    settings.aees_settings.n_burnin_draws = 500
    settings.aees_settings.n_keep_draws = 8000
    settings.aees_settings.n_rings = 11
    settings.aees_settings.ee_prob_par = 0.05
    settings.aees_settings.temper_vec = jnp.array([60.0, 9.0])
    settings.aees_settings.par_scale = 1.0
    settings.aees_settings.cov_mat = 0.35 * jnp.eye(2)

    out = mcmc_tpu.aees(mu[0], log_kernel, settings)
    d = np.asarray(out.draws)
    assert d.shape == (8000, 2)

    pos = d[d[:, 0] > 0.1]
    neg = d[d[:, 0] < -0.1]
    # both modes must be visited (the whole point of equi-energy jumps)
    assert len(pos) > 200 and len(neg) > 200
    np.testing.assert_allclose(pos.mean(axis=0), [2.0, 2.0], atol=0.25)
    np.testing.assert_allclose(neg.mean(axis=0), [-2.0, -2.0], atol=0.25)
    np.testing.assert_array_equal(
        np.sort(np.asarray(out.diagnostics["temperatures"]))[::-1], [60.0, 9.0, 1.0]
    )


def test_de_mesh_sharded_matches_statistics():
    """Population-sharded DE (all_gather per generation) over a virtual
    8-device mesh recovers the same posterior as the unsharded path."""
    from mcmc_tpu.parallel import make_mesh

    key = jax.random.PRNGKey(31)
    x = 2.0 + jax.random.normal(key, (100,))
    log_kernel = models.gaussian_mean_model(x, sigma=1.0)
    s = mcmc_tpu.DESettings(n_pop=64, n_burnin_draws=400, n_keep_draws=400)

    out = mcmc_tpu.de(jnp.array([1.0]), log_kernel, s,
                      key=jax.random.PRNGKey(0), mesh=make_mesh(8))
    assert out.draws.shape == (400, 64, 1)
    assert float(out.draws.mean()) == pytest.approx(2.0, abs=0.3)
    rate = int(out.n_accept_draws) / (400 * 64)
    assert 0.05 < rate < 0.95


def test_aees_sharded_ladder_bimodal():
    """Ladder-sharded AEES (one temperature per device, ppermute history
    ring) must still hop between the mixture modes."""
    from mcmc_tpu.parallel import make_mesh
    from mcmc_tpu.parallel.aees_sharded import aees_sharded

    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5])
    )
    settings = mcmc_tpu.AlgoSettings(rng_seed_value=2)
    settings.aees_settings.n_initial_draws = 400
    settings.aees_settings.n_burnin_draws = 400
    settings.aees_settings.n_keep_draws = 6000
    settings.aees_settings.n_rings = 11
    settings.aees_settings.ee_prob_par = 0.05
    settings.aees_settings.temper_vec = jnp.array([60.0, 9.0])
    settings.aees_settings.cov_mat = 0.35 * jnp.eye(2)

    out = aees_sharded(mu[0], log_kernel, settings, mesh=make_mesh(3),
                       key=jax.random.PRNGKey(7))
    d = np.asarray(out.draws)
    assert d.shape == (6000, 2)
    pos = d[d[:, 0] > 0.1]
    neg = d[d[:, 0] < -0.1]
    assert len(pos) > 100 and len(neg) > 100
    np.testing.assert_allclose(pos.mean(axis=0), [2.0, 2.0], atol=0.3)
    np.testing.assert_allclose(neg.mean(axis=0), [-2.0, -2.0], atol=0.3)


def test_aees_sharded_requires_matching_mesh():
    from mcmc_tpu.parallel import make_mesh
    from mcmc_tpu.parallel.aees_sharded import aees_sharded
    s = mcmc_tpu.AEESSettings(temper_vec=jnp.array([10.0]))
    with pytest.raises(ValueError, match="ladder size"):
        aees_sharded(jnp.zeros(2), lambda v: -jnp.sum(v**2), s,
                     mesh=make_mesh(4))


def test_aees_multi_run_vmapped():
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.5, 0.5]), weights=jnp.array([0.5, 0.5])
    )
    s = mcmc_tpu.AEESSettings(
        n_initial_draws=150, n_burnin_draws=150, n_keep_draws=600,
        n_rings=5, ee_prob_par=0.1, temper_vec=jnp.array([20.0, 4.0]),
        cov_mat=0.5 * jnp.eye(2),
    )
    out = mcmc_tpu.aees(mu[0], log_kernel, s, key=jax.random.PRNGKey(0),
                        n_runs=4)
    d = np.asarray(out.draws)
    assert d.shape == (600, 4, 2)
    # replicas are independent: they must not be identical
    assert np.abs(d[:, 0] - d[:, 1]).max() > 0
    # pooled draws cover both modes
    pooled = d.reshape(-1, 2)
    assert (pooled[:, 0] > 0.1).mean() > 0.1 and (pooled[:, 0] < -0.1).mean() > 0.1


def test_aees_capped_history_bimodal():
    """Bounded-memory AEES (reservoir history, VERDICT item 4): with a
    512-slot reservoir instead of the full (n_total, K, d) history, the
    bimodal mixture statistics must match the full-history run — memory is
    independent of n_total."""
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5])
    )
    settings = mcmc_tpu.AlgoSettings(rng_seed_value=2)
    settings.aees_settings.n_initial_draws = 500
    settings.aees_settings.n_burnin_draws = 500
    settings.aees_settings.n_keep_draws = 8000
    settings.aees_settings.n_rings = 11
    settings.aees_settings.ee_prob_par = 0.05
    settings.aees_settings.temper_vec = jnp.array([60.0, 9.0])
    settings.aees_settings.cov_mat = 0.35 * jnp.eye(2)

    out = mcmc_tpu.aees(mu[0], log_kernel, settings, history_capacity=512)
    d = np.asarray(out.draws)
    assert d.shape == (8000, 2)
    pos = d[d[:, 0] > 0.1]
    neg = d[d[:, 0] < -0.1]
    assert len(pos) > 200 and len(neg) > 200
    np.testing.assert_allclose(pos.mean(axis=0), [2.0, 2.0], atol=0.25)
    np.testing.assert_allclose(neg.mean(axis=0), [-2.0, -2.0], atol=0.25)

    # the reservoir state really is capacity-sized, not n_total-sized
    from mcmc_tpu.samplers.aees import build_aees_kernel
    from mcmc_tpu.samplers import common as _c
    prob = _c.setup_problem(mu[0], log_kernel, settings, None, None)
    temps = jnp.array([60.0, 9.0, 1.0])
    mk, _ = build_aees_kernel(prob.box_log_kernel, temps,
                              settings.aees_settings, 2, jnp.float32,
                              history_capacity=512)
    st = mk(prob.first_draw[0], jnp.asarray(0.0))
    assert st.hist_draws.shape == (512, 3, 2)
    assert st.hist_kv.shape == (512, 3)


def test_aees_sharded_capped_history():
    """Sharded AEES with a device-local reservoir (capped) still hops modes."""
    from mcmc_tpu.parallel import make_mesh
    from mcmc_tpu.parallel.aees_sharded import aees_sharded

    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5])
    )
    settings = mcmc_tpu.AlgoSettings(rng_seed_value=7)
    settings.aees_settings.n_initial_draws = 400
    settings.aees_settings.n_burnin_draws = 400
    settings.aees_settings.n_keep_draws = 6000
    settings.aees_settings.n_rings = 11
    settings.aees_settings.ee_prob_par = 0.05
    settings.aees_settings.temper_vec = jnp.array([60.0, 9.0])
    settings.aees_settings.cov_mat = 0.35 * jnp.eye(2)

    out = aees_sharded(mu[0], log_kernel, settings, mesh=make_mesh(3),
                       key=jax.random.PRNGKey(0), history_capacity=256)
    d = np.asarray(out.draws)
    pos = d[d[:, 0] > 0.1]
    neg = d[d[:, 0] < -0.1]
    assert len(pos) > 150 and len(neg) > 150
    np.testing.assert_allclose(pos.mean(axis=0), [2.0, 2.0], atol=0.3)
    np.testing.assert_allclose(neg.mean(axis=0), [-2.0, -2.0], atol=0.3)


def test_aees_replicas_mesh_sharded():
    """n_runs + mesh: whole-ladder replicas shard over the device mesh
    (collective-free); statistics match the unsharded replica path."""
    from mcmc_tpu.parallel import make_mesh
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.5, 0.5]), weights=jnp.array([0.5, 0.5])
    )
    s = mcmc_tpu.AEESSettings(
        n_initial_draws=100, n_burnin_draws=100, n_keep_draws=400,
        n_rings=5, ee_prob_par=0.1, temper_vec=jnp.array([20.0, 4.0]),
        cov_mat=0.5 * jnp.eye(2),
    )
    out = mcmc_tpu.aees(mu[0], log_kernel, s, key=jax.random.PRNGKey(0),
                        n_runs=8, mesh=make_mesh(8),
                        history_capacity=128)
    d = np.asarray(out.draws)
    assert d.shape == (400, 8, 2)
    pooled = d.reshape(-1, 2)
    assert (pooled[:, 0] > 0.1).mean() > 0.1
    assert (pooled[:, 0] < -0.1).mean() > 0.1


def test_aees_adapt_ladder_ee():
    """adapt_ladder=True (the 'ee' energy-overlap mode): the constructed
    ladder is geometric-ish descending with T=1 appended, only max(
    temper_vec) is consumed (rung count emerges from the walk), EE-jump
    acceptance diagnostics are attached, and both modes are visited."""
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5]))
    settings = mcmc_tpu.AEESSettings(
        n_initial_draws=300, n_burnin_draws=300, n_keep_draws=4000,
        n_rings=11, ee_prob_par=0.05, temper_vec=jnp.array([60.0]),
        cov_mat=0.35 * jnp.eye(2))
    out = mcmc_tpu.aees(mu[0], log_kernel, settings,
                        key=jax.random.PRNGKey(3), n_runs=4,
                        history_capacity=256, adapt_ladder=True)
    temps = np.asarray(out.diagnostics["temperatures"])
    K = temps.shape[0]
    assert 3 <= K <= 8                          # emergent rung count
    assert temps[0] == pytest.approx(60.0)
    assert temps[-1] == pytest.approx(1.0)
    assert np.all(np.diff(temps) < 0)           # strictly descending
    assert np.all(temps[1:-1] > 1.4)            # no near-target rungs
    # the measured equi-energy functional: jumps attempted and accepted
    att = np.asarray(out.diagnostics["ee_attempts"])
    rate = np.asarray(out.diagnostics["ee_accept_rate"])
    assert att.shape == (K,) and att[0] == 0 and (att[1:] > 0).all()
    assert (rate[1:] > 0.3).all()               # overlap rule keeps jumps live
    d = np.asarray(out.draws)
    assert d.shape == (4000, 4, 2)
    assert (d[..., 0] > 0.1).mean() > 0.05
    assert (d[..., 0] < -0.1).mean() > 0.05

    with pytest.raises(ValueError, match="adapt_ladder"):
        mcmc_tpu.aees(mu[0], log_kernel,
                      mcmc_tpu.AEESSettings(n_keep_draws=10),
                      adapt_ladder=True)
    with pytest.raises(ValueError, match="adapt_ladder"):
        mcmc_tpu.aees(mu[0], log_kernel, settings, adapt_ladder="nope")


def test_build_ee_ladder_typed_key_and_cap_warning():
    """The ladder builder accepts NEW-STYLE typed PRNG keys (the pilot's
    key reshape must not assume legacy (N, 2) uint32 keys), and warns when
    max_rungs truncates the walk before bridging to T=1."""
    from mcmc_tpu.samplers.aees import build_ee_ladder
    import warnings as _warnings
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.AEESSettings(cov_mat=jnp.eye(2))
    temps = build_ee_ladder(jax.random.key(0), lk, jnp.zeros(2), s, 2,
                            jnp.float32, 60.0, n_pilot_draws=100)
    t = np.asarray(temps)
    assert t[0] == pytest.approx(60.0) and np.all(np.diff(t) < 0)
    assert np.all(t > 1.0)
    # tiny spacing -> the walk needs ~84 rungs to bridge 60 -> 1; the
    # max_rungs cap must WARN instead of silently leaving the gap
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        build_ee_ladder(jax.random.PRNGKey(1), lk, jnp.zeros(2), s, 2,
                        jnp.float32, 60.0, spacing=0.05, max_rungs=4,
                        n_pilot_draws=100)
    assert any("max_rungs" in str(x.message) for x in w)
    # high dimension: the fixed par_scale*sqrt(T) proposal would stick
    # completely at d=64, but the pilot's per-temperature scale
    # self-tuning keeps the chains moving and builds a real ladder
    # (sigma_val ~ sqrt(d/2)/beta -> ratio ~1 + 3/5.7, many rungs)
    lk_hd = lambda v: -0.5 * jnp.sum(v ** 2)
    s_hd = mcmc_tpu.AEESSettings(cov_mat=jnp.eye(64))
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        t_hd = np.asarray(build_ee_ladder(
            jax.random.PRNGKey(1), lk_hd, jnp.zeros(64), s_hd,
            64, jnp.float32, 60.0, n_pilot_draws=200, max_rungs=32))
    assert not any("barely move" in str(x.message) for x in w)
    assert len(t_hd) >= 6                      # dense ladder, not [60]
    # a degenerate all-rejecting target still warns instead of
    # constructing a nan ladder
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        t_bad = np.asarray(build_ee_ladder(
            jax.random.PRNGKey(1), lambda v: -jnp.inf, jnp.zeros(2), s,
            2, jnp.float32, 60.0, n_pilot_draws=100))
    assert any("barely move" in str(x.message) for x in w)
    assert np.isfinite(t_bad).all()


def test_aees_adapt_ladder_pt_legacy():
    """adapt_ladder='pt': the legacy PT Robbins-Monro pre-run is still
    available (kept for comparison; the sweep measured it transferring
    poorly to EE jumps) — fixed rung count, moved off the initial guess."""
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5]))
    settings = mcmc_tpu.AEESSettings(
        n_initial_draws=300, n_burnin_draws=300, n_keep_draws=2000,
        n_rings=11, ee_prob_par=0.05, temper_vec=jnp.array([60.0, 9.0]),
        cov_mat=0.35 * jnp.eye(2))
    out = mcmc_tpu.aees(mu[0], log_kernel, settings,
                        key=jax.random.PRNGKey(3), n_runs=4,
                        history_capacity=256, adapt_ladder="pt",
                        n_ladder_adapt=400)
    temps = np.asarray(out.diagnostics["temperatures"])
    assert temps.shape == (3,)
    assert temps[-1] == pytest.approx(1.0)
    assert np.all(np.diff(temps) < 0)
    assert not np.allclose(temps[:-1], [60.0, 9.0], rtol=0.05)
