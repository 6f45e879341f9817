"""Parallel tempering: swap correctness, mode recovery, ladder adaptation,
checkpoint/determinism composition, and the ladder-sharded variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu.samplers.pt import build_pt_kernel, make_ladder, _log_temps_from_rho


def bimodal(v, data=None):
    """Equal-weight Gaussian mixture at +-2 (the AEES test target)."""
    return jnp.logaddexp(-0.5 * jnp.sum((v - 2.0) ** 2),
                         -0.5 * jnp.sum((v + 2.0) ** 2))


def test_make_ladder():
    s = mcmc_tpu.PTSettings(n_temps=4, max_temp=27.0)
    temps = np.asarray(make_ladder(s, jnp.float32))
    np.testing.assert_allclose(temps, [27.0, 9.0, 3.0, 1.0], rtol=1e-5)

    s2 = mcmc_tpu.PTSettings(temper_vec=[10.0, 3.0])
    np.testing.assert_allclose(np.asarray(make_ladder(s2, jnp.float32)),
                               [10.0, 3.0, 1.0], rtol=1e-6)

    # entries <= 1 (inverse temperatures, or a duplicate T=1) are rejected
    with pytest.raises(ValueError, match="must all be > 1"):
        make_ladder(mcmc_tpu.PTSettings(temper_vec=[1.0, 3.0]), jnp.float32)
    with pytest.raises(ValueError, match="must all be > 1"):
        make_ladder(mcmc_tpu.PTSettings(temper_vec=[0.25, 0.5]), jnp.float32)


def test_rho_roundtrip():
    """rho parametrization reproduces the ladder it was initialized from."""
    s = mcmc_tpu.PTSettings(n_temps=5, max_temp=64.0)
    with jax.enable_x64():
        temps = make_ladder(s, jnp.float64)
        lt = jnp.log(temps)
        rho = jnp.log(lt[:-1] - lt[1:])
        np.testing.assert_allclose(
            np.asarray(_log_temps_from_rho(rho, jnp.float64)),
            np.asarray(lt), rtol=1e-12)


def test_pt_swap_permutation_detailed():
    """Drive the kernel one step with a forced-swap ladder (huge log-alpha)
    and check the state permutation is the exact even/odd pair exchange."""
    dt = jnp.float32
    s = mcmc_tpu.PTSettings(n_temps=4, max_temp=8.0, inner="rwmh",
                            par_scale=1e-6)  # inner moves ~no-ops
    box = lambda z: -0.5 * jnp.sum(z ** 2)
    make_state0, step = build_pt_kernel(box, s, 2, dt, n_adapt=0)
    st = make_state0(jnp.zeros(2), box(jnp.zeros(2)))
    # hand-set distinct positions; kv chosen so every pair's log_alpha >> 0:
    # log_alpha_k = (beta_k - beta_{k+1}) (kv_{k+1} - kv_k); beta ascending,
    # so kv descending in k makes log_alpha positive for every pair
    X = jnp.arange(8.0, dtype=dt).reshape(4, 2)
    kv = jnp.array([40.0, 30.0, 20.0, 10.0], dt)
    st = st._replace(X=X, kv=kv)

    # draw 0 -> parity 0: pairs (0,1) and (2,3) both must swap
    st1, info = step(jax.random.PRNGKey(0), st)
    np.testing.assert_array_equal(np.asarray(st1.X),
                                  np.asarray(X)[[1, 0, 3, 2]])
    np.testing.assert_array_equal(np.asarray(st1.kv),
                                  np.asarray(kv)[[1, 0, 3, 2]])
    np.testing.assert_array_equal(np.asarray(info["swap_attempted"]),
                                  [1.0, 0.0, 1.0])
    # draw 1 -> parity 1: only pair (1,2) active
    st2, info2 = step(jax.random.PRNGKey(1), st1._replace(kv=kv))
    np.testing.assert_array_equal(np.asarray(info2["swap_attempted"]),
                                  [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(st2.X),
                                  np.asarray(st1.X)[[0, 2, 1, 3]])


def test_pt_bimodal_mode_recovery():
    """The cold chain crosses between the +-2 modes and recovers both mode
    means and the 50/50 weight; a single untempered chain at this separation
    essentially never crosses."""
    s = mcmc_tpu.PTSettings(n_burnin_draws=400, n_keep_draws=1500, n_temps=6,
                            max_temp=50.0, inner="hmc", step_size=0.25,
                            n_leap_steps=5)
    out = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, n_chains=8,
                      key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert d.shape == (1500, 8, 2)
    pos = d[..., 0] > 0
    frac = float(pos.mean())
    assert 0.40 < frac < 0.60, frac
    np.testing.assert_allclose(d[pos].mean(axis=0), [2.0, 2.0], atol=0.15)
    np.testing.assert_allclose(d[~pos].mean(axis=0), [-2.0, -2.0], atol=0.15)
    # every chain individually crosses (tempering works per ladder)
    per_chain_frac = pos.mean(axis=0)
    assert (per_chain_frac > 0.15).all() and (per_chain_frac < 0.85).all()
    rates = np.asarray(out.diagnostics["swap_accept_rate"])
    assert rates.shape == (8, 5)
    assert (rates > 0.2).all() and (rates < 0.95).all()


def test_pt_rwmh_inner_and_squeeze():
    s = mcmc_tpu.PTSettings(n_burnin_draws=300, n_keep_draws=800, n_temps=5,
                            max_temp=30.0, inner="rwmh", par_scale=0.8)
    out = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, key=jax.random.PRNGKey(3))
    assert out.draws.shape == (800, 2)
    d = np.asarray(out.draws)
    assert 0.1 < (d[..., 0] > 0).mean() < 0.9   # crosses modes
    assert out.diagnostics["swap_accept_rate"].shape == (4,)


def test_pt_ladder_adaptation_targets_swap_rate():
    """adapt_temps drives per-pair swap acceptance toward 0.234 from a
    deliberately too-dense ladder (initial acceptance ~0.9)."""
    s = mcmc_tpu.PTSettings(n_burnin_draws=1500, n_keep_draws=800,
                            n_temps=6, max_temp=3.0,       # far too dense
                            inner="rwmh", par_scale=0.8,
                            adapt_temps=True)
    out = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, n_chains=16,
                      key=jax.random.PRNGKey(4))
    temps = np.asarray(out.diagnostics["temperatures"])
    assert temps[0] > 3.0          # ladder widened
    assert abs(temps[-1] - 1.0) < 1e-6
    assert (temps[:-1] > temps[1:]).all()
    rates = np.asarray(out.diagnostics["swap_accept_rate"]).mean(axis=0)
    assert (np.abs(rates - 0.234) < 0.15).all(), rates


def test_pt_bitwise_determinism():
    s = mcmc_tpu.PTSettings(n_burnin_draws=50, n_keep_draws=50, n_temps=4,
                            max_temp=10.0, step_size=0.2, n_leap_steps=3)
    a = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, n_chains=4,
                    key=jax.random.PRNGKey(7))
    b = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, n_chains=4,
                    key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))


def test_pt_checkpoint_roundtrip(tmp_path):
    s = mcmc_tpu.PTSettings(n_burnin_draws=100, n_keep_draws=200, n_temps=4,
                            max_temp=10.0, step_size=0.2, n_leap_steps=3)
    kw = dict(n_chains=4, key=jax.random.PRNGKey(5),
              checkpoint_dir=tmp_path / "pt", checkpoint_every=80)
    out = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, **kw)
    assert out.draws.shape == (200, 4, 2)
    out2 = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, **kw)
    np.testing.assert_array_equal(np.asarray(out.draws),
                                  np.asarray(out2.draws))
    # swap diagnostics survive the totals-only checkpoint path
    assert out.diagnostics["swap_accept_rate"].shape == (4, 3)


def test_pt_bounded():
    """Bounded target: draws stay in bounds; tempering acts on the box
    kernel (log-Jacobian included)."""
    algo = mcmc_tpu.AlgoSettings(
        vals_bound=True, lower_bounds=jnp.array([0.0, 0.0]),
        upper_bounds=jnp.array([jnp.inf, jnp.inf]))
    algo.pt_settings.n_burnin_draws = 200
    algo.pt_settings.n_keep_draws = 400
    algo.pt_settings.n_temps = 4
    algo.pt_settings.max_temp = 10.0
    algo.pt_settings.step_size = 0.15
    algo.pt_settings.n_leap_steps = 4
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    out = mcmc_tpu.pt(jnp.ones(2), lk, algo, n_chains=4,
                      key=jax.random.PRNGKey(9))
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert abs(d.mean() - 1.09) < 0.25     # truncated-normal mean > 1


def test_pt_single_temperature_degenerates_to_inner():
    """K=1 is plain (un-tempered) HMC: no swap diagnostics, correct target."""
    s = mcmc_tpu.PTSettings(n_burnin_draws=200, n_keep_draws=600,
                            temper_vec=[], step_size=0.3, n_leap_steps=5)
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    out = mcmc_tpu.pt(jnp.zeros(3), lk, s, n_chains=8,
                      key=jax.random.PRNGKey(11))
    assert out.diagnostics["swap_accept_rate"].size == 0
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.12)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.15)


def test_pt_sharded_matches_library_distributionally():
    """Ladder-sharded PT on a 6-device mesh: same config as the library
    sampler, agreeing mode balance and swap-acceptance profile (RNG stream
    layouts differ, so agreement is distributional)."""
    from jax.sharding import Mesh
    from mcmc_tpu.parallel import pt_sharded

    if len(jax.devices()) < 6:
        pytest.skip("needs 6 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:6]), ("chains",))
    s = mcmc_tpu.PTSettings(n_burnin_draws=400, n_keep_draws=2500, n_temps=6,
                            max_temp=50.0, inner="hmc", step_size=0.25,
                            n_leap_steps=5)
    out = pt_sharded(jnp.zeros(2), bimodal, s, mesh=mesh,
                     key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert d.shape == (2500, 2)
    frac = float((d[..., 0] > 0).mean())
    assert 0.35 < frac < 0.65, frac
    rates = np.asarray(out.diagnostics["swap_accept_rate"])
    ref = mcmc_tpu.pt(jnp.zeros(2), bimodal, s, n_chains=4,
                      key=jax.random.PRNGKey(1))
    ref_rates = np.asarray(ref.diagnostics["swap_accept_rate"]).mean(axis=0)
    np.testing.assert_allclose(rates, ref_rates, atol=0.12)

    with pytest.raises(ValueError, match="fixed ladder"):
        pt_sharded(jnp.zeros(2), bimodal,
                   mcmc_tpu.PTSettings(n_temps=6, adapt_temps=True),
                   mesh=mesh)


def test_pt_round_trip_diagnostics():
    """Replica-flow bookkeeping: a well-mixed geometric ladder on an easy
    target completes round trips (rate > 0); the counters are consistent
    (non-negative ints, rate = total / sweeps) and a K=1 ladder reports
    zero trips."""
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.PTSettings(n_burnin_draws=200, n_keep_draws=800,
                            n_temps=4, max_temp=8.0, step_size=0.5,
                            n_leap_steps=4)
    out = mcmc_tpu.pt(jnp.zeros(2), lk, s, n_chains=4,
                      key=jax.random.PRNGKey(0))
    trips = np.asarray(out.diagnostics["round_trips"])
    rate = np.asarray(out.diagnostics["round_trip_rate"])
    assert trips.shape == (4,) and (trips >= 0).all()
    assert trips.min() > 0, trips          # healthy ladder traverses
    np.testing.assert_allclose(rate, trips / 1000.0, rtol=1e-6)

    s1 = mcmc_tpu.PTSettings(n_burnin_draws=50, n_keep_draws=50, n_temps=1)
    out1 = mcmc_tpu.pt(jnp.zeros(2), lk, s1, key=jax.random.PRNGKey(1))
    assert int(out1.diagnostics["round_trips"]) == 0


def test_pt_round_trip_counts_exact_small():
    """Hand-checkable flow: with K=2 and swap_every=1 every sweep attempts
    the single pair; forcing near-certain swaps (identical temperatures ~
    1+eps) the occupant alternates rungs every sweep, so each replica
    completes ~n_sweeps/2 round trips (hot->cold->hot takes 2 swaps)."""
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.PTSettings(n_burnin_draws=0, n_keep_draws=100,
                            temper_vec=[1.0 + 1e-4], step_size=0.3,
                            n_leap_steps=2)
    out = mcmc_tpu.pt(jnp.zeros(1), lk, s, key=jax.random.PRNGKey(2))
    trips = int(np.asarray(out.diagnostics["round_trips"]))
    # 100 sweeps -> ~50 swaps accepted at ~100% -> total trips across the
    # 2 replicas ~ 50 (each round trip needs 2 swaps; both replicas count)
    assert 30 <= trips <= 60, trips
