"""MCLMC / MAMS tests: statistical correctness, the energy-error operating
point, L adaptation, the exact (adjusted) chain, bounds, mesh sharding, and
determinism. (No reference analog — the microcanonical family is the
framework's highest-throughput accelerator-native sampler; see
samplers/mclmc.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

import mcmc_tpu
from mcmc_tpu import models, diagnostics


def _aniso_logk(scales):
    return lambda v: -0.5 * jnp.sum((v / scales) ** 2)


def test_mclmc_anisotropic_gaussian_moments_and_tuning():
    """Moments of a 4-d anisotropic Gaussian; the adapted L lands at the
    sqrt-trace heuristic and the pooled energy-error variance per dimension
    lands on the desired_energy_var operating point."""
    scales = jnp.array([0.5, 1.0, 2.0, 4.0])
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=800, n_keep_draws=2000)
    out = mcmc_tpu.mclmc(jnp.zeros(4), _aniso_logk(scales), s,
                         n_chains=256, key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert d.shape == (2000, 256, 4)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.08)
    np.testing.assert_allclose(d.std(axis=(0, 1)), np.asarray(scales),
                               rtol=0.05)
    # L -> l_factor * sqrt(trace Sigma) = sqrt(0.25+1+4+16) ~ 4.61
    L = float(out.diagnostics["adapted_L"])
    assert 3.0 < L < 7.0, L
    de = np.asarray(out.diagnostics["energy_change"])
    var_e_dim = float((de ** 2).mean()) / 4
    assert 2e-4 < var_e_dim < 1.2e-3, var_e_dim  # target 5e-4
    # every step finite ("accepted" = healthy-step counter)
    assert (np.asarray(out.n_accept_draws) == 2000).all()
    # widest coordinate mixes slowest without preconditioning: loose gate
    assert float(np.asarray(diagnostics.split_rhat(out.draws)).max()) < 1.05


def test_mams_acceptance_and_exactness():
    """MAMS is Metropolis-exact: acceptance lands on the 0.9 target and the
    last draw of many long chains passes a KS test against the exact
    marginal."""
    scales = jnp.array([0.5, 1.0, 2.0])
    s = mcmc_tpu.MAMSSettings(n_burnin_draws=600, n_keep_draws=600)
    out = mcmc_tpu.mams(jnp.zeros(3), _aniso_logk(scales), s,
                        n_chains=512, key=jax.random.PRNGKey(1))
    acc = float(np.mean(out.accept_rate))
    assert 0.82 < acc < 0.97, acc
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.std(axis=(0, 1)), np.asarray(scales),
                               rtol=0.06)
    # cross-chain final states are independent draws from the stationary law
    finals = d[-1]  # (512, 3)
    for j, sc in enumerate(np.asarray(scales)):
        p = sps.kstest(finals[:, j] / sc, "norm").pvalue
        assert p > 1e-3, (j, p)


def test_mclmc_bias_is_controlled_by_energy_target():
    """The unadjusted chain's stationary bias is set by desired_energy_var:
    ~3% variance bias at the 5e-4 default on a 16-d standard Gaussian
    (measured +3.4%), dropping with the target (bias ~ target^(1/3)). The
    pooled-over-dims variance has negligible MC error at this volume, so
    this pins the knob's contract."""
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=800, n_keep_draws=2500)
    out = mcmc_tpu.mclmc(jnp.zeros(16), lk, s, n_chains=512,
                         key=jax.random.PRNGKey(2))
    bias_default = np.asarray(out.draws).reshape(-1, 16).var(axis=0).mean() - 1.0
    assert abs(bias_default) < 0.05, bias_default

    s2 = mcmc_tpu.MCLMCSettings(n_burnin_draws=800, n_keep_draws=2500,
                                desired_energy_var=1e-5)
    out2 = mcmc_tpu.mclmc(jnp.zeros(16), lk, s2, n_chains=512,
                          key=jax.random.PRNGKey(2))
    bias_tight = np.asarray(out2.draws).reshape(-1, 16).var(axis=0).mean() - 1.0
    assert abs(bias_tight) < 0.02, bias_tight
    assert abs(bias_tight) < abs(bias_default)


def test_mclmc_adapt_mass_ill_conditioned():
    lk = models.ill_conditioned_gaussian(16, condition_number=1e3)
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=1200, n_keep_draws=1500)
    out = mcmc_tpu.mclmc(jnp.zeros(16), lk, s, n_chains=128,
                         key=jax.random.PRNGKey(3), adapt_mass=True)
    d = np.asarray(out.draws)
    vr = d.reshape(-1, 16).var(axis=0) / np.asarray(lk.variances)
    assert (vr > 0.75).all() and (vr < 1.35).all(), vr


def test_mams_matches_nuts_posterior():
    """Same 10-d logistic-regression posterior, MAMS vs NUTS."""
    X, y, _ = models.make_logistic_regression_data(jax.random.PRNGKey(1),
                                                   300, 10)
    lk = models.logistic_regression_model(X, y)
    out_m = mcmc_tpu.mams(jnp.zeros(10), lk,
                          mcmc_tpu.MAMSSettings(n_burnin_draws=600,
                                                n_keep_draws=1000),
                          n_chains=32, key=jax.random.PRNGKey(4),
                          adapt_mass=True)
    out_n = mcmc_tpu.nuts(jnp.zeros(10), lk,
                          mcmc_tpu.NUTSSettings(n_burnin_draws=500,
                                                n_keep_draws=1000,
                                                n_adapt_draws=500),
                          n_chains=16, key=jax.random.PRNGKey(5),
                          adapt_mass_matrix=True)
    mm = np.asarray(out_m.draws).reshape(-1, 10).mean(axis=0)
    mn = np.asarray(out_n.draws).reshape(-1, 10).mean(axis=0)
    np.testing.assert_allclose(mm, mn, atol=0.06)
    vm = np.asarray(out_m.draws).reshape(-1, 10).var(axis=0)
    vn = np.asarray(out_n.draws).reshape(-1, 10).var(axis=0)
    np.testing.assert_allclose(vm, vn, rtol=0.25)


def test_mclmc_bounded_target():
    s = mcmc_tpu.AlgoSettings(vals_bound=True,
                              lower_bounds=jnp.zeros(2),
                              upper_bounds=jnp.full(2, 5.0))
    s.mclmc_settings.n_burnin_draws = 500
    s.mclmc_settings.n_keep_draws = 800
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    out = mcmc_tpu.sample("mclmc", jnp.ones(2), lk, s, n_chains=64,
                          key=jax.random.PRNGKey(6))
    d = np.asarray(out.draws)
    assert (d >= 0.0).all() and (d <= 5.0).all()
    # truncated-normal mean is pushed up from 1.0 by the zero bound
    assert 1.0 < d.mean() < 1.6


def test_mams_bounded_target():
    s = mcmc_tpu.AlgoSettings(vals_bound=True,
                              lower_bounds=jnp.zeros(2),
                              upper_bounds=jnp.full(2, 5.0))
    s.mams_settings.n_burnin_draws = 400
    s.mams_settings.n_keep_draws = 600
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    out = mcmc_tpu.sample("mams", jnp.ones(2), lk, s, n_chains=64,
                          key=jax.random.PRNGKey(7))
    d = np.asarray(out.draws)
    assert (d >= 0.0).all() and (d <= 5.0).all()
    assert 1.0 < d.mean() < 1.6


def test_mclmc_guards():
    with pytest.raises(ValueError, match="dim >= 2"):
        mcmc_tpu.mclmc(jnp.zeros(1), lambda v: -jnp.sum(v ** 2),
                       n_chains=8, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="n_chains"):
        mcmc_tpu.mclmc(jnp.zeros(2), lambda v: -jnp.sum(v ** 2),
                       key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="n_chains"):
        mcmc_tpu.mams(jnp.zeros(2), lambda v: -jnp.sum(v ** 2),
                      key=jax.random.PRNGKey(0))


def test_mclmc_fixed_key_determinism():
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=50, n_keep_draws=50)
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    a = mcmc_tpu.mclmc(jnp.zeros(3), lk, s, n_chains=8,
                       key=jax.random.PRNGKey(9))
    b = mcmc_tpu.mclmc(jnp.zeros(3), lk, s, n_chains=8,
                       key=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))


def test_mclmc_nonfinite_step_bounces():
    """A hard barrier: non-finite steps bounce (position kept, velocity
    flipped) instead of poisoning the chain; draws stay finite and inside."""
    lk = lambda v: jnp.where(v[0] < 2.0, -0.5 * jnp.sum(v ** 2), -jnp.inf)
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=300, n_keep_draws=500)
    out = mcmc_tpu.mclmc(jnp.zeros(2), lk, s, n_chains=32,
                         key=jax.random.PRNGKey(10))
    d = np.asarray(out.draws)
    assert np.isfinite(d).all()
    assert (d[..., 0] < 2.0).all()
    assert abs(d[..., 1].mean()) < 0.3


def test_mclmc_mesh_sharded():
    from mcmc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(4)
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=300, n_keep_draws=600)
    lk = _aniso_logk(jnp.array([1.0, 2.0]))
    out = mcmc_tpu.mclmc(jnp.zeros(2), lk, s, n_chains=64,
                         key=jax.random.PRNGKey(11), mesh=mesh)
    d = np.asarray(out.draws)
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d.std(axis=(0, 1)), [1.0, 2.0], rtol=0.08)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.15)
    # NOTE: no bit-equality with the unsharded run — the pooled pmean's
    # reduction order differs under GSPMD and the microcanonical dynamics
    # are chaotic, so f32 rounding diverges trajectories (distribution is
    # unchanged; the R-hat below gates that)
    assert float(np.asarray(diagnostics.split_rhat(out.draws)).max()) < 1.05


def test_mclmc_thin_and_resume():
    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=200, n_keep_draws=300)
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    out = mcmc_tpu.mclmc(jnp.zeros(2), lk, s, n_chains=32,
                         key=jax.random.PRNGKey(12), thin=3,
                         return_resume=True)
    assert np.asarray(out.draws).shape == (300, 32, 2)
    assert out.diagnostics["thin"] == 3
    more = out.diagnostics["resume"](jax.random.PRNGKey(13), 100)
    assert np.asarray(more.draws).shape == (100, 32, 2)
    assert np.isfinite(np.asarray(more.draws)).all()


def test_mams_checkpoint_matches_plain(tmp_path):
    s = mcmc_tpu.MAMSSettings(n_burnin_draws=100, n_keep_draws=200)
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    plain = mcmc_tpu.mams(jnp.zeros(2), lk, s, n_chains=16,
                          key=jax.random.PRNGKey(14))
    ck = mcmc_tpu.mams(jnp.zeros(2), lk, s, n_chains=16,
                       key=jax.random.PRNGKey(14),
                       checkpoint_dir=str(tmp_path / "mams"),
                       checkpoint_every=64)
    np.testing.assert_array_equal(np.asarray(plain.draws),
                                  np.asarray(ck.draws))
    np.testing.assert_array_equal(np.asarray(plain.n_accept_draws),
                                  np.asarray(ck.n_accept_draws))


def test_mclachlan_integrator_smaller_energy_error_and_exact():
    """The minimal-norm integrator's energy-error constant is far below
    velocity Verlet's: at the same FIXED step size the per-step energy
    error drops by >5x; and the tuned sampler stays exact on moments."""
    scales = jnp.array([0.5, 1.0, 2.0, 4.0])
    lk = _aniso_logk(scales)
    outs = {}
    for integ in ("velocity_verlet", "mclachlan"):
        s = mcmc_tpu.MCLMCSettings(n_burnin_draws=0, n_keep_draws=300,
                                   step_size=0.8, L=5.0, integrator=integ)
        outs[integ] = mcmc_tpu.mclmc(jnp.zeros(4), lk, s, n_chains=64,
                                     key=jax.random.PRNGKey(20))
    ve = np.asarray(outs["velocity_verlet"].diagnostics["energy_change"])
    me = np.asarray(outs["mclachlan"].diagnostics["energy_change"])
    assert (me ** 2).mean() < (ve ** 2).mean() / 5.0, \
        ((me ** 2).mean(), (ve ** 2).mean())

    s = mcmc_tpu.MCLMCSettings(n_burnin_draws=600, n_keep_draws=1500,
                               integrator="mclachlan")
    out = mcmc_tpu.mclmc(jnp.zeros(4), lk, s, n_chains=256,
                         key=jax.random.PRNGKey(21))
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.std(axis=(0, 1)), np.asarray(scales),
                               rtol=0.06)
    # the tuned step lands larger than velocity Verlet's at the same
    # energy-variance target (the point of the integrator)
    s_vv = mcmc_tpu.MCLMCSettings(n_burnin_draws=600, n_keep_draws=10,
                                  integrator="velocity_verlet")
    out_vv = mcmc_tpu.mclmc(jnp.zeros(4), lk, s_vv, n_chains=256,
                            key=jax.random.PRNGKey(21))
    assert float(out.diagnostics["adapted_step_size"]) > \
        1.3 * float(out_vv.diagnostics["adapted_step_size"])

    with pytest.raises(ValueError, match="integrator"):
        mcmc_tpu.mclmc(jnp.zeros(4), lk,
                       mcmc_tpu.MCLMCSettings(integrator="rk4"),
                       n_chains=8, key=jax.random.PRNGKey(0))
