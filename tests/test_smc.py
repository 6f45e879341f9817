"""Tempered SMC: resampling unit tests, adaptive schedule, moment/evidence
recovery against closed forms, multimodal mass recovery, bounded mode,
mesh sharding, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu.samplers.smc import next_lambda, resample_indices


def test_resample_systematic_uniform_weights_is_identity():
    """With exactly uniform weights, systematic resampling keeps every
    particle exactly once (the zero-variance case)."""
    n = 64
    logw = jnp.zeros((n,))
    idx = np.asarray(resample_indices(jax.random.PRNGKey(0), logw, n,
                                      "systematic"))
    np.testing.assert_array_equal(np.sort(idx), np.arange(n))


def test_resample_degenerate_weight_takes_single_ancestor():
    n = 32
    logw = jnp.full((n,), -1e30).at[7].set(0.0)
    for kind in ("systematic", "stratified", "multinomial"):
        idx = np.asarray(resample_indices(jax.random.PRNGKey(1), logw, n,
                                          kind))
        assert (idx == 7).all(), kind


def test_resample_proportional_counts():
    """Systematic counts are within 1 of n*w_i (the defining property)."""
    n = 1000
    w = np.array([0.5, 0.25, 0.125, 0.125])
    logw = jnp.log(jnp.asarray(np.repeat(w / (n // 4), n // 4)))
    idx = np.asarray(resample_indices(jax.random.PRNGKey(2), logw, n,
                                      "systematic"))
    counts = np.bincount(idx // (n // 4), minlength=4)
    np.testing.assert_allclose(counts, w * n, atol=1.0)


def test_next_lambda_bisection():
    """Hits the ESS target on a hand-checkable weight profile and jumps to
    1.0 when the target is reachable there."""
    key = jax.random.PRNGKey(3)
    delta = jax.random.normal(key, (512,)) * 20.0
    lam = jnp.asarray(0.2)
    lam_new = next_lambda(lam, delta, jnp.asarray(0.5))
    assert float(lam_new) > 0.2
    logw = (lam_new - lam) * delta
    w = np.exp(np.asarray(logw - logw.max()))
    ess = w.sum() ** 2 / (w ** 2).sum() / 512
    assert 0.5 - 1e-5 <= ess < 0.52  # conservative side of the target (f32)
    # tiny delta -> ESS stays ~1 all the way -> take 1.0
    assert float(next_lambda(lam, delta * 1e-4, jnp.asarray(0.5))) == 1.0


def test_smc_gaussian_moments_and_evidence():
    """logK = -|x-1|^2/(2*1.69): mean 1, var 1.69, Z = (2 pi 1.69)^{d/2}."""
    d, sig2 = 3, 1.69
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2) / sig2
    s = mcmc_tpu.SMCSettings(n_particles=4096, init_scale=3.0)
    out = mcmc_tpu.smc(jnp.zeros(d), lk, s, key=jax.random.PRNGKey(0))
    dd = np.asarray(out.draws)
    assert dd.shape == (4096, d)
    assert out.diagnostics["completed"]
    np.testing.assert_allclose(dd.mean(axis=0), 1.0, atol=0.08)
    np.testing.assert_allclose(dd.var(axis=0), sig2, rtol=0.10)
    exact = 0.5 * d * np.log(2 * np.pi * sig2)
    assert abs(float(out.diagnostics["log_z"]) - exact) < 0.12
    # schedule sanity: strictly increasing to exactly 1, ESS at/above target
    lams = np.asarray(out.diagnostics["lambdas"])
    assert (np.diff(np.concatenate([[0.0], lams])) > 0).all()
    assert lams[-1] == 1.0
    ess = np.asarray(out.diagnostics["ess_fraction"])
    assert (ess >= 0.5 - 1e-4).all()


def test_smc_unequal_mixture_mass_and_modes():
    """0.3/0.7 mixture at -+2: the cloud recovers the mass split the
    single-chain samplers can only get by rare mode hops, and the evidence
    Z = 2 pi 0.25 (weights sum to 1)."""
    def mix(v):
        return jnp.logaddexp(
            jnp.log(0.3) - 0.5 * jnp.sum((v + 2.0) ** 2) / 0.25,
            jnp.log(0.7) - 0.5 * jnp.sum((v - 2.0) ** 2) / 0.25)

    s = mcmc_tpu.SMCSettings(n_particles=8192, init_scale=4.0)
    out = mcmc_tpu.smc(jnp.zeros(2), mix, s, key=jax.random.PRNGKey(1))
    d = np.asarray(out.draws)
    pos = d[..., 0] > 0
    assert abs(pos.mean() - 0.7) < 0.05, pos.mean()
    np.testing.assert_allclose(d[pos].mean(axis=0), [2.0, 2.0], atol=0.05)
    np.testing.assert_allclose(d[~pos].mean(axis=0), [-2.0, -2.0], atol=0.05)
    assert abs(float(out.diagnostics["log_z"])
               - np.log(2 * np.pi * 0.25)) < 0.15


def test_smc_hmc_inner_ill_conditioned():
    from mcmc_tpu import models
    lk = models.ill_conditioned_gaussian(20, condition_number=1000.0)
    s = mcmc_tpu.SMCSettings(n_particles=4096, init_scale=10.0, inner="hmc",
                             n_mcmc_steps=3, step_size=0.5, n_leap_steps=5)
    out = mcmc_tpu.smc(jnp.zeros(20), lk, s, key=jax.random.PRNGKey(2))
    assert out.diagnostics["completed"]
    ratio = np.asarray(out.draws).var(axis=0) / np.asarray(lk.variances)
    np.testing.assert_allclose(ratio, 1.0, atol=0.2)


def test_smc_bounded_truncated_normal():
    """x > 0 with logK = -(x-1)^2/2 per dim: the cloud stays in bounds,
    matches the truncated-normal mean, and log_z is the constrained-space
    integral d * [log sqrt(2 pi) + log Phi(1)]."""
    from scipy.stats import norm
    algo = mcmc_tpu.AlgoSettings(
        vals_bound=True, lower_bounds=jnp.zeros(2),
        upper_bounds=jnp.full((2,), jnp.inf))
    algo.smc_settings.n_particles = 4096
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    out = mcmc_tpu.smc(jnp.ones(2), lk, algo, key=jax.random.PRNGKey(3))
    d = np.asarray(out.draws)
    assert (d > 0).all()
    trunc_mean = 1.0 + norm.pdf(1.0) / norm.cdf(1.0)
    np.testing.assert_allclose(d.mean(), trunc_mean, atol=0.05)
    exact = 2 * (0.5 * np.log(2 * np.pi) + np.log(norm.cdf(1.0)))
    assert abs(float(out.diagnostics["log_z"]) - exact) < 0.1


def test_smc_bitwise_determinism():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.SMCSettings(n_particles=512, max_stages=20)
    a = mcmc_tpu.smc(jnp.zeros(2), lk, s, key=jax.random.PRNGKey(7))
    b = mcmc_tpu.smc(jnp.zeros(2), lk, s, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))
    assert float(a.diagnostics["log_z"]) == float(b.diagnostics["log_z"])


def test_smc_mesh_sharded_population():
    """Particle axis sharded over the 8-device CPU mesh: completes, matches
    the unsharded run's statistics (GSPMD turns the reductions/resampling
    into collectives; RNG layout is identical so results agree closely)."""
    from mcmc_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2) / 1.69
    s = mcmc_tpu.SMCSettings(n_particles=4096, init_scale=3.0)
    out = mcmc_tpu.smc(jnp.zeros(3), lk, s, key=jax.random.PRNGKey(0),
                       mesh=mesh)
    d = np.asarray(out.draws)
    assert out.diagnostics["completed"]
    np.testing.assert_allclose(d.mean(axis=0), 1.0, atol=0.08)
    np.testing.assert_allclose(d.var(axis=0), 1.69, rtol=0.10)
    exact = 0.5 * 3 * np.log(2 * np.pi * 1.69)
    assert abs(float(out.diagnostics["log_z"]) - exact) < 0.12


def test_smc_validation_errors():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    with pytest.raises(ValueError, match="n_particles"):
        mcmc_tpu.smc(jnp.zeros((4, 2)), lk)
    with pytest.raises(ValueError, match="ess_target"):
        mcmc_tpu.smc(jnp.zeros(2), lk, mcmc_tpu.SMCSettings(ess_target=1.5))
    with pytest.raises(ValueError, match="inner"):
        mcmc_tpu.smc(jnp.zeros(2), lk, mcmc_tpu.SMCSettings(inner="nuts"))
    with pytest.raises(ValueError, match="resample"):
        mcmc_tpu.smc(jnp.zeros(2), lk, mcmc_tpu.SMCSettings(resample="x"))


def test_smc_via_sample_dispatcher():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    out = mcmc_tpu.sample("smc", jnp.zeros(2), lk,
                          mcmc_tpu.SMCSettings(n_particles=1024),
                          key=jax.random.PRNGKey(5))
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(d.var(axis=0), 1.0, rtol=0.15)
