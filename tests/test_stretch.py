"""Stretch-move ensemble sampler: proposal-density unit checks, exact
affine-equivariance, moment recovery, bounded mode, mesh sharding,
checkpointing, determinism, and argument validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models
from mcmc_tpu.parallel import make_mesh
from mcmc_tpu.samplers.stretch import StretchState, build_stretch_sweep


def _settings(**kw):
    base = dict(n_walkers=64, n_burnin_draws=500, n_keep_draws=1000)
    base.update(kw)
    return mcmc_tpu.StretchSettings(**base)


def test_z_distribution():
    """The stretch factor z = ((a-1)u + 1)^2 / a must follow g(z) ∝ 1/sqrt(z)
    on [1/a, a]: P(Z <= t) = (sqrt(a t) - 1) / (a - 1)."""
    a = 2.0
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (200_000,)))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    assert z.min() >= 1 / a - 1e-6 and z.max() <= a + 1e-6
    for t in (0.6, 1.0, 1.5):
        expected = (np.sqrt(a * t) - 1.0) / (a - 1.0)
        np.testing.assert_allclose((z <= t).mean(), expected, atol=5e-3)


def test_gaussian_mean_posterior():
    """Conjugate posterior mean recovered (reference correctness-anchor
    style, examples/eigen/rwmh_normal_mean.cpp)."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    out = mcmc_tpu.stretch(jnp.array([1.0]), models.gaussian_mean_model(x),
                           _settings(), key=jax.random.PRNGKey(2))
    assert out.draws.shape == (1000, 64, 1)
    post_prec = 100 / 1.0 + 1 / 4.0
    post_mean = (x.sum() / 1.0 + 1.0 / 4.0) / post_prec
    se = float(jnp.sqrt(1.0 / post_prec))
    assert abs(float(out.mean[0]) - float(post_mean)) < 5 * se / np.sqrt(50)
    # per-walker acceptance in a healthy band for a=2 on a 1-d Gaussian
    acc = out.diagnostics["accept_rate_per_walker"]
    assert 0.3 < float(acc.mean()) < 0.95


def test_affine_equivariance_exact():
    """The defining property, bit-for-bit: running on an axis-scaled
    Gaussian with the affinely-mapped initial ensemble produces exactly the
    scaled draws of the isotropic run (all RNG decisions coincide because
    z, partners, and the accept ratio are affine-invariant; the scale is a
    power of two so the f32 arithmetic is exactly equivariant too)."""
    scale = jnp.array([1.0, 8.0])

    def iso(v):
        return -0.5 * jnp.sum(v * v)

    def aniso(v):
        return -0.5 * jnp.sum((v / scale) ** 2)

    s_iso = _settings(n_walkers=16, n_burnin_draws=50, n_keep_draws=100,
                      init_spread=0.5)
    s_aniso = _settings(n_walkers=16, n_burnin_draws=50, n_keep_draws=100,
                        init_spread=0.5 * scale)
    key = jax.random.PRNGKey(7)
    out_iso = mcmc_tpu.stretch(jnp.zeros(2), iso, s_iso, key=key)
    out_aniso = mcmc_tpu.stretch(jnp.zeros(2), aniso, s_aniso, key=key)
    np.testing.assert_array_equal(
        np.asarray(out_aniso.draws), np.asarray(out_iso.draws) * scale)
    assert int(out_iso.n_accept_draws) == int(out_aniso.n_accept_draws)


def test_2d_correlated_moments():
    """Covariance of a correlated Gaussian recovered — exercises the
    z^(d-1) proposal-density factor (wrong exponent biases the spread)."""
    rho = 0.8
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lk(v):
        return -0.5 * v @ prec @ v

    out = mcmc_tpu.stretch(jnp.zeros(2), lk,
                           _settings(n_keep_draws=4000),
                           key=jax.random.PRNGKey(3))
    d = np.asarray(out.draws).reshape(-1, 2)
    emp = np.cov(d.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.12)


def test_bounded_draws_inside():
    out = mcmc_tpu.stretch(
        jnp.array([0.5]), lambda v: -8.0 * (v[0] - 0.3) ** 2,
        mcmc_tpu.AlgoSettings(
            vals_bound=True, lower_bounds=jnp.array([0.0]),
            upper_bounds=jnp.array([1.0]),
            stretch_settings=_settings(n_keep_draws=500)),
        key=jax.random.PRNGKey(4))
    d = np.asarray(out.draws)
    assert (d > 0.0).all() and (d < 1.0).all()
    assert 0.2 < d.mean() < 0.45


def test_determinism():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    s = _settings(n_walkers=16, n_burnin_draws=50, n_keep_draws=100)
    a = mcmc_tpu.stretch(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(5))
    b = mcmc_tpu.stretch(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))


def test_sweep_half_partnering():
    """A walker's partner always comes from the complementary half: freeze
    one half at a point mass far away and verify every accepted proposal of
    the other half lies on a line through the point mass (collinearity in
    2-d)."""
    s = mcmc_tpu.StretchSettings(n_walkers=8, par_a=2.0)
    sweep = build_stretch_sweep(lambda v: 0.0, s, 2)  # flat target
    X = jnp.concatenate([
        jnp.zeros((4, 2)) + jnp.array([[0.0, 1.0], [1.0, 0.0],
                                       [1.0, 1.0], [-1.0, 0.5]]),
        jnp.full((4, 2), 100.0)])
    state = StretchState(X=X, kernel_vals=jnp.zeros(8))
    new, info = sweep(jax.random.PRNGKey(6), state)
    moved = np.asarray(new.X[:4])
    old = np.asarray(X[:4])
    acc = np.asarray(info["accepted"][:4])
    for i in range(4):
        if acc[i]:
            # new point on the segment through (100, 100) and old[i]
            v1 = moved[i] - np.array([100.0, 100.0])
            v2 = old[i] - np.array([100.0, 100.0])
            cross = v1[0] * v2[1] - v1[1] * v2[0]
            assert abs(cross) < 1e-2 * np.linalg.norm(v1) * np.linalg.norm(v2)
    assert acc.any()  # flat target: stretch moves toward partner accept often


def test_mesh_sharded_matches_posterior():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    lk = models.gaussian_mean_model(x)
    mesh = make_mesh(8)
    out = mcmc_tpu.stretch(jnp.array([1.0]), lk, _settings(),
                           key=jax.random.PRNGKey(8), mesh=mesh)
    assert out.draws.shape == (1000, 64, 1)
    post_mean = (x.sum() + 0.25) / (100 + 0.25)
    assert abs(float(out.mean[0]) - float(post_mean)) < 0.1
    acc = out.diagnostics["accept_rate_per_walker"]
    assert 0.3 < float(acc.mean()) < 0.95


def test_checkpointed_run(tmp_path):
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (50,))
    lk = models.gaussian_mean_model(x)
    out = mcmc_tpu.stretch(
        jnp.array([1.0]), lk,
        _settings(n_walkers=16, n_burnin_draws=100, n_keep_draws=300),
        key=jax.random.PRNGKey(9), checkpoint_dir=str(tmp_path),
        checkpoint_every=100)
    assert out.draws.shape == (300, 16, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.5


def test_validation_errors():
    lk = lambda v: -0.5 * jnp.sum(v * v)
    with pytest.raises(ValueError, match="even"):
        mcmc_tpu.stretch(jnp.zeros(2), lk,
                         mcmc_tpu.StretchSettings(n_walkers=15))
    with pytest.raises(ValueError, match="par_a"):
        mcmc_tpu.stretch(jnp.zeros(2), lk,
                         mcmc_tpu.StretchSettings(par_a=1.0))
    with pytest.raises(ValueError, match="twice as many walkers"):
        mcmc_tpu.stretch(jnp.zeros(40), lk,
                         mcmc_tpu.StretchSettings(n_walkers=64))
    with pytest.raises(ValueError, match="single center point"):
        mcmc_tpu.stretch(jnp.zeros((4, 2)), lk)
    with pytest.raises(TypeError):
        mcmc_tpu.stretch(jnp.zeros(2), lk, mcmc_tpu.DESettings())
