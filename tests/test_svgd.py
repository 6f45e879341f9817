"""SVGD: Gaussian moment matching, repulsion (no mode collapse), bimodal
coverage, bounds, determinism, and the single-particle MAP limit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings
from mcmc_tpu.svgd import svgd, _svgd_direction


def test_gaussian_moments():
    cov = np.array([[2.0, 0.8], [0.8, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0])
    lk = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)
    r = svgd(jnp.zeros(2), lk, n_particles=512, n_steps=1500,
             key=jax.random.PRNGKey(0))
    P = np.asarray(r.particles)
    np.testing.assert_allclose(P.mean(0), np.asarray(mu), atol=0.02)
    np.testing.assert_allclose(np.cov(P.T), cov, atol=0.15)
    tr = np.asarray(r.grad_norm_trace)
    assert tr[-50:].mean() < 0.1 * tr[:50].mean()   # converged


def test_repulsion_no_collapse():
    """Without the kernel-gradient term every particle is a MAP ascent and
    the cloud collapses; with it the stationary spread matches the target
    sd. Guard: final particle sd within 20% of 1.0 on N(0,1)^2."""
    lk = lambda x: -0.5 * jnp.sum(x ** 2)
    r = svgd(jnp.zeros(2), lk, n_particles=256, n_steps=1500,
             key=jax.random.PRNGKey(1))
    sd = np.asarray(r.particles).std(axis=0)
    np.testing.assert_allclose(sd, 1.0, rtol=0.2)


def test_bimodal_coverage():
    lk = lambda x: jnp.logaddexp(-0.5 * jnp.sum((x - 2.0) ** 2) / 0.25,
                                 -0.5 * jnp.sum((x + 2.0) ** 2) / 0.25)
    r = svgd(jnp.zeros(1), lk, n_particles=256, n_steps=1500,
             init_scale=3.0, key=jax.random.PRNGKey(2))
    P = np.asarray(r.particles)[:, 0]
    assert 0.3 < (P > 0).mean() < 0.7     # both modes hold particles


def test_bounded_gamma():
    lk = lambda x: 2.0 * jnp.log(x[0]) - 2.0 * x[0]
    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    r = svgd(jnp.ones(1), lk, s, n_particles=256, n_steps=1500,
             key=jax.random.PRNGKey(3))
    P = np.asarray(r.particles)
    assert P.min() > 0.0
    assert abs(P.mean() - 1.5) < 0.15


def test_direction_gaussian_closed_form():
    """Sanity on the direction itself: for particles AT the target mean of
    N(0, I), attraction vanishes and the direction is pure repulsion
    pointing outward from the centroid."""
    X = jnp.asarray([[0.5, 0.0], [-0.5, 0.0]], jnp.float32)
    g = -X        # grad log N(0, I)
    phi = _svgd_direction(X, g, jnp.asarray(1.0))
    # symmetric pair: phi_x components equal/opposite, repulsion dominates
    # (|x| = 0.5 < 2/h * separation contribution)
    assert float(phi[0, 0]) > 0 and float(phi[1, 0]) < 0
    np.testing.assert_allclose(np.asarray(phi[0]), -np.asarray(phi[1]),
                               atol=1e-6)


def test_determinism_and_validation():
    lk = lambda x: -0.5 * jnp.sum(x ** 2)
    a = svgd(jnp.zeros(2), lk, n_particles=64, n_steps=100,
             key=jax.random.PRNGKey(4))
    b = svgd(jnp.zeros(2), lk, n_particles=64, n_steps=100,
             key=jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a.particles),
                                  np.asarray(b.particles))
    with pytest.raises(ValueError, match="n_particles"):
        svgd(jnp.zeros(2), lk, n_particles=1)
    with pytest.raises(TypeError, match="settings"):
        svgd(jnp.zeros(2), lk, settings="x")
