"""map_laplace: MAP optimization + Laplace covariance + chain initialization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings


def _mvn_kernel(mu, cov):
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(mu)
    return lambda x: -0.5 * (x - mu) @ prec @ (x - mu)


def test_gaussian_mode_and_cov_exact():
    """For a Gaussian target the MAP is the mean and the Laplace covariance
    is the exact covariance; cov_sqrt reproduces cov."""
    mu = np.array([1.5, -2.0, 0.5], np.float32)
    cov = np.array([[2.0, 0.6, 0.0],
                    [0.6, 1.0, -0.2],
                    [0.0, -0.2, 0.5]], np.float32)
    lap = mcmc_tpu.map_laplace(jnp.zeros(3), _mvn_kernel(mu, cov),
                               n_steps=800, learning_rate=0.1,
                               key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(lap.mode), mu, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lap.cov), cov, atol=5e-3)
    s = np.asarray(lap.cov_sqrt)
    np.testing.assert_allclose(s @ s.T, cov, atol=5e-3)
    assert float(lap.grad_norm) < 1e-2


def test_bounded_gamma_mode():
    """Gamma(3, 2) with a hard lower bound at 0. The objective is the box
    log-kernel (Jacobian included), so under z = log x the analytic optimum
    is x* = k/rate = 1.5 with z-space variance 1/k — the Laplace match of
    the density the samplers actually traverse. draw_init respects the
    bound."""
    k_shape, rate = 3.0, 2.0
    lk = lambda x: (k_shape - 1.0) * jnp.log(x[0]) - rate * x[0]
    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    lap = mcmc_tpu.map_laplace(jnp.ones(1) * 0.3, lk, s, n_steps=800,
                               learning_rate=0.05, key=jax.random.PRNGKey(1))
    assert float(lap.mode[0]) == pytest.approx(k_shape / rate, abs=5e-3)
    assert float(lap.cov[0, 0]) == pytest.approx(1.0 / k_shape, abs=5e-3)
    inits = np.asarray(lap.draw_init(jax.random.PRNGKey(2), 64))
    assert inits.shape == (64, 1)
    assert (inits > 0).all()


def test_restarts_escape_shallow_mode():
    """Batched restarts with jitter find the dominant mode of a well-
    separated two-component mixture even when initial_vals sits on the
    shallow one; restart_log_posts exposes the multimodality."""
    comp = lambda x, m: jnp.exp(-0.5 * jnp.sum((x - m) ** 2) / 0.25)
    lk = lambda x: jnp.log(0.1 * comp(x, -3.0) + 0.9 * comp(x, 3.0) + 1e-300)
    lap = mcmc_tpu.map_laplace(jnp.full(2, -3.0), lk, n_restarts=8,
                               restart_scale=4.0, n_steps=600,
                               learning_rate=0.1, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(lap.mode), 3.0, atol=0.02)
    spread = np.asarray(lap.restart_log_posts)
    assert spread.shape == (8,)
    assert spread.max() - spread.min() > 1.0   # restarts landed on both modes


def test_nonfinite_overshoot_does_not_poison():
    """An objective that returns -inf outside a disk: overshooting iterates
    must not corrupt the best-so-far tracking."""
    lk = lambda x: jnp.where(jnp.sum(x**2) < 4.0, -jnp.sum((x - 0.5) ** 2),
                             -jnp.inf)
    lap = mcmc_tpu.map_laplace(jnp.zeros(2), lk, n_steps=400,
                               learning_rate=0.3, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(lap.mode), 0.5, atol=1e-2)
    assert np.isfinite(float(lap.log_post))


def test_fit_laplace_init_runs():
    """fit(init='laplace') wires MAP-centered overdispersed starts through
    each algorithm family (gradient + ensemble)."""
    mu = np.array([2.0, -1.0], np.float32)
    cov = np.array([[1.0, 0.3], [0.3, 0.5]], np.float32)
    lk = _mvn_kernel(mu, cov)
    out = mcmc_tpu.fit(jnp.zeros(2) + 20.0, lk, algorithm="chees",
                       n_chains=8, n_warmup=300, n_draws=300,
                       key=jax.random.PRNGKey(5), init="laplace")
    np.testing.assert_allclose(np.asarray(out.mean), mu, atol=0.15)

    out2 = mcmc_tpu.fit(jnp.zeros(2) + 20.0, lk, algorithm="stretch",
                        n_chains=8, n_warmup=300, n_draws=300,
                        key=jax.random.PRNGKey(6), init="laplace")
    np.testing.assert_allclose(np.asarray(out2.mean), mu, atol=0.15)

    with pytest.raises(ValueError, match="fit init"):
        mcmc_tpu.fit(jnp.zeros(2), lk, init="magic")
