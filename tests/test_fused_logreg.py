"""Fused Pallas HMC trajectory vs the plain XLA leapfrog — numerical
equivalence (interpret mode on CPU) and statistical behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_tpu import models
from mcmc_tpu.ops.fused_logreg import make_fused_trajectory, make_fused_hmc_step

D, N, L, EPS = 10, 64, 3, 0.05


def _setup():
    X, y, _ = models.make_logistic_regression_data(jax.random.PRNGKey(0), N, D)
    return X, y


def test_fused_trajectory_matches_xla_leapfrog():
    X, y = _setup()
    lk = models.logistic_regression_model(X, y, prior_scale=10.0)
    grad = jax.grad(lk)

    traj = make_fused_trajectory(X, y, 10.0, EPS, L, block_chains=8,
                                 interpret=True)
    n_chains = 16
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n_chains, D))
    p0 = jax.random.normal(jax.random.PRNGKey(2), (n_chains, D))
    Dp = traj.dim_padded
    zp = jnp.zeros((n_chains, Dp)).at[:, :D].set(z0)
    pp = jnp.zeros((n_chains, Dp)).at[:, :D].set(p0)
    z1, p1, U1 = traj(zp, pp)

    def leap(z, p):
        for _ in range(L):
            p = p + 0.5 * EPS * jax.vmap(grad)(z)
            z = z + EPS * p
            p = p + 0.5 * EPS * jax.vmap(grad)(z)
        return z, p, -jax.vmap(lk)(z)

    z2, p2, U2 = leap(z0, p0)

    # padding columns must stay exactly zero
    assert float(jnp.abs(z1[:, D:]).max()) == 0.0
    # bf16 matmuls: loose-but-meaningful agreement
    np.testing.assert_allclose(np.asarray(z1[:, :D]), np.asarray(z2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), rtol=2e-2,
                               atol=0.5)


def test_fused_hmc_step_samples_posterior():
    X, y = _setup()
    step = make_fused_hmc_step(X, y, step_size=0.08, n_leap=5,
                               block_chains=8, interpret=True)
    n_chains = 32
    state = step.init(0.1 * jax.random.normal(jax.random.PRNGKey(3), (n_chains, D)))

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        st, info = step(sub, st)
        return (st, k), (st.position, info["accepted"])

    (_, _), (traj, acc) = jax.lax.scan(body, (state, jax.random.PRNGKey(4)),
                                       None, length=600)
    acc = np.asarray(acc)
    assert acc.mean() > 0.5  # small steps: healthy acceptance

    # compare posterior mean vs standard HMC on the same model
    import mcmc_tpu
    lk = models.logistic_regression_model(X, y, prior_scale=10.0)
    ref = mcmc_tpu.hmc(jnp.zeros(D), lk,
                       mcmc_tpu.HMCSettings(n_burnin_draws=500, n_keep_draws=600,
                                            step_size=0.08, n_leap_steps=5),
                       n_chains=16, key=jax.random.PRNGKey(5))
    fused_mean = np.asarray(traj[300:, :, :D]).mean(axis=(0, 1))
    ref_mean = np.asarray(ref.draws).mean(axis=(0, 1))
    np.testing.assert_allclose(fused_mean, ref_mean, atol=0.3)


import pytest


def test_fused_trajectory_glm_links():
    """Poisson and linear links in the fused kernel match the XLA gradient
    path (interpret mode)."""
    import numpy as np
    from mcmc_tpu.ops.fused_logreg import make_fused_trajectory

    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    n, d = 48, 6
    X = jax.random.normal(k1, (n, d)) * 0.3
    for link in ("poisson", "linear"):
        if link == "poisson":
            y = jax.random.poisson(k2, jnp.exp(X @ jnp.ones(d) * 0.2)).astype(jnp.float32)
            def lk(b):
                eta = X @ b
                return jnp.sum(y * eta - jnp.exp(eta)) - 0.5 * jnp.sum(b**2) / 100.0
        else:
            y = X @ jnp.ones(d) + 0.1 * jax.random.normal(k2, (n,))
            def lk(b):
                eta = X @ b
                return jnp.sum(-0.5 * (y - eta) ** 2) - 0.5 * jnp.sum(b**2) / 100.0

        traj = make_fused_trajectory(X, y, 10.0, 0.02, 3, block_chains=8,
                                     interpret=True, link=link)
        Dp = traj.dim_padded
        z0 = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (8, d))
        p0 = jax.random.normal(jax.random.PRNGKey(2), (8, d))
        zp = jnp.zeros((8, Dp)).at[:, :d].set(z0)
        pp = jnp.zeros((8, Dp)).at[:, :d].set(p0)
        z1, p1, U1 = traj(zp, pp)

        grad = jax.grad(lk)
        z, p = z0, p0
        for _ in range(3):
            p = p + 0.5 * 0.02 * jax.vmap(grad)(z)
            z = z + 0.02 * p
            p = p + 0.5 * 0.02 * jax.vmap(grad)(z)
        np.testing.assert_allclose(np.asarray(z1[:, :d]), np.asarray(z),
                                   rtol=2e-2, atol=2e-2, err_msg=link)
        np.testing.assert_allclose(np.asarray(U1), np.asarray(-jax.vmap(lk)(z)),
                                   rtol=2e-2, atol=0.5, err_msg=link)
