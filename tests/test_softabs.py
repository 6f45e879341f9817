"""SoftAbs metric tests: the eigenvalue map, the degeneracy-stable custom
JVP (checked against finite differences where naive eigh differentiation is
NaN), and end-to-end RM-HMC on Neal's funnel — the canonical target that
needs a position-dependent metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


def test_eigenvalue_map():
    """Indefinite Hessian -> SPD metric: negative eigenvalues flip sign,
    zero eigenvalues floor at 1/alpha, large ones pass through as |l|."""
    A = jnp.diag(jnp.array([-5.0, 0.0, 2.0]))
    m = mcmc_tpu.softabs_metric(lambda x: -0.5 * x @ A @ x, alpha=10.0)
    ev = np.sort(np.linalg.eigvalsh(np.asarray(m(jnp.zeros(3)))))
    np.testing.assert_allclose(ev, [0.1, 2.0, 5.0], rtol=1e-4)


def _fd_jac(m, x0, eps):
    d = x0.shape[0]
    cols = []
    for i in range(d):
        e = jnp.zeros(d).at[i].set(eps)
        cols.append((np.asarray(m(x0 + e)) - np.asarray(m(x0 - e)))
                    / (2 * eps))
    return np.stack(cols, axis=-1)


def test_derivative_matches_fd_distinct():
    with jax.enable_x64():
        W = jax.random.normal(jax.random.PRNGKey(0), (4, 4)) * 0.3
        lk = lambda x: (-0.5 * x @ x - 0.1 * jnp.sum((W @ x) ** 4)
                        - 0.05 * jnp.sum(x ** 3))
        m = mcmc_tpu.softabs_metric(lk, alpha=2.0)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (4,))
        J = np.asarray(jax.jacfwd(m)(x0))
        Jfd = _fd_jac(m, x0, 1e-6)
        np.testing.assert_allclose(J, Jfd, atol=1e-7)


def test_derivative_finite_and_exact_at_degeneracy():
    """U = 0.5 (x.x)^2 gives H = 2|x|^2 I + 4 x x^T — eigenvalue 2|x|^2 has
    multiplicity d-1.  Differentiating eigh naively NaNs here; the custom
    divided-difference JVP must stay finite AND match finite differences
    (the spectral function H -> f(H) is analytic through the degeneracy)."""
    with jax.enable_x64():
        lk = lambda x: -0.5 * (x @ x) ** 2
        m = mcmc_tpu.softabs_metric(lk, alpha=1.0)
        x0 = jnp.array([1.0, 0.5, -0.3, 0.2])
        J = np.asarray(jax.jacfwd(m)(x0))
        assert np.isfinite(J).all()
        np.testing.assert_allclose(J, _fd_jac(m, x0, 1e-6), atol=1e-6)

        # control: the naive eigh path really is broken at this input
        def naive(x):
            H = jax.hessian(lambda v: -lk(v))(x)
            lam, Q = jnp.linalg.eigh(H)
            return (Q * (lam / jnp.tanh(lam))) @ Q.T
        assert not np.isfinite(np.asarray(jax.jacfwd(naive)(x0))).all()


def test_metric_symmetric_and_spd_along_trajectory():
    lk = models.neals_funnel(dim=3, scale=3.0)
    m = mcmc_tpu.softabs_metric(lk, alpha=1.0)
    for seed in range(5):
        x = 2.0 * jax.random.normal(jax.random.PRNGKey(seed), (3,))
        G = np.asarray(m(x))
        np.testing.assert_allclose(G, G.T, atol=1e-5)
        assert np.linalg.eigvalsh(G).min() > 0


def test_funnel_rmhmc_end_to_end():
    """RM-HMC + SoftAbs on Neal's funnel: no hand metric, and the sampler
    reaches the deep neck (v < -6) that defeats fixed-metric HMC; the
    v-marginal is N(0, 3^2)."""
    lk = models.neals_funnel(dim=3, scale=3.0)
    metric = mcmc_tpu.softabs_metric(lk, alpha=1.0)
    out = mcmc_tpu.rmhmc(jnp.zeros(3), lk, metric,
                         mcmc_tpu.RMHMCSettings(n_burnin_draws=500,
                                                n_keep_draws=2000,
                                                step_size=0.5,
                                                n_leap_steps=4,
                                                n_fp_steps=5),
                         n_chains=16, key=jax.random.PRNGKey(0))
    v = np.asarray(out.draws)[..., 0].reshape(-1)
    acc = float(np.asarray(out.n_accept_draws).sum()) / (2000 * 16)
    assert 0.5 < acc < 0.95, acc
    assert abs(v.mean()) < 0.4, v.mean()
    assert 2.2 < v.std() < 3.5, v.std()
    assert v.min() < -6.0, v.min()   # the neck is actually visited


def test_alpha_validation():
    with pytest.raises(ValueError, match="alpha"):
        mcmc_tpu.softabs_metric(lambda x: -x @ x, alpha=0.0)
