"""Pathfinder: compact-BFGS factorization exactness vs a dense recursion,
draw quality on Gaussian targets, bounds, funnel behavior, fit() init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import AlgoSettings
from mcmc_tpu.pathfinder import (_diag_bfgs_update, _gauss_pieces,
                                 _sample_gauss, _sigma_mv, pathfinder)


def _dense_bfgs(S, Y, alpha):
    """Reference dense inverse-BFGS recursion from H0 = diag(alpha)."""
    d = S.shape[1]
    H = np.diag(alpha)
    for s, y in zip(S, Y):
        rho = 1.0 / (s @ y)
        V = np.eye(d) - rho * np.outer(s, y)
        H = V @ H @ V.T + rho * np.outer(s, s)
    return H


def _spd_case(d=7, J=4, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(d, d))
    H_true = A @ A.T + d * np.eye(d)
    S = rng.normal(size=(J, d))
    Y = S @ H_true.T          # y = H s  =>  s.y > 0
    alpha = np.abs(rng.normal(size=d)) + 0.5
    return S.astype(np.float32), Y.astype(np.float32), \
        alpha.astype(np.float32), H_true


def test_compact_factorization_matches_dense_bfgs():
    """Sigma = diag(a) + U M U^T reproduced via the QR+eigh factored form
    equals the dense two-loop BFGS recursion, including logdet and the
    Sigma@v product used for the Newton shift."""
    S, Y, alpha, _ = _spd_case()
    H = _dense_bfgs(S, Y, alpha)
    pmask = jnp.ones(4, bool)
    W, lam, logdet, ok = _gauss_pieces(jnp.asarray(S), jnp.asarray(Y),
                                       jnp.asarray(alpha), pmask)
    assert bool(ok)
    sa = np.sqrt(alpha)
    Sigma = (sa[:, None] * (np.eye(7) + np.asarray(W) @ np.diag(
        np.asarray(lam)) @ np.asarray(W).T)) * sa[None, :]
    np.testing.assert_allclose(Sigma, H, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(logdet), np.linalg.slogdet(H)[1],
                               rtol=1e-4)
    v = np.linspace(-1, 1, 7).astype(np.float32)
    mv = _sigma_mv(jnp.asarray(v), jnp.asarray(alpha), jnp.asarray(S),
                   jnp.asarray(Y), pmask)
    np.testing.assert_allclose(np.asarray(mv), H @ v, rtol=2e-3)


def test_factorization_masked_pairs():
    """Zero-padded (absent) pairs contribute nothing: result equals the
    dense recursion over the valid suffix only."""
    S, Y, alpha, _ = _spd_case(seed=1)
    H2 = _dense_bfgs(S[2:], Y[2:], alpha)
    S[:2] = 0.0
    Y[:2] = 0.0
    pmask = jnp.asarray([False, False, True, True])
    W, lam, logdet, ok = _gauss_pieces(jnp.asarray(S), jnp.asarray(Y),
                                       jnp.asarray(alpha), pmask)
    assert bool(ok)
    sa = np.sqrt(alpha)
    Sigma = (sa[:, None] * (np.eye(7) + np.asarray(W) @ np.diag(
        np.asarray(lam)) @ np.asarray(W).T)) * sa[None, :]
    np.testing.assert_allclose(Sigma, H2, rtol=2e-4, atol=2e-4)


def test_sample_gauss_moments_and_logq():
    """Draws have the factored covariance; log_q equals the dense MVN
    log-density at the drawn points."""
    S, Y, alpha, _ = _spd_case(seed=2)
    pmask = jnp.ones(4, bool)
    W, lam, logdet, ok = _gauss_pieces(jnp.asarray(S), jnp.asarray(Y),
                                       jnp.asarray(alpha), pmask)
    mu = jnp.asarray(np.linspace(-2, 2, 7), jnp.float32)
    x, logq = _sample_gauss(jax.random.PRNGKey(0), mu, jnp.asarray(alpha),
                            W, lam, 100_000)
    H = _dense_bfgs(S, Y, alpha)
    emp = np.cov(np.asarray(x).T)
    assert np.abs(emp - H).max() / np.abs(H).max() < 0.03
    # dense MVN logpdf at the first 100 draws
    xs = np.asarray(x[:100], np.float64)
    Hinv = np.linalg.inv(H)
    cent = xs - np.asarray(mu)
    dense = (-0.5 * 7 * np.log(2 * np.pi)
             - 0.5 * np.linalg.slogdet(H)[1]
             - 0.5 * np.einsum("nd,de,ne->n", cent, Hinv, cent))
    np.testing.assert_allclose(np.asarray(logq[:100], np.float64), dense,
                               rtol=1e-3, atol=1e-2)


def test_diag_bfgs_update_positive():
    rng = np.random.default_rng(3)
    alpha = jnp.asarray(np.abs(rng.normal(size=5)) + 0.1, jnp.float32)
    s = jnp.asarray(rng.normal(size=5), jnp.float32)
    y = jnp.asarray(rng.normal(size=5), jnp.float32)
    y = jnp.where(s @ y > 0, y, -y)
    a2 = _diag_bfgs_update(alpha, s, y, jnp.asarray(True))
    assert bool(jnp.all(a2 > 0))
    a3 = _diag_bfgs_update(alpha, s, y, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(alpha))


def test_pathfinder_gaussian_recovery():
    """On a correlated Gaussian the resampled draws match mean and
    covariance and the best ELBO is near the exact log-normalizer gap."""
    rng = np.random.default_rng(4)
    d = 8
    A = rng.normal(size=(d, d)) * 0.4
    cov = A @ A.T + np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    mu = jnp.asarray(rng.normal(size=d), jnp.float32)
    lk = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)

    res = pathfinder(jnp.zeros(d), lk, n_paths=4, n_draws=2000,
                     key=jax.random.PRNGKey(0))
    draws = np.asarray(res.draws)
    assert draws.shape == (2000, d)
    assert np.abs(draws.mean(0) - np.asarray(mu)).max() < 0.15
    assert np.abs(np.cov(draws.T) - cov).max() / np.abs(cov).max() < 0.45
    # exact ELBO at q = p/Z is log Z = d/2 log 2pi + 1/2 log|cov|
    exact = 0.5 * d * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(cov)[1]
    assert np.asarray(res.elbo).max() > exact - 0.5
    assert float(res.pareto_k) < 0.7


def test_pathfinder_bounded():
    """Gamma(3,2) behind a lower bound: draws respect the bound, land near
    the posterior bulk, and init_box/center stay in constrained space."""
    lk = lambda x: 2.0 * jnp.log(x[0]) - 2.0 * x[0]
    s = AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    res = pathfinder(jnp.ones(1), lk, s, n_paths=2, n_draws=400,
                     key=jax.random.PRNGKey(1))
    d = np.asarray(res.draws)
    assert d.min() > 0.0
    assert abs(d.mean() - 1.5) < 0.3          # E[Gamma(3,2)] = 1.5
    lo, hi = res.init_box(2.0)
    assert float(lo[0]) > 0.0 and float(hi[0]) > float(lo[0])
    assert float(res.center[0]) > 0.0


def test_pathfinder_funnel_prefers_early_iterate():
    """A funnel: the joint mode (z = 0, v far below the v ~ N(0, 3^2)
    typical set) is where L-BFGS converges, so the best-ELBO iterate must
    NOT be the last one — Pathfinder stops in the typical set. (The
    paper's central claim; a mode-seeking init fails here.)"""
    def funnel(x):
        v, z = x[0], x[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(z ** 2) * jnp.exp(-v) - 2.0 * v)

    res = pathfinder(jnp.zeros(6), funnel, n_paths=4, n_draws=400,
                     max_iters=40, key=jax.random.PRNGKey(2))
    assert bool(jnp.all(res.best_iter < 39))
    assert np.isfinite(np.asarray(res.elbo)).all()


def test_fit_init_pathfinder():
    """fit(init='pathfinder') converges on a shifted target from a far
    start."""
    mu = jnp.asarray([5.0, -4.0])
    lk = lambda x: -0.5 * jnp.sum((x - mu) ** 2)
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="chees", n_chains=8,
                       n_warmup=400, n_draws=400, init="pathfinder",
                       key=jax.random.PRNGKey(3))
    got = np.asarray(out.draws).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(got, np.asarray(mu), atol=0.2)


def test_pathfinder_validation_errors():
    lk = lambda x: -0.5 * x @ x
    with pytest.raises(TypeError, match="settings"):
        pathfinder(jnp.zeros(2), lk, settings=1.0)
    with pytest.raises(ValueError, match="pool"):
        pathfinder(jnp.zeros(2), lk, n_paths=2, n_draws=1000,
                   n_draws_per_path=10)
    with pytest.raises(ValueError, match="n_paths"):
        pathfinder(jnp.zeros(2), lk, n_paths=0)
