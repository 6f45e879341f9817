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


def test_fused_gaussian_trajectory_matches_xla():
    """The MVN fused trajectory equals the XLA leapfrog on the same target."""
    from mcmc_tpu.ops.fused_logreg import make_fused_gaussian_trajectory
    rng = np.random.default_rng(0)
    A = rng.normal(size=(D, D))
    P = jnp.asarray(A @ A.T / D + np.eye(D), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)

    traj = make_fused_gaussian_trajectory(P, mean, step_size=EPS, n_leap=L,
                                          block_chains=8, interpret=True)
    n_chains = 16
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n_chains, D))
    p0 = jax.random.normal(jax.random.PRNGKey(2), (n_chains, D))
    Dp = traj.dim_padded
    zp = jnp.zeros((n_chains, Dp)).at[:, :D].set(z0)
    pp = jnp.zeros((n_chains, Dp)).at[:, :D].set(p0)
    z_f, p_f, u_f = traj(zp, pp)

    def xla_leapfrog(z, p):
        grad = lambda zz: -P @ (zz - mean)
        for _ in range(L):
            p = p + 0.5 * EPS * grad(z)
            z = z + EPS * p
            p = p + 0.5 * EPS * grad(z)
        u = 0.5 * (z - mean) @ (P @ (z - mean))
        return z, p, u

    z_x, p_x, u_x = jax.vmap(xla_leapfrog)(z0, p0)
    np.testing.assert_allclose(np.asarray(z_f[:, :D]), np.asarray(z_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_f[:, :D]), np.asarray(p_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_x),
                               rtol=2e-4, atol=2e-4)
    # padded coordinates stay exactly zero (decoupled identity block)
    assert float(jnp.abs(z_f[:, D:]).max()) == 0.0


def test_fused_gaussian_hmc_step_samples_target():
    """The fused MVN HMC step samples N(mean, P^{-1})."""
    from mcmc_tpu.ops.fused_logreg import make_fused_gaussian_hmc_step
    var = jnp.array([0.5, 2.0, 1.0, 4.0])
    P = jnp.diag(1.0 / var)
    mean = jnp.array([1.0, -1.0, 0.5, 2.0])
    step = make_fused_gaussian_hmc_step(P, mean, step_size=0.4, n_leap=5,
                                        block_chains=8, interpret=True)
    st = step.init(jnp.zeros((32, 4)))
    key = jax.random.PRNGKey(0)

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        st, info = step(sub, st)
        return (st, k), st.position[:, :4]

    (st, _), draws = jax.lax.scan(body, (st, key), None, length=400)
    d = np.asarray(draws[100:]).reshape(-1, 4)
    np.testing.assert_allclose(d.mean(axis=0), np.asarray(mean), atol=0.25)
    np.testing.assert_allclose(d.var(axis=0), np.asarray(var), rtol=0.35)


def test_fused_trajectory_custom_link_hook():
    """A callable link reproducing the built-in logistic family must match
    the built-in exactly (the pluggable eta -> (mu, ll) hook)."""
    X, y = _setup()

    def logistic_hook(eta, yv):
        return jax.nn.sigmoid(eta), yv * eta - jax.nn.softplus(eta)

    t_builtin = make_fused_trajectory(X, y, 10.0, EPS, L, block_chains=8,
                                      interpret=True, link="logistic")
    t_custom = make_fused_trajectory(X, y, 10.0, EPS, L, block_chains=8,
                                     interpret=True, link=logistic_hook)
    n_chains = 8
    Dp = t_builtin.dim_padded
    z0 = jnp.zeros((n_chains, Dp)).at[:, :D].set(
        0.1 * jax.random.normal(jax.random.PRNGKey(1), (n_chains, D)))
    p0 = jnp.zeros((n_chains, Dp)).at[:, :D].set(
        jax.random.normal(jax.random.PRNGKey(2), (n_chains, D)))
    zb, pb, ub = t_builtin(z0, p0)
    zc, pc, uc = t_custom(z0, p0)
    np.testing.assert_array_equal(np.asarray(zb), np.asarray(zc))
    np.testing.assert_array_equal(np.asarray(ub), np.asarray(uc))


def test_fused_trajectory_rt_matches_xla():
    """Runtime-eps/-mass fused trajectory equals the XLA leapfrog."""
    from mcmc_tpu.ops.fused_logreg import make_fused_trajectory_rt
    X, y = _setup()
    lk = models.logistic_regression_model(X, y, prior_scale=10.0)
    grad = jax.grad(lk)
    traj = make_fused_trajectory_rt(X, y, 10.0, L, block_chains=8,
                                    interpret=True)
    Dp = traj.dim_padded
    eps = 0.05
    im = np.ones(Dp, np.float32)
    im[:D] = np.linspace(0.5, 2.0, D)
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (16, D))
    p0 = jax.random.normal(jax.random.PRNGKey(2), (16, D))
    zp = jnp.zeros((16, Dp)).at[:, :D].set(z0)
    pp = jnp.zeros((16, Dp)).at[:, :D].set(p0)
    zf, pf, uf = traj(zp, pp, jnp.asarray(eps), jnp.asarray(im))

    def ref(z, p):
        imv = jnp.asarray(im[:D])
        for _ in range(L):
            p = p + 0.5 * eps * grad(z)
            z = z + eps * (imv * p)
            p = p + 0.5 * eps * grad(z)
        return z, p, -lk(z)

    zr, pr, ur = jax.vmap(ref)(z0, p0)
    np.testing.assert_allclose(np.asarray(zf[:, :D]), np.asarray(zr),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pf[:, :D]), np.asarray(pr),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ur),
                               rtol=1e-3, atol=2e-3)


def test_fused_trajectory_probit_and_studentt_links():
    """Probit (built-in, non-canonical) and Student-t (callable factory)
    links: fused-kernel gradient path matches jax.grad of the exact
    log-posterior, and the returned potential matches the exact U
    (interpret mode; bf16 matmul tolerance)."""
    from mcmc_tpu.ops.fused_logreg import make_fused_trajectory, studentt_link

    key = jax.random.PRNGKey(17)
    k1, k2 = jax.random.split(key)
    n, d = 48, 6
    X = jax.random.normal(k1, (n, d)) * 0.4

    def ndtr(eta):
        return 0.5 * (1.0 + jax.lax.erf(eta / jnp.sqrt(2.0)))

    cases = []
    # probit regression
    y_pro = (jax.random.uniform(k2, (n,)) < ndtr(X @ jnp.ones(d) * 0.5)
             ).astype(jnp.float32)

    def lk_probit(b):
        cdf = jnp.clip(ndtr(X @ b), 1e-30, 1.0 - 1e-7)
        return (jnp.sum(y_pro * jnp.log(cdf) + (1 - y_pro) * jnp.log(1 - cdf))
                - 0.5 * jnp.sum(b ** 2) / 100.0)
    cases.append(("probit", y_pro, lk_probit))

    # student-t robust regression, nu = 4
    y_t = X @ jnp.ones(d) + 0.3 * jax.random.t(k2, 4.0, (n,))

    def lk_t(b):
        r = y_t - X @ b
        return (jnp.sum(-0.5 * 5.0 * jnp.log1p(r * r / 4.0))
                - 0.5 * jnp.sum(b ** 2) / 100.0)
    cases.append((studentt_link(4.0), y_t, lk_t))

    for link, y, lk in cases:
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
        name = link if isinstance(link, str) else "studentt"
        np.testing.assert_allclose(np.asarray(z1[:, :d]), np.asarray(z),
                                   rtol=2e-2, atol=2e-2, err_msg=name)
        np.testing.assert_allclose(np.asarray(U1),
                                   np.asarray(-jax.vmap(lk)(z)),
                                   rtol=2e-2, atol=0.5, err_msg=name)


def test_fused_sampler_entry_points():
    """fused_glm_hmc / fused_gaussian_hmc return SamplerResults whose
    posteriors match the generic samplers (interpret mode, small shapes)."""
    from mcmc_tpu.ops import fused_glm_hmc, fused_gaussian_hmc
    import mcmc_tpu

    X, y = _setup()
    out = fused_glm_hmc(X, y, step_size=0.08, n_leap=5, n_chains=16,
                        n_burnin_draws=300, n_keep_draws=400,
                        key=jax.random.PRNGKey(3), block_chains=8,
                        interpret=True)
    assert out.draws.shape == (400, 16, D)
    assert 0.5 < float(out.diagnostics["accept_rate_per_chain"].mean()) <= 1.0
    lk = models.logistic_regression_model(X, y, prior_scale=10.0)
    ref = mcmc_tpu.hmc(jnp.zeros(D), lk,
                       mcmc_tpu.HMCSettings(n_burnin_draws=300,
                                            n_keep_draws=400,
                                            step_size=0.08, n_leap_steps=5),
                       n_chains=16, key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out.draws).mean(axis=(0, 1)),
                               np.asarray(ref.draws).mean(axis=(0, 1)),
                               atol=0.3)

    # ill-conditioned diagonal Gaussian: marginal variances recovered
    variances = jnp.array([1.0, 4.0, 25.0, 100.0])
    outg = fused_gaussian_hmc(1.0 / variances, step_size=0.8, n_leap=20,
                              n_chains=16, n_burnin_draws=200,
                              n_keep_draws=600, key=jax.random.PRNGKey(6),
                              block_chains=8, interpret=True)
    assert outg.draws.shape == (600, 16, 4)
    emp = np.asarray(outg.draws).reshape(-1, 4).var(axis=0)
    np.testing.assert_allclose(emp, np.asarray(variances), rtol=0.35)
