"""Compositional block-Gibbs tests.

Correctness anchors: an all-exact-conditional Gibbs chain on a correlated
bivariate normal must reproduce the exact posterior moments (the textbook
Gibbs sampler, so any bookkeeping error in the block/conditioning logic
shows up immediately); MH-within-Gibbs must be KS-exact on an independent
normal (the conditional equals the marginal there, so the per-block
kernels must be exactly invariant); mixed-method sweeps and bounded
targets check the composition and the constrained-space exact-block
contract.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _ks_stat_vs_normal(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    return max(d_plus, d_minus)


RHO = 0.8


def _biv_normal_lk(v):
    # N(0, [[1, rho], [rho, 1]])
    q = (v[0] ** 2 - 2 * RHO * v[0] * v[1] + v[1] ** 2) / (1 - RHO ** 2)
    return -0.5 * q


def test_exact_conditional_gibbs_bivariate_normal():
    """Both blocks draw the exact normal conditional x_i | x_j ~
    N(rho x_j, 1 - rho^2): the resulting chain is the textbook Gibbs
    sampler and must match the exact joint moments."""
    sd = math.sqrt(1 - RHO ** 2)

    def cond0(key, full):
        return (RHO * full[1]
                + sd * jax.random.normal(key, (1,), full.dtype))

    def cond1(key, full):
        return (RHO * full[0]
                + sd * jax.random.normal(key, (1,), full.dtype))

    out = mcmc_tpu.gibbs(
        jnp.zeros(2), _biv_normal_lk,
        mcmc_tpu.GibbsSettings(n_burnin_draws=200, n_keep_draws=2000),
        blocks=[([0], cond0), ([1], cond1)],
        n_chains=32, key=jax.random.PRNGKey(0))

    d = np.asarray(out.draws).reshape(-1, 2)
    cov = np.cov(d.T)
    assert abs(d.mean(axis=0)).max() < 0.05
    assert abs(cov[0, 0] - 1.0) < 0.08
    assert abs(cov[1, 1] - 1.0) < 0.08
    assert abs(cov[0, 1] - RHO) < 0.08
    # exact blocks always report accepted
    assert np.allclose(np.asarray(out.diagnostics["block_accept_rate"]),
                       1.0)
    assert out.diagnostics["block_methods"] == ["exact", "exact"]


@pytest.mark.parametrize("method,opts", [
    ("rwmh", {"scale": 2.4}),
    ("hmc", {"step_size": 0.7, "n_leap_steps": 3}),
    ("slice", {"w": 2.0}),
])
def test_mh_within_gibbs_exact_on_standard_normal(method, opts):
    """On an independent 2-d standard normal, each conditional equals the
    marginal N(0,1) — KS-test the pooled draws of both blocks."""
    out = mcmc_tpu.gibbs(
        jnp.zeros(2), lambda v: -0.5 * jnp.sum(v ** 2),
        mcmc_tpu.GibbsSettings(n_burnin_draws=500, n_keep_draws=3000),
        blocks=[([0], method, opts), ([1], method, opts)],
        n_chains=16, key=jax.random.PRNGKey(3))
    thin = 8 if method == "rwmh" else 4
    samples = np.asarray(out.draws)[::thin].reshape(-1)
    ks = _ks_stat_vs_normal(samples)
    assert ks < 1.95 / math.sqrt(len(samples)), (method, ks)


def test_mixed_methods_correlated_target():
    """hmc block + exact block on the correlated bivariate normal: the
    MH kernel must stay exact against the *moving* conditional."""
    sd = math.sqrt(1 - RHO ** 2)

    def cond1(key, full):
        return (RHO * full[0]
                + sd * jax.random.normal(key, (1,), full.dtype))

    out = mcmc_tpu.gibbs(
        jnp.zeros(2), _biv_normal_lk,
        mcmc_tpu.GibbsSettings(n_burnin_draws=400, n_keep_draws=3000),
        blocks=[([0], "hmc", {"step_size": 0.4, "n_leap_steps": 5}),
                ([1], cond1)],
        n_chains=32, key=jax.random.PRNGKey(5))
    d = np.asarray(out.draws).reshape(-1, 2)
    cov = np.cov(d.T)
    assert abs(d.mean(axis=0)).max() < 0.06
    assert abs(cov[0, 0] - 1.0) < 0.1
    assert abs(cov[0, 1] - RHO) < 0.1
    rate = np.asarray(out.diagnostics["block_accept_rate"])
    assert rate[:, 0].mean() > 0.6        # adapted hmc block
    assert np.allclose(rate[:, 1], 1.0)   # exact block


def test_gibbs_bounded_target():
    """Positive-bounded scale coordinate (exact conjugate conditional in
    constrained space) + free mean coordinate via rwmh: the Gibbs sweep
    must honor the box transform on both sides.

    Model: y_i ~ N(mu, 1), tau ~ unconstrained free; block 1 is
    tau | rest ~ Gamma(3, 1) drawn exactly (independent of mu, so the
    target factorizes: mu posterior N(ybar, 1/n), tau Gamma(3,1))."""
    y = jnp.asarray([0.3, -0.2, 0.5, 0.1], jnp.float32)
    n = y.shape[0]

    def lk(v):
        mu, tau = v[0], v[1]
        # log N(y | mu, 1) + log Gamma(tau; shape=3, rate=1)
        return (-0.5 * jnp.sum((y - mu) ** 2)
                + 2.0 * jnp.log(tau) - tau)

    def cond_tau(key, full):
        return jax.random.gamma(key, 3.0, (1,), full.dtype)

    s = mcmc_tpu.AlgoSettings(
        vals_bound=True,
        lower_bounds=jnp.asarray([-jnp.inf, 0.0]),
        upper_bounds=jnp.asarray([jnp.inf, jnp.inf]),
        gibbs_settings=mcmc_tpu.GibbsSettings(n_burnin_draws=400,
                                              n_keep_draws=2500),
    )
    out = mcmc_tpu.gibbs(
        jnp.asarray([0.0, 1.0]), lk, s,
        blocks=[([0], "rwmh", {"scale": 1.0}), ([1], cond_tau)],
        n_chains=16, key=jax.random.PRNGKey(7))
    d = np.asarray(out.draws).reshape(-1, 2)
    assert (d[:, 1] > 0).all()
    ybar = float(np.mean(np.asarray(y)))
    assert abs(d[:, 0].mean() - ybar) < 4.0 / math.sqrt(len(d) / 20) / \
        math.sqrt(n)
    # Gamma(3,1): mean 3, var 3
    assert abs(d[:, 1].mean() - 3.0) < 0.15
    assert abs(d[:, 1].var() - 3.0) < 0.5


def test_gibbs_determinism_and_resume():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    kw = dict(blocks=[([0, 1], "rwmh"), ([2], "slice")], n_chains=4,
              key=jax.random.PRNGKey(11))
    s = mcmc_tpu.GibbsSettings(n_burnin_draws=50, n_keep_draws=60)
    a = mcmc_tpu.gibbs(jnp.zeros(3), lk, s, **kw)
    b = mcmc_tpu.gibbs(jnp.zeros(3), lk, s, **kw)
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    r = mcmc_tpu.gibbs(jnp.zeros(3), lk, s, return_resume=True, **kw)
    r2 = r.diagnostics["resume"](jax.random.PRNGKey(12), 30)
    assert r2.draws.shape == (30, 4, 3)


def test_gibbs_block_validation():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    x0 = jnp.zeros(3)
    with pytest.raises(ValueError, match="missing"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1], "rwmh")])
    with pytest.raises(ValueError, match="overlap"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1], "rwmh"),
                                       ([1, 2], "rwmh")])
    with pytest.raises(ValueError, match="method"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1, 2], "nuts")])
    with pytest.raises(ValueError, match="out of range"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1, 3], "rwmh")])
    # unknown / misdirected per-block options raise instead of being
    # silently ignored (ADVICE r4)
    with pytest.raises(ValueError, match="step_sze"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1, 2], "hmc",
                                        {"step_sze": 0.1})])
    with pytest.raises(ValueError, match="scale"):
        mcmc_tpu.gibbs(x0, lk, blocks=[([0, 1, 2], "hmc",
                                        {"scale": 0.5})])
    with pytest.raises(ValueError, match="exact"):
        mcmc_tpu.gibbs(x0, lk, blocks=[
            ([0, 1, 2], lambda k, v: v, {"adapt": True})])


def test_gibbs_thin_and_dispatcher():
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    out = mcmc_tpu.sample(
        "gibbs", jnp.zeros(2), lk,
        mcmc_tpu.GibbsSettings(n_burnin_draws=50, n_keep_draws=40),
        blocks=[([0], "rwmh"), ([1], "rwmh")], n_chains=3, thin=3,
        key=jax.random.PRNGKey(13))
    assert out.draws.shape == (40, 3, 2)
    assert out.diagnostics["thin"] == 3
    assert np.asarray(out.diagnostics["block_accept_rate"]).shape == (3, 2)


def test_gibbs_checkpoint_matches_in_memory(tmp_path):
    """checkpoint_dir runs of the heterogeneous GibbsState (tuple of
    per-block kernel states incl. zero-size exact placeholders) must
    serialize, stream, and reproduce the in-memory draws bit-exactly."""
    sd = math.sqrt(1 - RHO ** 2)

    def cond1(key, full):
        return (RHO * full[0]
                + sd * jax.random.normal(key, (1,), full.dtype))

    s = mcmc_tpu.GibbsSettings(n_burnin_draws=60, n_keep_draws=120)
    kw = dict(blocks=[([0], "rwmh"), ([1], cond1)], n_chains=4,
              key=jax.random.PRNGKey(21))
    mem = mcmc_tpu.gibbs(jnp.zeros(2), _biv_normal_lk, s, **kw)
    ckpt = mcmc_tpu.gibbs(jnp.zeros(2), _biv_normal_lk, s,
                          checkpoint_dir=tmp_path / "run",
                          checkpoint_every=50, **kw)
    np.testing.assert_array_equal(np.asarray(mem.draws),
                                  np.asarray(ckpt.draws))
    np.testing.assert_array_equal(np.asarray(mem.n_accept_draws),
                                  np.asarray(ckpt.n_accept_draws))
    np.testing.assert_allclose(
        np.asarray(mem.diagnostics["block_accept_rate"]),
        np.asarray(ckpt.diagnostics["block_accept_rate"]), atol=1e-6)


def test_gibbs_mesh_sharded():
    """Chain-sharded Gibbs sweep over the 8-device mesh matches the
    unsharded run bit-exactly (GSPMD partitioning must not change the
    program semantics)."""
    from mcmc_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.GibbsSettings(n_burnin_draws=30, n_keep_draws=40)
    kw = dict(blocks=[([0, 1], "hmc", {"step_size": 0.5,
                                       "n_leap_steps": 2}),
                      ([2], "slice")],
              n_chains=16, key=jax.random.PRNGKey(23))
    plain = mcmc_tpu.gibbs(jnp.zeros(3), lk, s, **kw)
    sharded = mcmc_tpu.gibbs(jnp.zeros(3), lk, s, mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(plain.draws),
                                  np.asarray(sharded.draws))
