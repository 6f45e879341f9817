"""Pytree parameter front-end: structured models flattened onto the
flat-vector sampler API and draws unflattened back."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _structured_model(x_data):
    """{mu, log_sigma} Gaussian model — the reference's mean/scale example
    (examples/eigen/hmc_normal.cpp) with named parameters."""
    def log_kernel(p):
        sigma = jnp.exp(p["log_sigma"])
        n = x_data.shape[0]
        return (-n * p["log_sigma"]
                - 0.5 * jnp.sum((x_data - p["mu"]) ** 2) / sigma**2)
    return log_kernel


def test_ravel_model_matches_flat_run_bitwise():
    """The flat view of a structured model must run IDENTICALLY to the
    hand-flattened model (same key -> same draws): the wrapper is a
    reshape, not a reparameterization."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(0), (50,))
    tree_lk = _structured_model(x)
    init = {"log_sigma": jnp.asarray(0.0), "mu": jnp.asarray(1.0)}

    x0, lk, unravel = mcmc_tpu.ravel_model(init, tree_lk)
    assert x0.shape == (2,)

    # hand-flattened equivalent in ravel_pytree's (alphabetical key) order
    def flat_lk(v):
        return tree_lk({"log_sigma": v[0], "mu": v[1]})

    s = mcmc_tpu.HMCSettings(step_size=0.05, n_leap_steps=8,
                             n_burnin_draws=100, n_keep_draws=200)
    a = mcmc_tpu.hmc(x0, lk, s, key=jax.random.PRNGKey(1))
    b = mcmc_tpu.hmc(jnp.array([0.0, 1.0]), flat_lk, s,
                     key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    # structure restored with leading draw axes
    tree = mcmc_tpu.unravel_draws(a.draws, unravel)
    assert set(tree) == {"mu", "log_sigma"}
    assert tree["mu"].shape == (200,)
    assert float(tree["mu"].mean()) == pytest.approx(float(x.mean()),
                                                     abs=0.15)


def test_unravel_draws_multi_axis_and_matrix_leaf():
    """(draws, chains, d) unravels leaf-wise including a matrix leaf."""
    init = {"A": jnp.zeros((2, 3)), "b": jnp.zeros(2)}
    x0, _, unravel = mcmc_tpu.ravel_model(init)
    assert x0.shape == (8,)
    draws = jnp.arange(5 * 4 * 8, dtype=jnp.float32).reshape(5, 4, 8)
    tree = mcmc_tpu.unravel_draws(draws, unravel)
    assert tree["A"].shape == (5, 4, 2, 3)
    assert tree["b"].shape == (5, 4, 2)
    # round trip: re-flattening row 0,0 gives the original row
    re_flat, _ = jax.flatten_util.ravel_pytree(
        jax.tree_util.tree_map(lambda a: a[0, 0], tree))
    np.testing.assert_array_equal(np.asarray(re_flat),
                                  np.asarray(draws[0, 0]))


def test_bounds_like_positional_alignment():
    """Per-leaf bounds flatten in the same order as the parameters; a
    bounded run keeps the constrained leaf inside its bound."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(2), (60,))

    def tree_lk(p):   # sigma sampled directly, must stay > 0
        n = x.shape[0]
        return (-n * jnp.log(p["sigma"])
                - 0.5 * jnp.sum((x - p["mu"]) ** 2) / p["sigma"]**2)[0]

    init = {"mu": jnp.ones(1), "sigma": jnp.ones(1)}
    x0, lk, unravel = mcmc_tpu.ravel_model(init, tree_lk)
    lb = mcmc_tpu.bounds_like(init, {"mu": None, "sigma": 1e-6},
                              default=-jnp.inf)
    ub = mcmc_tpu.bounds_like(init, {"mu": None, "sigma": None},
                              default=jnp.inf)
    assert lb.shape == (2,) and np.isinf(np.asarray(lb)).sum() == 1

    s = mcmc_tpu.AlgoSettings(vals_bound=True, lower_bounds=lb,
                              upper_bounds=ub)
    s.rwmh_settings.par_scale = 0.3
    s.rwmh_settings.n_burnin_draws = 300
    s.rwmh_settings.n_keep_draws = 600
    out = mcmc_tpu.rwmh(x0, lk, s, key=jax.random.PRNGKey(3))
    tree = mcmc_tpu.unravel_draws(out.draws, unravel)
    assert (np.asarray(tree["sigma"]) > 0).all()
    assert float(tree["mu"].mean()) == pytest.approx(float(x.mean()),
                                                     abs=0.2)


def test_pytree_validation_errors():
    with pytest.raises(TypeError, match="callable"):
        mcmc_tpu.ravel_model({"a": jnp.zeros(2)}, "not-a-function")
    with pytest.raises(ValueError, match="prefix"):
        mcmc_tpu.bounds_like({"a": jnp.zeros(2)}, {"b": 0.0},
                             default=-jnp.inf)


def test_coerce_model_approximator_surfaces():
    """Dict-parameterized models run directly through pathfinder / advi /
    svgd / map_laplace / thermo_evidence; results carry `unravel` where
    draws come back flat."""
    from mcmc_tpu.pytree import unravel_draws

    init = {"mu": jnp.zeros(2), "log_s": jnp.asarray(0.0)}

    def lk(p):
        return (-0.5 * jnp.sum((p["mu"] - 1.0) ** 2)
                - 0.5 * (p["log_s"] + 0.5) ** 2)

    lap = mcmc_tpu.map_laplace(init, lk, n_steps=400,
                               key=jax.random.PRNGKey(40))
    mode = unravel_draws(lap.mode[None], lap.unravel)
    assert abs(float(mode["mu"][0, 0]) - 1.0) < 0.05
    assert abs(float(mode["log_s"][0]) + 0.5) < 0.05

    pf = mcmc_tpu.pathfinder(init, lk, n_paths=2, n_draws=200,
                             key=jax.random.PRNGKey(41))
    tree = unravel_draws(pf.draws, pf.unravel)
    assert tree["mu"].shape == (200, 2)
    assert abs(float(tree["mu"].mean()) - 1.0) < 0.2

    av = mcmc_tpu.advi(init, lk, n_steps=600, key=jax.random.PRNGKey(42))
    d = unravel_draws(av.draw(jax.random.PRNGKey(43), 500), av.unravel)
    assert abs(float(d["log_s"].mean()) + 0.5) < 0.2

    sv = mcmc_tpu.svgd(init, lk, n_particles=64, n_steps=400,
                       key=jax.random.PRNGKey(44))
    t2 = unravel_draws(sv.particles, sv.unravel)
    assert t2["mu"].shape == (64, 2)

    lp = lambda p: (-0.5 * jnp.sum(p["mu"] ** 2)
                    - jnp.asarray(1.5) * jnp.log(2 * jnp.pi)
                    - 0.5 * p["log_s"] ** 2)
    ll = lambda p: -0.5 * jnp.sum((p["mu"] - 1.0) ** 2)
    s = mcmc_tpu.AlgoSettings()
    s.evidence_settings = mcmc_tpu.EvidenceSettings(
        n_burnin_draws=100, n_keep_draws=200, n_temps=6)
    ev = mcmc_tpu.thermo_evidence(init, lp, ll, s, n_chains=4,
                                  key=jax.random.PRNGKey(45))
    assert np.isfinite(float(ev.log_z))
