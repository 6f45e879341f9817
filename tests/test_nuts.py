"""NUTS tests: statistical parity with the reference example target
(reference examples/eigen/nuts_normal.cpp), correctness of the masked
iterative tree against hand-checkable targets, and adaptation behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models, diagnostics


def test_nuts_standard_normal():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=1500, n_adapt_draws=500)
    out = mcmc_tpu.nuts(jnp.zeros(3), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert d.shape == (1500, 8, 3)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.1)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.15)
    # dual averaging should land near the target accept rate (0.55 default,
    # reference mcmc_structs.hpp:90)
    acc = np.asarray(out.diagnostics["accept_stat"])  # (n_keep, chains)
    assert 0.4 < acc.mean() < 0.95
    rhat = diagnostics.split_rhat(out.draws)
    assert np.all(np.asarray(rhat) < 1.05)


def test_nuts_mean_scale_example():
    """Reference examples/eigen/nuts_normal.cpp: defaults, (mu, sigma) model."""
    key = jax.random.PRNGKey(11)
    x = 2.0 + 2.0 * jax.random.normal(key, (1000,))
    log_kernel = models.gaussian_mean_scale_model(x)

    settings = mcmc_tpu.AlgoSettings(rng_seed_value=4)
    settings.nuts_settings.n_burnin_draws = 1000
    settings.nuts_settings.n_keep_draws = 1000
    settings.nuts_settings.n_adapt_draws = 1000

    out = mcmc_tpu.nuts(jnp.array([3.0, 3.0]), log_kernel, settings)
    mean = np.asarray(out.mean)
    xd = np.asarray(x)
    assert mean[0] == pytest.approx(xd.mean(), abs=0.2)
    assert mean[1] == pytest.approx(xd.std(), abs=0.2)
    assert int(out.n_accept_draws) > 0


def test_nuts_correlated_gaussian():
    """2-d correlated Gaussian: NUTS must recover the covariance."""
    rho = 0.8
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)
    log_kernel = lambda v: -0.5 * v @ prec @ v

    s = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=2000, n_adapt_draws=500)
    out = mcmc_tpu.nuts(jnp.zeros(2), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(5))
    d = np.asarray(out.draws).reshape(-1, 2)
    emp_cov = np.cov(d.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.15)


def test_nuts_tree_depth_bounded():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.NUTSSettings(
        n_burnin_draws=100, n_keep_draws=200, n_adapt_draws=100, max_tree_depth=4
    )
    out = mcmc_tpu.nuts(jnp.zeros(2), log_kernel, s, n_chains=4,
                        key=jax.random.PRNGKey(1))
    depth = np.asarray(out.diagnostics["tree_depth"])
    assert depth.max() <= 4
    assert depth.min() >= 1


def test_nuts_divergence_detection():
    """A pathological target (huge curvature wall) must register divergences
    rather than crash (reference guard Delta_max = 1000, nuts.ipp:124)."""
    log_kernel = lambda v: jnp.where(v[0] < 1.0, -0.5 * jnp.sum(v**2), -1e8)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=50, n_keep_draws=100, n_adapt_draws=50)
    out = mcmc_tpu.nuts(jnp.zeros(2), log_kernel, s, n_chains=4,
                        key=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out.draws)).all()
    assert int(np.asarray(out.diagnostics["n_divergent"]).sum()) > 0


def test_nuts_mass_matrix_adaptation_ill_conditioned():
    """Windowed diagonal mass adaptation must learn the scales of an
    ill-conditioned Gaussian (variances 1..1e4) and beat the unadapted
    sampler decisively on effective draws."""
    log_kernel = models.ill_conditioned_gaussian(8, condition_number=1e4)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=700, n_keep_draws=500,
                              n_adapt_draws=700)

    out = mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(0),
                        adapt_mass_matrix=True, pooled_adaptation=True)
    inv_mass = np.asarray(out.diagnostics["inv_mass_diag"])  # (chains, dim)
    true_var = np.asarray(log_kernel.variances)
    # learned inverse mass tracks the marginal variances within ~3x
    ratio = inv_mass[0] / true_var
    assert (ratio > 0.3).all() and (ratio < 3.0).all(), ratio

    d = np.asarray(out.draws)
    emp_var = d.reshape(-1, 8).var(axis=0)
    np.testing.assert_allclose(emp_var / true_var, 1.0, atol=0.5)

    from mcmc_tpu import diagnostics as diag
    ess_adapted = float(np.asarray(diag.ess(out.draws)).min())

    out0 = mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s, n_chains=8,
                         key=jax.random.PRNGKey(0))
    ess_plain = float(np.asarray(diag.ess(out0.draws)).min())
    assert ess_adapted > 3 * ess_plain, (ess_adapted, ess_plain)


def test_nuts_banana():
    """BASELINE banana target: curved ridge; NUTS must recover the known
    marginal moments E[x1]=0, Var[x1]=sigma^2, E[x2]=0."""
    b, sigma = 0.1, 3.0
    log_kernel = models.banana_model(b=b, sigma=sigma)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=800, n_keep_draws=1500,
                              n_adapt_draws=800, target_accept_rate=0.8)
    out = mcmc_tpu.nuts(jnp.zeros(2), log_kernel, s, n_chains=16,
                        key=jax.random.PRNGKey(3), adapt_mass_matrix=True)
    d = np.asarray(out.draws).reshape(-1, 2)
    # x1 ~ N(0, sigma^2); x2 = b*(x1^2 - sigma^2) + N(0,1) -> E[x2] = 0
    assert abs(d[:, 0].mean()) < 0.4
    assert d[:, 0].var() == pytest.approx(sigma**2, rel=0.3)
    assert abs(d[:, 1].mean()) < 0.5


def test_nuts_dense_mass_correlated_gaussian():
    """Dense mass adaptation must learn the full covariance of a strongly
    correlated Gaussian and beat the diagonal metric on min-ESS."""
    rho = 0.95
    dim = 6
    cov = (1 - rho) * np.eye(dim) + rho * np.ones((dim, dim))
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    log_kernel = lambda v: -0.5 * v @ prec @ v

    s = mcmc_tpu.NUTSSettings(n_burnin_draws=800, n_keep_draws=600,
                              n_adapt_draws=800)
    out_dense = mcmc_tpu.nuts(jnp.zeros(dim), log_kernel, s, n_chains=8,
                              key=jax.random.PRNGKey(0),
                              adapt_mass_matrix="dense", pooled_adaptation=True)
    out_diag = mcmc_tpu.nuts(jnp.zeros(dim), log_kernel, s, n_chains=8,
                             key=jax.random.PRNGKey(0),
                             adapt_mass_matrix="diag", pooled_adaptation=True)

    # learned Sigma tracks the true covariance
    sigma = np.asarray(out_dense.diagnostics["inv_mass_diag"])
    # (for dense mode the diagnostic holds the full matrix per chain)
    assert sigma.shape[-2:] == (dim, dim)
    np.testing.assert_allclose(sigma[0], cov, atol=0.35)

    from mcmc_tpu import diagnostics as diag
    ess_dense = float(np.asarray(diag.ess(out_dense.draws)).min())
    ess_diag = float(np.asarray(diag.ess(out_diag.draws)).min())
    assert ess_dense > 1.5 * ess_diag, (ess_dense, ess_diag)

    d = np.asarray(out_dense.draws).reshape(-1, dim)
    emp = np.cov(d.T)
    np.testing.assert_allclose(emp, cov, atol=0.4)


# ---------------------------------------------------------------------------
# Tree equivalence: iterative masked subtree vs a direct port of the
# reference recursion (nuts.ipp:99-241), stubbed RNG. The compared outputs
# (leaf count n, stop flag s, traversal endpoint, alpha sum, leaf count
# n_alpha, divergence flag) are RNG-independent: only the proposal choice
# consumes randomness, and it does not feed back into the tree walk.
# ---------------------------------------------------------------------------

def _reference_build_tree(v, eps, log_u, prev_H, z, r, depth,
                          potential, kinetic, leapfrog1):
    """Test-local port of the reference's recursive nuts_build_tree
    (nuts.ipp:99-241). Returns a dict of the subtree summary. The proposal
    swap (nuts.ipp:213-218) is stubbed out (draw recorded as None) since the
    compared quantities do not depend on it."""
    if depth == 0:
        z1, r1 = leapfrog1(z, r, v * eps)
        U = float(potential(z1))
        if not np.isfinite(U):
            U = np.inf
        K = float(kinetic(r1))
        H = U + K
        n = int(log_u <= -H)
        s = int(log_u < 1000.0 - H)
        alpha = float(np.exp(min(0.0, -H + prev_H)))
        return {
            "pos": (z1, r1), "neg": (z1, r1), "n": n, "s": s,
            "alpha": alpha, "n_alpha": 1, "div": s == 0,
        }

    first = _reference_build_tree(v, eps, log_u, prev_H, z, r, depth - 1,
                                  potential, kinetic, leapfrog1)
    if first["s"] != 1:
        return first

    # extend from the outer end of the first half (nuts.ipp:186-216)
    start = first["neg"] if v == -1 else first["pos"]
    second = _reference_build_tree(v, eps, log_u, prev_H, start[0], start[1],
                                   depth - 1, potential, kinetic, leapfrog1)

    pos = first["pos"] if v == -1 else second["pos"]
    neg = second["neg"] if v == -1 else first["neg"]
    span = pos[0] - neg[0]
    check1 = float(np.dot(span, neg[1])) >= 0.0
    check2 = float(np.dot(span, pos[1])) >= 0.0
    return {
        "pos": pos, "neg": neg,
        "n": first["n"] + second["n"],
        "s": int(second["s"] * check1 * check2),
        "alpha": first["alpha"] + second["alpha"],
        "n_alpha": first["n_alpha"] + second["n_alpha"],
        "div": first["div"] or second["div"],
    }


def test_subtree_matches_reference_recursion():
    """The iterative masked subtree must agree with the recursion port on
    (n, s, endpoint, alpha, n_alpha, div) over random Gaussian targets,
    depths 0..4, both directions — 100 random cases."""
    from mcmc_tpu.samplers.nuts import make_subtree_builder
    from mcmc_tpu import integrators

    max_depth = 4
    rng = np.random.default_rng(0)
    n_checked = 0
    n_stopped = 0
    for case in range(100):
        dim = int(rng.integers(1, 5))
        scales = jnp.asarray(np.exp(rng.normal(0.0, 1.0, dim)), jnp.float32)

        def logk(z, scales=scales):
            return -0.5 * jnp.sum((z / scales) ** 2)

        grad_fn = jax.grad(logk)

        def potential(z):
            u = -logk(z)
            return jnp.where(jnp.isfinite(u), u, jnp.inf)

        def kinetic(r, inv_mass=None):
            return 0.5 * jnp.dot(r, r)

        def leapfrog1(z, r, eps, inv_mass=None):
            return integrators.leapfrog(grad_fn, lambda p: p, eps, 1, z, r)

        build = make_subtree_builder(potential, kinetic, leapfrog1, max_depth)

        z0 = jnp.asarray(rng.normal(0.0, 1.0, dim), jnp.float32)
        r0 = jnp.asarray(rng.normal(0.0, 1.0, dim), jnp.float32)
        # eps large enough that U-turns/divergences actually happen
        eps = jnp.asarray(float(np.exp(rng.uniform(np.log(0.05), np.log(2.0)))),
                          jnp.float32)
        H0 = float(potential(z0) + kinetic(r0))
        log_u = jnp.asarray(float(np.log(rng.uniform())) - H0, jnp.float32)
        depth = int(rng.integers(0, max_depth + 1))
        v = float(rng.choice([-1.0, 1.0]))

        # alpha baseline = prev_U + prev_K = H0 (src/nuts.cpp:236-249)
        out = build(jax.random.PRNGKey(case), jnp.asarray(depth, jnp.int32),
                    jnp.asarray(v, jnp.float32), z0, r0, eps, log_u,
                    jnp.asarray(H0, jnp.float32), dim, jnp.float32)

        ref = _reference_build_tree(
            v, eps, float(log_u), H0, z0, r0, depth,
            potential, kinetic,
            lambda z, r, e: leapfrog1(z, r, e),
        )

        assert int(out["n"]) == ref["n"], (case, int(out["n"]), ref["n"])
        assert int(out["s"]) == ref["s"], (case, int(out["s"]), ref["s"])
        assert int(out["n_alpha"]) == ref["n_alpha"], case
        assert bool(out["div"]) == ref["div"], case
        np.testing.assert_allclose(float(out["alpha"]), ref["alpha"],
                                   rtol=1e-4, atol=1e-5, err_msg=str(case))
        # traversal endpoint = the subtree's outer end in direction v
        end = ref["neg"] if v == -1 else ref["pos"]
        np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(end[0]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(case))
        np.testing.assert_allclose(np.asarray(out["r"]), np.asarray(end[1]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(case))
        n_checked += 1
        if ref["s"] == 0:
            n_stopped += 1

    assert n_checked == 100
    # the case mix must actually exercise U-turn/divergence stopping
    assert 10 < n_stopped < 95, n_stopped


def test_nuts_depth_budget():
    """adapt_depth: warmup learns a shared tree-depth cap; the sampling
    phase never exceeds it, and posterior moments stay correct."""
    log_kernel = models.ill_conditioned_gaussian(8, condition_number=1e3)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=500,
                              n_adapt_draws=500)
    out = mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(0), adapt_mass_matrix=True,
                        pooled_adaptation=True, adapt_depth=True)
    cap = np.asarray(out.diagnostics["depth_cap"])
    assert (cap == cap[0]).all()          # pooled: one shared budget
    assert 1 <= cap[0] <= 10
    depth = np.asarray(out.diagnostics["tree_depth"])
    assert depth.max() <= cap[0]
    d = np.asarray(out.draws).reshape(-1, 8)
    ratio = d.var(axis=0) / np.asarray(log_kernel.variances)
    assert (ratio > 0.5).all() and (ratio < 1.6).all()


def test_nuts_warmup_tree_depth_cap():
    """warmup_tree_depth: capping the doubling budget during the FIRST
    half of warmup (the mis-adapted expensive phase) leaves the adapted
    step size, learned depth budget, and posterior intact — the histogram
    half and sampling run the full budget."""
    log_kernel = models.ill_conditioned_gaussian(8, condition_number=1e3)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=500,
                              n_adapt_draws=500)
    kw = dict(n_chains=8, key=jax.random.PRNGKey(0), adapt_mass_matrix=True,
              pooled_adaptation=True, adapt_depth=True)
    base = mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s, **kw)
    capped = mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s,
                           warmup_tree_depth=3, **kw)
    eps_b = float(np.asarray(base.diagnostics["step_size"])[-1].mean())
    eps_c = float(np.asarray(capped.diagnostics["step_size"])[-1].mean())
    assert abs(np.log(eps_c / eps_b)) < 0.7    # same adapted regime
    d = np.asarray(capped.draws).reshape(-1, 8)
    ratio = d.var(axis=0) / np.asarray(log_kernel.variances)
    assert (ratio > 0.5).all() and (ratio < 1.6).all()
    with pytest.raises(ValueError, match="warmup_tree_depth"):
        mcmc_tpu.nuts(jnp.zeros(8), log_kernel, s,
                      warmup_tree_depth=0, **kw)


def test_nuts_eight_schools_exact_posterior():
    """Eight-schools (half-Cauchy tau): the endpoint tree variant must match
    the exact 2-d quadrature posterior E[mu]=4.397, E[tau]=3.589 (theta
    marginalizes analytically: y_i ~ N(mu, sigma_i^2 + tau^2)). The
    reference-shaped tree (tree_variant="reference") is measurably biased
    high on tau — that quirk restarts each doubling from the current draw
    rather than the tree endpoint (src/nuts.cpp:242-255)."""
    lk = models.eight_schools_model(non_centered=True,
                                    tau_prior="half_cauchy")
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=1500, n_keep_draws=3000,
                              n_adapt_draws=1500, target_accept_rate=0.9)
    out = mcmc_tpu.nuts(jnp.zeros(10), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(1), adapt_mass_matrix=True)
    d = np.asarray(out.draws)
    mu = float(d[..., 0].mean())
    tau = float(np.exp(d[..., 1]).mean())
    assert mu == pytest.approx(4.397, abs=0.35), mu
    assert tau == pytest.approx(3.589, abs=0.45), tau
    # modern diagnostics pass on a correctly converged run
    summ = diagnostics.summary(out.draws)
    assert float(np.asarray(summ["rhat_rank"]).max()) < 1.02
    assert float(np.asarray(summ["ess_tail"]).min()) > 400


def test_nuts_multinomial_matches_exact_posterior():
    """sample_method='multinomial' (Betancourt 2017 Boltzmann-weighted
    leaves, the modern-Stan construction) must match the exact eight-schools
    posterior and sample a correlated Gaussian's covariance correctly."""
    rho = 0.8
    prec = jnp.linalg.inv(jnp.array([[1.0, rho], [rho, 1.0]]))
    lk = lambda v: -0.5 * v @ prec @ v
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=500, n_keep_draws=2000,
                              n_adapt_draws=500)
    out = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(5),
                        sample_method="multinomial")
    d = np.asarray(out.draws).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(d.T),
                               [[1.0, rho], [rho, 1.0]], atol=0.12)

    lk8 = models.eight_schools_model(non_centered=True,
                                     tau_prior="half_cauchy")
    s8 = mcmc_tpu.NUTSSettings(n_burnin_draws=1200, n_keep_draws=2500,
                               n_adapt_draws=1200, target_accept_rate=0.9)
    out8 = mcmc_tpu.nuts(jnp.zeros(10), lk8, s8, n_chains=8,
                         key=jax.random.PRNGKey(1), adapt_mass_matrix=True,
                         sample_method="multinomial")
    d8 = np.asarray(out8.draws)
    assert float(d8[..., 0].mean()) == pytest.approx(4.397, abs=0.4)
    assert float(np.exp(d8[..., 1]).mean()) == pytest.approx(3.589, abs=0.5)

    with pytest.raises(ValueError, match="multinomial"):
        mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                      key=jax.random.PRNGKey(0),
                      sample_method="multinomial", tree_variant="reference")


def test_nuts_static_sampling_depth():
    """static_sampling_depth=True rebuilds the sampling kernel with the
    learned depth budget as the static tree size (the round-3 straggler
    lever, 2x draws/s on the flagship): posterior still exact, depth_cap
    reported, and realized sampling-phase depths never exceed it."""
    cov = np.array([[1.0, 0.5], [0.5, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    lk = lambda x: -0.5 * x @ prec @ x
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=400, n_keep_draws=800,
                              n_adapt_draws=400, target_accept_rate=0.65)
    out = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(4), pooled_adaptation=True,
                        adapt_mass_matrix=True, adapt_depth=True,
                        static_sampling_depth=True)
    d = np.asarray(out.draws)
    assert d.shape == (800, 8, 2)
    cap = int(np.asarray(out.diagnostics["depth_cap"]).max())
    assert 1 <= cap <= 10
    assert int(np.asarray(out.diagnostics["tree_depth"]).max()) <= cap
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.15)
    emp = np.cov(d.reshape(-1, 2).T)
    np.testing.assert_allclose(emp, cov, atol=0.25)

    # guard rails
    with pytest.raises(ValueError, match="requires adapt_depth"):
        mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                      key=jax.random.PRNGKey(0), static_sampling_depth=True)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                      key=jax.random.PRNGKey(0), adapt_depth=True,
                      static_sampling_depth=True, checkpoint_dir="/tmp/x")
    s_bad = mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=100,
                                  n_adapt_draws=200)
    with pytest.raises(ValueError, match="n_adapt_draws"):
        mcmc_tpu.nuts(jnp.zeros(2), lk, s_bad, n_chains=4,
                      key=jax.random.PRNGKey(0), adapt_depth=True,
                      static_sampling_depth=True)
