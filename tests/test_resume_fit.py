"""Warm continuation (return_resume) and fit run-until-converged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import NUTSSettings, StretchSettings


def _gauss2(rho=0.5):
    cov = np.array([[1.0, rho], [rho, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    return lambda x: -0.5 * x @ prec @ x


def test_nuts_resume_continues_warm():
    """resume(key, n) yields more draws from the adapted kernel: shapes are
    right, the step size matches the adapted one (no re-warmup), and the
    combined sample still matches the target moments."""
    lk = _gauss2()
    s = NUTSSettings(n_burnin_draws=300, n_keep_draws=200, n_adapt_draws=300)
    out = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                        key=jax.random.PRNGKey(0), pooled_adaptation=True,
                        adapt_mass_matrix=True, return_resume=True)
    assert "resume" in out.diagnostics
    out2 = out.diagnostics["resume"](jax.random.PRNGKey(1), 300)
    assert out2.draws.shape == (300, 4, 2)
    assert "resume" in out2.diagnostics        # chainable
    # step size is the frozen adapted value, not a fresh warmup trace
    np.testing.assert_allclose(np.asarray(out2.diagnostics["step_size"][0]),
                               np.asarray(out.diagnostics["step_size"][-1]),
                               rtol=1e-6)
    alldraws = np.concatenate([np.asarray(out.draws), np.asarray(out2.draws)])
    np.testing.assert_allclose(alldraws.mean(axis=(0, 1)), 0.0, atol=0.2)
    emp = np.cov(alldraws.reshape(-1, 2).T)
    assert emp[0, 1] == pytest.approx(0.5, abs=0.2)


@pytest.mark.parametrize("algo", ["rwmh", "mala", "hmc", "pt", "rmhmc"])
def test_resume_all_chain_samplers(algo):
    """Every chain sampler supports return_resume: the continuation produces
    correctly-shaped draws whose pooled mean stays near the target's."""
    lk = _gauss2(0.0)
    kwargs = {"n_chains": 4, "key": jax.random.PRNGKey(7),
              "return_resume": True}
    settings_by = {
        "rwmh": mcmc_tpu.RWMHSettings(n_burnin_draws=200, n_keep_draws=100,
                                      par_scale=1.5),
        "mala": mcmc_tpu.MALASettings(n_burnin_draws=200, n_keep_draws=100,
                                      step_size=0.8),
        "hmc": mcmc_tpu.HMCSettings(n_burnin_draws=200, n_keep_draws=100,
                                    step_size=0.5),
        "pt": mcmc_tpu.PTSettings(n_burnin_draws=200, n_keep_draws=100),
        "rmhmc": mcmc_tpu.RMHMCSettings(n_burnin_draws=100, n_keep_draws=50,
                                        step_size=0.4),
    }
    fn = getattr(mcmc_tpu, algo)
    args = (jnp.zeros(2), lk)
    if algo == "rmhmc":
        args = (jnp.zeros(2), lk, lambda v: jnp.eye(2))
    out = fn(*args, settings_by[algo], **kwargs)
    n2 = 50
    out2 = out.diagnostics["resume"](jax.random.PRNGKey(8), n2)
    assert out2.draws.shape == (n2, 4, 2)
    assert "resume" in out2.diagnostics
    pooled = np.concatenate([np.asarray(out.draws), np.asarray(out2.draws)])
    np.testing.assert_allclose(pooled.mean(axis=(0, 1)), 0.0, atol=0.4)


def test_resume_checkpoint_dir_conflict(tmp_path):
    lk = _gauss2()
    with pytest.raises(ValueError, match="return_resume"):
        mcmc_tpu.stretch(jnp.zeros(2), lk,
                         StretchSettings(n_walkers=8, n_keep_draws=10),
                         key=jax.random.PRNGKey(0), return_resume=True,
                         checkpoint_dir=str(tmp_path))


def test_fit_until_min_ess():
    """fit(min_ess=...) extends in warm segments until the bulk-ESS gate
    passes; draws concatenate across segments and the outcome is recorded."""
    lk = _gauss2()
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="chees", n_chains=16,
                       n_warmup=300, n_draws=150, key=jax.random.PRNGKey(2),
                       min_ess=2500, max_rounds=6)
    rounds = int(out.diagnostics["n_rounds"])
    assert out.diagnostics["converged"]
    assert rounds >= 2                          # 150x16 draws can't hit 2500
    assert out.draws.shape == (150 * rounds, 16, 2)
    assert float(np.asarray(out.diagnostics["summary"]["ess_bulk"]).min()) \
        >= 2500


def test_fit_until_max_rounds_cap():
    """An unreachable gate stops at max_rounds with converged=False."""
    lk = _gauss2()
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="stretch", n_chains=8,
                       n_warmup=200, n_draws=100, key=jax.random.PRNGKey(3),
                       min_ess=1e9, max_rounds=2)
    assert int(out.diagnostics["n_rounds"]) == 2
    assert not out.diagnostics["converged"]
    assert out.draws.shape[0] == 200


def test_fit_slice_with_bounds_and_convergence_gate():
    """fit(algorithm='slice'): derivative-free per-coordinate self-tuning
    path — converges on the truncated normal with box bounds and attaches
    the summary."""
    lk = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    out = mcmc_tpu.fit(jnp.ones(1) * 0.5, lk, algorithm="slice",
                       n_chains=8, n_warmup=200, n_draws=300,
                       key=jax.random.PRNGKey(5),
                       lower_bounds=jnp.zeros(1),
                       rhat_target=1.01, max_rounds=4)
    assert out.diagnostics["converged"]
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert float(d.mean()) == pytest.approx(1.2876, abs=0.05)
    assert "summary" in out.diagnostics

    with pytest.raises(ValueError, match="requires blocks"):
        mcmc_tpu.fit(jnp.zeros(1), lk, algorithm="gibbs")
    with pytest.raises(ValueError, match="fit algorithm"):
        mcmc_tpu.fit(jnp.zeros(1), lk, algorithm="nope")
    with pytest.raises(ValueError, match="gibbs-only"):
        mcmc_tpu.fit(jnp.zeros(1), lk, algorithm="slice",
                     blocks=[([0], "rwmh")])


def test_fit_gibbs_blocks():
    """fit(algorithm='gibbs', blocks=...) (VERDICT r4 item 8b): the
    compositional layer is reachable from the one-call surface with
    per-block adaptation defaults, convergence gates, and summary."""
    # modest correlation: coordinate-wise Gibbs random-walks along the
    # correlation direction, so rho=0.6 needs far more draws to pass the
    # gate — not the point of this routing test
    A = jnp.asarray([[1.0, 0.3], [0.3, 1.0]])
    P = jnp.linalg.inv(A)
    lk = lambda v: -0.5 * v @ (P @ v)
    out = mcmc_tpu.fit(
        jnp.zeros(2), lk, algorithm="gibbs",
        blocks=[([0], "hmc", {"step_size": 0.3}), ([1], "rwmh")],
        n_chains=16, n_warmup=300, n_draws=500,
        key=jax.random.PRNGKey(9), rhat_target=1.02, max_rounds=4)
    assert out.diagnostics["converged"]
    assert "summary" in out.diagnostics
    d = np.asarray(out.draws).reshape(-1, 2)
    assert np.abs(d.mean(axis=0)).max() < 0.12
    assert abs(np.cov(d.T)[0, 1] - 0.3) < 0.15
    assert list(out.diagnostics["block_methods"]) == ["hmc", "rwmh"]

    # fit's target_accept threads into adapted MH blocks (not silently
    # dropped), and dense_mass raises like the other unsupported branches
    out2 = mcmc_tpu.fit(
        jnp.zeros(2), lk, algorithm="gibbs",
        blocks=[([0, 1], "rwmh")], n_chains=8, n_warmup=150, n_draws=150,
        key=jax.random.PRNGKey(3), target_accept=0.6)
    rate = float(np.asarray(
        out2.diagnostics["block_accept_rate"]).mean())
    assert 0.4 < rate < 0.8          # adapted toward 0.6, not 0.234
    with pytest.raises(ValueError, match="dense mass"):
        mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="gibbs",
                     blocks=[([0, 1], "rwmh")], dense_mass=True)


def test_fit_hmc_and_mala_adapted():
    """fit(algorithm='hmc'|'mala') (VERDICT r2 item 8): adapted step size +
    learned mass/preconditioner converge on the correlated Gaussian."""
    lk = _gauss2()
    for algo, kw in [("hmc", dict(n_leap_steps=8)), ("mala", {}),
                     ("ghmc", {})]:
        out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm=algo, n_chains=16,
                           n_warmup=400, n_draws=400,
                           key=jax.random.PRNGKey(7), **kw)
        d = np.asarray(out.draws)
        assert d.shape == (400, 16, 2)
        np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.2)
        emp = np.cov(d.reshape(-1, 2).T)
        assert emp[0, 1] == pytest.approx(0.5, abs=0.2), algo
        assert "summary" in out.diagnostics
        assert "adapted_step_size" in out.diagnostics
        # adapted runs must actually move
        acc = float(np.asarray(out.n_accept_draws).mean()) / 400
        assert 0.3 < acc <= 1.0, (algo, acc)


def test_fit_pytree_model():
    """fit accepts a parameter pytree directly: initial values as a dict,
    bounds as pytree prefixes, unravel attached (VERDICT r2 item 8)."""
    x = 2.0 + 0.5 * jax.random.normal(jax.random.PRNGKey(0), (200,))

    def lk_tree(p):
        return (-0.5 * jnp.sum((x - p["mu"]) ** 2) / p["sigma"] ** 2
                - 200 * jnp.log(p["sigma"]) - 0.5 * p["mu"] ** 2 / 100.0)

    out = mcmc_tpu.fit({"mu": jnp.array(0.0), "sigma": jnp.array(1.0)},
                       lk_tree, algorithm="nuts", n_chains=8,
                       n_warmup=300, n_draws=300, key=jax.random.PRNGKey(9),
                       lower_bounds={"mu": None, "sigma": 0.0})
    assert out.draws.shape == (300, 8, 2)
    unravel = out.diagnostics["unravel"]
    tree = mcmc_tpu.unravel_draws(out.draws, unravel)
    assert set(tree) == {"mu", "sigma"}
    assert tree["mu"].shape == (300, 8)
    assert float(tree["mu"].mean()) == pytest.approx(2.0, abs=0.15)
    assert float(tree["sigma"].mean()) == pytest.approx(0.5, abs=0.1)
    assert bool((tree["sigma"] > 0).all())     # bound respected


def test_fit_checkpoint_convergence_gate(tmp_path):
    """fit(checkpoint_dir=..., min_ess=...) composes (VERDICT r2 item 4):
    extension rounds re-enter the same directory with a grown total (the
    chunked runner continues the stream), gates evaluate the full sink, and
    the summary is computed from the memmap."""
    lk = _gauss2()
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="chees", n_chains=16,
                       n_warmup=300, n_draws=150, key=jax.random.PRNGKey(2),
                       min_ess=2500, max_rounds=6,
                       checkpoint_dir=tmp_path / "fitck",
                       )
    rounds = int(out.diagnostics["n_rounds"])
    assert out.diagnostics["converged"]
    assert rounds >= 2                          # 150x16 draws can't hit 2500
    assert out.draws.shape == (150 * rounds, 16, 2)
    assert float(np.asarray(out.diagnostics["summary"]["ess_bulk"]).min()) \
        >= 2500
    # the sink holds exactly the final stream
    from mcmc_tpu.runtime import read_draws
    sunk = np.asarray(read_draws(tmp_path / "fitck" / "draws.bin"))
    np.testing.assert_array_equal(sunk, np.asarray(out.draws))


def test_fit_thin_passthrough():
    lk = _gauss2()
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="chees", n_chains=16,
                       n_warmup=200, n_draws=100, thin=3,
                       key=jax.random.PRNGKey(4))
    assert out.draws.shape == (100, 16, 2)
    assert int(out.diagnostics["thin"]) == 3


def test_fit_mclmc_and_mams():
    """fit(algorithm='mclmc'|'mams'): the microcanonical family through the
    one-call surface, with convergence gates."""
    lk = _gauss2()
    for algo in ("mclmc", "mams"):
        out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm=algo, n_chains=32,
                           n_warmup=400, n_draws=400,
                           key=jax.random.PRNGKey(9),
                           rhat_target=1.05, max_rounds=3)
        d = np.asarray(out.draws)
        assert d.shape[1:] == (32, 2)
        np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.2)
        emp = np.cov(d.reshape(-1, 2).T)
        assert emp[0, 1] == pytest.approx(0.5, abs=0.2), algo
        assert "summary" in out.diagnostics
        assert bool(out.diagnostics["converged"])
    with pytest.raises(ValueError, match="diagonal"):
        mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="mclmc", n_chains=8,
                     dense_mass=True, key=jax.random.PRNGKey(0))


def test_fit_pt_multimodal():
    """fit(algorithm='pt'): one-call multimodal fit — the cold chain
    visits both modes of a separated mixture (a plain fit would stick)."""
    lk = lambda v: jnp.logaddexp(-0.5 * jnp.sum((v - 3.0) ** 2) / 0.25,
                                 -0.5 * jnp.sum((v + 3.0) ** 2) / 0.25)
    out = mcmc_tpu.fit(jnp.zeros(2), lk, algorithm="pt", n_chains=8,
                       n_warmup=500, n_draws=1000,
                       key=jax.random.PRNGKey(30))
    d = np.asarray(out.draws).reshape(-1, 2)
    frac = (d[:, 0] > 0).mean()
    assert 0.2 < frac < 0.8, frac            # both modes occupied
    assert float(np.asarray(
        out.diagnostics["round_trip_rate"]).mean()) > 0.0
    assert "summary" in out.diagnostics
