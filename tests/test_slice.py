"""Univariate slice-within-Gibbs — KS-exactness on the standard normal,
scale robustness (the point of the algorithm), bounded targets, and the
usual determinism/composition/validation battery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

import mcmc_tpu


def test_ks_exact_standard_normal():
    """Pooled slice draws from N(0,1) pass a Kolmogorov-Smirnov test:
    slice sampling has no step-size bias — the draw set is exact."""
    s = mcmc_tpu.SliceSettings(n_burnin_draws=200, n_keep_draws=500)
    out = mcmc_tpu.slice_sampler(jnp.zeros(1),
                                 lambda x: -0.5 * jnp.sum(x**2), s,
                                 n_chains=16, key=jax.random.PRNGKey(0),
                                 thin=2)
    d = np.asarray(out.draws).ravel()
    assert float(out.accept_rate.mean()) == 1.0
    # thinned + pooled over chains: near-independent; alpha = 0.001
    assert sps.kstest(d, "norm").pvalue > 0.001


def test_scale_robustness_wrong_w():
    """w wrong by 30x in either direction still samples N(0, 4) exactly —
    the self-tuning claim; only mean_kernel_evals changes."""
    lk = lambda x: -0.5 * jnp.sum(x**2) / 4.0
    evals = {}
    for w in (0.1, 3.0, 60.0):
        # the narrow w needs a larger stepping-out budget to span the
        # slice (m-limited stepping out stays exact but mixes like a
        # short random walk when m*w << the slice width)
        s = mcmc_tpu.SliceSettings(w=w, n_burnin_draws=200,
                                   n_keep_draws=1500,
                                   max_step_out=64 if w < 1 else 8)
        out = mcmc_tpu.slice_sampler(jnp.zeros(1), lk, s, n_chains=16,
                                     key=jax.random.PRNGKey(1))
        d = np.asarray(out.draws)
        assert float(out.accept_rate.mean()) == 1.0, w
        assert float(d.mean()) == pytest.approx(0.0, abs=0.1), w
        assert float(d.var()) == pytest.approx(4.0, rel=0.1), w
        evals[w] = float(np.asarray(
            out.diagnostics["mean_kernel_evals"]).mean())
    assert evals[0.1] > evals[3.0]   # too-narrow w pays stepping-out evals


def test_correlated_gaussian_moments():
    """2-d correlated Gaussian: coordinate-wise sweeps still recover the
    full covariance (slower mixing, unchanged stationary law)."""
    P = jnp.asarray(np.linalg.inv([[1.0, 0.8], [0.8, 1.0]]), jnp.float32)
    lk = lambda x: -0.5 * x @ (P @ x)
    s = mcmc_tpu.SliceSettings(n_burnin_draws=300, n_keep_draws=2500)
    out = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s, n_chains=16,
                                 key=jax.random.PRNGKey(2))
    d = np.asarray(out.draws).reshape(-1, 2)
    assert np.allclose(np.cov(d.T), [[1.0, 0.8], [0.8, 1.0]], atol=0.08)


def test_bounded_halfline():
    """Lower bound 0 on the N(1,1) target: truncated-normal mean 1.2876
    through the same transform stack as every chain sampler."""
    s = mcmc_tpu.AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.slice_settings.n_burnin_draws = 300
    s.slice_settings.n_keep_draws = 1500
    out = mcmc_tpu.slice_sampler(jnp.ones(1) * 0.5,
                                 lambda x: -0.5 * jnp.sum((x - 1.0) ** 2),
                                 s, n_chains=16, key=jax.random.PRNGKey(3))
    d = np.asarray(out.draws)
    assert (d > 0).all()
    assert float(d.mean()) == pytest.approx(1.2876, abs=0.04)


def test_determinism_composition_validation(tmp_path):
    lk = lambda x: -0.5 * jnp.sum(x**2)
    s = mcmc_tpu.SliceSettings(n_burnin_draws=20, n_keep_draws=40)
    a = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s, n_chains=4,
                               key=jax.random.PRNGKey(7))
    b = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s, n_chains=4,
                               key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    out = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s, n_chains=4,
                                 key=jax.random.PRNGKey(8), thin=2,
                                 checkpoint_dir=tmp_path / "ck")
    assert out.draws.shape == (40, 4, 2)
    assert float(out.accept_rate.mean()) == 1.0

    r = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s,
                               key=jax.random.PRNGKey(9),
                               return_resume=True)
    r2 = r.diagnostics["resume"](jax.random.PRNGKey(10), 15)
    assert r2.draws.shape == (15, 2)

    with pytest.raises(ValueError, match="w "):
        mcmc_tpu.slice_sampler(jnp.zeros(2), lk,
                               mcmc_tpu.SliceSettings(w=-1.0))
    with pytest.raises(ValueError, match="max_step_out"):
        mcmc_tpu.slice_sampler(jnp.zeros(2), lk,
                               mcmc_tpu.SliceSettings(max_step_out=0))
    with pytest.raises(ValueError, match="max_shrink_steps"):
        mcmc_tpu.slice_sampler(jnp.zeros(2), lk,
                               mcmc_tpu.SliceSettings(max_shrink_steps=0))

    out = mcmc_tpu.sample(
        "slice", jnp.zeros(1), lk,
        mcmc_tpu.SliceSettings(n_burnin_draws=5, n_keep_draws=10),
        key=jax.random.PRNGKey(0))
    assert out.draws.shape == (10, 1)


def test_impossible_target_caps_out():
    """log_kernel == -inf everywhere: every coordinate caps out, the chain
    stays finite and in place, accept_rate == 0."""
    s = mcmc_tpu.SliceSettings(n_burnin_draws=0, n_keep_draws=5,
                               max_shrink_steps=4)
    out = mcmc_tpu.slice_sampler(jnp.ones(2), lambda x: jnp.asarray(-jnp.inf),
                                 s, key=jax.random.PRNGKey(4))
    d = np.asarray(out.draws)
    assert np.isfinite(d).all()
    assert float(out.accept_rate) == 0.0


def test_adapt_w_cuts_evals_on_ill_scaled_target():
    """adapt_w learns per-dimension widths from burn-in: on diag(1, 400)
    the fixed w=1 bracket pays ~log2(50) stepping-out evals on the wide
    coordinate every draw; the adapted w_i ~ 2.5 sd_i removes them at
    unchanged posterior moments."""
    lk = lambda x: -0.5 * (x[0] ** 2 + x[1] ** 2 / 400.0)
    s = mcmc_tpu.SliceSettings(w=1.0, max_step_out=64,
                               n_burnin_draws=400, n_keep_draws=1500)
    runs = {}
    for aw in (False, True):
        out = mcmc_tpu.slice_sampler(jnp.zeros(2), lk, s, n_chains=16,
                                     key=jax.random.PRNGKey(12),
                                     adapt_w=aw, pooled_adaptation=aw)
        d = np.asarray(out.draws).reshape(-1, 2)
        assert float(out.accept_rate.mean()) == 1.0, aw
        assert float(d[:, 1].var()) == pytest.approx(400.0, rel=0.15), aw
        assert float(d[:, 0].var()) == pytest.approx(1.0, rel=0.15), aw
        runs[aw] = out
    ev_fixed = float(np.asarray(
        runs[False].diagnostics["mean_kernel_evals"]).mean())
    ev_adapt = float(np.asarray(
        runs[True].diagnostics["mean_kernel_evals"]).mean())
    assert ev_adapt < 0.6 * ev_fixed, (ev_fixed, ev_adapt)
    w_hat = np.asarray(runs[True].diagnostics["adapted_w"]).mean(axis=0)
    assert w_hat[1] / w_hat[0] == pytest.approx(20.0, rel=0.35)
