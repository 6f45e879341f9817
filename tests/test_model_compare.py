"""WAIC / PSIS-LOO model comparison — validated against closed forms.

The conjugate normal model has an EXACT leave-one-out predictive density,
so PSIS-LOO is checked against truth (not just self-consistency); the GPD
fitter is checked on synthetic Pareto tails with known shape.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_tpu import model_compare as mc


def _norm_logpdf(y, mu, var):
    return -0.5 * (np.log(2 * np.pi * var) + (y - mu) ** 2 / var)


def _conjugate_setup(seed=0, n_obs=30, tau2=100.0, sig2=1.0, S=8000):
    """y_i ~ N(theta, sig2), theta ~ N(0, tau2). Returns (y, log_lik draws
    (S, n_obs), exact LOO elpd)."""
    rng = np.random.default_rng(seed)
    theta_true = 1.3
    y = theta_true + rng.standard_normal(n_obs) * math.sqrt(sig2)

    def posterior(ys):
        n = len(ys)
        prec = 1.0 / tau2 + n / sig2
        mu = (ys.sum() / sig2) / prec
        return mu, 1.0 / prec

    mu_n, v_n = posterior(y)
    draws = mu_n + math.sqrt(v_n) * rng.standard_normal(S)
    log_lik = _norm_logpdf(y[None, :], draws[:, None], sig2)   # (S, n_obs)

    exact = 0.0
    for i in range(n_obs):
        mu_i, v_i = posterior(np.delete(y, i))
        exact += _norm_logpdf(y[i], mu_i, v_i + sig2)
    return y, jnp.asarray(log_lik, jnp.float32), float(exact)


def test_gpd_fit_recovers_shape():
    """Zhang-Stephens fit on synthetic GPD exceedances recovers (k, sigma).
    Inverse-CDF sampling: x = sigma/k * ((1-u)^-k - 1)."""
    rng = np.random.default_rng(3)
    for k_true, sig_true in ((0.3, 1.0), (0.1, 2.0), (0.7, 0.5)):
        u = rng.uniform(size=4000)
        x = sig_true / k_true * ((1 - u) ** (-k_true) - 1.0)
        x = np.sort(x)
        k, sig = mc.gpd_fit(jnp.asarray(x, jnp.float32))
        assert float(k) == pytest.approx(k_true, abs=0.08), (k_true, float(k))
        assert float(sig) == pytest.approx(sig_true, rel=0.15)


def test_psis_loo_matches_exact_loo():
    """PSIS-LOO elpd on the conjugate normal matches the closed-form LOO
    predictive within MC error; p_eff ~ the 1 free parameter; all k small."""
    _, ll, exact = _conjugate_setup()
    out = mc.psis_loo(ll)
    assert float(out["elpd"]) == pytest.approx(exact, abs=0.25)
    assert 0.3 < float(out["p_eff"]) < 2.0
    assert out["pareto_k"].shape == (30,)
    assert float(out["pareto_k"].max()) < 0.7
    # chain-shaped input (n_draws, n_chains, n_obs) gives the same answer
    out3 = mc.psis_loo(ll.reshape(2000, 4, 30))
    assert float(out3["elpd"]) == pytest.approx(float(out["elpd"]), abs=1e-3)


def test_waic_agrees_with_loo():
    """For a well-specified regular model WAIC ~= PSIS-LOO (asymptotically
    equal; Vehtari et al. 2017 §2.2)."""
    _, ll, exact = _conjugate_setup(seed=1)
    w, l = mc.waic(ll), mc.psis_loo(ll)
    assert float(w["elpd"]) == pytest.approx(float(l["elpd"]), abs=0.1)
    assert float(w["elpd"]) == pytest.approx(exact, abs=0.3)
    assert float(w["p_eff"]) == pytest.approx(float(l["p_eff"]), abs=0.3)
    assert float(w["se"]) == pytest.approx(float(l["se"]), rel=0.2)


def test_compare_ranks_and_separates():
    """compare() puts the correct model first with a decisive paired SE:
    model B scores the data under a fixed wrong parameter (theta = -2)."""
    y, ll_a, _ = _conjugate_setup(seed=2)
    S = ll_a.shape[0]
    ll_b = jnp.broadcast_to(
        jnp.asarray(_norm_logpdf(y, -2.0, 1.0), jnp.float32)[None, :],
        (S, len(y)))
    res = mc.compare({"good": mc.psis_loo(ll_a), "bad": mc.waic(ll_b)})
    assert [r["name"] for r in res] == ["good", "bad"]
    assert res[0]["elpd_diff"] == 0.0 and res[0]["rank"] == 0
    assert res[1]["elpd_diff"] > 2.0 * res[1]["se_diff"] > 0.0

    with pytest.raises(ValueError, match="at least two"):
        mc.compare({"only": mc.waic(ll_a)})
    short = {"pointwise": jnp.zeros(7)}
    with pytest.raises(ValueError, match="same data"):
        mc.compare({"a": mc.waic(ll_a), "b": short})


def test_pointwise_log_lik_layouts():
    draws2 = jnp.linspace(-1, 1, 12).reshape(6, 2)
    fn = lambda th: -0.5 * (jnp.array([0.3, -0.4, 1.0]) - th.sum()) ** 2
    out2 = mc.pointwise_log_lik(draws2, fn)
    assert out2.shape == (6, 3)
    draws3 = draws2.reshape(3, 2, 2)
    out3 = mc.pointwise_log_lik(draws3, fn)
    assert out3.shape == (3, 2, 3)
    np.testing.assert_allclose(np.asarray(out3.reshape(6, 3)),
                               np.asarray(out2), rtol=1e-6)
    with pytest.raises(ValueError, match="2-D or 3-D"):
        mc.pointwise_log_lik(jnp.zeros(4), fn)


def test_psis_loo_small_sample_raises():
    with pytest.raises(ValueError, match="more draws"):
        mc.psis_loo(jnp.zeros((20, 4)))


def test_psis_loo_flags_influential_point():
    """An extreme outlier's LOO importance ratios are heavy-tailed: its
    pareto_k must be the largest and exceed the well-specified points'."""
    rng = np.random.default_rng(5)
    n_obs, S = 20, 6000
    y = rng.standard_normal(n_obs)
    y[7] = 9.0                        # gross outlier under N(theta, 1)
    tau2, sig2 = 100.0, 1.0
    prec = 1 / tau2 + n_obs / sig2
    mu_n, v_n = (y.sum() / sig2) / prec, 1 / prec
    draws = mu_n + math.sqrt(v_n) * rng.standard_normal(S)
    ll = jnp.asarray(_norm_logpdf(y[None, :], draws[:, None], sig2),
                     jnp.float32)
    out = mc.psis_loo(ll)
    k = np.asarray(out["pareto_k"])
    assert int(k.argmax()) == 7
    assert k[7] > np.delete(k, 7).max() + 0.1


def test_psis_degenerate_tails():
    """Degenerate-tail semantics (review regression):

    - a tied block spanning the tail cutoff must NOT produce NaN k;
    - a column whose importance mass sits in one dominating draw reports
      pareto_k = +inf (maximally unreliable -> 'k > 0.7' always fires);
    - an exactly-flat column reports pareto_k = 0 (benign).
    """
    rng = np.random.default_rng(0)
    S = 1000
    # col 0: 200 draws tied at the top, rest below -> exceedances contain 0s
    tied = np.concatenate([rng.normal(-3.0, 0.1, S - 200), np.zeros(200)])
    # col 1: one draw with ll so low its LOO ratio dominates everything
    dominated = rng.normal(0.0, 0.1, S)
    dominated[0] = -200.0
    # col 2: exactly flat
    flat = np.full(S, -1.0)
    ll = jnp.asarray(np.stack([tied, dominated, flat], axis=1), jnp.float32)
    out = mc.psis_loo(ll)
    k = np.asarray(out["pareto_k"])
    assert not np.any(np.isnan(k)), k
    assert np.isfinite(k[0]), k
    assert k[1] == np.inf, k
    assert k[2] == 0.0, k
    assert (k > 0.7)[1] and not (k > 0.7)[2]
    pw = np.asarray(out["pointwise"])
    assert np.isfinite(pw[0]) and np.isfinite(pw[2])
