"""Unit tests: diagnostics (R-hat, ESS, streaming moments), density helpers,
pooled NUTS adaptation, and float64 operation."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import diagnostics, stats


def test_rhat_iid_near_one():
    draws = jax.random.normal(jax.random.PRNGKey(0), (2000, 8, 3))
    r = np.asarray(diagnostics.split_rhat(draws))
    assert (r < 1.02).all()


def test_rhat_detects_disagreement():
    key = jax.random.PRNGKey(1)
    draws = jax.random.normal(key, (1000, 4, 2))
    shift = jnp.arange(4.0)[None, :, None]
    r = np.asarray(diagnostics.split_rhat(draws + shift))
    assert (r > 1.5).all()


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient rho has tau = (1+rho)/(1-rho)."""
    rho = 0.7
    n, m = 20000, 4
    rng = np.random.default_rng(0)
    x = np.zeros((n, m, 1), np.float64)
    innov = rng.normal(size=(n, m, 1)) * math.sqrt(1 - rho**2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + innov[t]
    ess = float(np.asarray(diagnostics.ess(jnp.asarray(x, jnp.float32)))[0])
    expected = n * m * (1 - rho) / (1 + rho)
    assert ess == pytest.approx(expected, rel=0.2)


def test_ess_iid_near_sample_size():
    """iid chains must report ESS ~ n*m (the pre-fix formula dropped rho_0
    from the Geyer pairing and reported ~4.9x the sample size)."""
    n, m = 2000, 8
    draws = jax.random.normal(jax.random.PRNGKey(7), (n, m, 3))
    e = np.asarray(diagnostics.ess(draws))
    assert (e > 0.7 * n * m).all()
    assert (e < 1.3 * n * m).all()


def test_rank_normalized_diagnostics():
    n, m = 1000, 8
    draws = jax.random.normal(jax.random.PRNGKey(3), (n, m, 2))
    # iid: rank R-hat ~ 1, bulk/tail ESS near sample size
    r = np.asarray(diagnostics.rank_normalized_rhat(draws))
    assert (r < 1.01).all()
    assert (np.asarray(diagnostics.bulk_ess(draws)) > 0.5 * n * m).all()
    assert (np.asarray(diagnostics.tail_ess(draws)) > 0.3 * n * m).all()
    # a heavy-tailed scale mismatch between chains is invisible to the
    # classical split R-hat of the mean but caught by the folded/rank form
    scales = jnp.array([1.0, 1.0, 1.0, 1.0, 3.0, 3.0, 3.0, 3.0])
    bad = draws * scales[None, :, None]
    r_bad = np.asarray(diagnostics.rank_normalized_rhat(bad))
    assert (r_bad > 1.05).all()


def test_hdi_and_quantile_summary():
    """hdi() matches the known normal 94% HDI (symmetric: ±1.88), prefers
    the mode side on a skewed exponential (lower bound at ~0, tighter than
    the central interval), and summary() carries q5/q50/q95 + HDI keys."""
    key = jax.random.PRNGKey(7)
    n, m = 4000, 4
    normal = jax.random.normal(key, (n, m, 1))
    lo, hi = np.asarray(diagnostics.hdi(normal, 0.94))
    assert lo[0] == pytest.approx(-1.881, abs=0.12)
    assert hi[0] == pytest.approx(1.881, abs=0.12)

    expo = jax.random.exponential(key, (n, m, 1))
    lo_e, hi_e = np.asarray(diagnostics.hdi(expo, 0.90))
    assert lo_e[0] < 0.05            # HDI hugs the mode at 0
    assert hi_e[0] == pytest.approx(2.30, abs=0.25)
    # strictly narrower than the equal-tailed 90% interval [0.051, 3.00]
    q = np.quantile(np.asarray(expo).ravel(), [0.05, 0.95])
    assert (hi_e[0] - lo_e[0]) < (q[1] - q[0])

    s = diagnostics.summary(normal)
    for k in ("q5", "q50", "q95", "hdi_low", "hdi_high"):
        assert k in s, k
    assert float(np.asarray(s["q50"])[0]) == pytest.approx(0.0, abs=0.05)
    assert float(np.asarray(s["q95"])[0]) == pytest.approx(1.645, abs=0.1)


def test_ess_ar1_rank_normalized_consistent():
    """bulk_ess should roughly agree with plain ess for a Gaussian AR(1)."""
    rho = 0.5
    n, m = 8000, 4
    rng = np.random.default_rng(1)
    x = np.zeros((n, m, 1), np.float64)
    innov = rng.normal(size=(n, m, 1)) * math.sqrt(1 - rho**2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + innov[t]
    xj = jnp.asarray(x, jnp.float32)
    e_plain = float(np.asarray(diagnostics.ess(xj))[0])
    e_bulk = float(np.asarray(diagnostics.bulk_ess(xj))[0])
    assert e_bulk == pytest.approx(e_plain, rel=0.25)


def test_streaming_moments_match_batch():
    draws = jax.random.normal(jax.random.PRNGKey(2), (500, 6, 3)) \
        + jnp.arange(3.0)
    m = diagnostics.moments_init(6, 3)

    def body(m, x):
        return diagnostics.moments_update(m, x), None

    m, _ = jax.lax.scan(body, m, draws)
    mean, var = diagnostics.moments_finalize(m)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(draws.mean(axis=0)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(draws.var(axis=0, ddof=1)),
                               rtol=1e-4, atol=1e-4)
    r_stream = np.asarray(diagnostics.moments_rhat(m))
    assert (np.abs(r_stream - 1.0) < 0.05).all()


def test_dnorm_and_dmvnorm():
    x = jnp.array([0.3, -1.2])
    # dnorm vs formula
    v = float(stats.dnorm(jnp.asarray(0.5), 1.0, 2.0, log=True))
    expect = -0.5 * math.log(2 * math.pi) - math.log(2.0) - 0.5 * ((0.5 - 1.0) / 2.0) ** 2
    assert v == pytest.approx(expect, rel=1e-5)
    # dmvnorm: full matrix path equals diagonal path for a diagonal sigma
    diag = jnp.array([2.0, 3.0])
    full = jnp.diag(diag)
    a = float(stats.dmvnorm(x, jnp.zeros(2), diag, log=True))
    b = float(stats.dmvnorm(x, jnp.zeros(2), full, log=True))
    assert a == pytest.approx(b, rel=1e-5)
    # non-log form matches exp
    c = float(stats.dmvnorm(x, jnp.zeros(2), diag, log=False))
    assert c == pytest.approx(math.exp(a), rel=1e-5)


def test_nuts_pooled_adaptation_shares_step_size():
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=100, n_adapt_draws=100)
    out = mcmc_tpu.nuts(jnp.zeros(3), log_kernel, s, n_chains=8,
                        key=jax.random.PRNGKey(0), pooled_adaptation=True)
    step_sizes = np.asarray(out.diagnostics["step_size"])  # (n_keep, chains)
    # one shared trajectory: all chains identical at every draw
    assert (step_sizes == step_sizes[:, :1]).all()
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.25)


def test_samplers_run_in_float64():
    with jax.enable_x64():
        log_kernel = lambda v: -0.5 * jnp.sum(v**2)
        out = mcmc_tpu.rwmh(jnp.zeros(2, jnp.float64), log_kernel,
                            mcmc_tpu.RWMHSettings(n_burnin_draws=100,
                                                  n_keep_draws=200, par_scale=1.5),
                            key=jax.random.PRNGKey(0))
        assert out.draws.dtype == jnp.float64
        assert abs(float(out.draws.mean())) < 0.5

        out2 = mcmc_tpu.hmc(jnp.zeros(2, jnp.float64), log_kernel,
                            mcmc_tpu.HMCSettings(n_burnin_draws=50, n_keep_draws=100,
                                                 step_size=0.5, n_leap_steps=3),
                            key=jax.random.PRNGKey(1))
        assert out2.draws.dtype == jnp.float64


def test_ess_chain_chunk_identical():
    """Chunked-FFT ESS (bounded workspace for huge chain batches) is
    numerically identical to the one-shot estimator, incl. through
    bulk/tail ESS."""
    from mcmc_tpu import diagnostics
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (200, 16, 3))
    # add autocorrelation so tau is nontrivial
    x = x.at[1:].add(0.7 * x[:-1])
    for fn in (diagnostics.ess, diagnostics.bulk_ess, diagnostics.tail_ess):
        a = np.asarray(fn(x))
        b = np.asarray(fn(x, chain_chunk=4))
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=fn.__name__)
    with pytest.raises(ValueError, match="chain_chunk"):
        diagnostics.ess(x, chain_chunk=5)
