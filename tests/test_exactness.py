"""Distributional exactness: Kolmogorov-Smirnov tests of each MH-corrected
sampler against the standard normal — a stronger correctness check than
moment matching (it exercises the accept rules, incl. the reference's
min(0.01, .) clamp which still caps acceptance probability at 1, so the
chains must be *exactly* invariant for N(0, 1))."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _ks_stat_vs_normal(x):
    """KS statistic of samples against the standard normal CDF."""
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    return max(d_plus, d_minus)


def _thinned_samples(draws, thin):
    d = np.asarray(draws)[::thin]          # thin to cut autocorrelation
    return d.reshape(-1)


LOG_KERNEL = lambda v: -0.5 * jnp.sum(v**2)


@pytest.mark.parametrize("name", ["rwmh", "mala", "hmc"])
def test_sampler_exact_on_standard_normal(name):
    if name == "rwmh":
        out = mcmc_tpu.rwmh(jnp.zeros(1), LOG_KERNEL,
                            mcmc_tpu.RWMHSettings(n_burnin_draws=500,
                                                  n_keep_draws=4000, par_scale=2.4),
                            n_chains=16, key=jax.random.PRNGKey(0))
        thin = 8
    elif name == "mala":
        out = mcmc_tpu.mala(jnp.zeros(1), LOG_KERNEL,
                            mcmc_tpu.MALASettings(n_burnin_draws=500,
                                                  n_keep_draws=4000, step_size=1.2),
                            n_chains=16, key=jax.random.PRNGKey(1))
        thin = 6
    else:
        out = mcmc_tpu.hmc(jnp.zeros(1), LOG_KERNEL,
                           mcmc_tpu.HMCSettings(n_burnin_draws=500,
                                                n_keep_draws=4000, step_size=0.7,
                                                n_leap_steps=3),
                           n_chains=16, key=jax.random.PRNGKey(2))
        thin = 4

    samples = _thinned_samples(out.draws[:, :, 0], thin)
    n = len(samples)
    ks = _ks_stat_vs_normal(samples)
    # 0.1% critical value ~ 1.95/sqrt(n); thinned draws are near-independent
    # but allow 2x headroom for residual autocorrelation
    assert ks < 2 * 1.95 / math.sqrt(n), (name, ks, n)


def test_nuts_exact_on_standard_normal():
    out = mcmc_tpu.nuts(jnp.zeros(1), LOG_KERNEL,
                        mcmc_tpu.NUTSSettings(n_burnin_draws=500,
                                              n_keep_draws=4000, n_adapt_draws=500),
                        n_chains=16, key=jax.random.PRNGKey(3))
    samples = _thinned_samples(out.draws[:, :, 0], 4)
    ks = _ks_stat_vs_normal(samples)
    assert ks < 2 * 1.95 / math.sqrt(len(samples)), (ks, len(samples))
