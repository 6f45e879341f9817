"""Simulation-based calibration harness: a calibrated sampler produces
uniform ranks (chi-squared p-value comfortably above rejection), a broken
one is flagged, and the protocol validations fire."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models

# mu ~ N(1, 2^2), x_i ~ N(mu, 1): the conjugate generative model whose
# posterior gaussian_mean_model targets exactly
_PRIOR = lambda k: 1.0 + 2.0 * jax.random.normal(k, (1,))
_SIM = lambda k, th: th[0] + jax.random.normal(k, (40,))


def _rwmh_sampler(n_burnin, par_scale, start):
    def run(k, data):
        out = mcmc_tpu.rwmh(jnp.array([start]),
                            models.gaussian_mean_model(data),
                            mcmc_tpu.RWMHSettings(n_burnin_draws=n_burnin,
                                                  n_keep_draws=256,
                                                  par_scale=par_scale),
                            key=k)
        return out.draws
    return run


def test_calibrated_sampler_uniform_ranks():
    r = mcmc_tpu.sbc(jax.random.PRNGKey(0), _PRIOR, _SIM,
                     _rwmh_sampler(300, 0.4, 1.0),
                     n_sims=60, n_rank_draws=31, thin=8, n_bins=8)
    assert r["ranks"].shape == (60, 1)
    assert r["ranks"].min() >= 0 and r["ranks"].max() <= 31
    assert r["p_value"][0] > 0.01, (r["p_value"], r["chi2"])


def test_broken_sampler_flagged():
    """No burn-in, far start, tiny proposal: the rank histogram piles at
    the edges and the chi-squared test rejects decisively."""
    r = mcmc_tpu.sbc(jax.random.PRNGKey(0), _PRIOR, _SIM,
                     _rwmh_sampler(0, 0.02, 8.0),
                     n_sims=60, n_rank_draws=31, thin=8, n_bins=8)
    assert r["p_value"][0] < 1e-4, r["p_value"]


def test_protocol_validation():
    good = _rwmh_sampler(10, 0.4, 1.0)
    with pytest.raises(ValueError, match="n_bins"):
        mcmc_tpu.sbc(jax.random.PRNGKey(0), _PRIOR, _SIM, good,
                     n_sims=2, n_rank_draws=31, n_bins=7)
    with pytest.raises(ValueError, match="need n_rank_draws"):
        mcmc_tpu.sbc(jax.random.PRNGKey(0), _PRIOR, _SIM, good,
                     n_sims=1, n_rank_draws=31, thin=32, n_bins=8)
