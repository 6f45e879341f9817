"""generated_quantities / posterior_predictive: deterministic mapping,
stochastic predictive validated against the exact conjugate predictive law,
pytree outputs, chunked (batch_size) equivalence, and SamplerResult input."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


def _mu_draws():
    """RWMH draws of mu for the conjugate normal-mean model (prior
    N(1, 4), likelihood sd 1) — posterior and predictive are closed-form."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(0), (100,))
    out = mcmc_tpu.rwmh(jnp.array([1.0]), models.gaussian_mean_model(x),
                        mcmc_tpu.RWMHSettings(n_burnin_draws=500,
                                              n_keep_draws=2000,
                                              par_scale=0.3),
                        n_chains=8, key=jax.random.PRNGKey(1))
    n = 100
    post_var = 1.0 / (n + 0.25)
    post_mean = (x.sum() + 0.25) / (n + 0.25)
    return out, float(post_mean), float(post_var)


def test_deterministic_mapping_matches_direct():
    out, _, _ = _mu_draws()
    gq = mcmc_tpu.generated_quantities(out, lambda p: {"mu2": p[0] ** 2,
                                                       "expmu": jnp.exp(p)})
    assert gq["mu2"].shape == (2000, 8)
    assert gq["expmu"].shape == (2000, 8, 1)
    np.testing.assert_allclose(np.asarray(gq["mu2"]),
                               np.asarray(out.draws[..., 0]) ** 2, rtol=1e-6)


def test_posterior_predictive_matches_conjugate_law():
    """y_new | data ~ N(post_mean, post_var + 1): the sampled predictive's
    mean and variance must land on the closed form."""
    out, post_mean, post_var = _mu_draws()
    pp = mcmc_tpu.posterior_predictive(
        out, lambda k, p: p[0] + jax.random.normal(k),
        key=jax.random.PRNGKey(2))
    y = np.asarray(pp).reshape(-1)
    assert y.shape == (16000,)
    assert abs(y.mean() - post_mean) < 0.05
    assert abs(y.var() - (post_var + 1.0)) < 0.08


def test_batch_size_equivalence():
    out, _, _ = _mu_draws()
    fn = lambda k, p: p + jax.random.normal(k, (3,))
    a = mcmc_tpu.generated_quantities(out, fn, key=jax.random.PRNGKey(3))
    b = mcmc_tpu.generated_quantities(out, fn, key=jax.random.PRNGKey(3),
                                      batch_size=300)   # non-divisor: pads
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2000, 8, 3)


def test_plain_array_and_single_chain_shapes():
    draws = jnp.linspace(0.0, 1.0, 50)[:, None]   # (n_keep, 1)
    gq = mcmc_tpu.generated_quantities(draws, lambda p: 2.0 * p[0])
    assert gq.shape == (50,)
    np.testing.assert_allclose(np.asarray(gq),
                               2.0 * np.asarray(draws[:, 0]), rtol=1e-6)


def test_key_required_for_predictive():
    with pytest.raises(ValueError, match="key"):
        mcmc_tpu.posterior_predictive(jnp.zeros((10, 2)),
                                      lambda k, p: p, None)
