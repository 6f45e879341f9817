"""Utility-path coverage: batched dmvnorm, observability, SamplerResult
properties, SPD dense path."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import observability, stats
from mcmc_tpu.results import SamplerResult
from mcmc_tpu.samplers.common import make_spd


def test_dmvnorm_batched_full_matrix():
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (5, 3))
    sigma = jnp.array([[2.0, 0.5, 0.0], [0.5, 1.5, 0.2], [0.0, 0.2, 1.0]])
    batched = stats.dmvnorm(xs, jnp.zeros(3), sigma, log=True)
    singles = jnp.stack([stats.dmvnorm(x, jnp.zeros(3), sigma, log=True)
                         for x in xs])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles),
                               rtol=1e-5)


def test_spd_full_matrix_ops():
    m = jnp.array([[4.0, 1.0], [1.0, 3.0]])
    spd = make_spd(m, 2, jnp.float32)
    v = jnp.array([1.0, -2.0])
    np.testing.assert_allclose(np.asarray(spd.mv(v)), np.asarray(m @ v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(spd.inv_mv(spd.mv(v))), np.asarray(v),
                               rtol=1e-4)
    # chol(M) z has covariance M
    chol_v = spd.sqrt_mv(v)
    L = np.linalg.cholesky(np.asarray(m))
    np.testing.assert_allclose(np.asarray(chol_v), L @ np.asarray(v), rtol=1e-5)


def test_observability_capture_trace(tmp_path):
    with observability.capture_trace(str(tmp_path / "trace")):
        with observability.trace("compute"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            jax.block_until_ready(x)
    # a trace directory with at least one event file must exist
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "profiler produced no output"


def test_observability_throughput():
    out = observability.throughput(100, 8, 2.0, leapfrogs_per_draw=4)
    assert out["draws_per_sec"] == 50.0
    assert out["samples_per_sec"] == 400.0
    assert out["leapfrog_steps_per_sec"] == 1600.0


def test_result_properties_shapes():
    draws = jax.random.normal(jax.random.PRNGKey(1), (100, 4, 3)) + 2.0
    res = SamplerResult(draws=draws, n_accept_draws=jnp.array([50, 60, 70, 80]))
    np.testing.assert_allclose(np.asarray(res.mean), 2.0, atol=0.2)
    np.testing.assert_allclose(np.asarray(res.accept_rate),
                               [0.5, 0.6, 0.7, 0.8])
    assert res.var.shape == (3,)


def test_settings_replace():
    s = mcmc_tpu.AlgoSettings(rng_seed_value=1)
    s2 = s.replace(rng_seed_value=7)
    assert s2.rng_seed_value == 7 and s.rng_seed_value == 1


def test_result_summary_and_arviz_gate():
    """SamplerResult.summary() returns the full diagnostic set; to_arviz()
    raises a helpful ImportError when arviz is absent (optional dep)."""
    import mcmc_tpu
    out = mcmc_tpu.rwmh(jnp.zeros(2), lambda v: -0.5 * jnp.sum(v**2),
                        mcmc_tpu.RWMHSettings(n_burnin_draws=100,
                                              n_keep_draws=200, par_scale=1.0),
                        n_chains=4, key=jax.random.PRNGKey(0))
    summ = out.summary()
    for k in ("mean", "sd", "mcse", "rhat", "ess", "rhat_rank",
              "ess_bulk", "ess_tail"):
        assert k in summ, k
    try:
        import arviz  # noqa: F401
        idata = out.to_arviz()
        assert idata.posterior["x"].shape == (4, 200, 2)
    except ImportError:
        import pytest
        with pytest.raises(ImportError, match="arviz"):
            out.to_arviz()
