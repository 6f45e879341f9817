"""Simplified manifold MALA: exactness under a position-DEPENDENT metric
(the two-sided proposal-density correction), SoftAbs funnel behavior,
constant-metric preconditioning, and driver-stack composition."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu


def _ks_vs_normal(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    return max(np.max(np.arange(1, n + 1) / n - cdf),
               np.max(cdf - np.arange(0, n) / n)), n


LOG_KERNEL = lambda v: -0.5 * jnp.sum(v ** 2)


def test_exact_under_position_dependent_metric():
    """The decisive invariance check: an arbitrary positive
    position-dependent metric G(x) = (1 + x^2) I changes the proposal
    everywhere, yet the MH correction must keep N(0,1) exactly invariant
    (KS) — any error in the asymmetric log-q terms fails this."""
    metric = lambda z: (1.0 + z @ z) * jnp.eye(z.shape[0])
    out = mcmc_tpu.mmala(jnp.zeros(1), LOG_KERNEL, metric,
                         mcmc_tpu.MMALASettings(n_burnin_draws=500,
                                                n_keep_draws=4000,
                                                step_size=1.0),
                         n_chains=16, key=jax.random.PRNGKey(0))
    ks, n = _ks_vs_normal(np.asarray(out.draws[:, :, 0])[::6].reshape(-1))
    assert ks < 1.95 / math.sqrt(n), ks
    assert 0.3 < float(out.accept_rate.mean()) < 0.99


def test_constant_metric_recovers_scales():
    """G = precision of the target: proposals are perfectly
    preconditioned, so a badly scaled target mixes across all
    coordinates at one step size."""
    scales = jnp.asarray([0.05, 1.0, 20.0])
    lk = lambda v: -0.5 * jnp.sum((v / scales) ** 2)
    metric = lambda z: jnp.diag(1.0 / scales ** 2)
    out = mcmc_tpu.mmala(jnp.zeros(3), lk, metric,
                         mcmc_tpu.MMALASettings(n_burnin_draws=500,
                                                n_keep_draws=3000,
                                                step_size=1.2),
                         n_chains=32, key=jax.random.PRNGKey(1))
    sd = np.asarray(out.draws).reshape(-1, 3).std(axis=0)
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.15)


def test_softabs_funnel():
    """SoftAbs-metric mMALA reaches the funnel's neck (v < -4) where a
    fixed-preconditioner MALA at the same budget cannot."""
    def funnel(x):
        v, z = x[0], x[1:]
        return -0.5 * (v / 3.0) ** 2 \
            - 0.5 * jnp.sum(z ** 2) * jnp.exp(-v) - 1.0 * v

    metric = mcmc_tpu.softabs_metric(funnel, alpha=1.0)
    out = mcmc_tpu.mmala(jnp.zeros(4), funnel, metric,
                         mcmc_tpu.MMALASettings(n_burnin_draws=1000,
                                                n_keep_draws=4000,
                                                step_size=0.8),
                         n_chains=16, key=jax.random.PRNGKey(2),
                         adapt_step_size=True)
    v = np.asarray(out.draws[:, :, 0])
    assert v.min() < -4.0, v.min()
    assert float(out.accept_rate.mean()) > 0.2


def test_driver_stack_composition():
    metric = lambda z: jnp.eye(2)
    s = mcmc_tpu.MMALASettings(n_burnin_draws=100, n_keep_draws=200,
                               step_size=1.0)
    kw = dict(n_chains=4, key=jax.random.PRNGKey(3))
    a = mcmc_tpu.mmala(jnp.zeros(2), LOG_KERNEL, metric, s, **kw)
    b = mcmc_tpu.mmala(jnp.zeros(2), LOG_KERNEL, metric, s, **kw)
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))

    t = mcmc_tpu.mmala(jnp.zeros(2), LOG_KERNEL, metric, s, thin=3, **kw)
    assert t.draws.shape == (200, 4, 2)

    r = mcmc_tpu.mmala(jnp.zeros(2), LOG_KERNEL, metric, s,
                       return_resume=True, **kw)
    r2 = r.diagnostics["resume"](jax.random.PRNGKey(4), 50)
    assert r2.draws.shape == (50, 4, 2)

    out = mcmc_tpu.sample("mmala", jnp.zeros(2), LOG_KERNEL, s,
                          metric_fn=metric, **kw)
    assert out.draws.shape == (200, 4, 2)
    with pytest.raises(ValueError, match="metric_fn"):
        mcmc_tpu.sample("mmala", jnp.zeros(2), LOG_KERNEL, s)
    with pytest.raises(TypeError, match="metric_fn"):
        mcmc_tpu.mmala(jnp.zeros(2), LOG_KERNEL, "not-a-fn", s)
