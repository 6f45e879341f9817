"""Thinning (`thin=k`): k transitions per stored draw across the chain
samplers, composing with checkpointing and mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models, diagnostics
from mcmc_tpu.parallel import make_mesh
from mcmc_tpu.samplers.common import thin_step


def _lk():
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (100,))
    return models.gaussian_mean_model(x)


def test_thin_step_contract():
    """Wrapper advances exactly k transitions and aggregates info: bools
    become window counts, other entries report the last transition."""
    calls = []

    def base(key, state):
        new = state + 1.0
        return new, {"accepted": new > 1.5, "value": new}

    step = thin_step(base, 4)
    state, info = step(jax.random.PRNGKey(0), jnp.asarray(0.0))
    assert float(state) == 4.0
    assert info["accepted"].dtype == jnp.int32 and int(info["accepted"]) == 3
    assert float(info["value"]) == 4.0
    # thin=1 is the identity — no key-stream change
    assert thin_step(base, 1) is base


def test_rwmh_thin_reduces_autocorrelation():
    lk = _lk()
    s = mcmc_tpu.RWMHSettings(n_burnin_draws=500, n_keep_draws=800,
                              par_scale=0.1)
    out1 = mcmc_tpu.rwmh(jnp.array([1.0]), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(2))
    out8 = mcmc_tpu.rwmh(jnp.array([1.0]), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(2), thin=8)
    assert out8.draws.shape == out1.draws.shape
    # same posterior...
    assert abs(float(out8.mean[0]) - 2.0) < 0.15
    # ...but far less autocorrelation per stored row
    ess1 = float(diagnostics.ess(out1.draws).min())
    ess8 = float(diagnostics.ess(out8.draws).min())
    assert ess8 > 2.0 * ess1
    # acceptance counts all transitions: ~8x the unthinned count
    n1 = int(jnp.sum(out1.n_accept_draws))
    n8 = int(jnp.sum(out8.n_accept_draws))
    assert 4 * n1 < n8 < 12 * n1


def test_nuts_thin_smoke():
    out = mcmc_tpu.nuts(
        jnp.zeros(2), models.banana_model(b=0.1, sigma=2.0),
        mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=100,
                              n_adapt_draws=100, max_tree_depth=6),
        n_chains=4, key=jax.random.PRNGKey(3), thin=3)
    assert out.draws.shape == (100, 4, 2)
    assert bool(jnp.isfinite(out.draws).all())


def test_thin_with_checkpoint(tmp_path):
    lk = _lk()
    out = mcmc_tpu.hmc(
        jnp.array([1.0]), lk,
        mcmc_tpu.HMCSettings(n_burnin_draws=100, n_keep_draws=200,
                             step_size=0.05, n_leap_steps=4),
        n_chains=4, key=jax.random.PRNGKey(4), thin=4,
        checkpoint_dir=str(tmp_path), checkpoint_every=50)
    assert out.draws.shape == (200, 4, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.2
    # totals carry the transition-count convention through the runner
    assert int(jnp.sum(out.n_accept_draws)) <= 200 * 4 * 4


def test_thin_with_mesh():
    lk = _lk()
    out = mcmc_tpu.mala(
        jnp.array([1.0]), lk,
        mcmc_tpu.MALASettings(n_burnin_draws=200, n_keep_draws=200,
                              step_size=0.05),
        n_chains=16, key=jax.random.PRNGKey(5), thin=2, mesh=make_mesh(8))
    assert out.draws.shape == (200, 16, 1)
    assert abs(float(out.mean[0]) - 2.0) < 0.2


def test_thin_validation():
    lk = _lk()
    try:
        mcmc_tpu.rwmh(jnp.array([1.0]), lk, thin=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "thin" in str(e)


def test_stretch_thin_reduces_autocorrelation():
    lk = _lk()
    s = mcmc_tpu.StretchSettings(n_walkers=16, n_burnin_draws=300,
                                 n_keep_draws=600)
    out1 = mcmc_tpu.stretch(jnp.array([1.0]), lk, s,
                            key=jax.random.PRNGKey(6))
    out4 = mcmc_tpu.stretch(jnp.array([1.0]), lk, s,
                            key=jax.random.PRNGKey(6), thin=4)
    assert out4.draws.shape == out1.draws.shape
    assert abs(float(out4.mean[0]) - 2.0) < 0.15
    ess1 = float(diagnostics.ess(out1.draws).min())
    ess4 = float(diagnostics.ess(out4.draws).min())
    assert ess4 > 1.5 * ess1
    # per-walker rate stays a probability under thin; the scalar
    # accept_rate keeps the population convention (total / transitions:
    # divide by n_walkers to get a probability, as the de example does)
    acc = out4.diagnostics["accept_rate_per_walker"]
    assert 0.0 < float(acc.mean()) <= 1.0
    assert float(out4.accept_rate) / 16 <= 1.0
    n1 = int(jnp.sum(out1.n_accept_draws))
    n4 = int(jnp.sum(out4.n_accept_draws))
    assert 2 * n1 < n4 < 7 * n1


def test_de_thin_smoke_and_checkpoint(tmp_path):
    lk = _lk()
    s = mcmc_tpu.DESettings(n_pop=32, n_burnin_draws=200, n_keep_draws=200)
    out = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(7),
                      thin=3)
    assert out.draws.shape == (200, 32, 1)
    assert abs(float(out.draws.mean()) - 2.0) < 0.2
    acc = out.diagnostics["accept_rate_per_walker"]
    assert 0.0 < float(acc.mean()) <= 1.0
    ck = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(7),
                     thin=3, checkpoint_dir=str(tmp_path),
                     checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(ck.draws),
                                  np.asarray(out.draws))


def test_demcz_thin_smoke():
    lk = _lk()
    out = mcmc_tpu.demcz(
        jnp.array([1.0]), lk,
        mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=200,
                               n_keep_draws=400),
        key=jax.random.PRNGKey(8), thin=3)
    assert out.draws.shape == (400, 8, 1)
    assert abs(float(out.draws.mean()) - 2.0) < 0.15
    assert out.diagnostics["thin"] == 3
