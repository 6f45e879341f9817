"""Edge cases: zero burn-in, single draw, 1-d problems, extreme settings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu

LK = lambda v: -0.5 * jnp.sum(v**2)


def test_zero_burnin():
    out = mcmc_tpu.rwmh(jnp.zeros(2), LK,
                        mcmc_tpu.RWMHSettings(n_burnin_draws=0, n_keep_draws=50),
                        key=jax.random.PRNGKey(0))
    assert out.draws.shape == (50, 2)


def test_single_keep_draw():
    out = mcmc_tpu.hmc(jnp.zeros(2), LK,
                       mcmc_tpu.HMCSettings(n_burnin_draws=10, n_keep_draws=1,
                                            step_size=0.3),
                       key=jax.random.PRNGKey(1))
    assert out.draws.shape == (1, 2)
    assert int(out.n_accept_draws) in (0, 1)


def test_one_dimensional():
    out = mcmc_tpu.nuts(jnp.zeros(1), LK,
                        mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=200,
                                              n_adapt_draws=100),
                        key=jax.random.PRNGKey(2))
    assert out.draws.shape == (200, 1)
    assert abs(float(out.draws.mean())) < 0.5


def test_nuts_adapt_exceeds_burnin():
    """Reference quirk: adaptation continues into kept draws when
    n_adapt > n_burnin (src/nuts.cpp:54 has no guard)."""
    out = mcmc_tpu.nuts(jnp.zeros(2), LK,
                        mcmc_tpu.NUTSSettings(n_burnin_draws=50, n_keep_draws=150,
                                              n_adapt_draws=150),
                        key=jax.random.PRNGKey(3))
    ss = np.asarray(out.diagnostics["step_size"])
    # step size still moving inside the keep phase (draws 0..100 kept are
    # adapt draws 50..150), then frozen
    assert ss[:90].std() > 0
    assert ss[110:].std() == 0


def test_de_tiny_population():
    """n_pop=3 is the smallest population with distinct (i, c1, c2)."""
    out = mcmc_tpu.de(jnp.zeros(1), LK,
                      mcmc_tpu.DESettings(n_pop=3, n_burnin_draws=50,
                                          n_keep_draws=50),
                      key=jax.random.PRNGKey(4))
    assert out.draws.shape == (50, 3, 1)
    assert np.isfinite(np.asarray(out.draws)).all()


def test_initial_vals_per_chain():
    """(n_chains, dim) initial values are used as-is, not broadcast."""
    inits = jnp.array([[5.0, 5.0], [-5.0, -5.0]])
    out = mcmc_tpu.hmc(inits, LK,
                       mcmc_tpu.HMCSettings(n_burnin_draws=0, n_keep_draws=1,
                                            step_size=1e-6),
                       key=jax.random.PRNGKey(5))
    d = np.asarray(out.draws)[0]
    # with a negligible step the first kept draw stays near each chain's init
    np.testing.assert_allclose(d, np.asarray(inits), atol=0.01)


@pytest.mark.parametrize("kwargs", [
    dict(adapt_mass_matrix=True, adapt_depth=True, pooled_adaptation=True,
         sample_method="multinomial"),
    dict(adapt_mass_matrix="dense", sample_method="multinomial"),
    dict(adapt_depth=True, tree_variant="reference"),
])
def test_nuts_option_combinations_smoke(kwargs):
    """NUTS extension flags compose (multinomial x mass x depth x pooled)."""
    lk = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=60, n_keep_draws=80,
                              n_adapt_draws=60)
    out = mcmc_tpu.nuts(jnp.zeros(3), lk, s, n_chains=4,
                        key=jax.random.PRNGKey(0), **kwargs)
    d = np.asarray(out.draws)
    assert d.shape == (80, 4, 3)
    assert np.isfinite(d).all()


@pytest.mark.parametrize("kwargs", [
    dict(adapt_scale=True, adapt_precond="dense", pooled_adaptation=True),
    dict(adapt_precond="diag"),
])
def test_rwmh_option_combinations_smoke(kwargs):
    lk = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.RWMHSettings(n_burnin_draws=80, n_keep_draws=80,
                              par_scale=0.8)
    out = mcmc_tpu.rwmh(jnp.zeros(3), lk, s, n_chains=4,
                        key=jax.random.PRNGKey(0), **kwargs)
    assert np.isfinite(np.asarray(out.draws)).all()


def test_chees_checkpoint_roundtrip(tmp_path):
    """ChEES composes with checkpoint_dir (single-key totals path)."""
    lk = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.ChEESSettings(n_burnin_draws=100, n_keep_draws=200)
    out = mcmc_tpu.chees(jnp.zeros(2), lk, s, n_chains=8,
                         key=jax.random.PRNGKey(0),
                         checkpoint_dir=tmp_path / "c", checkpoint_every=80)
    assert out.draws.shape == (200, 8, 2)
    out2 = mcmc_tpu.chees(jnp.zeros(2), lk, s, n_chains=8,
                          key=jax.random.PRNGKey(0),
                          checkpoint_dir=tmp_path / "c", checkpoint_every=80)
    np.testing.assert_array_equal(np.asarray(out.draws), np.asarray(out2.draws))


def test_swapped_arguments_clear_error():
    """Passing (log_kernel, initial_vals) — the classic argument swap —
    raises an actionable TypeError at the entry boundary, not a deep JAX
    dtype error from inside tracing."""
    lk = lambda v: -0.5 * jnp.sum(v**2)
    with pytest.raises(TypeError, match="argument order"):
        mcmc_tpu.rwmh(lk, jnp.zeros(2), mcmc_tpu.RWMHSettings())
    with pytest.raises(TypeError, match="argument order"):
        mcmc_tpu.fit(lk, jnp.zeros(2))
    with pytest.raises(TypeError, match="callable"):
        mcmc_tpu.nuts(jnp.zeros(2), jnp.zeros(2))
    with pytest.raises(TypeError, match="array-like"):
        mcmc_tpu.hmc(object(), lk)
