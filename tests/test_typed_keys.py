"""New-style typed PRNG keys (``jax.random.key``) work at every entry
point exactly like legacy uint32 keys. The library mostly treats keys as
opaque pytree leaves, but any code that reshapes raw key arrays (e.g. the
AEES ladder pilot's (grid, chains) key batch) can silently assume the
legacy (N, 2) layout — this file pins the contract on a representative
spread of surfaces (cheap configs; statistical quality is covered
elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu

LK = lambda v: -0.5 * jnp.sum(v ** 2)
X0 = jnp.zeros(2)
S = dict(n_burnin_draws=40, n_keep_draws=40)


@pytest.mark.parametrize("name,run", [
    ("rwmh", lambda k: mcmc_tpu.rwmh(
        X0, LK, mcmc_tpu.RWMHSettings(**S), n_chains=3, key=k)),
    ("nuts", lambda k: mcmc_tpu.nuts(
        X0, LK, mcmc_tpu.NUTSSettings(**S, n_adapt_draws=40),
        n_chains=3, key=k)),
    ("gibbs", lambda k: mcmc_tpu.gibbs(
        X0, LK, mcmc_tpu.GibbsSettings(**S),
        blocks=[([0, 1], "rwmh")], n_chains=3, key=k)),
    ("aees_auto", lambda k: mcmc_tpu.aees(
        X0, LK, mcmc_tpu.AEESSettings(n_keep_draws=40,
                                      temper_vec=jnp.array([10.0])),
        key=k, adapt_ladder=True)),
    ("de", lambda k: mcmc_tpu.de(
        X0, LK, mcmc_tpu.DESettings(n_pop=8, **S), key=k)),
    ("fit", lambda k: mcmc_tpu.fit(
        X0, LK, n_chains=4, n_warmup=40, n_draws=40, key=k)),
])
def test_typed_key_entry_points(name, run):
    out = run(jax.random.key(7))
    assert np.isfinite(np.asarray(out.draws)).all()


def test_typed_key_matches_legacy_key_bitwise():
    """A typed key and its legacy equivalent drive identical streams
    through the sampler (the library folds/splits identically)."""
    legacy = mcmc_tpu.rwmh(X0, LK, mcmc_tpu.RWMHSettings(**S), n_chains=3,
                           key=jax.random.PRNGKey(11))
    typed = mcmc_tpu.rwmh(X0, LK, mcmc_tpu.RWMHSettings(**S), n_chains=3,
                          key=jax.random.key(11))
    np.testing.assert_array_equal(np.asarray(legacy.draws),
                                  np.asarray(typed.draws))
