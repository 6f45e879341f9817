"""Multi-chip NUTS: thousands of chains sharded over a device mesh.

On a pod slice, run under `jax.distributed.initialize()`; on a single host
this demonstrates the same code path over all local devices (the sandbox
falls back to 8 virtual CPU devices)."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models, diagnostics
from mcmc_tpu.parallel import make_mesh

mesh = make_mesh()
n_chains = 64 * mesh.devices.size
print(f"mesh: {mesh}; running {n_chains} chains")

log_kernel = models.ill_conditioned_gaussian(16, condition_number=1e3)
out = mcmc_tpu.nuts(
    jnp.zeros(16), log_kernel,
    mcmc_tpu.NUTSSettings(n_burnin_draws=300, n_keep_draws=300, n_adapt_draws=300),
    n_chains=n_chains, key=jax.random.PRNGKey(0), mesh=mesh,
)
print("draw sharding:", out.draws.sharding)
print("max split R-hat:", float(diagnostics.split_rhat(out.draws).max()))
print("min ESS:", float(diagnostics.ess(out.draws).min()))
