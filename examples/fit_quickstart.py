"""The one-call API: automatic warmup (pooled step-size + mass-matrix
adaptation) and a full diagnostic summary. No counterpart in the reference,
whose settings are all fixed by the caller."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

log_kernel = models.eight_schools_model()

out = mcmc_tpu.fit(jnp.zeros(10), log_kernel, n_chains=8,
                   n_warmup=1000, n_draws=1000, key=jax.random.PRNGKey(0))

s = out.diagnostics["summary"]
print("posterior mean:", s["mean"])
print("mcse:", s["mcse"])
print("split R-hat:", s["rhat"])
print("ESS:", s["ess"])
