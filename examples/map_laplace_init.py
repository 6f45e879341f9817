"""MAP + Laplace initialization: find the posterior mode with the batched
Adam optimizer, then start overdispersed chains from the Laplace Gaussian.

No counterpart in the reference — MCMCLib ships no optimizer, and its
examples hardcode `initial_vals` (e.g. examples/eigen/rwmh_normal_mean.cpp).
"""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

X, y, beta_true = models.make_logistic_regression_data(
    jax.random.PRNGKey(0), n_data=500, dim=10)
log_kernel = models.logistic_regression_model(X, y)

# MAP search: 4 jittered restarts vmapped into one jitted Adam scan
lap = mcmc_tpu.map_laplace(jnp.zeros(10), log_kernel,
                           n_steps=600, key=jax.random.PRNGKey(1))
print("MAP:", lap.mode)
print("grad norm at mode:", float(lap.grad_norm))
print("Laplace sd:", jnp.sqrt(jnp.diagonal(lap.cov)))

# start chains from overdispersed Laplace draws (or: fit(init="laplace"))
inits = lap.draw_init(jax.random.PRNGKey(2), n_chains=16)
out = mcmc_tpu.fit(inits, log_kernel, n_chains=16, algorithm="chees",
                   n_warmup=500, n_draws=500, key=jax.random.PRNGKey(3))
s = out.diagnostics["summary"]
print("posterior mean:", s["mean"])
print("94% HDI:", s["hdi_low"], s["hdi_high"])
print("max rank R-hat:", float(jnp.max(s["rhat_rank"])))
