"""RM-HMC on the (mu, sigma) Gaussian model with the analytic Fisher metric
— reference examples/eigen/rmhmc_normal.cpp: step 0.2. The metric
derivative cube is obtained by jax.jacfwd instead of hand-coding."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

n_data = 1000
x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(6), (n_data,))
log_kernel = models.gaussian_mean_scale_model(x_data)
metric_fn = models.normal_fisher_metric(n_data)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=13)
settings.rmhmc_settings.step_size = 0.2
settings.rmhmc_settings.n_burnin_draws = 1000
settings.rmhmc_settings.n_keep_draws = 1000

out = mcmc_tpu.rmhmc(jnp.array([3.0, 3.0]), log_kernel, metric_fn, settings)
print("rmhmc mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
