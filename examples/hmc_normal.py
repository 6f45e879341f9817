"""HMC on the (mu, sigma) Gaussian model — reference examples/eigen/
hmc_normal.cpp: step 0.08, 2000 + 2000 draws."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(3), (1000,))
log_kernel = models.gaussian_mean_scale_model(x_data)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=5)
settings.hmc_settings.step_size = 0.08
settings.hmc_settings.n_burnin_draws = 2000
settings.hmc_settings.n_keep_draws = 2000

out = mcmc_tpu.hmc(jnp.array([3.0, 3.0]), log_kernel, settings)
print("hmc mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
