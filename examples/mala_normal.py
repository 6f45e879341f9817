"""MALA on the (mu, sigma) Gaussian model — reference examples/eigen/
mala_normal.cpp, gradients via jax.grad instead of a hand-coded grad_out."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(2), (1000,))
log_kernel = models.gaussian_mean_scale_model(x_data)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=7)
settings.mala_settings.step_size = 0.04
settings.mala_settings.n_burnin_draws = 2000
settings.mala_settings.n_keep_draws = 2000

out = mcmc_tpu.mala(jnp.array([3.0, 3.0]), log_kernel, settings)
print("mala mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
