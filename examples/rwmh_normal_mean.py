"""Sampling the posterior mean of a Gaussian with RWMH.

The mcmc_tpu rendition of reference examples/eigen/rwmh_normal_mean.cpp
(README.md:244-274): N(mu, 1) likelihood over 100 points, N(1, 2^2) prior,
par_scale 0.4, 2000 + 2000 draws.
"""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

key = jax.random.PRNGKey(1)
mu_true = 2.0
x_data = mu_true + jax.random.normal(key, (100,))

log_kernel = models.gaussian_mean_model(x_data, sigma=1.0, mu_0=1.0, sigma_0=2.0)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=42)
settings.rwmh_settings.par_scale = 0.4
settings.rwmh_settings.n_burnin_draws = 2000
settings.rwmh_settings.n_keep_draws = 2000

out = mcmc_tpu.rwmh(jnp.array([1.0]), log_kernel, settings)

print("rwmh mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
