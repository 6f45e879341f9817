"""DE-MCMC on the Gaussian-mean posterior — reference examples/eigen/
de_normal_mean.cpp. Acceptance is reported over n_keep * n_pop as in the
reference example."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

x_data = 2.0 + jax.random.normal(jax.random.PRNGKey(7), (100,))
log_kernel = models.gaussian_mean_model(x_data, sigma=1.0)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=17)
settings.de_settings.n_pop = 100
settings.de_settings.n_burnin_draws = 1000
settings.de_settings.n_keep_draws = 1000

out = mcmc_tpu.de(jnp.array([1.0]), log_kernel, settings)
print("de mean:", float(out.draws.mean()))
n_keep, n_pop = out.draws.shape[0], out.draws.shape[1]
print("acceptance rate:", int(out.n_accept_draws) / (n_keep * n_pop))
