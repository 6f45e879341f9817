"""NUTS on the (mu, sigma) Gaussian model — reference examples/eigen/
nuts_normal.cpp: default dual-averaging settings (target accept 0.55)."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models

x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(5), (1000,))
log_kernel = models.gaussian_mean_scale_model(x_data)

settings = mcmc_tpu.AlgoSettings(rng_seed_value=11)
settings.nuts_settings.n_burnin_draws = 2000
settings.nuts_settings.n_keep_draws = 2000
settings.nuts_settings.n_adapt_draws = 2000

out = mcmc_tpu.nuts(jnp.array([3.0, 3.0]), log_kernel, settings)
print("nuts mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
print("mean tree depth:", float(np.asarray(out.diagnostics["tree_depth"]).mean()))
print("adapted step size:", float(np.asarray(out.diagnostics["step_size"])[-1]))
