"""Parallel tempering on the bimodal Gaussian mixture (the AEES example
target, reference examples/eigen/aees_mixture.cpp) — the exact-swap
alternative to AEES's equi-energy jumps. An adaptive geometric ladder of 6
temperatures with HMC inner moves; 16 independent ladders run vmapped.
Prints sign-filtered mode means like the reference example, plus the
adapted ladder and per-pair swap acceptance."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models

mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
log_kernel = models.gaussian_mixture_model(
    mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5])
)

settings = mcmc_tpu.PTSettings(
    n_burnin_draws=1000, n_keep_draws=2000,
    n_temps=6, max_temp=60.0, adapt_temps=True,
    inner="hmc", step_size=0.12, n_leap_steps=5,
)

out = mcmc_tpu.pt(mu[0], log_kernel, settings, n_chains=16,
                  key=jax.random.PRNGKey(2))
d = np.asarray(out.draws).reshape(-1, 2)
print("posterior mean for > 0.1:", d[d[:, 0] > 0.1].mean(axis=0))
print("posterior mean for < -0.1:", d[d[:, 0] < -0.1].mean(axis=0))
print("mode balance:", float((d[:, 0] > 0).mean()))
print("adapted ladder:", np.asarray(out.diagnostics["temperatures"]).round(2))
print("swap acceptance:",
      np.asarray(out.diagnostics["swap_accept_rate"]).mean(axis=0).round(3))
