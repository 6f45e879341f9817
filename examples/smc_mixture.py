"""Tempered SMC on an unequal-weight bimodal mixture — the population-native
take on the AEES example target (reference examples/eigen/aees_mixture.cpp),
plus the one thing no MCMC sampler here can return: the model evidence.

A 0.3/0.7 mixture at (-2,-2)/(+2,+2) is annealed from a broad Gaussian
cloud; the adaptive temperature ladder, per-stage ESS, mutation acceptance,
mode masses, and log Z are printed. Note the recovered mode balance: chains
must *hop* to get mass ratios right, a particle cloud just reweights."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models

mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
log_kernel = models.gaussian_mixture_model(
    mu, sig_sq=jnp.array([0.25, 0.25]), weights=jnp.array([0.3, 0.7])
)

settings = mcmc_tpu.SMCSettings(
    n_particles=8192, init_scale=4.0, n_mcmc_steps=5, ess_target=0.5,
)

out = mcmc_tpu.smc(jnp.zeros(2), log_kernel, settings,
                   key=jax.random.PRNGKey(2))
d = np.asarray(out.draws)
pos = d[:, 0] > 0
print("mode mass at +2 (true 0.7):", round(float(pos.mean()), 3))
print("posterior mean (+) :", d[pos].mean(axis=0).round(3))
print("posterior mean (-) :", d[~pos].mean(axis=0).round(3))
print("stages:", out.diagnostics["n_stages"],
      " lambdas:", np.asarray(out.diagnostics["lambdas"]).round(3))
print("mutation acceptance:",
      np.asarray(out.diagnostics["mutation_accept_rate"]).round(3))
print("log Z:", round(float(out.diagnostics["log_z"]), 3),
      " (weights are normalized densities: exact log Z = 0)")
