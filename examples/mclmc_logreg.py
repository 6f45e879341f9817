"""Microcanonical samplers on Bayesian logistic regression (no reference
analog; Robnik et al. 2022 + the Metropolis-adjusted variant).

`mclmc` is the framework's highest-throughput sampler: one gradient per
draw, no accept/reject, perfectly lockstep across the chain batch — at the
cost of an O(step_size^2) stationary bias held at the `desired_energy_var`
operating point (~1% on this posterior's moments). `mams` is the exact
Metropolis-adjusted variant; running both and comparing moments is the
built-in bias audit shown here."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models, diagnostics

X, y, beta_true = models.make_logistic_regression_data(
    jax.random.PRNGKey(0), 500, 25)
log_kernel = models.logistic_regression_model(X, y)

out_u = mcmc_tpu.mclmc(
    jnp.zeros(25), log_kernel,
    mcmc_tpu.MCLMCSettings(n_burnin_draws=500, n_keep_draws=1000),
    n_chains=256, key=jax.random.PRNGKey(1), adapt_mass=True, thin=4,
)
out_x = mcmc_tpu.mams(
    jnp.zeros(25), log_kernel,
    mcmc_tpu.MAMSSettings(n_burnin_draws=500, n_keep_draws=1000),
    n_chains=256, key=jax.random.PRNGKey(2), adapt_mass=True,
)

du = np.asarray(out_u.draws).reshape(-1, 25)
dx = np.asarray(out_x.draws).reshape(-1, 25)
print("posterior mean vs truth (first 5):")
print("  mclmc:", du.mean(axis=0)[:5].round(2))
print("  mams :", dx.mean(axis=0)[:5].round(2))
print("  true :", np.asarray(beta_true)[:5].round(2))
print("bias audit (unadjusted vs exact): max |dmean| =",
      float(np.abs(du.mean(0) - dx.mean(0)).max()).__round__(4),
      " max |dstd|/std =",
      float(np.abs(du.std(0) / dx.std(0) - 1).max()).__round__(4))
print("mclmc adapted step:", float(out_u.diagnostics["adapted_step_size"]),
      " L:", float(out_u.diagnostics["adapted_L"]))
print("mams accept rate:", float(np.mean(out_x.accept_rate)),
      " mean leapfrogs/draw:",
      float(np.asarray(out_x.diagnostics["n_leap"]).mean()))
print("max split R-hat: mclmc",
      float(np.asarray(diagnostics.split_rhat(out_u.draws)).max()),
      " mams",
      float(np.asarray(diagnostics.split_rhat(out_x.draws)).max()))
