"""Pathfinder initialization: follow an L-BFGS path toward the posterior,
score every iterate's inverse-Hessian Gaussian by ELBO, and start chains
from PSIS-resampled draws of the winners — Stan's modern default
initializer, here with all iterates scored in one batched pass.

No counterpart in the reference — MCMCLib's examples hardcode
`initial_vals`. The funnel below is the case where mode-seeking
initialization (MAP/Laplace) fails: the joint mode sits at z = 0 with v
driven far negative (v* = -9(d-1)/2 for this parameterization — finite,
but dozens of standard deviations below the v ~ N(0, 3^2) typical set,
where the local curvature describes nothing the posterior bulk looks
like), while Pathfinder's ELBO picks an iterate in the typical set.
"""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

# --- flagship posterior: 10-d logistic regression --------------------
X, y, _ = models.make_logistic_regression_data(
    jax.random.PRNGKey(0), n_data=500, dim=10)
log_kernel = models.logistic_regression_model(X, y)

pf = mcmc_tpu.pathfinder(jnp.zeros(10), log_kernel, n_paths=8,
                         n_draws=1000, key=jax.random.PRNGKey(1))
print("best ELBO per path:", pf.elbo)
print("winning L-BFGS iterates:", pf.best_iter)
print("pooled pareto-k:", float(pf.pareto_k),
      "(< 0.7: draws usable as a rough posterior)")
print("draw mean:", pf.draws.mean(axis=0))

out = mcmc_tpu.fit(jnp.zeros(10), log_kernel, n_chains=16,
                   algorithm="chees", n_warmup=500, n_draws=500,
                   init="pathfinder", key=jax.random.PRNGKey(2))
s = out.diagnostics["summary"]
print("posterior mean:", s["mean"])
print("max rank R-hat:", float(jnp.max(s["rhat_rank"])))

# --- the funnel: where the mode is a lie ------------------------------


def funnel(x):
    v, z = x[0], x[1:]
    return (-0.5 * (v / 3.0) ** 2
            - 0.5 * jnp.sum(z ** 2) * jnp.exp(-v)
            - 0.5 * (x.shape[0] - 1) * v)


pf_f = mcmc_tpu.pathfinder(jnp.zeros(8), funnel, n_paths=8, n_draws=500,
                           max_iters=40, key=jax.random.PRNGKey(3))
print("\nfunnel: winning iterates", pf_f.best_iter,
      "(max_iters=40 — none at the path end: the ELBO rejects the "
      "collapsing mode)")
print("funnel v-draws mean/sd:", float(pf_f.draws[:, 0].mean()),
      float(pf_f.draws[:, 0].std()))
