"""Model comparison with PSIS-LOO: fit two regression models to the same
data, score their pointwise predictive densities over the posterior draws,
and rank them by elpd with paired standard errors.

No counterpart in the reference — MCMCLib returns draws and stops; here the
draws flow straight into cross-validated model assessment
(Vehtari, Gelman & Gabry 2017).
"""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu

# synthetic data: y depends on x linearly; model A = linear, model B =
# intercept-only (misspecified)
key = jax.random.PRNGKey(0)
k_x, k_y, k_fit = jax.random.split(key, 3)
n = 80
x = jax.random.normal(k_x, (n,))
y = 0.8 + 1.5 * x + 0.7 * jax.random.normal(k_y, (n,))


def loglik_linear(th):
    mu = th[0] + th[1] * x
    sig2 = jnp.exp(th[2]) ** 2
    return -0.5 * (jnp.log(2 * jnp.pi * sig2) + (y - mu) ** 2 / sig2)


def loglik_const(th):
    sig2 = jnp.exp(th[1]) ** 2
    return -0.5 * (jnp.log(2 * jnp.pi * sig2) + (y - th[0]) ** 2 / sig2)


def posterior(loglik_fn, dim):
    def log_kernel(th):
        return jnp.sum(loglik_fn(th)) - 0.5 * jnp.sum(th**2) / 100.0
    return mcmc_tpu.fit(jnp.zeros(dim), log_kernel, n_chains=8,
                        n_warmup=500, n_draws=1000, key=k_fit)


out_a = posterior(loglik_linear, 3)
out_b = posterior(loglik_const, 2)

loo_a = mcmc_tpu.psis_loo(mcmc_tpu.pointwise_log_lik(out_a.draws, loglik_linear))
loo_b = mcmc_tpu.psis_loo(mcmc_tpu.pointwise_log_lik(out_b.draws, loglik_const))

print(f"linear:    elpd = {float(loo_a['elpd']):8.1f} +- {float(loo_a['se']):.1f}  "
      f"p_eff = {float(loo_a['p_eff']):.1f}  max pareto_k = {float(loo_a['pareto_k'].max()):.2f}")
print(f"intercept: elpd = {float(loo_b['elpd']):8.1f} +- {float(loo_b['se']):.1f}  "
      f"p_eff = {float(loo_b['p_eff']):.1f}  max pareto_k = {float(loo_b['pareto_k'].max()):.2f}")

for r in mcmc_tpu.compare({"linear": loo_a, "intercept-only": loo_b}):
    print(f"rank {r['rank']}: {r['name']:15s} elpd_diff = {r['elpd_diff']:6.1f}"
          f" +- {r['se_diff']:.1f}")
