"""The approximate-inference family on one model: Laplace, Pathfinder,
ADVI (mean-field + full-rank), and SVGD, cross-checked against the exact
conjugate posterior and a ChEES run.

No counterpart in the reference — MCMCLib samples or nothing. Model:
Bayesian linear regression with known noise, d = 8, whose posterior is
exactly Gaussian — so every method's error is measurable.
"""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu

key = jax.random.PRNGKey(0)
k_x, k_y = jax.random.split(key)
n, d, sig = 200, 8, 0.5
X = jax.random.normal(k_x, (n, d))
w_true = jnp.linspace(-1.0, 1.0, d)
y = X @ w_true + sig * jax.random.normal(k_y, (n,))

# prior N(0, I); exact posterior N(mu_n, S_n)
S_n = np.linalg.inv(np.eye(d) + np.asarray(X.T @ X) / sig**2)
mu_n = S_n @ np.asarray(X.T @ y) / sig**2


def log_kernel(w):
    r = y - X @ w
    return -0.5 * jnp.sum(r**2) / sig**2 - 0.5 * jnp.sum(w**2)


def err(mean, cov):
    return (np.abs(np.asarray(mean) - mu_n).max(),
            np.abs(np.asarray(cov) - S_n).max())


lap = mcmc_tpu.map_laplace(jnp.zeros(d), log_kernel, n_steps=800,
                           key=jax.random.PRNGKey(1))
e = err(lap.mode, lap.cov)
print(f"laplace          mean err {e[0]:.4f}  cov err {e[1]:.4f}")

pf = mcmc_tpu.pathfinder(jnp.zeros(d), log_kernel, n_paths=4, n_draws=4000,
                         key=jax.random.PRNGKey(2))
P = np.asarray(pf.draws)
e = err(P.mean(0), np.cov(P.T))
print(f"pathfinder       mean err {e[0]:.4f}  cov err {e[1]:.4f}  "
      f"pareto-k {float(pf.pareto_k):.2f}")

mf = mcmc_tpu.advi(jnp.zeros(d), log_kernel, n_steps=2000,
                   key=jax.random.PRNGKey(3))
e = err(mf.mean, np.diag(np.asarray(mf.sd_z) ** 2))
print(f"advi mean-field  mean err {e[0]:.4f}  cov err {e[1]:.4f}  "
      f"(diagonal only — correlation-blind by construction)")

fr = mcmc_tpu.advi(jnp.zeros(d), log_kernel, full_rank=True, n_steps=3000,
                   key=jax.random.PRNGKey(4))
L = np.asarray(fr.chol)
e = err(fr.mean, L @ L.T)
print(f"advi full-rank   mean err {e[0]:.4f}  cov err {e[1]:.4f}  "
      f"elbo {float(fr.elbo):.2f}")

sv = mcmc_tpu.svgd(jnp.zeros(d), log_kernel, n_particles=512, n_steps=1500,
                   key=jax.random.PRNGKey(5))
P = np.asarray(sv.particles)
e = err(P.mean(0), np.cov(P.T))
print(f"svgd             mean err {e[0]:.4f}  cov err {e[1]:.4f}")

out = mcmc_tpu.fit(jnp.zeros(d), log_kernel, algorithm="chees", n_chains=16,
                   n_warmup=500, n_draws=500, key=jax.random.PRNGKey(6))
D = np.asarray(out.draws).reshape(-1, d)
e = err(D.mean(0), np.cov(D.T))
print(f"chees (exact)    mean err {e[0]:.4f}  cov err {e[1]:.4f}")
