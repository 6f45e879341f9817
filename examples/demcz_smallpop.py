"""DE-MC(Z) in the regime plain DE cannot reach: 8 walkers sampling a 20-d
strongly correlated Gaussian (no reference analog — ter Braak & Vrugt 2008).
Difference proposals come from the archive of past states, and ~10% of moves
are snooker (line) moves, so the tiny population inherits the archive's
geometry instead of being rank-limited by its own size."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu

d = 20
rho = 0.8
cov = rho * jnp.ones((d, d)) + (1 - rho) * jnp.eye(d)
P = jnp.linalg.inv(cov)
log_kernel = lambda x: -0.5 * x @ P @ x

out = mcmc_tpu.demcz(
    jnp.zeros(d), log_kernel,
    mcmc_tpu.DEMCZSettings(n_pop=8, n_burnin_draws=4000, n_keep_draws=6000),
    key=jax.random.PRNGKey(0))

pooled = np.asarray(out.draws).reshape(-1, d)
print("draws:", out.draws.shape)           # (6000, 8, 20)
print("accept rate:", float(out.n_accept_draws) / (6000 * 8))
print("marginal var (truth 1.0):", pooled.var(0).mean())
print("corr[0,1] (truth 0.8):",
      float(np.corrcoef(pooled[:, 0], pooled[:, 1])[0, 1]))
print("max split R-hat:",
      float(mcmc_tpu.diagnostics.split_rhat(out.draws).max()))
