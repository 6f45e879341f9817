"""RM-HMC with the SoftAbs metric on Neal's funnel (no reference analog —
the reference's RM-HMC needs a hand-derived metric + derivative cube,
examples/eigen/rmhmc_normal.cpp:78-111; SoftAbs (Betancourt 2013) builds it
from the Hessian of any target).  The funnel's neck (v << 0) defeats any
fixed mass matrix; the position-dependent metric walks down it."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import models

log_kernel = models.neals_funnel(dim=3, scale=3.0)
metric_fn = mcmc_tpu.softabs_metric(log_kernel, alpha=1.0)

out = mcmc_tpu.rmhmc(
    jnp.zeros(3), log_kernel, metric_fn,
    mcmc_tpu.RMHMCSettings(n_burnin_draws=500, n_keep_draws=2000,
                           step_size=0.5, n_leap_steps=4, n_fp_steps=5),
    n_chains=16, key=jax.random.PRNGKey(0))

v = np.asarray(out.draws)[..., 0].reshape(-1)
print("draws:", out.draws.shape)
print("accept:", float(np.asarray(out.n_accept_draws).sum()) / v.size)
print("v mean / std (truth 0 / 3):", round(v.mean(), 3), round(v.std(), 3))
print("deepest neck visited (v min):", round(float(v.min()), 2))
