"""Affine-invariant ensemble (stretch move) on a strongly correlated
Gaussian — no preconditioner, mass matrix, or scale tuning anywhere: the
stretch proposal is invariant under linear reparameterizations, so the
rho=0.95 correlation that would cripple an untuned random walk costs
nothing. Gradient-free, like the reference's DE-MCMC (reference
examples/eigen/de_normal_mean.cpp), but with zero tunable scales."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu

rho = 0.95
cov = jnp.array([[1.0, rho], [rho, 1.0]])
prec = jnp.linalg.inv(cov)


def log_kernel(v):
    return -0.5 * v @ prec @ v


settings = mcmc_tpu.StretchSettings(
    n_walkers=64, n_burnin_draws=1000, n_keep_draws=2000)
out = mcmc_tpu.stretch(jnp.zeros(2), log_kernel, settings,
                       key=jax.random.PRNGKey(0))

d = out.draws.reshape(-1, 2)
emp = jnp.cov(d.T)
print("empirical covariance:", [round(float(v), 3) for v in emp.ravel()])
print("true covariance:     ", [round(float(v), 3) for v in cov.ravel()])
print("mean accept/walker:  ",
      round(float(out.diagnostics["accept_rate_per_walker"].mean()), 3))
