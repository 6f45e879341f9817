"""The 'autodiff' example — reference examples/autodiff/
hmc_normal_autodiff.cpp used the external forward-mode autodiff C++ library
to avoid hand-deriving gradients; in mcmc_tpu every gradient sampler already
differentiates the user's pure-JAX log kernel with jax.grad, so the 'plain'
and 'autodiff' versions are the same program. This script just makes the
equivalence explicit."""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import models

x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(4), (1000,))


def log_kernel(params):
    """Written with no hand-coded gradient anywhere — jax.grad supplies it."""
    mu, sigma = params
    n = x_data.shape[0]
    return -n * (0.5 * jnp.log(2 * jnp.pi) + jnp.log(sigma)) \
        - jnp.sum((x_data - mu) ** 2) / (2 * sigma**2)


g = jax.grad(log_kernel)(jnp.array([2.0, 2.0]))
print("autodiff gradient at (2, 2):", g)

out = mcmc_tpu.hmc(
    jnp.array([3.0, 3.0]), log_kernel,
    mcmc_tpu.HMCSettings(step_size=0.08, n_burnin_draws=2000, n_keep_draws=2000),
)
print("hmc (autodiff) mean:", out.mean)
print("acceptance rate:", float(out.accept_rate))
