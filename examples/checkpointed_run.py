"""Restartable sampling: chunked execution with the native draw sink.

Kill this script at any point and re-run it — it resumes from the last
completed chunk and the final draws are bit-identical to an uninterrupted
run."""

from _common import setup

jax = setup()
import jax.numpy as jnp
import numpy as np

from mcmc_tpu import checkpoint, models
from mcmc_tpu.samplers import common
from mcmc_tpu.samplers.hmc import build_hmc_kernel

x_data = 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(1), (1000,))
log_kernel = models.gaussian_mean_scale_model(x_data)

init, step = build_hmc_kernel(
    log_kernel, jax.grad(log_kernel), common.make_spd(None, 2, jnp.float32),
    step_size=0.08, n_leap_steps=1,
)
state0 = jax.vmap(init)(jnp.tile(jnp.array([3.0, 3.0]), (32, 1)))

runner = checkpoint.ChunkedRunner(
    jax.vmap(step), collect_fn=lambda st: st.position,
    directory="/tmp/mcmc_tpu_checkpointed_run",
)
final_state, draws, n_accept = runner.run(
    jax.random.PRNGKey(0), state0, n_draws=2000, chunk_size=500
)
print("draws:", draws.shape, "(memmapped from the native sink)")
print("posterior mean:", np.array(draws[1000:]).mean(axis=(0, 1)))
