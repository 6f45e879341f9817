"""Shared example setup: run on TPU when available, otherwise a multi-device
CPU host (mirrors tests/conftest.py; the sandbox pre-pins jax to a remote
TPU tunnel, so CPU must be forced after import)."""

import os
import pathlib
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402


def setup(force_cpu=False):
    # MCMC_EXAMPLES_CPU short-circuits the backend probe entirely:
    # jax.default_backend() initializes the (possibly remote) TPU backend,
    # which can stall for minutes when the tunnel is busy/unhealthy.
    if force_cpu or os.environ.get("MCMC_EXAMPLES_CPU"):
        jax.config.update("jax_platforms", "cpu")
        return jax
    if jax.default_backend() not in ("tpu",):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    return jax
