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
    if force_cpu or jax.default_backend() not in ("tpu",):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    return jax
