"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4). The environment
pre-imports jax pinned to the remote 'axon' TPU tunnel (JAX_PLATFORMS=axon
via sitecustomize), which would make every eager op a network round-trip —
so the platform must be overridden *after* import via jax.config, plus
XLA_FLAGS before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
