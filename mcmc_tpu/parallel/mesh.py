"""Device-mesh utilities for multi-chip sampling.

The reference's only parallelism is OpenMP threads inside one process
(SURVEY.md §2d). Here the scaling axes are:

- **chains** — embarrassingly data-parallel for RWMH/MALA/HMC/NUTS/RM-HMC;
  sharded over the mesh with ``pjit``-style input shardings, no collectives
  on the hot path;
- **population** — DE's cross-walker difference proposals read the whole
  previous generation, so the sharded sweep all-gathers the population once
  per generation over ICI (see ``parallel.de_sharded``);
- **ladder/history** — AEES's cross-temperature reads (gathers over a
  replicated history ring buffer).

On a multi-host v5p slice, call :func:`jax.distributed.initialize` first and
pass the global mesh; single-host multi-chip works out of the box.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "chain_sharding", "shard_chain_axis"]

CHAIN_AXIS = "chains"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = CHAIN_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) local/global devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def chain_sharding(mesh: Mesh, ndim: int, axis_name: str = CHAIN_AXIS) -> NamedSharding:
    """Sharding that splits the leading (chain) axis across the mesh;
    rank-0 leaves (step counters etc.) are replicated."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_chain_axis(tree, mesh: Mesh, axis_name: str = CHAIN_AXIS):
    """Place every leaf with its leading axis sharded over the mesh.

    Works for single-process meshes (plain device_put) and multi-process
    global meshes (each process contributes its addressable shards of the
    host-replicated value via ``global_chain_array`` — callers must pass
    identical values on every process, which the fixed-seed PRNG discipline
    guarantees)."""
    multiprocess = any(d.process_index != jax.process_index()
                       for d in mesh.devices.flat)
    if multiprocess:
        from mcmc_tpu.parallel.distributed import global_chain_array
        return jax.tree_util.tree_map(
            lambda x: global_chain_array(x, mesh, axis_name), tree)

    def place(x):
        return jax.device_put(x, chain_sharding(mesh, x.ndim, axis_name))
    return jax.tree_util.tree_map(place, tree)
