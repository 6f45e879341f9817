#!/usr/bin/env python
"""Scaling-efficiency harness: samples/s vs device count (BASELINE.md:
">= 85% samples/s efficiency from 1 host to >= 2 hosts").

Runs the chain-sharded HMC workload on meshes of 1, 2, ..., all available
devices with the per-device chain count held fixed (weak scaling — the
configuration that matters for MCMC, where you add chips to run more
chains), and reports samples/s plus parallel efficiency vs the single-device
rate. On a multi-host slice, call ``mcmc_tpu.parallel.init_distributed()``
on every process first and build the mesh with
``mcmc_tpu.parallel.global_mesh()``; the cross-process plumbing (global
arrays, SPMD collectives over the process boundary) is exercised in
software by ``tests/test_multiprocess.py`` (2 CPU processes x 4 virtual
devices). On a single chip this harness degenerates to one row. Pass
``--cpu`` to exercise the full code path on the virtual host-device mesh
(validates the harness, not ICI bandwidth).

Prints one JSON line: {"devices": [...], "samples_per_sec": [...],
"efficiency": [...]}.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU + 8 virtual devices (harness validation)")
    ap.add_argument("--chains-per-device", type=int, default=4096)
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from mcmc_tpu import models
    from mcmc_tpu.samplers import common
    from mcmc_tpu.samplers.hmc import build_hmc_kernel
    from mcmc_tpu.parallel import make_mesh, shard_chain_axis

    D, N, L = 100, 1000, 4
    X, y, _ = models.make_logistic_regression_data(jax.random.PRNGKey(0), N, D)
    lk = models.logistic_regression_model(X, y, matmul_dtype=jnp.bfloat16)
    precond = common.make_spd(None, D, jnp.float32)
    init, step = build_hmc_kernel(lk, jax.grad(lk), precond, 0.01, L)
    bstep = jax.vmap(step, axis_name=common.CHAIN_AXIS_NAME)

    n_dev_all = jax.device_count()
    sizes = []
    d = 1
    while d <= n_dev_all:
        sizes.append(d)
        d *= 2
    if sizes[-1] != n_dev_all:
        sizes.append(n_dev_all)

    STEPS = 20
    results = []
    for nd in sizes:
        mesh = make_mesh(nd)
        C = args.chains_per_device * nd
        state = jax.vmap(init)(
            0.05 * jax.random.normal(jax.random.PRNGKey(1), (C, D)))
        keys = jax.random.split(jax.random.PRNGKey(2), C)
        state = shard_chain_axis(state, mesh)
        keys = shard_chain_axis(keys, mesh)

        @jax.jit
        def run(keys, state):
            def body(c, _):
                st, ks = c
                pair = jax.vmap(lambda k: jax.random.split(k, 2))(ks)
                st, _info = bstep(pair[:, 1], st)
                return (st, pair[:, 0]), None
            (st, ks), _ = lax.scan(body, (state, keys), None, length=STEPS)
            return ks, st

        keys, state = run(keys, state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < args.seconds:
            keys, state = run(keys, state)
            jax.block_until_ready(state)
            n += 1
        el = time.perf_counter() - t0
        sps = n * STEPS * C / el
        results.append((nd, sps))

    base = results[0][1]
    out = {
        "workload": "chain-sharded HMC, weak scaling (fixed chains/device)",
        "chains_per_device": args.chains_per_device,
        "devices": [r[0] for r in results],
        "samples_per_sec": [round(r[1], 1) for r in results],
        "efficiency": [round(r[1] / (base * r[0]), 3) for r in results],
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
