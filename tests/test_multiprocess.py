"""Multi-process distributed execution (VERDICT r1 item 7): two CPU
processes x 4 virtual devices each run chain-sharded HMC end-to-end over an
8-device global mesh, with collectives (Gloo) crossing the process boundary
— the software stand-in for the multi-host DCN path the BASELINE >= 85%
scaling target depends on. The reference has no multi-process capability at
all (SURVEY.md §2c)."""

import json
import pathlib
import socket
import subprocess
import sys
import textwrap

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from mcmc_tpu.parallel import init_distributed, global_mesh
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import mcmc_tpu
    from mcmc_tpu.samplers import common
    from mcmc_tpu.samplers.hmc import build_hmc_kernel

    mesh = global_mesh()

    # chain-sharded HMC end-to-end through the public run loop: every
    # process executes the same program; GSPMD partitions the chain axis
    log_kernel = lambda v: -0.5 * jnp.sum((v - 1.5) ** 2)
    precond = common.make_spd(None, 3, jnp.float32)
    grad_fn = jax.grad(log_kernel)
    init, step = build_hmc_kernel(log_kernel, grad_fn, precond,
                                  step_size=0.5, n_leap_steps=4)
    n_chains = 32
    state0 = jax.vmap(init)(jnp.zeros((n_chains, 3)))
    _, draws, infos = common.run_sampler_loop(
        jax.random.PRNGKey(0), state0, step, n_burnin=200, n_keep=500,
        collect_fn=lambda st: st.position, mesh=mesh)

    # global reductions are SPMD-legal on every process
    mean = float(jnp.mean(draws))
    var = float(jnp.var(draws))
    acc = float(jnp.mean(infos["accepted"]))

    # tall-data path across the process boundary: a (chains, data) grid
    # over the 8 global devices; shard_data_axis must take its
    # multi-process branch (global_chain_array on the data axis)
    from mcmc_tpu.parallel import make_grid_mesh, data_parallel_kernel
    grid = make_grid_mesh(2, 4)
    Xd = jnp.linspace(-1.0, 1.0, 64 * 3).reshape(64, 3)  # identical per proc
    def lk_of_data(b, data):
        return -0.5 * jnp.sum((data[0] @ b - 1.0) ** 2) / 64 \\
            - 0.5 * jnp.sum(b**2)
    lk_dp = data_parallel_kernel(lk_of_data, (Xd,), grid)
    out_dp = mcmc_tpu.hmc(
        jnp.zeros(3), lk_dp,
        mcmc_tpu.HMCSettings(step_size=0.2, n_leap_steps=2,
                             n_burnin_draws=5, n_keep_draws=5),
        n_chains=4, key=jax.random.PRNGKey(1), mesh=grid)
    dp_ok = bool(jnp.isfinite(out_dp.draws).all()) \\
        and out_dp.draws.shape == (5, 4, 3)

    print(json.dumps({"pid": pid, "mean": mean, "var": var, "acc": acc,
                      "shape": list(draws.shape), "dp_ok": dp_ok}), flush=True)
""") % str(ROOT)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_chain_sharded_hmc(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()

    procs = [subprocess.Popen([sys.executable, str(script), str(port), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-1200:]
        line = [l for l in out.decode().splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    # both processes observe the same global statistics of the same run
    assert outs[0]["shape"] == [500, 32, 3]
    np.testing.assert_allclose(outs[0]["mean"], outs[1]["mean"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["var"], outs[1]["var"], rtol=1e-6)
    # and they are statistically correct for N(1.5, 1)
    assert abs(outs[0]["mean"] - 1.5) < 0.1, outs[0]
    assert abs(outs[0]["var"] - 1.0) < 0.3, outs[0]
    assert 0.3 < outs[0]["acc"] < 1.0
    assert outs[0]["dp_ok"] and outs[1]["dp_ok"]
