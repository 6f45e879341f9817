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


_COLLECTIVE_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from mcmc_tpu.parallel import init_distributed, global_mesh
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    import mcmc_tpu

    mesh = global_mesh()

    # 1) sharded DE: the all_gather of the previous generation CROSSES the
    # Gloo process boundary every sweep (parallel/de_sharded.py) — the
    # collective path the chain-parallel HMC test never exercises
    lk = lambda v: -0.5 * jnp.sum((v - 1.5) ** 2)
    out_de = mcmc_tpu.de(
        jnp.zeros(3), lk,
        mcmc_tpu.DESettings(n_pop=32, n_burnin_draws=300, n_keep_draws=600,
                            initial_lb=jnp.full(3, 0.0),
                            initial_ub=jnp.full(3, 3.0)),
        key=jax.random.PRNGKey(0), mesh=mesh)
    de_mean = float(jnp.mean(out_de.draws))
    de_var = float(jnp.var(out_de.draws))

    # 2) ladder-sharded PT: one rung per device; each swap round is a pair
    # of neighbor ppermutes riding the process boundary between devices
    # 1 (proc 0) and 2 (proc 1) (parallel/pt_sharded.py)
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    from mcmc_tpu.models import gaussian_mixture_model
    lk_mix = gaussian_mixture_model(mu, jnp.array([0.3, 0.3]),
                                    jnp.array([0.5, 0.5]))
    from mcmc_tpu.parallel.pt_sharded import pt_sharded
    out_pt = pt_sharded(
        mu[0], lk_mix,
        mcmc_tpu.PTSettings(n_burnin_draws=400, n_keep_draws=1200,
                            n_temps=4, max_temp=40.0, adapt_temps=False,
                            inner="rwmh", par_scale=0.8),
        mesh=mesh, key=jax.random.PRNGKey(1))
    pt_mean = float(jnp.mean(out_pt.draws))
    # mode occupancy of the cold chain: both modes must be visited, which
    # only happens via swaps propagated down the ppermute ladder
    frac_hi = float(jnp.mean((out_pt.draws[:, 0] > 0)))
    swap = [float(v) for v in out_pt.diagnostics["swap_accept_rate"]]

    # 3) ladder-sharded AEES: one ladder position per device; every draw
    # ppermutes the (state, kernel value) ring one step down the ladder,
    # crossing the process boundary between devices 1 (proc 0) and 2
    # (proc 1) — the gather-by-ring collective (parallel/aees_sharded.py)
    from mcmc_tpu.parallel.aees_sharded import aees_sharded
    out_ae = aees_sharded(
        mu[0], lk_mix,
        mcmc_tpu.AEESSettings(n_initial_draws=200, n_burnin_draws=200,
                              n_keep_draws=1500, n_rings=7,
                              ee_prob_par=0.1,
                              temper_vec=jnp.array([40.0, 10.0, 3.0]),
                              cov_mat=0.5 * jnp.eye(2)),
        mesh=mesh, key=jax.random.PRNGKey(2), history_capacity=256)
    ae_mean = float(jnp.mean(out_ae.draws))
    ae_frac_hi = float(jnp.mean(out_ae.draws[:, 0] > 0))

    print(json.dumps({"pid": pid, "de_mean": de_mean, "de_var": de_var,
                      "de_shape": list(out_de.draws.shape),
                      "pt_mean": pt_mean, "frac_hi": frac_hi,
                      "swap": swap, "ae_mean": ae_mean,
                      "ae_frac_hi": ae_frac_hi,
                      "ae_shape": list(out_ae.draws.shape)}), flush=True)
""") % str(ROOT)


def _run_two(script_text, tmp_path, name):
    script = tmp_path / name
    script.write_text(script_text)
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
    return outs


def test_two_process_collective_de_pt(tmp_path):
    """Cross-process COLLECTIVES: sharded DE's per-generation all_gather and
    sharded PT's neighbor ppermute both cross the 2-process Gloo boundary
    (VERDICT r2 item 1b)."""
    outs = _run_two(_COLLECTIVE_WORKER, tmp_path, "collective_worker.py")

    # both processes observe identical global statistics of the same run
    np.testing.assert_allclose(outs[0]["de_mean"], outs[1]["de_mean"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["pt_mean"], outs[1]["pt_mean"], rtol=1e-6)

    # DE targets N(1.5, 1) per coordinate
    assert outs[0]["de_shape"] == [600, 32, 3]
    assert abs(outs[0]["de_mean"] - 1.5) < 0.15, outs[0]
    assert abs(outs[0]["de_var"] - 1.0) < 0.35, outs[0]

    # PT cold chain visits BOTH modes of the +-2 mixture (requires swaps
    # riding the ppermute ladder across the process boundary) and its
    # pooled mean is near 0
    assert 0.15 < outs[0]["frac_hi"] < 0.85, outs[0]
    assert abs(outs[0]["pt_mean"]) < 1.2, outs[0]
    assert all(0.0 < r <= 1.0 for r in outs[0]["swap"]), outs[0]

    # AEES cold chain visits BOTH modes (requires EE jumps drawn from the
    # ring history ppermuted down the ladder across the process boundary)
    np.testing.assert_allclose(outs[0]["ae_mean"], outs[1]["ae_mean"],
                               rtol=1e-6)
    assert outs[0]["ae_shape"] == [1500, 2]
    assert 0.1 < outs[0]["ae_frac_hi"] < 0.9, outs[0]
    assert abs(outs[0]["ae_mean"]) < 1.5, outs[0]


def test_multihost_launch_script():
    """scripts/run_multihost.sh (VERDICT r4 item 7): the one-command
    multi-host launcher joins two Gloo-coupled processes and reports
    per-process local sample rates — the exact command that captures the
    BASELINE >= 85% 1->2-host number the moment hardware exists."""
    import os
    import subprocess
    port = _free_port()
    script = str(ROOT / "scripts" / "run_multihost.sh")
    env = {**os.environ, "MCMC_MULTIHOST_CPU": "2"}
    extra = ["--chains-per-device", "16", "--seconds", "1"]
    procs = []
    rows = []
    try:
        procs = [subprocess.Popen(
            ["bash", script, f"localhost:{port}", "2", str(i)] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for i in range(2)]
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, err.decode()[-1200:]
            line = [l for l in out.decode().splitlines()
                    if l.startswith("{")][-1]
            rows.append(json.loads(line))
    finally:
        # a failed rank must not leave its sibling blocked in the Gloo
        # rendezvous holding the port for the rest of the pytest run
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    assert {r["pid"] for r in rows} == {0, 1}
    for r in rows:
        assert r["nproc"] == 2 and r["devices"] == 4
        assert r["local_samples_per_sec"] > 0


def test_two_process_chain_sharded_hmc(tmp_path):
    outs = _run_two(_WORKER, tmp_path, "worker.py")

    # both processes observe the same global statistics of the same run
    assert outs[0]["shape"] == [500, 32, 3]
    np.testing.assert_allclose(outs[0]["mean"], outs[1]["mean"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["var"], outs[1]["var"], rtol=1e-6)
    # and they are statistically correct for N(1.5, 1)
    assert abs(outs[0]["mean"] - 1.5) < 0.1, outs[0]
    assert abs(outs[0]["var"] - 1.0) < 0.3, outs[0]
    assert 0.3 < outs[0]["acc"] < 1.0
    assert outs[0]["dp_ok"] and outs[1]["dp_ok"]
