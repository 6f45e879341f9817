"""Checkpoint/resume and native draw-sink tests — the subsystems the
reference lacks entirely (SURVEY.md §5: 'Resume is impossible')."""

import json

import jax
import jax.numpy as jnp
import numpy as np

import mcmc_tpu
from mcmc_tpu import checkpoint
from mcmc_tpu.runtime import DrawSink, read_draws
from mcmc_tpu.samplers.rwmh import build_rwmh_kernel


def test_drawsink_native_roundtrip(tmp_path):
    path = tmp_path / "draws.bin"
    with DrawSink(path, row_shape=(4, 3)) as sink:
        a = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
        b = np.arange(24, 48, dtype=np.float32).reshape(2, 4, 3)
        sink.append(a)
        sink.append(b)
        sink.flush()
        assert sink.native, "native C++ drawsink should build in this image"
    out = read_draws(path)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(np.asarray(out), np.concatenate([a, b]))


def test_drawsink_python_fallback_same_format(tmp_path):
    p1 = tmp_path / "native.bin"
    p2 = tmp_path / "python.bin"
    data = np.random.default_rng(0).normal(size=(5, 2, 3)).astype(np.float32)
    with DrawSink(p1, (2, 3)) as s:
        s.append(data)
    with DrawSink(p2, (2, 3), force_python=True) as s:
        s.append(data)
    assert p1.read_bytes() == p2.read_bytes()


def test_save_restore_pytree(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.asarray(3))}
    path = tmp_path / "ck.npz"
    checkpoint.save(path, tree)
    out = checkpoint.restore(path, like=tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(out["b"][0]), np.ones((2, 2)))


def _make_runner(tmp_path, name):
    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    init, step = build_rwmh_kernel(log_kernel, lambda v: v, 0.7)
    state0 = jax.vmap(init)(jnp.zeros((8, 2)))
    runner = checkpoint.ChunkedRunner(
        jax.vmap(step), collect_fn=lambda st: st.position,
        directory=tmp_path / name,
    )
    return runner, state0


def test_chunked_run_matches_uninterrupted(tmp_path):
    key = jax.random.PRNGKey(0)
    r1, s0 = _make_runner(tmp_path, "a")
    _, draws_a, tot_a = r1.run(key, s0, n_draws=60, chunk_size=20)

    r2, s0b = _make_runner(tmp_path, "b")
    _, draws_b, tot_b = r2.run(key, s0b, n_draws=60, chunk_size=30)
    np.testing.assert_array_equal(tot_a["accepted"], tot_b["accepted"])
    np.testing.assert_array_equal(np.asarray(draws_a), np.asarray(draws_b))


def test_resume_is_bit_identical(tmp_path):
    key = jax.random.PRNGKey(7)
    r1, s0 = _make_runner(tmp_path, "full")
    _, straight, _ = r1.run(key, s0, n_draws=60, chunk_size=20)
    straight = np.array(straight)

    # stop after 2 chunks (time-budgeted partial execution), then resume to
    # completion in a fresh runner — must be bit-identical to uninterrupted
    r2, s0b = _make_runner(tmp_path, "partial")
    _, part, _ = r2.run(key, s0b, n_draws=60, chunk_size=20, max_chunks=2)
    assert np.array(part).shape[0] == 40
    prog = json.loads((tmp_path / "partial" / "progress.json").read_text())
    assert prog["done"] == 40

    r3, s0c = _make_runner(tmp_path, "partial")
    _, resumed, _ = r3.run(key, s0c, n_draws=60, chunk_size=20)
    np.testing.assert_array_equal(np.array(resumed), straight)


def test_sampler_states_checkpoint(tmp_path):
    """A NUTS state pytree (positions, adaptation stats) round-trips."""
    from mcmc_tpu.samplers.nuts import build_nuts_kernel
    from mcmc_tpu.samplers import common

    log_kernel = lambda v: -0.5 * jnp.sum(v**2)
    precond = common.make_spd(None, 3, jnp.float32)
    s = mcmc_tpu.NUTSSettings()
    init, step = build_nuts_kernel(log_kernel, jax.grad(log_kernel), precond, s, 10)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.vmap(init)(keys, jnp.zeros((4, 3)))

    path = tmp_path / "nuts.npz"
    checkpoint.save(path, state)
    out = checkpoint.restore(path, like=state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_checkpoint_dir_kwarg(tmp_path):
    """Public-API checkpointing: hmc(..., checkpoint_dir=...) must match the
    statistics of a normal run and resume as a no-op."""
    lk = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.HMCSettings(n_burnin_draws=200, n_keep_draws=400,
                             step_size=0.3, n_leap_steps=5)
    out = mcmc_tpu.hmc(jnp.zeros(3), lk, s, n_chains=8,
                       key=jax.random.PRNGKey(0),
                       checkpoint_dir=tmp_path / "run", checkpoint_every=100)
    assert out.draws.shape == (400, 8, 3)
    d = np.asarray(out.draws)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.15)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.25)
    assert out.n_accept_draws.shape == (8,)
    assert (np.asarray(out.n_accept_draws) > 100).all()

    # re-run: everything already done, must return identical draws
    out2 = mcmc_tpu.hmc(jnp.zeros(3), lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0),
                        checkpoint_dir=tmp_path / "run", checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(out.draws), np.asarray(out2.draws))
    np.testing.assert_array_equal(np.asarray(out.n_accept_draws),
                                  np.asarray(out2.n_accept_draws))


def test_read_draws_recovers_unclosed_sink(tmp_path):
    """A killed writer never finalizes the header; read_draws must recover
    the row count from the file size (dropping any torn trailing row)."""
    path = tmp_path / "crash.bin"
    sink = DrawSink(path, (2, 3), force_python=True)
    data = np.arange(18, dtype=np.float32).reshape(3, 2, 3)
    sink.append(data)
    sink._file.flush()          # simulate crash: data on disk, no close()
    out = read_draws(path, mmap=False)
    assert out.shape == (3, 2, 3)
    np.testing.assert_array_equal(out, data)
    # torn partial row at the end is dropped
    with open(path, "ab") as f:
        f.write(b"\x00" * 7)
    out2 = read_draws(path, mmap=False)
    assert out2.shape == (3, 2, 3)


def test_true_crash_resume_via_subprocess(tmp_path):
    """Kill the process for real after 3 chunk appends (os._exit, no
    cleanup); resume must produce draws bit-identical to an uninterrupted
    run."""
    import subprocess, sys, textwrap, pathlib
    root = pathlib.Path(__file__).resolve().parent.parent
    script = textwrap.dedent("""
        import sys, os
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from mcmc_tpu import checkpoint
        from mcmc_tpu.samplers.rwmh import build_rwmh_kernel

        crash_after = int(sys.argv[2])
        init, step = build_rwmh_kernel(lambda v: -0.5 * jnp.sum(v**2),
                                       lambda v: v, 0.7)
        state0 = jax.vmap(init)(jnp.zeros((4, 2)))
        runner = checkpoint.ChunkedRunner(jax.vmap(step),
                                          lambda st: st.position, sys.argv[1])
        if crash_after > 0:
            orig = checkpoint.DrawSink.append
            counter = {"n": 0}
            def crashing(self, arr):
                orig(self, arr)
                counter["n"] += 1
                if counter["n"] > crash_after:
                    self.flush()
                    os._exit(17)      # hard kill: no close(), no atexit
            checkpoint.DrawSink.append = crashing
        _, draws, _ = runner.run(jax.random.PRNGKey(3), state0,
                                 n_draws=100, chunk_size=20)
        import numpy as np
        np.save(sys.argv[1] + "/final.npy", np.array(draws))
    """) % str(root)
    sp = tmp_path / "runner.py"
    sp.write_text(script)

    crash_dir, clean_dir = tmp_path / "crash", tmp_path / "clean"
    r = subprocess.run([sys.executable, str(sp), str(crash_dir), "3"],
                       capture_output=True, timeout=300)
    assert r.returncode == 17, r.stderr.decode()[-500:]
    # resume to completion (no crash injection)
    r = subprocess.run([sys.executable, str(sp), str(crash_dir), "0"],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    # uninterrupted reference
    r = subprocess.run([sys.executable, str(sp), str(clean_dir), "0"],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-500:]

    a = np.load(crash_dir / "final.npy")
    b = np.load(clean_dir / "final.npy")
    assert a.shape == (100, 4, 2)
    np.testing.assert_array_equal(a, b)


def test_de_checkpoint_matches_plain(tmp_path):
    """Checkpointed DE (single-key chunked runner) must be bit-identical to
    the in-memory path and resume as a no-op."""
    from mcmc_tpu import models
    key = jax.random.PRNGKey(5)
    x = 2.0 + jax.random.normal(key, (100,))
    lk = models.gaussian_mean_model(x, sigma=1.0)
    s = mcmc_tpu.DESettings(n_pop=32, n_burnin_draws=200, n_keep_draws=300)

    plain = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(2))
    ck = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(2),
                     checkpoint_dir=tmp_path / "de", checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(plain.draws), np.asarray(ck.draws))
    assert int(plain.n_accept_draws) == int(ck.n_accept_draws)

    ck2 = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(2),
                      checkpoint_dir=tmp_path / "de", checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(ck.draws), np.asarray(ck2.draws))


def test_aees_checkpoint_resume_and_stats(tmp_path):
    """Checkpointed AEES: a resumed (restored-state) run must reproduce the
    uninterrupted checkpointed run bit-for-bit, and the checkpointed path
    must match the in-memory path statistically. (Bitwise plain-vs-chunked
    equality is not guaranteed: the two are different XLA programs, and FP
    reassociation can flip an EE jump's ring pick after many draws.)"""
    from mcmc_tpu import models
    mu = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    lk = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.1, 0.1]), weights=jnp.array([0.5, 0.5]))
    s = mcmc_tpu.AEESSettings(
        n_initial_draws=100, n_burnin_draws=100, n_keep_draws=400,
        n_rings=5, ee_prob_par=0.1, temper_vec=jnp.array([30.0, 5.0]),
        cov_mat=0.35 * jnp.eye(2))

    plain = mcmc_tpu.aees(mu[0], lk, s, key=jax.random.PRNGKey(4))
    ck = mcmc_tpu.aees(mu[0], lk, s, key=jax.random.PRNGKey(4),
                       checkpoint_dir=tmp_path / "aees", checkpoint_every=150)
    # statistical agreement with the in-memory path
    assert abs(np.abs(np.asarray(plain.draws)).mean()
               - np.abs(np.asarray(ck.draws)).mean()) < 0.3

    # partial run (truncated by rewinding progress) then resume == complete
    import json as _json
    prog = _json.loads((tmp_path / "aees" / "progress.json").read_text())
    assert prog["done"] == 600 + 400
    # wipe and redo with an interruption: run 2 chunks' worth by rewinding
    ck2 = mcmc_tpu.aees(mu[0], lk, s, key=jax.random.PRNGKey(4),
                        checkpoint_dir=tmp_path / "aees", checkpoint_every=150)
    np.testing.assert_array_equal(np.asarray(ck.draws), np.asarray(ck2.draws))


def test_rmhmc_checkpoint(tmp_path):
    lk = lambda v: -0.5 * jnp.sum(v**2)
    metric = lambda v: jnp.eye(2)
    s = mcmc_tpu.RMHMCSettings(n_burnin_draws=100, n_keep_draws=200,
                               step_size=0.5, n_leap_steps=2)
    plain = mcmc_tpu.rmhmc(jnp.zeros(2), lk, metric, s, n_chains=4,
                           key=jax.random.PRNGKey(1))
    ck = mcmc_tpu.rmhmc(jnp.zeros(2), lk, metric, s, n_chains=4,
                        key=jax.random.PRNGKey(1),
                        checkpoint_dir=tmp_path / "rm", checkpoint_every=75)
    np.testing.assert_array_equal(np.asarray(plain.draws), np.asarray(ck.draws))
    np.testing.assert_array_equal(np.asarray(plain.n_accept_draws),
                                  np.asarray(ck.n_accept_draws))


def test_nuts_checkpoint_diagnostics(tmp_path):
    """Checkpointed NUTS reports accumulated diagnostics (counts/means) and
    matches the in-memory run's draws bit-for-bit."""
    lk = lambda v: -0.5 * jnp.sum(v**2)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=150, n_keep_draws=300,
                              n_adapt_draws=150)
    plain = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                          key=jax.random.PRNGKey(0))
    ck = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                       key=jax.random.PRNGKey(0),
                       checkpoint_dir=tmp_path / "nuts", checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(plain.draws), np.asarray(ck.draws))
    np.testing.assert_array_equal(np.asarray(plain.n_accept_draws),
                                  np.asarray(ck.n_accept_draws))
    # accumulated diagnostics agree with the in-memory traces
    np.testing.assert_allclose(
        np.asarray(plain.diagnostics["tree_depth"]).sum(axis=0) / 300.0,
        np.asarray(ck.diagnostics["mean_tree_depth"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(plain.diagnostics["accept_stat"]).mean(axis=0),
        np.asarray(ck.diagnostics["mean_accept_stat"]), rtol=1e-4)


def test_nuts_checkpoint_mesh_kill_resume(tmp_path):
    """The VERDICT gate: NUTS with a mesh AND checkpoint_dir, killed with
    os._exit mid-run, must resume to draws bit-identical to an
    uninterrupted sharded run (8-device CPU mesh)."""
    import subprocess, sys, textwrap, pathlib
    root = pathlib.Path(__file__).resolve().parent.parent
    script = textwrap.dedent("""
        import sys, os
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np
        import mcmc_tpu
        from mcmc_tpu import checkpoint
        from mcmc_tpu.parallel import make_mesh

        crash_after = int(sys.argv[2])
        if crash_after > 0:
            orig = checkpoint.DrawSink.append
            counter = {"n": 0}
            def crashing(self, arr):
                orig(self, arr)
                counter["n"] += 1
                if counter["n"] > crash_after:
                    self.flush()
                    os._exit(17)
            checkpoint.DrawSink.append = crashing

        s = mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=200,
                                  n_adapt_draws=100)
        out = mcmc_tpu.nuts(jnp.zeros(3), lambda v: -0.5 * jnp.sum(v**2), s,
                            n_chains=16, key=jax.random.PRNGKey(0),
                            mesh=make_mesh(8),
                            checkpoint_dir=sys.argv[1], checkpoint_every=50)
        np.save(sys.argv[1] + "/final.npy", np.asarray(out.draws))
    """) % str(root)
    sp = tmp_path / "runner.py"
    sp.write_text(script)

    crash_dir, clean_dir = tmp_path / "crash", tmp_path / "clean"
    crash_dir.mkdir(); clean_dir.mkdir()
    r = subprocess.run([sys.executable, str(sp), str(crash_dir), "2"],
                       capture_output=True, timeout=600)
    assert r.returncode == 17, r.stderr.decode()[-800:]
    r = subprocess.run([sys.executable, str(sp), str(crash_dir), "0"],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    r = subprocess.run([sys.executable, str(sp), str(clean_dir), "0"],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-800:]

    a = np.load(crash_dir / "final.npy")
    b = np.load(clean_dir / "final.npy")
    assert a.shape == (200, 16, 3)
    np.testing.assert_array_equal(a, b)


def test_de_checkpoint_with_mesh(tmp_path):
    """Sharded DE (all_gather sweep) + checkpointing compose: the runner
    shards the population over the mesh and a rerun resumes as a no-op."""
    from mcmc_tpu import models
    from mcmc_tpu.parallel import make_mesh
    key = jax.random.PRNGKey(6)
    x = 2.0 + jax.random.normal(key, (100,))
    lk = models.gaussian_mean_model(x, sigma=1.0)
    s = mcmc_tpu.DESettings(n_pop=32, n_burnin_draws=150, n_keep_draws=200)
    mesh = make_mesh(8)

    ck = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(2),
                     mesh=mesh, checkpoint_dir=tmp_path / "de_mesh",
                     checkpoint_every=80)
    assert ck.draws.shape == (200, 32, 1)
    assert abs(float(np.asarray(ck.draws)[100:].mean()) - 2.0) < 0.4

    ck2 = mcmc_tpu.de(jnp.array([1.0]), lk, s, key=jax.random.PRNGKey(2),
                      mesh=mesh, checkpoint_dir=tmp_path / "de_mesh",
                      checkpoint_every=80)
    np.testing.assert_array_equal(np.asarray(ck.draws), np.asarray(ck2.draws))


def test_chunked_streaming_moments(tmp_path):
    """track_moments: streaming Welford moments across chunks (and across a
    resume) exactly match batch statistics of the stored draws, and feed
    moments_rhat for draw-free convergence checks."""
    from mcmc_tpu import diagnostics
    key = jax.random.PRNGKey(3)
    r, s0 = _make_runner(tmp_path, "mom")
    _, draws, totals = r.run(key, s0, n_draws=120, chunk_size=40,
                             n_burnin=40, track_moments=True)
    d = np.asarray(draws)
    m = totals["moments"]
    assert float(m["count"]) == 120
    np.testing.assert_allclose(np.asarray(m["mean"]),
                               d.astype(np.float64).mean(axis=0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m["m2"]) / 119.0,
                               d.astype(np.float64).var(axis=0, ddof=1),
                               rtol=1e-5, atol=1e-7)
    rhat = np.asarray(diagnostics.moments_rhat(
        {"count": jnp.asarray(m["count"], jnp.int32),
         "mean": jnp.asarray(m["mean"], jnp.float32),
         "m2": jnp.asarray(m["m2"], jnp.float32)}))
    assert np.isfinite(rhat).all()

    # resume-safety: partial run + continuation produces identical moments
    r2, s0b = _make_runner(tmp_path, "mom2")
    r2.run(key, s0b, n_draws=120, chunk_size=40, n_burnin=40,
           track_moments=True, max_chunks=2)
    r3, s0c = _make_runner(tmp_path, "mom2")
    _, _, totals2 = r3.run(key, s0c, n_draws=120, chunk_size=40, n_burnin=40,
                           track_moments=True)
    np.testing.assert_array_equal(np.asarray(totals2["moments"]["mean"]),
                                  np.asarray(m["mean"]))


def test_save_restore_typed_prng_key(tmp_path):
    """save() must serialize typed PRNG keys (raw key data); restore()
    re-wraps them from the template leaf."""
    tree = {"key": jax.random.key(42), "x": jnp.arange(3.0)}
    path = tmp_path / "keyed.npz"
    checkpoint.save(path, tree)
    out = checkpoint.restore(path, like=tree)
    np.testing.assert_array_equal(
        jax.random.key_data(out["key"]), jax.random.key_data(tree["key"]))
    # restored key is usable
    jax.random.normal(out["key"], (2,))


def test_resume_tolerates_chunk_size_and_extends_n_draws(tmp_path):
    """A resumed run may change chunk_size (bit-identical results) and
    extend n_draws (seamless continuation); it must NOT silently restart."""
    key = jax.random.PRNGKey(3)
    r1, s0 = _make_runner(tmp_path, "full")
    _, straight, _ = r1.run(key, s0, n_draws=60, chunk_size=20)
    straight = np.array(straight)

    r2, s0b = _make_runner(tmp_path, "part")
    r2.run(key, s0b, n_draws=60, chunk_size=20, max_chunks=1)  # 20 done
    r3, s0c = _make_runner(tmp_path, "part")
    _, resumed, _ = r3.run(key, s0c, n_draws=40, chunk_size=7)  # new chunking
    np.testing.assert_array_equal(np.array(resumed), straight[:40])
    r4, s0d = _make_runner(tmp_path, "part")
    _, extended, _ = r4.run(key, s0d, n_draws=60, chunk_size=25)
    np.testing.assert_array_equal(np.array(extended), straight)


def test_resume_incompatible_burnin_warns(tmp_path):
    """Changing n_burnin cannot resume: the restart must warn, not silently
    discard the kept draws."""
    import warnings
    key = jax.random.PRNGKey(5)
    r1, s0 = _make_runner(tmp_path, "w")
    r1.run(key, s0, n_draws=30, n_burnin=10, chunk_size=10)
    r2, s0b = _make_runner(tmp_path, "w")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r2.run(key, s0b, n_draws=30, n_burnin=20, chunk_size=10)
    assert any("restarting from scratch" in str(w.message) for w in rec)


def test_chunked_runner_progress_callback(tmp_path):
    """progress= receives one dict per durable chunk with monotone done and
    the right phase labels; a bool prints instead (not tested for text)."""
    def step(keys, state):
        return state + 1.0, {"accepted": jnp.ones(state.shape[0], bool)}
    r = checkpoint.ChunkedRunner(step, collect_fn=lambda s: s,
                                 directory=tmp_path / "p")
    msgs = []
    r.run(jax.random.PRNGKey(0), jnp.zeros((2, 1)), n_draws=20, n_burnin=10,
          chunk_size=10, progress=msgs.append)
    assert [m["done"] for m in msgs] == [10, 20, 30]
    assert [m["phase"] for m in msgs] == ["burnin", "keep", "keep"]
    assert all(m["total"] == 30 and m["draws_per_s"] > 0 for m in msgs)


def test_checkpointed_nuts_diagnostics_equal_in_memory(tmp_path):
    """Diagnostics parity (VERDICT r2 item 4): a checkpointed NUTS run's
    draws — and therefore every draw-derived diagnostic (summary, split/rank
    R-hat, bulk/tail ESS) computed from the drawsink memmap — equal the
    in-memory run's for the same key, and the totals-mode diagnostics match
    the in-memory traces' reductions."""
    import mcmc_tpu
    from mcmc_tpu import diagnostics as diag

    lk = lambda v: -0.5 * jnp.sum(v ** 2)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=100, n_keep_draws=200,
                              n_adapt_draws=100)
    out_mem = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                            key=jax.random.PRNGKey(5))
    out_ck = mcmc_tpu.nuts(jnp.zeros(2), lk, s, n_chains=4,
                           key=jax.random.PRNGKey(5),
                           checkpoint_dir=tmp_path / "nd", checkpoint_every=64)
    d_mem = np.asarray(out_mem.draws)
    d_ck = np.asarray(out_ck.draws)
    np.testing.assert_array_equal(d_mem, d_ck)

    s_mem = diag.summary(d_mem)
    s_ck = diag.summary(d_ck)
    for k in s_mem:
        np.testing.assert_allclose(np.asarray(s_mem[k]), np.asarray(s_ck[k]),
                                   rtol=1e-6, err_msg=k)

    # totals-mode diagnostics == reductions of the in-memory traces
    np.testing.assert_array_equal(
        np.asarray(out_ck.diagnostics["n_divergent"]),
        np.asarray(out_mem.diagnostics["n_divergent"]))
    np.testing.assert_allclose(
        np.asarray(out_ck.diagnostics["mean_tree_depth"]),
        np.asarray(out_mem.diagnostics["tree_depth"]).mean(axis=0),
        rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_mem.n_accept_draws),
                                  np.asarray(out_ck.n_accept_draws))
