#!/usr/bin/env python
"""Benchmark: leapfrog steps/sec/chip + converged NUTS ESS/sec, 100-d
Bayesian logistic regression (the BASELINE.md primary workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against a single-thread C++ sequential HMC of the same
model, structured like the reference's hmc_impl and compiled with the
reference's own -O3 -march=native flags (benchmarks/baseline_hmc.cpp) — the
reference library itself publishes no numbers and its Armadillo/Eigen
dependencies are not installable here (BASELINE.md). The C++ number is
measured once on this host and cached in benchmarks/baseline_cpp.json.

Two measurements:

1. **Throughput** (the headline metric): 16384 vmapped chains through the
   Pallas fused-leapfrog HMC step — gradients as (chains, d) x (d, n) MXU
   matmuls in bfloat16 with f32 accumulation (the accept test stays f32, so
   MH exactness is unaffected — gradient precision only shapes the
   proposal).

2. **Statistical quality** (BASELINE "ESS/sec ... R-hat parity"): NUTS with
   full warmup adaptation — pooled dual averaging at 0.8 target accept,
   windowed diagonal mass-matrix adaptation, and a learned tree-depth
   budget — on the same posterior; min/bulk/tail ESS per second over the
   post-warmup phase, gated on max split R-hat <= 1.01 ("converged": the
   quality numbers are only claimed when the gate passes).
"""

import json
import pathlib
import subprocess
import time

ROOT = pathlib.Path(__file__).resolve().parent
BASELINE_CACHE = ROOT / "benchmarks" / "baseline_cpp.json"

N_CHAINS = 16384
DIM = 100
N_DATA = 1000
N_LEAP = 4
STEP_SIZE = 0.01

# 1024 chains measured ~45% higher min-ESS/s than 256 (4096 exhausts HBM
# with the collected draw buffer); see round-2 chains-scaling probe
NUTS_CHAINS = 1024
NUTS_WARMUP = 500
NUTS_KEEP = 1000


def cpp_baseline_steps_per_sec():
    """Build + run (once) the C++ sequential-HMC stand-in for the reference."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["leapfrog_steps_per_sec"]
    exe = ROOT / "benchmarks" / "baseline_hmc"
    src = ROOT / "benchmarks" / "baseline_hmc.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=fast",
             str(src), "-o", str(exe)],
            check=True, capture_output=True, timeout=120,
        )
        out = subprocess.run([str(exe), "3.0"], check=True, capture_output=True,
                             timeout=60, text=True)
        val = float(out.stdout.strip())
        BASELINE_CACHE.write_text(json.dumps({"leapfrog_steps_per_sec": val}))
        return val
    except Exception:
        return None


def measure_throughput(X, y, on_tpu):
    import jax
    from jax import lax
    from mcmc_tpu.ops.fused_logreg import make_fused_hmc_step

    # block_chains=256 + 400 steps/jitted-call measured best on the v5e
    # (round-2 amortization probe: 50 steps/call left ~45% on the table —
    # per-call host sync through the axon tunnel dominates short scans;
    # block_chains 512/1024 were within noise or slower, 2048 OOMs VMEM).
    step = make_fused_hmc_step(X, y, step_size=STEP_SIZE, n_leap=N_LEAP,
                               block_chains=256, interpret=not on_tpu)
    positions = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (N_CHAINS, DIM))
    state = step.init(positions)

    STEPS_PER_CALL = 400 if on_tpu else 10
    N_CALLS = 40 if on_tpu else 2

    @jax.jit
    def run_steps(key, state):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, info = step(sub, st)
            return (st, k), info["accepted"].mean()
        (state, key), acc = lax.scan(body, (state, key), None,
                                     length=STEPS_PER_CALL)
        return key, state, acc.mean()

    key = jax.random.PRNGKey(2)
    key, state, acc = run_steps(key, state)          # warmup / compile
    jax.block_until_ready(state)

    # Async dispatch: each call consumes the previous call's state, so the
    # device pipelines back-to-back; one block at the end keeps host/tunnel
    # round-trip latency off the measurement (it is per-session overhead,
    # not per-step cost).
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        key, state, acc = run_steps(key, state)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    total = N_CALLS * STEPS_PER_CALL * N_LEAP * N_CHAINS
    return total / elapsed, float(acc)


def measure_nuts_quality(log_kernel):
    """Adapted-NUTS ESS/sec with a convergence gate (VERDICT r1 item 1):
    pooled dual averaging + windowed diag mass + depth budget over
    NUTS_WARMUP draws, then a timed sampling phase of NUTS_KEEP draws."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import mcmc_tpu
    from mcmc_tpu import diagnostics
    from mcmc_tpu.samplers import common
    from mcmc_tpu.samplers.nuts import build_nuts_kernel

    s = mcmc_tpu.NUTSSettings(n_burnin_draws=NUTS_WARMUP, n_keep_draws=NUTS_KEEP,
                              n_adapt_draws=NUTS_WARMUP, target_accept_rate=0.8)
    precond = common.make_spd(None, DIM, jnp.float32)
    init, step = build_nuts_kernel(log_kernel, jax.grad(log_kernel), precond,
                                   s, NUTS_WARMUP, pooled_adaptation=True,
                                   adapt_mass_matrix=True, adapt_depth=True)
    bstep = jax.vmap(step, axis_name=common.CHAIN_AXIS_NAME)

    keys = jax.random.split(jax.random.PRNGKey(11), NUTS_CHAINS)
    pos0 = 0.05 * jax.random.normal(jax.random.PRNGKey(12), (NUTS_CHAINS, DIM))
    state0 = jax.vmap(init, axis_name=common.CHAIN_AXIS_NAME)(keys, pos0)

    def scan_phase(n, collect):
        def run(state, ks):
            def body(c, _):
                st, k = c
                pairs = jax.vmap(lambda kk: jax.random.split(kk, 2))(k)
                st, info = bstep(pairs[:, 1], st)
                out = (st.position, info["tree_depth"], info["diverged"]) \
                    if collect else None
                return (st, pairs[:, 0]), out
            (st, k), outs = lax.scan(body, (state, ks), None, length=n)
            return st, k, outs
        return jax.jit(run)

    warm = scan_phase(NUTS_WARMUP, collect=False)
    samp = scan_phase(NUTS_KEEP, collect=True)

    ks = jax.random.split(jax.random.PRNGKey(13), NUTS_CHAINS)
    t0 = time.perf_counter()
    stw, ks, _ = warm(state0, ks)
    jax.block_until_ready(stw)
    t_warm = time.perf_counter() - t0

    # compile the sampling phase off the clock, then measure
    _st, _ks, outs = samp(stw, ks)
    jax.block_until_ready(outs[0])
    t0 = time.perf_counter()
    _st, _ks, (draws, depth, div) = samp(stw, ks)
    jax.block_until_ready(draws)
    t_samp = time.perf_counter() - t0

    ess = diagnostics.ess(draws)
    rhat = float(diagnostics.split_rhat(draws).max())
    rank_rhat = float(diagnostics.rank_normalized_rhat(draws).max())
    return {
        "nuts_min_ess_per_sec": round(float(ess.min()) / t_samp, 1),
        "nuts_bulk_ess_per_sec": round(
            float(diagnostics.bulk_ess(draws).min()) / t_samp, 1),
        "nuts_tail_ess_per_sec": round(
            float(diagnostics.tail_ess(draws).min()) / t_samp, 1),
        "nuts_draws_per_sec": round(NUTS_KEEP * NUTS_CHAINS / t_samp, 1),
        "nuts_max_split_rhat": round(rhat, 4),
        "nuts_max_rank_rhat": round(rank_rhat, 4),
        "nuts_converged": bool(rhat <= 1.01),
        "nuts_mean_tree_depth": round(float(depth.mean()), 2),
        "nuts_n_divergent": int(div.sum()),
        "nuts_warmup_seconds": round(t_warm, 2),
        "nuts_sample_seconds": round(t_samp, 2),
        "nuts_chains": NUTS_CHAINS,
        "nuts_adapted_step_size": round(float(stw.epsilon_bar[0]), 4),
    }


def measure_chees_quality(log_kernel):
    """Same protocol as measure_nuts_quality for ChEES-HMC — the framework's
    accelerator-native NUTS alternative (no tree; shared jittered
    trajectories; 8x NUTS's min-ESS/s on this workload when introduced)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import mcmc_tpu
    from mcmc_tpu import diagnostics, adaptation
    from mcmc_tpu.samplers import common
    from mcmc_tpu.samplers.chees import build_chees_kernel

    s = mcmc_tpu.ChEESSettings(n_burnin_draws=NUTS_WARMUP,
                               n_keep_draws=NUTS_KEEP)
    mass_cfg = adaptation.make_precond_cfg(NUTS_WARMUP, pooled=True,
                                           axis_name=common.CHAIN_AXIS_NAME)
    init, step = build_chees_kernel(log_kernel, jax.grad(log_kernel), s,
                                    NUTS_WARMUP, adapt_mass=True,
                                    mass_cfg=mass_cfg)
    bstep = jax.vmap(step, axis_name=common.CHAIN_AXIS_NAME)
    pos0 = 0.05 * jax.random.normal(jax.random.PRNGKey(22),
                                    (NUTS_CHAINS, DIM))
    state0 = jax.vmap(init, axis_name=common.CHAIN_AXIS_NAME)(pos0)

    def scan_phase(n, collect):
        def run(state, ks):
            def body(c, _):
                st, k = c
                pairs = jax.vmap(lambda kk: jax.random.split(kk, 2))(k)
                st, info = bstep(pairs[:, 1], st)
                out = (st.position, info["n_leap"]) if collect else None
                return (st, pairs[:, 0]), out
            (st, k), outs = lax.scan(body, (state, ks), None, length=n)
            return st, k, outs
        return jax.jit(run)

    warm = scan_phase(NUTS_WARMUP, collect=False)
    samp = scan_phase(NUTS_KEEP, collect=True)
    ks = jax.random.split(jax.random.PRNGKey(23), NUTS_CHAINS)
    stw, ks, _ = warm(state0, ks)
    jax.block_until_ready(stw)
    _st, _ks, outs = samp(stw, ks)
    jax.block_until_ready(outs[0])
    t0 = time.perf_counter()
    _st, _ks, (draws, nleap) = samp(stw, ks)
    jax.block_until_ready(draws)
    t_samp = time.perf_counter() - t0

    import numpy as np
    ess = diagnostics.ess(draws)
    rhat = float(diagnostics.split_rhat(draws).max())
    return {
        "chees_min_ess_per_sec": round(float(ess.min()) / t_samp, 1),
        "chees_max_split_rhat": round(rhat, 4),
        "chees_converged": bool(rhat <= 1.01),
        "chees_mean_n_leap": round(float(np.asarray(nleap).mean()), 2),
        "chees_trajectory_length": round(float(np.exp(stw.log_T[0])), 3),
        "chees_sample_seconds": round(t_samp, 3),
    }


def main():
    baseline = cpp_baseline_steps_per_sec()

    import jax
    import mcmc_tpu  # noqa: F401
    from mcmc_tpu import models

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    key = jax.random.PRNGKey(0)
    X, y, _ = models.make_logistic_regression_data(key, N_DATA, DIM)

    steps_per_sec, acc = measure_throughput(X, y, on_tpu)
    lk = models.logistic_regression_model(X, y)
    quality = measure_nuts_quality(lk)
    quality.update(measure_chees_quality(lk))

    result = {
        "metric": "leapfrog_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "leapfrog_steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2) if baseline else None,
        "baseline_cpp_steps_per_sec": baseline,
        "platform": platform,
        "n_chains": N_CHAINS,
        "dim": DIM,
        "n_data": N_DATA,
        "accept_rate": round(acc, 4),
        "workload": "HMC+NUTS 100-d Bayesian logistic regression (BASELINE.md)",
        **quality,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
