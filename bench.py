#!/usr/bin/env python
"""Benchmark: leapfrog steps/sec/chip, HMC on 100-d Bayesian logistic
regression (the BASELINE.md primary workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against a single-thread C++ sequential HMC of the same
model, structured like the reference's hmc_impl and compiled with the
reference's own -O3 -march=native flags (benchmarks/baseline_hmc.cpp) — the
reference library itself publishes no numbers and its Armadillo/Eigen
dependencies are not installable here (BASELINE.md). The C++ number is
measured once on this host and cached in benchmarks/baseline_cpp.json.

The TPU path: 16384 vmapped chains, gradients as (chains, d) x (d, n) MXU
matmuls in bfloat16 with f32 accumulation (the accept test stays f32, so
MH exactness is unaffected — gradient precision only shapes the proposal).
"""

import json
import os
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


def main():
    baseline = cpp_baseline_steps_per_sec()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import mcmc_tpu  # noqa: F401
    from mcmc_tpu import models
    from mcmc_tpu.ops.fused_logreg import make_fused_hmc_step

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    key = jax.random.PRNGKey(0)
    X, y, _ = models.make_logistic_regression_data(key, N_DATA, DIM)

    # fused Pallas trajectory (VMEM-resident leapfrog); interpret off-TPU
    step = make_fused_hmc_step(X, y, step_size=STEP_SIZE, n_leap=N_LEAP,
                               block_chains=256, interpret=not on_tpu)

    positions = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (N_CHAINS, DIM))
    state = step.init(positions)

    STEPS_PER_CALL = 50

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

    # warmup / compile
    key = jax.random.PRNGKey(2)
    key, state, acc = run_steps(key, state)
    jax.block_until_ready(state)

    n_calls = 0
    t0 = time.perf_counter()
    elapsed = 0.0
    while elapsed < 10.0:
        key, state, acc = run_steps(key, state)
        jax.block_until_ready(state)
        n_calls += 1
        elapsed = time.perf_counter() - t0

    total_leapfrogs = n_calls * STEPS_PER_CALL * N_LEAP * N_CHAINS
    steps_per_sec = total_leapfrogs / elapsed

    # secondary: ESS/sec + R-hat on the same target (BASELINE.md metrics)
    from mcmc_tpu import diagnostics
    ESS_CHAINS, ESS_DRAWS = 2048, 300
    # longer trajectories for the mixing measurement (L*eps ~ posterior scale)
    ess_step = make_fused_hmc_step(X, y, step_size=0.05, n_leap=8,
                                   block_chains=256, interpret=not on_tpu)
    ess_state = ess_step.init(
        0.05 * jax.random.normal(jax.random.PRNGKey(9), (ESS_CHAINS, DIM)))

    @jax.jit
    def run_collect(key, state):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _info = ess_step(sub, st)
            return (st, k), st.position[:, :DIM]
        (state, _), draws = lax.scan(body, (state, key), None, length=ESS_DRAWS)
        return state, draws

    for warm_key in (10, 12, 13):
        ess_state, _warm = run_collect(jax.random.PRNGKey(warm_key), ess_state)
    jax.block_until_ready(ess_state)
    t_ess = time.perf_counter()
    ess_state, draws = run_collect(jax.random.PRNGKey(11), ess_state)
    jax.block_until_ready(draws)
    ess_elapsed = time.perf_counter() - t_ess
    ess = diagnostics.ess(draws)
    rhat = diagnostics.split_rhat(draws)
    min_ess_per_sec = float(ess.min()) / ess_elapsed
    max_rhat = float(rhat.max())

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
        "accept_rate": round(float(acc), 4),
        "min_ess_per_sec": round(min_ess_per_sec, 1),
        "max_split_rhat": round(max_rhat, 4),
        "workload": "HMC 100-d Bayesian logistic regression (BASELINE.md)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
