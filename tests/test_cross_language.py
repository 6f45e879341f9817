"""Cross-implementation validation: the independent C++ sequential HMC
(benchmarks/baseline_hmc.cpp --fit, structured like the reference's
hmc_impl with mt19937_64 RNG) and mcmc_tpu's samplers must agree on the
posterior of *identical data* within Monte-Carlo error — agreement between
two implementations sharing no code or RNG is strong evidence both are
correct."""

import pathlib
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_posterior_agrees_with_independent_cpp(tmp_path):
    # data
    key = jax.random.PRNGKey(5)
    n, d = 200, 8
    X, y, _ = models.make_logistic_regression_data(key, n, d)
    Xd = np.asarray(X, np.float64)
    yd = np.asarray(y, np.float64)

    data = tmp_path / "data.bin"
    with open(data, "wb") as f:
        np.array([n, d], np.float64).tofile(f)
        Xd.tofile(f)
        yd.tofile(f)

    exe = tmp_path / "baseline_hmc"
    subprocess.run(
        ["g++", "-O2", str(ROOT / "benchmarks" / "baseline_hmc.cpp"),
         "-o", str(exe)],
        check=True, capture_output=True, timeout=120,
    )
    out = subprocess.run([str(exe), "--fit", str(data), "8000"], check=True,
                         capture_output=True, timeout=120, text=True)
    cpp_mean = np.array([float(t) for t in out.stdout.split()])
    assert cpp_mean.shape == (d,)

    lk = models.logistic_regression_model(X, y, prior_scale=10.0)
    ours = mcmc_tpu.hmc(jnp.zeros(d), lk,
                        mcmc_tpu.HMCSettings(n_burnin_draws=1000,
                                             n_keep_draws=1500,
                                             step_size=0.05, n_leap_steps=8),
                        n_chains=8, key=jax.random.PRNGKey(1))
    our_mean = np.asarray(ours.draws).reshape(-1, d).mean(axis=0)
    our_sd = np.asarray(ours.draws).reshape(-1, d).std(axis=0)

    # agreement within a fraction of the posterior sd per coordinate
    assert (np.abs(our_mean - cpp_mean) < 0.5 * our_sd + 0.05).all(), \
        (our_mean, cpp_mean, our_sd)

    # and NUTS agrees too
    nuts = mcmc_tpu.nuts(jnp.zeros(d), lk,
                         mcmc_tpu.NUTSSettings(n_burnin_draws=800,
                                               n_keep_draws=1000,
                                               n_adapt_draws=800),
                         n_chains=8, key=jax.random.PRNGKey(2))
    nuts_mean = np.asarray(nuts.draws).reshape(-1, d).mean(axis=0)
    assert (np.abs(nuts_mean - cpp_mean) < 0.5 * our_sd + 0.05).all()
