"""Data-axis (tall-dataset) parallelism: the likelihood reduction shards
over the mesh's ``data`` axis via GSPMD — within-draw parallelism the
reference's OpenMP-over-chains model has no analog for (SURVEY.md §2d).

Verified three ways: numerical equality of the sharded log-density and
gradient against the replicated computation, proof that SPMD actually
executes (intermediate shardings carry the data axis; a plain closure is
shown to LOSE its sharding — the trap data_parallel_kernel exists for),
and an end-to-end HMC run on a (chains, data) grid mesh agreeing
statistically with the unsharded run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import parallel


N, D = 4096, 8


@pytest.fixture(scope="module")
def logreg():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    X = jax.random.normal(k1, (N, D))
    beta_true = jax.random.normal(k2, (D,))
    p = jax.nn.sigmoid(X @ beta_true)
    y = (jax.random.uniform(k3, (N,)) < p).astype(jnp.float32)

    def kernel_of_data(beta, data):
        Xa, ya = data
        eta = Xa @ beta
        # logistic log-lik: y*eta - softplus(eta); N(0, 10^2) prior
        ll = jnp.sum(ya * eta - jax.nn.softplus(eta))
        return ll - 0.5 * jnp.sum(beta**2) / 100.0

    return X, y, kernel_of_data


def test_sharded_value_and_grad_match(logreg):
    X, y, kernel_of_data = logreg
    mesh = parallel.make_grid_mesh(2, 4)
    lk_sh = parallel.data_parallel_kernel(kernel_of_data, (X, y), mesh)
    lk_rep = lambda b: kernel_of_data(b, (X, y))
    f_rep = jax.jit(jax.value_and_grad(lk_rep))
    f_sh = jax.jit(jax.value_and_grad(lk_sh))
    for seed in range(3):
        beta = 0.3 * jax.random.normal(jax.random.PRNGKey(seed), (D,))
        v0, g0 = f_rep(beta)
        v1, g1 = f_sh(beta)
        np.testing.assert_allclose(float(v1), float(v0), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=2e-4, atol=1e-5)


def test_spmd_actually_partitions(logreg):
    """The contract data_parallel_kernel exists for: a jitted closure over
    a sharded array bakes it to a single-device constant (no SPMD), while
    the with_sharding_constraint inside data_parallel_kernel keeps the
    observation axis partitioned through the compiled computation."""
    X, y, kernel_of_data = logreg
    mesh = parallel.make_grid_mesh(1, 8)

    Xs = parallel.shard_data_axis(X, mesh)
    assert "data" in str(Xs.sharding.spec)
    baked = jax.jit(lambda b: Xs @ b)(jnp.ones(D))
    assert "data" not in str(getattr(baked.sharding, "spec", ""))  # the trap

    def eta_of_data(beta, data):
        return data[0] @ beta
    eta_fn = parallel.data_parallel_kernel(eta_of_data, (X, y), mesh)
    eta = jax.jit(eta_fn)(jnp.ones(D))
    assert "data" in str(eta.sharding.spec), eta.sharding


def test_hmc_on_grid_mesh_end_to_end(logreg):
    """HMC with chains sharded 2-way and the dataset sharded 4-way: runs,
    accepts, and agrees with the unsharded posterior (mean within MC
    error; trajectories differ bitwise — reduction order — so the check
    is statistical)."""
    X, y, kernel_of_data = logreg
    mesh = parallel.make_grid_mesh(2, 4)
    lk_sh = parallel.data_parallel_kernel(kernel_of_data, (X, y), mesh)
    lk_rep = lambda b: kernel_of_data(b, (X, y))

    s = mcmc_tpu.HMCSettings(step_size=0.02, n_leap_steps=8,
                             n_burnin_draws=200, n_keep_draws=400)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros(D)
    out_sh = mcmc_tpu.hmc(x0, lk_sh, s, n_chains=4, key=key, mesh=mesh)
    out_rep = mcmc_tpu.hmc(x0, lk_rep, s, n_chains=4, key=key)
    assert 0.5 < float(out_sh.accept_rate.mean()) <= 1.0
    m_sh = np.asarray(out_sh.draws).reshape(-1, D).mean(0)
    m_rep = np.asarray(out_rep.draws).reshape(-1, D).mean(0)
    sd = np.asarray(out_rep.draws).reshape(-1, D).std(0)
    # posterior is tight (N=4096): means agree within a few posterior sds
    np.testing.assert_allclose(m_sh, m_rep, atol=float(3 * sd.max()))
    assert np.all(np.isfinite(np.asarray(out_sh.draws)))


def test_nuts_data_parallel_runs(logreg):
    """NUTS (the deep-control-flow sampler) composes with the data-sharded
    kernel on the grid mesh."""
    X, y, kernel_of_data = logreg
    mesh = parallel.make_grid_mesh(2, 4)
    lk = parallel.data_parallel_kernel(kernel_of_data, (X, y), mesh)
    s = mcmc_tpu.NUTSSettings(n_burnin_draws=60, n_keep_draws=60,
                              n_adapt_draws=60, max_tree_depth=6)
    out = mcmc_tpu.nuts(jnp.zeros(D), lk, s, n_chains=4,
                        key=jax.random.PRNGKey(2), mesh=mesh)
    d = np.asarray(out.draws)
    assert d.shape == (60, 4, D) and np.isfinite(d).all()


def test_grid_mesh_validates_device_count():
    with pytest.raises(ValueError, match="devices"):
        parallel.make_grid_mesh(4, 4)
