"""ChEES-HMC tests: statistical correctness, trajectory-length adaptation,
mass adaptation, and posterior agreement with NUTS. (No reference analog —
this is the framework's accelerator-native NUTS alternative; see
samplers/chees.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models, diagnostics


def test_chees_standard_normal():
    out = mcmc_tpu.chees(jnp.zeros(3), lambda v: -0.5 * jnp.sum(v**2),
                         mcmc_tpu.ChEESSettings(n_burnin_draws=400,
                                                n_keep_draws=800),
                         n_chains=32, key=jax.random.PRNGKey(0))
    d = np.asarray(out.draws)
    assert d.shape == (800, 32, 3)
    np.testing.assert_allclose(d.mean(axis=(0, 1)), 0.0, atol=0.08)
    np.testing.assert_allclose(d.var(axis=(0, 1)), 1.0, atol=0.12)
    # dual averaging lands near the 0.651 target
    acc = float(np.mean(out.accept_rate))
    assert 0.5 < acc < 0.85, acc
    # adapted trajectory length is O(the posterior scale), not degenerate
    T = float(np.asarray(out.diagnostics["adapted_trajectory_length"])[0])
    assert 0.5 < T < 20.0, T
    assert float(np.asarray(diagnostics.split_rhat(out.draws)).max()) < 1.02


def test_chees_mass_adaptation_ill_conditioned():
    lk = models.ill_conditioned_gaussian(16, condition_number=1e3)
    out = mcmc_tpu.chees(jnp.zeros(16), lk,
                         mcmc_tpu.ChEESSettings(n_burnin_draws=800,
                                                n_keep_draws=800),
                         n_chains=32, key=jax.random.PRNGKey(0),
                         adapt_mass_matrix=True)
    d = np.asarray(out.draws)
    vr = d.reshape(-1, 16).var(axis=0) / np.asarray(lk.variances)
    assert (vr > 0.7).all() and (vr < 1.4).all(), vr
    assert float(np.asarray(diagnostics.split_rhat(out.draws)).max()) < 1.03


def test_chees_matches_nuts_posterior():
    """Same 10-d logistic-regression posterior, ChEES vs NUTS: means agree
    within Monte-Carlo error."""
    X, y, _ = models.make_logistic_regression_data(jax.random.PRNGKey(1),
                                                   300, 10)
    lk = models.logistic_regression_model(X, y)
    out_c = mcmc_tpu.chees(jnp.zeros(10), lk,
                           mcmc_tpu.ChEESSettings(n_burnin_draws=500,
                                                  n_keep_draws=1000),
                           n_chains=32, key=jax.random.PRNGKey(2),
                           adapt_mass_matrix=True)
    out_n = mcmc_tpu.nuts(jnp.zeros(10), lk,
                          mcmc_tpu.NUTSSettings(n_burnin_draws=500,
                                                n_keep_draws=1000,
                                                n_adapt_draws=500),
                          n_chains=16, key=jax.random.PRNGKey(3),
                          adapt_mass_matrix=True)
    mc = np.asarray(out_c.draws).reshape(-1, 10).mean(axis=0)
    mn = np.asarray(out_n.draws).reshape(-1, 10).mean(axis=0)
    np.testing.assert_allclose(mc, mn, atol=0.06)
    vc = np.asarray(out_c.draws).reshape(-1, 10).var(axis=0)
    vn = np.asarray(out_n.draws).reshape(-1, 10).var(axis=0)
    np.testing.assert_allclose(vc, vn, rtol=0.25)


def test_chees_requires_multiple_chains():
    with pytest.raises(ValueError, match="n_chains"):
        mcmc_tpu.chees(jnp.zeros(2), lambda v: -jnp.sum(v**2),
                       key=jax.random.PRNGKey(0))


def test_chees_via_dispatcher_and_bounded():
    """sample('chees', ...) dispatch + box constraints (draws stay inside)."""
    s = mcmc_tpu.AlgoSettings(vals_bound=True,
                              lower_bounds=jnp.zeros(2),
                              upper_bounds=jnp.full(2, 5.0))
    s.chees_settings.n_burnin_draws = 300
    s.chees_settings.n_keep_draws = 500
    lk = lambda v: -0.5 * jnp.sum((v - 1.0) ** 2)
    out = mcmc_tpu.sample("chees", jnp.ones(2), lk, s, n_chains=16,
                          key=jax.random.PRNGKey(4))
    d = np.asarray(out.draws)
    assert (d >= 0.0).all() and (d <= 5.0).all()
    # truncated-normal mean is pushed up from 1.0 by the zero bound
    assert 1.0 < d.mean() < 1.6


def test_chees_survives_divergent_start():
    """A target with a hard barrier produces overflowed trajectories early
    in warmup; the pooled trajectory-length gradient must not be poisoned
    (0 * inf = NaN previously stuck log_T at NaN forever)."""
    lk = lambda v: jnp.where(v[0] < 2.0, -0.5 * jnp.sum(v**2), -1e30)
    out = mcmc_tpu.chees(jnp.zeros(2), lk,
                         mcmc_tpu.ChEESSettings(n_burnin_draws=300,
                                                n_keep_draws=400,
                                                step_size=1.0),
                         n_chains=16, key=jax.random.PRNGKey(0))
    T = np.asarray(out.diagnostics["adapted_trajectory_length"])
    assert np.isfinite(T).all(), T
    d = np.asarray(out.draws)
    assert np.isfinite(d).all()
    assert (d[..., 0] < 2.0).all()
    assert abs(d[..., 1].mean()) < 0.3


def test_chees_dense_mass_correlated_gaussian():
    """Dense mass for ChEES: learns the full covariance of a rho=0.95
    Gaussian and beats the diagonal metric on min-ESS."""
    rho, dim = 0.95, 6
    cov = (1 - rho) * np.eye(dim) + rho * np.ones((dim, dim))
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    lk = lambda v: -0.5 * v @ prec @ v
    s = mcmc_tpu.ChEESSettings(n_burnin_draws=800, n_keep_draws=800)
    ess = {}
    for mode in ("diag", "dense"):
        out = mcmc_tpu.chees(jnp.zeros(dim), lk, s, n_chains=32,
                             key=jax.random.PRNGKey(0),
                             adapt_mass_matrix=mode)
        ess[mode] = float(np.asarray(diagnostics.ess(out.draws)).min())
        d = np.asarray(out.draws).reshape(-1, dim)
        if mode == "dense":
            np.testing.assert_allclose(np.cov(d.T), cov, atol=0.35)
    assert ess["dense"] > 1.5 * ess["diag"], ess
