"""Box-constrained operation of every sampler family — exercises the
reference-mode Jacobian chain rule (inv_jacobian_adjust), the bounded MALA
proposal covariance quirk, DE's bounds-clipped init box, and the bounded
back-transform across output layouts (reference docs/source/
box_constraints.rst)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_tpu
from mcmc_tpu import models


@pytest.fixture(scope="module")
def normal_data():
    return 2.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(123), (1000,))


def _bounded_settings(seed):
    return mcmc_tpu.AlgoSettings(
        rng_seed_value=seed, vals_bound=True,
        lower_bounds=jnp.array([-jnp.inf, 0.2]),
        upper_bounds=jnp.array([jnp.inf, 8.0]),
    )


def test_mala_bounded(normal_data):
    log_kernel = models.gaussian_mean_scale_model(normal_data)
    x = np.asarray(normal_data)
    for mode in ("reference", "exact"):
        settings = _bounded_settings(3)
        settings.mala_settings.step_size = 0.03
        settings.mala_settings.n_burnin_draws = 2000
        settings.mala_settings.n_keep_draws = 2000
        out = mcmc_tpu.mala(jnp.array([3.0, 3.0]), log_kernel, settings,
                            bounded_grad=mode)
        d = np.asarray(out.draws)
        assert (d[:, 1] > 0.2).all() and (d[:, 1] < 8.0).all(), mode
        assert d[:, 0].mean() == pytest.approx(x.mean(), abs=0.3), mode
        assert d[:, 1].mean() == pytest.approx(x.std(), abs=0.3), mode


def test_nuts_bounded(normal_data):
    log_kernel = models.gaussian_mean_scale_model(normal_data)
    x = np.asarray(normal_data)
    settings = _bounded_settings(5)
    settings.nuts_settings.n_burnin_draws = 800
    settings.nuts_settings.n_keep_draws = 800
    settings.nuts_settings.n_adapt_draws = 800
    out = mcmc_tpu.nuts(jnp.array([3.0, 3.0]), log_kernel, settings)
    d = np.asarray(out.draws)
    assert (d[:, 1] > 0.2).all()
    assert d[:, 0].mean() == pytest.approx(x.mean(), abs=0.3)
    assert d[:, 1].mean() == pytest.approx(x.std(), abs=0.3)


def test_rmhmc_bounded(normal_data):
    log_kernel = models.gaussian_mean_scale_model(normal_data)
    metric_fn = models.normal_fisher_metric(1000)
    x = np.asarray(normal_data)
    settings = _bounded_settings(7)
    settings.rmhmc_settings.step_size = 0.15
    settings.rmhmc_settings.n_leap_steps = 2
    settings.rmhmc_settings.n_burnin_draws = 1000
    settings.rmhmc_settings.n_keep_draws = 1000
    out = mcmc_tpu.rmhmc(jnp.array([2.5, 2.5]), log_kernel, metric_fn, settings)
    d = np.asarray(out.draws)
    assert (d[:, 1] > 0.2).all()
    assert d[:, 0].mean() == pytest.approx(x.mean(), abs=0.35)
    assert d[:, 1].mean() == pytest.approx(x.std(), abs=0.35)


def test_de_bounded():
    """DE with a one-sided bound: the posterior mode sits well inside, and
    the bounds-clipped init box plus the box kernel must keep every kept
    draw feasible (reference src/de.cpp:72-76, bounds_check.hpp)."""
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(9), (100,))
    log_kernel = models.gaussian_mean_model(x, sigma=1.0)
    settings = mcmc_tpu.AlgoSettings(
        rng_seed_value=11, vals_bound=True,
        lower_bounds=jnp.array([0.5]), upper_bounds=jnp.array([jnp.inf]),
    )
    settings.de_settings.n_pop = 50
    settings.de_settings.n_burnin_draws = 600
    settings.de_settings.n_keep_draws = 600
    out = mcmc_tpu.de(jnp.array([1.0]), log_kernel, settings)
    d = np.asarray(out.draws)
    assert (d >= 0.5).all()
    assert float(d[200:].mean()) == pytest.approx(float(np.asarray(x).mean()),
                                                  abs=0.3)


def test_aees_bounded():
    """AEES with a box: output draws must be back-transformed into it."""
    mu = jnp.array([[1.0, 1.0], [3.0, 3.0]])
    log_kernel = models.gaussian_mixture_model(
        mu, sig_sq=jnp.array([0.2, 0.2]), weights=jnp.array([0.5, 0.5]))
    settings = mcmc_tpu.AlgoSettings(
        rng_seed_value=13, vals_bound=True,
        lower_bounds=jnp.array([0.0, 0.0]), upper_bounds=jnp.array([5.0, 5.0]),
    )
    settings.aees_settings.n_initial_draws = 200
    settings.aees_settings.n_burnin_draws = 200
    settings.aees_settings.n_keep_draws = 1500
    settings.aees_settings.temper_vec = jnp.array([10.0])
    settings.aees_settings.cov_mat = 0.3 * jnp.eye(2)
    out = mcmc_tpu.aees(mu[0], log_kernel, settings)
    d = np.asarray(out.draws)
    assert (d >= 0.0).all() and (d <= 5.0).all()
    assert 0.5 < d.mean() < 3.5


def test_mala_truncated_normal_exactness():
    """Pins BOTH bounded-MALA conventions on the truncated normal
    N(1,1) | x > 0 (true mean 1.2876, sd 0.7935):

    - bounded_grad="exact" must be statistically exact (the corrected MH
      ratio), within ~3 MC sigma;
    - bounded_grad="reference" must reproduce the reference's asymmetry
      quirk (mala.ipp:48-57), whose measured stationary bias is ~+0.11 —
      the quirk is load-bearing for parity, so its bias is asserted too.
    """
    lk = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    s = mcmc_tpu.AlgoSettings(vals_bound=True, lower_bounds=jnp.zeros(1))
    s.mala_settings.n_burnin_draws = 2000
    s.mala_settings.n_keep_draws = 15000
    exact = mcmc_tpu.mala(jnp.ones(1) * 0.5, lk, s, n_chains=8,
                          key=jax.random.PRNGKey(0), bounded_grad="exact")
    d = np.asarray(exact.draws)
    assert float(d.mean()) == pytest.approx(1.2876, abs=0.05)
    assert float(d.std()) == pytest.approx(0.7935, abs=0.05)

    ref = mcmc_tpu.mala(jnp.ones(1) * 0.5, lk, s, n_chains=8,
                        key=jax.random.PRNGKey(0), bounded_grad="reference")
    dref = np.asarray(ref.draws)
    assert float(dref.mean()) > 1.34   # quirk bias present, ~1.40

    with pytest.raises(ValueError, match="bounded_grad"):
        mcmc_tpu.mala(jnp.ones(1) * 0.5, lk, s, bounded_grad="box")
