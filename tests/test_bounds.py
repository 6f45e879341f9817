"""Deterministic unit tests for the bounds/transform stack — the test layer
the reference lacks entirely (SURVEY.md §4). Semantics under test are those of
reference include/misc/{determine_bounds_type,transform_vals,log_jacobian,
inv_jacobian_adjust,bounds_check}.hpp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_tpu import bounds


LB = jnp.array([-jnp.inf, 0.0, -jnp.inf, -1.0])
UB = jnp.array([jnp.inf, jnp.inf, 2.0, 1.0])
CODES = bounds.determine_bounds_type(True, 4, LB, UB)


def test_bounds_type_codes():
    np.testing.assert_array_equal(np.asarray(CODES), [1, 2, 3, 4])
    free = bounds.determine_bounds_type(False, 4, LB, UB)
    np.testing.assert_array_equal(np.asarray(free), [1, 1, 1, 1])


def test_transform_roundtrip():
    x = jnp.array([0.7, 1.3, -0.4, 0.25])
    z = bounds.transform(x, CODES, LB, UB)
    x_back = bounds.inv_transform(z, CODES, LB, UB)
    # the +/- eps offsets in the forward map make the round-trip approximate
    # (as in the reference, transform_vals.hpp:40-51); f32 leaves ~1e-4
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=5e-4, atol=5e-4)


def test_inv_transform_respects_bounds():
    for z_val in [-50.0, -3.0, 0.0, 3.0, 50.0]:
        z = jnp.full((4,), z_val)
        x = np.asarray(bounds.inv_transform(z, CODES, LB, UB))
        assert x[1] >= 0.0
        assert x[2] <= 2.0
        assert -1.0 <= x[3] <= 1.0


def test_inv_transform_nonfinite_clamps():
    # reference transform_vals.hpp:81-111 clamping semantics
    eps = float(jnp.finfo(jnp.float32).eps)
    z = jnp.array([jnp.inf, -jnp.inf, jnp.inf, -jnp.inf])
    x = np.asarray(bounds.inv_transform(z, CODES, LB, UB))
    assert x[1] == pytest.approx(0.0 + eps)
    assert x[2] == pytest.approx(2.0 - eps)
    assert x[3] == pytest.approx(-1.0 + eps)
    z_nan = jnp.full((4,), jnp.nan)
    x_nan = np.asarray(bounds.inv_transform(z_nan, CODES, LB, UB))
    # reference quirk: NaN two-sided -> (ub - lb)/2
    assert x_nan[3] == pytest.approx((1.0 - (-1.0)) / 2)


def test_log_jacobian_matches_autodiff():
    """log|J| must equal sum log d inv_transform/dz (exactness check the
    reference can't express)."""
    z = jnp.array([0.3, -0.7, 1.2, 0.4], dtype=jnp.float64) \
        if jax.config.jax_enable_x64 else jnp.array([0.3, -0.7, 1.2, 0.4])

    lj = float(bounds.log_jacobian(z, CODES, LB, UB))

    jac = jax.jacfwd(lambda zz: bounds.inv_transform(zz, CODES, LB, UB))(z)
    diag = jnp.diagonal(jac)
    lj_ad = float(jnp.sum(jnp.log(jnp.abs(diag))))
    assert lj == pytest.approx(lj_ad, rel=1e-3)


def test_inv_jacobian_diag_is_reciprocal_derivative():
    z = jnp.array([0.3, -0.7, 1.2, 0.4])
    jac = jax.jacfwd(lambda zz: bounds.inv_transform(zz, CODES, LB, UB))(z)
    diag = jnp.diagonal(jac)
    inv_j = bounds.inv_jacobian_diag(z, CODES, LB, UB)
    np.testing.assert_allclose(np.asarray(inv_j * diag), np.ones(4), rtol=1e-3)


def test_sampling_bounds_check():
    samp_lb = jnp.full((4,), -5.0)
    samp_ub = jnp.full((4,), 5.0)
    out_lb, out_ub = bounds.sampling_bounds_check(True, CODES, LB, UB, samp_lb, samp_ub)
    np.testing.assert_allclose(np.asarray(out_lb), [-5.0, 0.0, -5.0, -1.0])
    np.testing.assert_allclose(np.asarray(out_ub), [5.0, 5.0, 2.0, 1.0])


def test_box_log_kernel_gradient_finite():
    log_kernel = lambda x: -0.5 * jnp.sum(x**2)
    box = bounds.make_box_log_kernel(log_kernel, True, CODES, LB, UB)
    g = jax.grad(box)(jnp.array([0.1, -0.2, 0.3, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_box_log_kernel_gradient_finite_extreme_z():
    """Regression: a code-2 lane at very negative z (|z| > float32's
    exp overflow threshold ~88) used to NaN grad(box) through the
    UNSELECTED code-3 branch's exp(-z) (0 * inf in the select VJP).
    Every code must give finite gradients across the full float32 range
    that MALA/HMC/NUTS can visit."""
    log_kernel = lambda x: -0.5 * jnp.sum(x**2)
    box = bounds.make_box_log_kernel(log_kernel, True, CODES, LB, UB)
    g = jax.grad(box)
    for zv in (-120.0, -90.0, 90.0, 120.0):
        z = jnp.full((4,), zv, jnp.float32)
        gv = np.asarray(g(z))
        # NaN = cross-branch contamination (the bug); inf can only be the
        # genuine float32 overflow of an out-of-support lane's true math
        # (e.g. code 3 at z=-120 has x = ub - e^120)
        assert not np.any(np.isnan(gv)), f"NaN grad at z={zv}: {gv}"
        jd = bounds.inv_jacobian_diag(z, CODES, LB, UB)
        assert not np.any(np.isnan(np.asarray(jd)))
    # the near-boundary approach direction of each bounded code — the
    # region samplers actually visit — must be fully finite: code 2
    # (lane 1) at z = -120 has x -> lb, code 3 (lane 2) at z = +120 has
    # x -> ub, code 4 (lane 3) saturates at either end
    for zv in (-120.0, 120.0):
        z = jnp.array([0.0, -120.0, 120.0, zv], jnp.float32)
        gv = np.asarray(g(z))
        assert np.all(np.isfinite(gv)), (zv, gv)


def test_bounds_roundtrip_property():
    """Randomized property test: for 40 random bound configurations and
    random interior points, transform/inv_transform round-trips and the
    box-kernel gradient stays finite."""
    rng = np.random.default_rng(0)
    for trial in range(40):
        d = int(rng.integers(1, 6))
        kind = rng.integers(1, 5, size=d)
        lb = np.where(kind % 2 == 0, rng.normal(size=d), -np.inf)   # 2,4 lower
        lb = np.where(kind == 3, -np.inf, lb)
        ub = np.where(kind >= 3, lb + np.abs(rng.normal(size=d)) + 0.5, np.inf)
        ub = np.where(kind == 2, np.inf, ub)
        lb = np.where(kind == 1, -np.inf, lb)
        lbj, ubj = jnp.asarray(lb, jnp.float32), jnp.asarray(ub, jnp.float32)
        codes = bounds.determine_bounds_type(True, d, lbj, ubj)

        # interior point
        lo = np.where(np.isfinite(lb), lb, -2.0)
        hi = np.where(np.isfinite(ub), ub, lo + 4.0)
        x = jnp.asarray(lo + (hi - lo) * rng.uniform(0.2, 0.8, size=d), jnp.float32)

        z = bounds.transform(x, codes, lbj, ubj)
        x_back = bounds.inv_transform(z, codes, lbj, ubj)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                                   rtol=2e-3, atol=2e-3, err_msg=f"trial {trial}")

        box = bounds.make_box_log_kernel(lambda v: -0.5 * jnp.sum(v**2),
                                         True, codes, lbj, ubj)
        g = jax.grad(box)(z)
        assert np.isfinite(np.asarray(g)).all(), f"trial {trial}: {g}"


# ---------------------------------------------------------------------------
# Property-based coverage (hypothesis): random bounds configurations
# ---------------------------------------------------------------------------

from hypothesis import given, settings as hyp_settings, strategies as st


@st.composite
def _bounds_case(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    lbs, ubs, xs = [], [], []
    for _ in range(n):
        kind = draw(st.integers(min_value=1, max_value=4))
        lo = draw(st.floats(min_value=-50.0, max_value=40.0))
        width = draw(st.floats(min_value=0.5, max_value=60.0))
        if kind == 1:
            lb, ub = -np.inf, np.inf
            x = draw(st.floats(min_value=-40.0, max_value=40.0))
        elif kind == 2:
            lb, ub = lo, np.inf
            x = lo + draw(st.floats(min_value=0.05, max_value=50.0))
        elif kind == 3:
            lb, ub = -np.inf, lo
            x = lo - draw(st.floats(min_value=0.05, max_value=50.0))
        else:
            lb, ub = lo, lo + width
            x = lo + width * draw(st.floats(min_value=0.02, max_value=0.98))
        lbs.append(lb); ubs.append(ub); xs.append(x)
    return (np.array(lbs, np.float64), np.array(ubs, np.float64),
            np.array(xs, np.float64))


@given(_bounds_case())
@hyp_settings(max_examples=50, deadline=None)
def test_bounds_roundtrip_hypothesis(case):
    """For ANY mix of bound types and in-range point: codes are correct,
    transform/inv_transform round-trips, the log-Jacobian is finite, and
    the inverse-Jacobian diagonal is positive."""
    lb64, ub64, x64 = case
    with jax.enable_x64():
        lb = jnp.asarray(lb64); ub = jnp.asarray(ub64); x = jnp.asarray(x64)
        n = x.shape[0]
        codes = bounds.determine_bounds_type(True, n, lb, ub)
        expect = np.where(np.isfinite(lb64) & np.isfinite(ub64), 4,
                          np.where(np.isfinite(lb64), 2,
                                   np.where(np.isfinite(ub64), 3, 1)))
        np.testing.assert_array_equal(np.asarray(codes), expect)

        z = bounds.transform(x, codes, lb, ub)
        x_back = bounds.inv_transform(z, codes, lb, ub)
        np.testing.assert_allclose(np.asarray(x_back), x64,
                                   rtol=1e-9, atol=1e-9)

        lj = bounds.log_jacobian(z, codes, lb, ub)
        assert np.isfinite(float(lj))
        jd = bounds.inv_jacobian_diag(z, codes, lb, ub)
        assert (np.asarray(jd) > 0).all()
        # inverse map always lands inside the box
        assert (np.asarray(x_back) >= lb64 - 1e-9).all()
        assert (np.asarray(x_back) <= ub64 + 1e-9).all()
