"""Step-size / scale adaptation shared by the fixed-step samplers.

The reference's only adaptation is NUTS's dual averaging (src/nuts.cpp:
294-302); RWMH/MALA/HMC take a fixed ``par_scale``/``step_size``. This
module provides the same Nesterov dual-averaging primal recursion as a
reusable state machine so those samplers can optionally tune themselves
toward standard target acceptance rates during burn-in
(RWMH 0.234, MALA 0.574, HMC 0.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DualAveraging", "da_init", "da_update", "TARGET_ACCEPT",
           "window_schedule", "WindowedVariance", "wv_init", "wv_update"]

TARGET_ACCEPT = {"rwmh": 0.234, "mala": 0.574, "hmc": 0.8, "barker": 0.574,
                 "ghmc": 0.95}


class DualAveraging(NamedTuple):
    log_eps: jax.Array      # current (tuned) log step size
    log_eps_bar: jax.Array  # averaged iterate, used after adaptation ends
    h: jax.Array
    t: jax.Array            # adaptation step counter
    mu: jax.Array           # shrink target log(10 * eps_0)


def da_init(eps0):
    eps0 = jnp.asarray(eps0)
    return DualAveraging(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.log(eps0),
        h=jnp.zeros_like(eps0),
        t=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
    )


def da_update(state: DualAveraging, accept_stat, target,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveraging:
    """One dual-averaging step (same recursion as reference src/nuts.cpp:
    294-302, with the step counter inside the state)."""
    t = state.t + 1.0
    h = state.h + (1.0 / (t + t0)) * (target - accept_stat - state.h)
    log_eps = state.mu - h * jnp.sqrt(t) / gamma
    w = t ** (-kappa)
    log_eps_bar = (1.0 - w) * state.log_eps_bar + w * log_eps
    return DualAveraging(log_eps=log_eps, log_eps_bar=log_eps_bar,
                         h=h, t=t, mu=state.mu)


def window_schedule(n_adapt: int):
    """Stan-style warmup schedule: an initial fast interval, doubling slow
    windows in which posterior variance is accumulated, and a terminal fast
    interval. Returns (collect_mask, window_end_mask) as length-n_adapt
    boolean arrays. (No reference analog — MCMCLib's preconditioners are
    fixed user matrices, mcmc_structs.hpp:77,93,130.)"""
    import numpy as np
    collect = np.zeros(max(n_adapt, 1), bool)
    window_end = np.zeros(max(n_adapt, 1), bool)
    init_fast = min(75, int(0.15 * n_adapt))
    term_fast = min(50, int(0.1 * n_adapt))
    b, e = init_fast, n_adapt - term_fast
    if e - b >= 20:
        collect[b:e] = True
        w = 25
        pos = b
        while pos < e:
            end = pos + w
            if end * 2 - pos > e:  # last window absorbs the remainder
                end = e
            window_end[min(end, e) - 1] = True
            pos = end
            w *= 2
    return jnp.asarray(collect), jnp.asarray(window_end)


class WindowedVariance(NamedTuple):
    """Welford accumulator + the currently adopted diagonal variance.

    ``var`` is the regularized posterior-variance estimate adopted at the
    last window end — the diagonal preconditioner/mass shared by HMC/NUTS
    mass adaptation and the RWMH/MALA proposal-covariance adaptation."""
    count: jax.Array
    mean: jax.Array
    m2: jax.Array
    var: jax.Array


def wv_init(dim, dtype):
    return WindowedVariance(
        count=jnp.asarray(0, jnp.int32),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        var=jnp.ones((dim,), dtype),
    )


def wv_update(wv: WindowedVariance, x, collecting, window_end,
              axis_name=None) -> WindowedVariance:
    """Fold one draw; at a window end adopt the regularized variance
    (shrunk toward 1e-3, Stan-style) and reset the accumulator. With
    ``axis_name`` the estimate is pooled across that vmap/mesh axis."""
    dtype = x.dtype
    cnt1 = wv.count + 1
    delta = x - wv.mean
    mean1 = wv.mean + delta / cnt1.astype(dtype)
    m21 = wv.m2 + delta * (x - mean1)
    count = jnp.where(collecting, cnt1, wv.count)
    mean = jnp.where(collecting, mean1, wv.mean)
    m2 = jnp.where(collecting, m21, wv.m2)

    n = jnp.maximum(count, 2).astype(dtype)
    var_est = m2 / (n - 1.0)
    if axis_name is not None:
        var_est = jax.lax.pmean(var_est, axis_name)
    var_reg = (n / (n + 5.0)) * var_est + 1e-3 * (5.0 / (n + 5.0))

    var = jnp.where(window_end, var_reg, wv.var)
    count = jnp.where(window_end, 0, count)
    mean = jnp.where(window_end, jnp.zeros_like(mean), mean)
    m2 = jnp.where(window_end, jnp.zeros_like(m2), m2)
    return WindowedVariance(count=count, mean=mean, m2=m2, var=var)


def make_precond_cfg(n_adapt, pooled=False, axis_name=None):
    """Schedule bundle for windowed proposal-covariance / preconditioner
    adaptation (shared by RWMH and MALA)."""
    collect, window_end = window_schedule(n_adapt)
    return {"n_adapt": n_adapt, "collect": collect, "window_end": window_end,
            "axis_name": axis_name if pooled else None}


def windowed_precond_step(wv: WindowedVariance, da, new_position, draw_ind,
                          cfg, reset_da: bool):
    """One per-draw update of the windowed variance (and, at window ends,
    a dual-averaging restart from the current scale, Stan-style — the new
    covariance changes the acceptance landscape)."""
    idx = jnp.minimum(draw_ind, cfg["collect"].shape[0] - 1)
    in_warmup = draw_ind < cfg["n_adapt"]
    collecting = in_warmup & cfg["collect"][idx]
    wend = in_warmup & cfg["window_end"][idx]
    wv = wv_update(wv, new_position, collecting, wend, cfg["axis_name"])
    if reset_da:
        da_reset = da_init(jnp.exp(da.log_eps))
        da = jax.tree_util.tree_map(
            lambda r, old: jnp.where(wend, r, old), da_reset, da)
    return wv, da


def windowed_dense_step(wv: WindowedVariance, da, cov, chol, m2, x,
                        draw_ind, cfg, reset_da: bool):
    """Dense analog of :func:`windowed_precond_step`, shared by RWMH, MALA
    and ChEES: fold ``x`` into the dense Welford accumulator while the
    schedule says collect, adopt the regularized covariance + its Cholesky
    at window ends, and (``reset_da=True``) restart dual averaging from the
    current scale there. ``wv.m2``/``wv.var`` hold the *diagonal*
    accumulator and pass through untouched — the dense accumulator is
    ``m2``. Returns ``(wv, da, cov, chol, m2)``."""
    idx = jnp.minimum(draw_ind, cfg["collect"].shape[0] - 1)
    in_warmup = draw_ind < cfg["n_adapt"]
    collecting = in_warmup & cfg["collect"][idx]
    wend = in_warmup & cfg["window_end"][idx]
    wc, wm, m2, cov, chol = windowed_mass_update(
        wv.count, wv.mean, m2, cov, chol, x,
        collecting, wend, "dense", cfg["axis_name"])
    wv = WindowedVariance(count=wc, mean=wm, m2=wv.m2, var=wv.var)
    if reset_da:
        da_reset = da_init(jnp.exp(da.log_eps))
        da = jax.tree_util.tree_map(
            lambda r, old: jnp.where(wend, r, old), da_reset, da)
    return wv, da, cov, chol, m2


def windowed_mass_update(count, mean, m2, inv_mass, chol, x,
                         collecting, window_end, mode, axis_name=None):
    """One draw of windowed Welford mass estimation, shared by HMC and NUTS
    (diag or dense). Folds ``x`` when ``collecting``; at ``window_end``
    adopts the regularized (co)variance — Stan-style ``n/(n+5)`` shrinkage
    toward ``1e-3 (I)`` — as the new inverse mass (+ its Cholesky in dense
    mode) and resets the accumulator. ``axis_name`` pools the estimate
    across that chain axis. Returns
    ``(count, mean, m2, inv_mass, chol)``."""
    dtype = x.dtype
    cnt1 = count + 1
    delta = x - mean
    mean1 = mean + delta / cnt1.astype(dtype)
    if mode == "dense":
        m21 = m2 + jnp.outer(delta, x - mean1)
    else:
        m21 = m2 + delta * (x - mean1)
    count = jnp.where(collecting, cnt1, count)
    mean = jnp.where(collecting, mean1, mean)
    m2 = jnp.where(collecting, m21, m2)

    n = jnp.maximum(count, 2).astype(dtype)
    var = m2 / (n - 1.0)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    shrink = 1e-3 * (5.0 / (n + 5.0))
    if mode == "dense":
        dim = x.shape[0]
        var = (n / (n + 5.0)) * 0.5 * (var + var.T) \
            + shrink * jnp.eye(dim, dtype=dtype)
        chol = jnp.where(window_end, jnp.linalg.cholesky(var), chol)
    else:
        var = (n / (n + 5.0)) * var + shrink
    inv_mass = jnp.where(window_end, var, inv_mass)
    count = jnp.where(window_end, 0, count)
    mean = jnp.where(window_end, jnp.zeros_like(mean), mean)
    m2 = jnp.where(window_end, jnp.zeros_like(m2), m2)
    return count, mean, m2, inv_mass, chol
