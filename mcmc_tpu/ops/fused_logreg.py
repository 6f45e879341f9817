"""Pallas fused HMC trajectories for GLM posteriors (logistic / Poisson /
linear links; logistic regression is the BASELINE flagship).

Why this kernel exists: under plain XLA, each gradient of the logistic
log-posterior materializes the ``(n_chains, n_data)`` logits tensor in HBM —
two big matmuls with an elementwise stage between them that XLA cannot keep
on-chip across a matmul-matmul chain. Measured on v5e, the vmapped gradient
runs at ~35 TFLOP/s *regardless of dtype* — HBM-bandwidth-bound
(~130 MB round-trip per gradient evaluation).

This kernel fuses the entire ``n_leap``-step leapfrog trajectory for a block
of chains inside VMEM: the design matrix (bf16, both orientations), the
logits tile, positions and momenta never leave the chip between leapfrog
steps. HBM traffic per trajectory drops from ``2 L x 130 MB`` to one
read/write of the (chains, dim) state plus one read of X per block —
turning the workload compute-bound on the MXU.

Precision contract: matmuls run bf16 with f32 accumulation; positions,
momenta, and the final potential are f32. The MH accept test (done outside,
in XLA) therefore uses the same f32 log-density as the reference math —
reduced gradient precision only perturbs the *proposal*, never the
stationary distribution (standard MH exactness argument).

The public entry is :func:`make_fused_hmc_step`, a drop-in batched HMC
transition for ``(n_chains, dim)`` chain blocks matching the semantics of
``mcmc_tpu.samplers.hmc`` (reference src/hmc.cpp:150-196: momentum refresh,
leapfrog, min(0.01, .) accept clamp, +inf guard).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedHMCState", "make_fused_trajectory", "make_fused_hmc_step",
           "make_fused_trajectory_rt", "studentt_link",
           "make_fused_gaussian_trajectory", "make_fused_gaussian_hmc_step"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedHMCState(NamedTuple):
    position: jax.Array   # (n_chains, dim_padded) f32; padding columns zero
    potential: jax.Array  # (n_chains,) f32


_LINKS = ("logistic", "poisson", "linear", "probit")

# f32 floor for probit tail probabilities: below eta ~ -11 the f32 normal
# CDF underflows; clipping makes ll finite with a capped tail penalty
# (log(1e-30) ~ -69) so far-tail proposals are strongly rejected instead of
# NaN-poisoning the trajectory. Within |eta| <~ 10 the math is exact f32.
_PROBIT_TINY = 1e-30


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (exp-only, |error| <= 1.5e-7 —
    at f32 epsilon). Mosaic has no ``erf`` lowering (verified on v5e:
    "Unimplemented primitive in Pallas TPU lowering: erf"), so the probit
    family uses this polynomial consistently in BOTH the fused kernel and
    the host-side reference potential — the approximated likelihood IS the
    model, keeping the MH accept exact for it (deviation from exact probit:
    < 1e-5 per-datum log-likelihood, below f32 resolution of the sums)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _link_eval_fns(link):
    """Per-family ``(mu_eff, ll_terms)`` from the linear predictor, shared by
    every fused GLM kernel. The gradient contract is
    ``d ll / d eta = y - mu_eff`` — exactly the mean function for canonical
    links (logistic/poisson/linear); for the non-canonical ``probit`` and
    the :func:`studentt_link` family ``mu_eff = y - score`` encodes the true
    score in the same slot. A callable ``link(eta, y) -> (mu_eff, ll_terms)``
    plugs any jnp-expressible family into the same trajectory."""
    def link_eval(eta, yv):
        if callable(link):
            return link(eta, yv)
        if link == "logistic":
            return jax.nn.sigmoid(eta), yv * eta - jax.nn.softplus(eta)
        if link == "poisson":
            mu = jnp.exp(eta)
            return mu, yv * eta - mu
        if link == "probit":
            # stable Bernoulli-probit score: phi/Phi for y=1, -phi/(1-Phi)
            # for y=0 (inverse Mills ratios), Phi clipped at the f32 floor
            phi = jnp.exp(-0.5 * eta * eta) * (1.0 / math.sqrt(2.0 * math.pi))
            cdf = jnp.clip(0.5 * (1.0 + _erf_poly(eta * (1.0 / math.sqrt(2.0)))),
                           _PROBIT_TINY, 1.0 - 1e-7)
            score = yv * phi / cdf - (1.0 - yv) * phi / (1.0 - cdf)
            ll = yv * jnp.log(cdf) + (1.0 - yv) * jnp.log(1.0 - cdf)
            return yv - score, ll
        return eta, -0.5 * (yv - eta) ** 2
    return link_eval


def studentt_link(nu: float = 4.0):
    """Student-t robust-regression link for the fused GLM trajectory:
    ``y | eta ~ t_nu(eta, 1)``. Returns a callable for the ``link=``
    parameter of the fused builders. Score ``(nu+1)(y-eta)/(nu+(y-eta)^2)``
    is bounded — the robustness property — and is encoded in the
    ``mu_eff = y - score`` slot of the gradient contract (non-canonical
    family; see :func:`_link_eval_fns`)."""
    nu = float(nu)

    def link(eta, yv):
        r = yv - eta
        score = (nu + 1.0) * r / (nu + r * r)
        ll = -0.5 * (nu + 1.0) * jnp.log1p(r * r / nu)
        return yv - score, ll

    return link


def make_fused_trajectory(X, y, prior_scale: float, step_size: float,
                          n_leap: int, block_chains: int = 256,
                          interpret: bool = False, link: str = "logistic"):
    """Build ``traj(z, p) -> (z_new, p_new, U_new)`` over padded arrays.

    ``X`` is (n_data, dim); internally padded to (Np, Dp) multiples of
    (512, 128) with a row mask so padded data rows contribute exactly zero
    to both gradient and log-density. ``link`` selects the GLM family: all
    three share the gradient structure ``X^T (y - mu(eta)) - z / s^2`` so
    one kernel covers them.

    ``link`` may also be a *callable* ``link_fn(eta, y) -> (mu, ll_terms)``
    mapping the linear predictor to the mean function and the per-datum
    log-likelihood terms (both same shape as ``eta``; padded columns are
    masked by the kernel afterwards) — any jnp-expressible exponential
    family with canonical link plugs into the same fused trajectory (the
    kernel uses the canonical-link identity ``d ll / d eta = y - mu``).
    """
    if not callable(link) and link not in _LINKS:
        raise ValueError(f"link must be callable or one of {_LINKS}, got {link!r}")
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n_data, dim = X.shape
    Np = _round_up(n_data, 512)
    Dp = _round_up(dim, 128)
    inv_pv = 1.0 / (prior_scale * prior_scale)
    eps = float(step_size)

    Xp = jnp.zeros((Np, Dp), jnp.float32).at[:n_data, :dim].set(X)
    Xb = Xp.astype(jnp.bfloat16)            # (Np, Dp) for grad matmul
    Xtb = Xp.T.astype(jnp.bfloat16)         # (Dp, Np) for logits matmul
    yrow = jnp.zeros((1, Np), jnp.float32).at[0, :n_data].set(y)
    mask = jnp.zeros((1, Np), jnp.float32).at[0, :n_data].set(1.0)
    link_eval_ = _link_eval_fns(link)

    def kernel(z_ref, p_ref, xt_ref, x_ref, y_ref, m_ref, oz_ref, op_ref, ou_ref):
        z = z_ref[:]
        p = p_ref[:]
        xt = xt_ref[:]
        x = x_ref[:]
        yv = y_ref[:]
        mv = m_ref[:]

        def grad_of(z, want_u):
            eta = jnp.dot(z.astype(jnp.bfloat16), xt,
                          preferred_element_type=jnp.float32)
            mu, ll_terms = link_eval_(eta, yv)
            r = (yv - mu) * mv
            g = jnp.dot(r.astype(jnp.bfloat16), x,
                        preferred_element_type=jnp.float32) - z * inv_pv
            if want_u:
                ll = jnp.sum(mv * ll_terms, axis=1, keepdims=True)
                u = -(ll - 0.5 * jnp.sum(z * z, axis=1, keepdims=True) * inv_pv)
            else:
                u = None
            return g, u

        # gradient hoisted across steps: n_leap + 1 evaluations, not
        # 2 * n_leap (the boundary gradient is shared by adjacent half-kicks
        # at the unchanged position — bit-identical op sequence)
        u_out = None
        g, _ = grad_of(z, False)
        for k in range(n_leap):
            p = p + (0.5 * eps) * g
            z = z + eps * p
            g, u = grad_of(z, k == n_leap - 1)
            p = p + (0.5 * eps) * g
            u_out = u

        oz_ref[:] = z
        op_ref[:] = p
        ou_ref[:] = u_out

    n_flops = (n_leap + 1) * (4 * block_chains * Dp * Np)

    def traj(z, p):
        n_chains = z.shape[0]
        if n_chains % block_chains != 0:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of "
                f"block_chains={block_chains}"
            )
        grid = (n_chains // block_chains,)
        bspec = pl.BlockSpec((block_chains, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        z_new, p_new, u_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec, bspec, full((Dp, Np)), full((Np, Dp)),
                      full((1, Np)), full((1, Np))],
            out_specs=[bspec, bspec,
                       pl.BlockSpec((block_chains, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=n_flops * grid[0], transcendentals=2 * n_leap * block_chains * Np * grid[0],
                bytes_accessed=4 * n_chains * Dp * 4,
            ),
            interpret=interpret,
        )(z, p, Xtb, Xb, yrow, mask)
        return z_new, p_new, u_new[:, 0]

    traj.dim = dim
    traj.dim_padded = Dp
    return traj


def make_fused_hmc_step(X, y, prior_scale=10.0, step_size=0.01, n_leap=4,
                        block_chains: int = 256, interpret: bool = False,
                        link: str = "logistic"):
    """Batched HMC transition ``step(key, state) -> (state, info)`` with the
    trajectory fused in Pallas; RNG is batch-generated from one key per step
    (counter-based, deterministic) instead of per-chain key splitting."""
    traj = make_fused_trajectory(X, y, prior_scale, step_size, n_leap,
                                 block_chains, interpret, link)
    dim, Dp = traj.dim, traj.dim_padded

    X32 = jnp.asarray(X, jnp.float32)
    y32 = jnp.asarray(y, jnp.float32)
    inv_pv = 1.0 / (prior_scale * prior_scale)
    link_eval_ = _link_eval_fns(link)

    def reference_potential(zp):
        # same per-family ll_terms the kernel computes, so the initial U is
        # consistent with in-trajectory U for every link (incl. callables)
        eta = X32 @ zp[:dim]
        _mu, ll_terms = link_eval_(eta, y32)
        ll = jnp.sum(ll_terms)
        return -(ll - 0.5 * jnp.sum(zp[:dim] ** 2) * inv_pv)

    def init(positions):
        n_chains = positions.shape[0]
        zp = jnp.zeros((n_chains, Dp), jnp.float32).at[:, :dim].set(positions)
        U = jax.vmap(reference_potential)(zp)
        return FusedHMCState(position=zp, potential=U)

    col_mask = (jnp.arange(Dp) < dim).astype(jnp.float32)

    def step(key, state: FusedHMCState):
        n_chains = state.position.shape[0]
        k_mom, k_acc = jax.random.split(key)
        p0 = jax.random.normal(k_mom, (n_chains, Dp), jnp.float32) * col_mask
        prev_K = 0.5 * jnp.sum(p0 * p0, axis=1)

        z_new, p_new, prop_U = traj(state.position, p0)
        prop_U = jnp.where(jnp.isfinite(prop_U), prop_U, jnp.inf)
        prop_K = 0.5 * jnp.sum(p_new * p_new, axis=1)

        comp = jnp.minimum(0.01, -(prop_U + prop_K) + (state.potential + prev_K))
        u = jax.random.uniform(k_acc, (n_chains,), jnp.float32)
        accepted = u < jnp.exp(comp)

        new_state = FusedHMCState(
            position=jnp.where(accepted[:, None], z_new, state.position),
            potential=jnp.where(accepted, prop_U, state.potential),
        )
        return new_state, {"accepted": accepted}

    step.init = init
    step.dim = dim
    step.dim_padded = Dp
    return step


# ---------------------------------------------------------------------------
# Fused multivariate-Gaussian trajectory: U(z) = (z-m)^T P (z-m) / 2. The
# gradient is one (chains, Dp) x (Dp, Dp) MXU matmul per half-kick; the
# whole n_leap trajectory stays in VMEM (P, mean, z, p resident), so it is
# the pure-matmul member of the fused-kernel family (ROADMAP #3).
# ---------------------------------------------------------------------------

def make_fused_gaussian_trajectory(precision, mean=None, step_size=0.1,
                                   n_leap=4, block_chains: int = 256,
                                   interpret: bool = False):
    """Build ``traj(z, p) -> (z_new, p_new, U_new)`` for a multivariate
    Gaussian target ``N(mean, P^{-1})`` given its precision matrix ``P``.

    ``precision`` is (dim, dim) SPD (or a (dim,) diagonal); padded to
    multiples of 128 with identity on the padded diagonal so padded
    coordinates stay decoupled (their positions never feed back into real
    coordinates and contribute zero to U because z starts 0 there and the
    momentum is masked by the caller, matching :func:`make_fused_hmc_step`'s
    column mask convention).
    """
    P = jnp.asarray(precision, jnp.float32)
    if P.ndim == 1:
        P = jnp.diag(P)
    dim = P.shape[0]
    Dp = _round_up(dim, 128)
    eps_default = float(step_size)

    Pp = jnp.eye(Dp, dtype=jnp.float32).at[:dim, :dim].set(P)
    m_row = jnp.zeros((1, Dp), jnp.float32)
    if mean is not None:
        m_row = m_row.at[0, :dim].set(jnp.asarray(mean, jnp.float32))

    def kernel(eps_ref, z_ref, p_ref, prec_ref, mean_ref, oz_ref, op_ref,
               ou_ref):
        # step size as an SMEM scalar: exact quadratic targets NEED per-draw
        # step jitter — fixed (eps, L) makes each coordinate's trajectory a
        # fixed rotation angle L*eps/sigma_i mod 2pi, and any sigma_i near a
        # resonance (angle ~ 0) mixes arbitrarily slowly (measured: rank
        # R-hat 3.2 on the 100-d log-spaced target at fixed eps; 1.00 with
        # +-20% jitter)
        eps = eps_ref[0]
        z = z_ref[:]
        p = p_ref[:]
        prec = prec_ref[:]
        mu = mean_ref[:]

        def grad_of(z):
            # f32 matmul: the precision solve is the whole computation here,
            # and Gaussian targets are often ill-conditioned — keep full
            # precision on the MXU (f32 matmuls still run on the MXU via
            # 3-pass bf16 decomposition)
            return -jnp.dot(z - mu, prec, preferred_element_type=jnp.float32)

        # boundary gradient hoisted: n_leap + 1 matmuls, not 2 * n_leap
        g = grad_of(z)
        for _ in range(n_leap):
            p = p + (0.5 * eps) * g
            z = z + eps * p
            g = grad_of(z)
            p = p + (0.5 * eps) * g

        d = z - mu
        u = 0.5 * jnp.sum(d * jnp.dot(d, prec,
                                      preferred_element_type=jnp.float32),
                          axis=1, keepdims=True)
        oz_ref[:] = z
        op_ref[:] = p
        ou_ref[:] = u

    def traj(z, p, eps=None):
        n_chains = z.shape[0]
        if n_chains % block_chains != 0:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of "
                f"block_chains={block_chains}"
            )
        grid = (n_chains // block_chains,)
        bspec = pl.BlockSpec((block_chains, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        eps_arr = jnp.asarray(eps_default if eps is None else eps,
                              jnp.float32).reshape(1)
        z_new, p_new, u_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec,
                      full((Dp, Dp)), full((1, Dp))],
            out_specs=[bspec, bspec,
                       pl.BlockSpec((block_chains, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),
            ],
            interpret=interpret,
        )(eps_arr, z, p, Pp, m_row)
        return z_new, p_new, u_new[:, 0]

    traj.dim = dim
    traj.dim_padded = Dp
    return traj


def make_fused_gaussian_hmc_step(precision, mean=None, step_size=0.1,
                                 n_leap=4, block_chains: int = 256,
                                 interpret: bool = False,
                                 step_jitter: float = 0.2):
    """Batched HMC transition for a multivariate-Gaussian target with the
    trajectory fused in Pallas (same driver contract as
    :func:`make_fused_hmc_step`).

    ``step_jitter=j`` draws the per-draw step size uniformly in
    ``step_size * [1 - j, 1 + j]`` (shared across chains — one SMEM
    scalar). On an exactly quadratic target this is REQUIRED for
    ergodicity in practice: with fixed ``(step_size, n_leap)`` each
    coordinate's trajectory is a fixed rotation angle, and any scale near
    a 2-pi resonance of that angle stops mixing (see kernel comment).
    Set 0.0 to disable."""
    traj = make_fused_gaussian_trajectory(precision, mean, step_size, n_leap,
                                          block_chains, interpret)
    dim, Dp = traj.dim, traj.dim_padded

    P = jnp.asarray(precision, jnp.float32)
    if P.ndim == 1:
        P = jnp.diag(P)
    mean_v = jnp.zeros((dim,), jnp.float32) if mean is None \
        else jnp.asarray(mean, jnp.float32)

    def reference_potential(zp):
        d = zp[:dim] - mean_v
        return 0.5 * d @ (P @ d)

    def init(positions):
        n_chains = positions.shape[0]
        zp = jnp.zeros((n_chains, Dp), jnp.float32).at[:, :dim].set(positions)
        U = jax.vmap(reference_potential)(zp)
        return FusedHMCState(position=zp, potential=U)

    col_mask = (jnp.arange(Dp) < dim).astype(jnp.float32)

    def step(key, state: FusedHMCState):
        n_chains = state.position.shape[0]
        k_mom, k_acc, k_eps = jax.random.split(key, 3)
        p0 = jax.random.normal(k_mom, (n_chains, Dp), jnp.float32) * col_mask
        prev_K = 0.5 * jnp.sum(p0 * p0, axis=1)

        eps = step_size * (1.0 + step_jitter * jax.random.uniform(
            k_eps, (), jnp.float32, minval=-1.0, maxval=1.0))
        z_new, p_new, prop_U = traj(state.position, p0, eps)
        prop_U = jnp.where(jnp.isfinite(prop_U), prop_U, jnp.inf)
        prop_K = 0.5 * jnp.sum((p_new * col_mask) ** 2, axis=1)

        comp = jnp.minimum(0.01, -(prop_U + prop_K) + (state.potential + prev_K))
        u = jax.random.uniform(k_acc, (n_chains,), jnp.float32)
        accepted = u < jnp.exp(comp)

        new_state = FusedHMCState(
            position=jnp.where(accepted[:, None], z_new, state.position),
            potential=jnp.where(accepted, prop_U, state.potential),
        )
        return new_state, {"accepted": accepted}

    step.init = init
    step.dim = dim
    step.dim_padded = Dp
    return step


# ---------------------------------------------------------------------------
# Runtime-parameter fused trajectory: step size as an SMEM scalar and a
# diagonal inverse mass as a VMEM row, so adaptive samplers (ChEES) can
# drive the fused GLM leapfrog with per-draw adapted parameters.
# ---------------------------------------------------------------------------

def make_fused_trajectory_rt(X, y, prior_scale: float, n_leap: int,
                             block_chains: int = 256, interpret: bool = False,
                             link: str = "logistic"):
    """Like :func:`make_fused_trajectory` but ``traj(z, p, eps, inv_mass)``
    takes the (traced) step size and a ``(Dp,)`` diagonal inverse mass at
    call time: ``z += eps * inv_mass * p`` drift, kicks unchanged. The
    leapfrog count stays compile-time static — callers switch between a few
    compiled counts (``lax.switch``) for adaptive trajectory lengths."""
    if not callable(link) and link not in _LINKS:
        raise ValueError(f"link must be callable or one of {_LINKS}, got {link!r}")
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n_data, dim = X.shape
    Np = _round_up(n_data, 512)
    Dp = _round_up(dim, 128)
    inv_pv = 1.0 / (prior_scale * prior_scale)

    Xp = jnp.zeros((Np, Dp), jnp.float32).at[:n_data, :dim].set(X)
    Xb = Xp.astype(jnp.bfloat16)
    Xtb = Xp.T.astype(jnp.bfloat16)
    yrow = jnp.zeros((1, Np), jnp.float32).at[0, :n_data].set(y)
    mask = jnp.zeros((1, Np), jnp.float32).at[0, :n_data].set(1.0)
    link_eval_ = _link_eval_fns(link)

    def kernel(eps_ref, z_ref, p_ref, im_ref, xt_ref, x_ref, y_ref, m_ref,
               oz_ref, op_ref, ou_ref):
        eps = eps_ref[0]
        z = z_ref[:]
        p = p_ref[:]
        im = im_ref[:]
        xt = xt_ref[:]
        x = x_ref[:]
        yv = y_ref[:]
        mv = m_ref[:]

        def grad_of(z, want_u):
            eta = jnp.dot(z.astype(jnp.bfloat16), xt,
                          preferred_element_type=jnp.float32)
            mu, ll_terms = link_eval_(eta, yv)
            r = (yv - mu) * mv
            g = jnp.dot(r.astype(jnp.bfloat16), x,
                        preferred_element_type=jnp.float32) - z * inv_pv
            if want_u:
                ll = jnp.sum(mv * ll_terms, axis=1, keepdims=True)
                u = -(ll - 0.5 * jnp.sum(z * z, axis=1, keepdims=True) * inv_pv)
            else:
                u = None
            return g, u

        # boundary gradient hoisted: n_leap + 1 evaluations, not 2 * n_leap
        u_out = None
        g, _ = grad_of(z, False)
        for k in range(n_leap):
            p = p + (0.5 * eps) * g
            z = z + eps * (im * p)
            g, u = grad_of(z, k == n_leap - 1)
            p = p + (0.5 * eps) * g
            u_out = u

        oz_ref[:] = z
        op_ref[:] = p
        ou_ref[:] = u_out

    def traj(z, p, eps, inv_mass):
        n_chains = z.shape[0]
        if n_chains % block_chains != 0:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of "
                f"block_chains={block_chains}"
            )
        grid = (n_chains // block_chains,)
        bspec = pl.BlockSpec((block_chains, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
        im_row = jnp.asarray(inv_mass, jnp.float32).reshape(1, Dp)
        z_new, p_new, u_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec,
                      full((1, Dp)), full((Dp, Np)), full((Np, Dp)),
                      full((1, Np)), full((1, Np))],
            out_specs=[bspec, bspec,
                       pl.BlockSpec((block_chains, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, Dp), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),
            ],
            interpret=interpret,
        )(eps_arr, z, p, im_row, Xtb, Xb, yrow, mask)
        return z_new, p_new, u_new[:, 0]

    traj.dim = dim
    traj.dim_padded = Dp
    return traj
