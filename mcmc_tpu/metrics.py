"""Metric constructors for Riemannian-manifold HMC.

The reference's RM-HMC requires the user to hand-derive the metric AND its
derivative cube (``tensor_fn(vals, Cube_t* deriv_out, data)``, reference
src/rmhmc.cpp:152-165 and examples/eigen/rmhmc_normal.cpp:78-111) — in
practice limiting it to models with textbook Fisher information.
:func:`softabs_metric` removes that limitation: the SoftAbs map of
Betancourt (2013, "A general metric for Riemannian manifold Hamiltonian
Monte Carlo") builds a positive-definite metric from the local Hessian of
*any* twice-differentiable log-kernel,

    H(theta) = -d^2 logK = Q diag(lambda) Q^T,
    G(theta) =  Q diag(lambda * coth(alpha * lambda)) Q^T,

i.e. each Hessian eigenvalue is pushed through the smooth absolute value
``f(l) = l coth(alpha l)`` (``|l|`` for ``alpha |l| >> 1``, floored at
``1/alpha`` near zero, always positive for indefinite Hessians).  ``alpha``
interpolates between a identity-like metric (small) and ``|H|`` (large).

Differentiation note: RM-HMC needs ``dG/dtheta`` (obtained by
``jax.jacfwd`` in the sampler).  Naively differentiating through
``jnp.linalg.eigh`` produces NaN whenever eigenvalues coincide — and
symmetric targets hit exact degeneracies.  The JVP here instead uses the
standard smooth rule for spectral functions of symmetric matrices
(Daleckii-Krein): with ``M = Q^T dH Q``,

    dG = Q (J o M) Q^T,   J_ij = (f(l_i) - f(l_j)) / (l_i - l_j),
                          J_ii = f'(l_i),

with coincident pairs taking the divided-difference limit
``(f'(l_i) + f'(l_j)) / 2`` — smooth through degeneracies (the map
``H -> f(H)`` is analytic even where the eigendecomposition is not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["softabs_metric"]


def _softabs_f(lam, alpha):
    """f(l) = l coth(alpha l), elementwise; series ``(1 + (alpha l)^2 / 3)
    / alpha`` below the cutoff (the direct form is 0/0 at l = 0)."""
    a = alpha * lam
    big = jnp.abs(a) > 1e-3
    safe = jnp.where(big, a, 1.0)
    return jnp.where(big, lam / jnp.tanh(safe),
                     (1.0 + a * a / 3.0) / alpha)


def _softabs_fprime(lam, alpha):
    """f'(l) = coth(alpha l) - (alpha l) csch^2(alpha l); series
    ``2 alpha l / 3`` below the cutoff.  Written in tanh so large
    ``|alpha l|`` saturates to sign(l) instead of overflowing sinh."""
    a = alpha * lam
    big = jnp.abs(a) > 1e-3
    safe = jnp.where(big, a, 1.0)
    t = jnp.tanh(safe)
    return jnp.where(big, 1.0 / t - safe * (1.0 - t * t) / (t * t),
                     2.0 * a / 3.0)


def softabs_metric(log_kernel, alpha=1.0):
    """Metric function for :func:`mcmc_tpu.rmhmc` from the SoftAbs map of
    the log-kernel's Hessian (Betancourt 2013) — RM-HMC on any
    twice-differentiable target, no hand-derived Fisher information.

    ``alpha`` sets the sharpness of the smooth absolute value applied to
    the Hessian eigenvalues: eigenvalues with ``|l| >> 1/alpha`` pass
    through as ``|l|``; smaller ones are floored at ``1/alpha`` (which also
    caps the sampler's effective step scale in flat directions).

    Returns ``metric_fn(params) -> (d, d)`` with a custom JVP that stays
    finite at coincident Hessian eigenvalues (see module docstring), so the
    sampler's ``jax.jacfwd(metric_fn)`` derivative cube is always valid.
    """
    alpha = float(alpha)
    if not alpha > 0.0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    hess_fn = jax.hessian(lambda x: -log_kernel(x))

    @jax.custom_jvp
    def metric_fn(x):
        H = hess_fn(x)
        lam, Q = jnp.linalg.eigh(H)
        return (Q * _softabs_f(lam, alpha)) @ Q.T

    @metric_fn.defjvp
    def _metric_jvp(primals, tangents):
        (x,), (dx,) = primals, tangents
        H, dH = jax.jvp(hess_fn, (x,), (dx,))
        lam, Q = jnp.linalg.eigh(H)
        f = _softabs_f(lam, alpha)
        fp = _softabs_fprime(lam, alpha)
        G = (Q * f) @ Q.T

        dlam = lam[:, None] - lam[None, :]
        # relative coincidence threshold; below it the divided difference
        # is replaced by its limit (f'(l_i) + f'(l_j)) / 2
        thr = 1e-6 * (jnp.abs(lam)[:, None] + jnp.abs(lam)[None, :] + 1.0)
        apart = jnp.abs(dlam) > thr
        safe = jnp.where(apart, dlam, 1.0)
        J = jnp.where(apart, (f[:, None] - f[None, :]) / safe,
                      0.5 * (fp[:, None] + fp[None, :]))

        M = Q.T @ dH @ Q
        dG = Q @ (J * M) @ Q.T
        # symmetrize away the eigh round-off asymmetry
        dG = 0.5 * (dG + dG.T)
        return G, dG

    return metric_fn
