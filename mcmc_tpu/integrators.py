"""Leapfrog integration shared by the Hamiltonian family (HMC, NUTS).

Re-designs the reference's ``mntm_update_fn`` / ``leap_frog_fn`` closures
(reference src/hmc.cpp:99-128, src/nuts.cpp:106-154) as pure functions. The
reference's two half-kicks both add ``+eps/2 * grad`` with the position drift
``z += eps * M^{-1} p`` between them (src/hmc.cpp:164-176); that structure is
preserved exactly.

Gradient modes for bounded problems:

- ``"reference"`` (default): the momentum kick uses
  ``J(z) * grad_x logK(inv_transform(z))`` — the diagonal inverse-Jacobian
  chain rule of the reference (src/hmc.cpp:108-122), which *omits* the
  gradient of the log-Jacobian term. The accept step still uses the full box
  kernel, so the chain remains a valid MH sampler.
- ``"exact"``: ``grad_z [logK(inv_transform(z)) + log|J|]`` via
  :func:`jax.grad` of the box kernel — the mathematically exact Hamiltonian
  on the unconstrained space.

For unbounded problems the two modes coincide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mcmc_tpu import bounds as bounds_mod

__all__ = ["make_kick_grad", "leapfrog", "kinetic_energy"]


def make_kick_grad(prob, mode: str = "reference"):
    """Return ``grad_fn(z) -> (n_vals,)`` used in momentum half-kicks."""
    if not prob.vals_bound or mode == "exact":
        return jax.grad(prob.box_log_kernel)
    if mode != "reference":
        raise ValueError(f"unknown bounded_grad mode: {mode!r}")

    user_grad = jax.grad(prob.log_kernel)

    def grad_fn(z):
        x = bounds_mod.inv_transform(z, prob.codes, prob.lower_bounds, prob.upper_bounds)
        jac = bounds_mod.inv_jacobian_diag(z, prob.codes, prob.lower_bounds, prob.upper_bounds)
        return jac * user_grad(x)

    return grad_fn


def leapfrog(grad_fn, inv_mv, step_size, n_steps, position, momentum):
    """``n_steps`` leapfrog steps (reference src/hmc.cpp:164-176).

    ``inv_mv`` applies the inverse preconditioner M^{-1}. ``step_size`` may be
    a traced scalar (NUTS varies it per draw); ``n_steps`` must be static.

    The gradient at the step boundary is carried through the scan: the
    reference evaluates ``mntm_update_fn`` twice per step, but its second
    half-kick gradient is the next step's first half-kick gradient at the
    unchanged position, so carrying it is bit-identical (same op sequence)
    while costing ``n_steps + 1`` gradient evaluations instead of
    ``2 * n_steps`` — XLA cannot CSE across scan iterations on its own.
    """
    g0 = grad_fn(position)

    def one_step(carry, _):
        z, p, g = carry
        p = p + 0.5 * step_size * g
        z = z + step_size * inv_mv(p)
        g = grad_fn(z)
        p = p + 0.5 * step_size * g
        return (z, p, g), None

    if isinstance(n_steps, int) and n_steps == 1:
        (z, p, _), _ = one_step((position, momentum, g0), None)
        return z, p
    (z, p, _), _ = lax.scan(one_step, (position, momentum, g0), None,
                            length=n_steps)
    return z, p


def kinetic_energy(momentum, inv_mv):
    """K = p^T M^{-1} p / 2 (reference src/hmc.cpp:156-160)."""
    return 0.5 * jnp.dot(momentum, inv_mv(momentum))
