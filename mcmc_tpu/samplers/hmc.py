"""Hamiltonian Monte Carlo.

TPU-native re-design of reference src/hmc.cpp:30-254: fixed ``n_leap_steps``
leapfrog trajectories with a constant preconditioner M, momentum refreshed as
``chol(M) @ xi`` each draw, and MH acceptance
``log u < min(0.01, -(U* + K*) + (U + K))`` (src/hmc.cpp:188) — the
reference's 0.01 clamp (not 0) is preserved. Non-finite proposal potentials
are forced to +inf so they are always rejected (src/hmc.cpp:180-182).

Gradients come from :func:`jax.grad` of the user kernel, replacing the
reference's ``grad_out*`` out-parameter convention and its optional external
``autodiff`` library (reference README.md:290-402).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcmc_tpu import adaptation
from mcmc_tpu import integrators
from mcmc_tpu.results import SamplerResult
from mcmc_tpu.settings import HMCSettings
from mcmc_tpu.samplers import common
from mcmc_tpu.samplers._resolve import resolve_settings, resolve_key

__all__ = ["hmc", "HMCState", "build_hmc_kernel"]


class HMCState(NamedTuple):
    position: jax.Array      # unconstrained coordinates
    potential: jax.Array     # U = -box_log_kernel(position)
    da: adaptation.DualAveraging
    draw_ind: jax.Array


def build_hmc_kernel(box_log_kernel, grad_fn, precond: common.SPD,
                     step_size, n_leap_steps, adapt_cfg=None):
    def init(position):
        return HMCState(
            position=position,
            potential=-box_log_kernel(position),
            da=adaptation.da_init(jnp.asarray(step_size, position.dtype)),
            draw_ind=jnp.asarray(0, jnp.int32),
        )

    def step(key, state: HMCState):
        k_mom, k_accept = jax.random.split(key)
        if adapt_cfg is None:
            eps = step_size
        else:
            adapting = state.draw_ind < adapt_cfg["n_burnin"]
            eps = jnp.exp(jnp.where(adapting, state.da.log_eps,
                                    state.da.log_eps_bar))
        noise = jax.random.normal(k_mom, state.position.shape, state.position.dtype)
        momentum = precond.sqrt_mv(noise)
        prev_K = integrators.kinetic_energy(momentum, precond.inv_mv)

        new_pos, new_mom = integrators.leapfrog(
            grad_fn, precond.inv_mv, eps, n_leap_steps,
            state.position, momentum,
        )

        prop_U = -box_log_kernel(new_pos)
        prop_U = jnp.where(jnp.isfinite(prop_U), prop_U, jnp.inf)
        prop_K = integrators.kinetic_energy(new_mom, precond.inv_mv)

        comp = jnp.minimum(0.01, -(prop_U + prop_K) + (state.potential + prev_K))
        u = jax.random.uniform(k_accept, dtype=state.position.dtype)
        accepted = u < jnp.exp(comp)

        da = state.da
        if adapt_cfg is not None:
            accept_stat = jnp.minimum(1.0, jnp.exp(comp))
            accept_stat = jnp.where(jnp.isnan(accept_stat), 0.0, accept_stat)
            da_new = adaptation.da_update(da, accept_stat, adapt_cfg["target"])
            da = jax.tree_util.tree_map(
                lambda new, old: jnp.where(adapting, new, old), da_new, da)

        new_state = HMCState(
            position=jnp.where(accepted, new_pos, state.position),
            potential=jnp.where(accepted, prop_U, state.potential),
            da=da,
            draw_ind=state.draw_ind + 1,
        )
        info = {"accepted": accepted, "energy_error": -(prop_U + prop_K) + (state.potential + prev_K)}
        return new_state, info

    return init, step


def hmc(initial_vals, log_kernel, settings=None, *, n_chains=None, key=None, mesh=None, checkpoint_dir=None, checkpoint_every=500,
        dtype=None, bounded_grad="reference", adapt_step_size=False,
        target_accept=None) -> SamplerResult:
    """Run HMC. See reference src/hmc.cpp and mcmc_structs.hpp:66-78 for the
    settings fields; ``bounded_grad`` selects the constrained-space gradient
    convention (see mcmc_tpu.integrators). ``adapt_step_size=True`` tunes
    the step size by dual averaging toward 0.8 acceptance during burn-in
    (no reference analog)."""
    algo, s = resolve_settings(settings, "hmc_settings", HMCSettings)
    key = resolve_key(key, algo)

    prob = common.setup_problem(initial_vals, log_kernel, algo, n_chains, dtype)
    precond = common.make_spd(s.precond_mat, prob.n_vals, prob.dtype)
    grad_fn = integrators.make_kick_grad(prob, bounded_grad)

    adapt_cfg = None
    if adapt_step_size:
        adapt_cfg = {
            "n_burnin": s.n_burnin_draws,
            "target": target_accept or adaptation.TARGET_ACCEPT["hmc"],
        }
    init, step = build_hmc_kernel(
        prob.box_log_kernel, grad_fn, precond, s.step_size, s.n_leap_steps,
        adapt_cfg,
    )
    state0 = jax.vmap(init)(prob.first_draw)

    final_state, draws, infos = common.run_sampler_loop(
        key, state0, step, s.n_burnin_draws, s.n_keep_draws,
        collect_fn=lambda st: st.position, mesh=mesh,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )

    n_accept = common.tally_accepts(infos)
    draws = common.finalize_draws(draws, prob)
    diagnostics = {}
    if "energy_error" in infos:
        diagnostics["energy_error"] = infos["energy_error"]
    if adapt_step_size:
        diagnostics["adapted_step_size"] = jnp.exp(final_state.da.log_eps_bar)
    if prob.squeeze:
        draws = draws[:, 0, :]
        n_accept = n_accept[0]
        diagnostics = {k: (v[:, 0] if v.ndim == 2 else v[0])
                       for k, v in diagnostics.items()}
    return SamplerResult(draws=draws, n_accept_draws=n_accept,
                         diagnostics=diagnostics)
