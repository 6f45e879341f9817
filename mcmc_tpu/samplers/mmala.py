"""Simplified manifold MALA (mMALA).

Completes the Riemannian family beside RM-HMC (reference
src/rmhmc.cpp:30-325 is the reference's only metric-aware sampler; it has
no MALA analog): Girolami & Calderhead (2011, JRSS-B) position-dependent
Langevin proposals

    y ~ N( x + eps^2/2 * G(x)^{-1} grad log p(x),  eps^2 * G(x)^{-1} )

with the full Metropolis-Hastings correction evaluating the asymmetric
proposal density in BOTH directions — the "simplified" variant drops the
Christoffel drift terms (the manifold-curvature corrections), which the MH
test makes exact anyway; what remains is a preconditioned MALA whose
preconditioner tracks the local geometry instead of being a global
constant. One metric evaluation + Cholesky + gradient per draw (the
current point's pieces ride in the chain state); the proposal draw and
both density evaluations are triangular solves against the same factors.

Use :func:`mcmc_tpu.softabs_metric` to derive a positive-definite metric
from any C2 target's Hessian (Betancourt 2013), exactly as with ``rmhmc``
— mMALA is the cheap option when RM-HMC's generalized leapfrog (fixed-point
iterations, O(n_leap * n_fp) metric evaluations per draw,
src/rmhmc.cpp:208-238) costs more than the geometry buys.

Composes with the standard driver stack (vmap chains, ``mesh``, ``thin``,
``checkpoint_dir``, ``return_resume``) and optional dual-averaged step
size (MALA's 0.574 target). Bounded problems run on the box kernel with
the exact unconstrained-space gradient; the metric is evaluated at the
unconstrained point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcmc_tpu import adaptation
from mcmc_tpu.results import SamplerResult
from mcmc_tpu.settings import MMALASettings
from mcmc_tpu.samplers import common
from mcmc_tpu.samplers._resolve import resolve_settings, resolve_key

__all__ = ["mmala", "MMALAState", "build_mmala_kernel"]


class MMALAState(NamedTuple):
    position: jax.Array
    log_prob: jax.Array
    grad: jax.Array       # box gradient at position
    chol: jax.Array       # Cholesky of G(position)
    da: adaptation.DualAveraging
    draw_ind: jax.Array


def build_mmala_kernel(box, metric_fn, step_size, adapt_cfg=None):
    box_vg = jax.value_and_grad(box)

    def eval_point(z):
        lp, g = box_vg(z)
        lp = jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        G = metric_fn(z)
        G = 0.5 * (G + G.T)
        L = jnp.linalg.cholesky(G)
        return lp, g, L

    def mean_of(z, g, L, eps2):
        # G^{-1} g via two triangular solves against L
        half = jax.scipy.linalg.solve_triangular(L, g, lower=True)
        ginv_g = jax.scipy.linalg.solve_triangular(L.T, half, lower=False)
        return z + 0.5 * eps2 * ginv_g

    def log_q(y, mu, L, eps):
        # N(y; mu, eps^2 G^{-1}): logdet(eps^2 G^{-1}) = 2d log eps
        #   - 2 sum log diag L; quad = |L^T (y - mu)|^2 / eps^2
        d = y.shape[0]
        r = L.T @ (y - mu) / eps
        return (jnp.sum(jnp.log(jnp.diagonal(L)))
                - d * jnp.log(eps)
                - 0.5 * d * jnp.log(2 * jnp.pi)
                - 0.5 * r @ r)

    def init(position):
        lp, g, L = eval_point(position)
        dt = position.dtype
        return MMALAState(
            position=position, log_prob=lp, grad=g, chol=L,
            da=adaptation.da_init(jnp.asarray(step_size, dt)),
            draw_ind=jnp.asarray(0, jnp.int32),
        )

    def step(key, state: MMALAState):
        k_noise, k_accept = jax.random.split(key)
        dt = state.position.dtype
        if adapt_cfg is None:
            eps = jnp.asarray(step_size, dt)
        else:
            adapting = state.draw_ind < adapt_cfg["n_burnin"]
            eps = jnp.exp(jnp.where(adapting, state.da.log_eps,
                                    state.da.log_eps_bar))
        eps2 = eps * eps

        mu = mean_of(state.position, state.grad, state.chol, eps2)
        xi = jax.random.normal(k_noise, state.position.shape, dt)
        # draw from N(mu, eps^2 G^{-1}): sqrt = eps L^{-T}
        proposal = mu + eps * jax.scipy.linalg.solve_triangular(
            state.chol.T, xi, lower=False)

        prop_lp, prop_g, prop_L = eval_point(proposal)
        prop_ok = jnp.all(jnp.isfinite(prop_L))
        # a non-PD metric at the proposal (NaN Cholesky) forces rejection
        safe_L = jnp.where(prop_ok, prop_L,
                           jnp.eye(prop_L.shape[0], dtype=dt))
        mu_rev = mean_of(proposal, prop_g, safe_L, eps2)

        adj = log_q(state.position, mu_rev, safe_L, eps) \
            - log_q(proposal, mu, state.chol, eps)
        comp = jnp.minimum(0.0, prop_lp - state.log_prob + adj)
        comp = jnp.where(jnp.isnan(comp) | ~prop_ok, -jnp.inf, comp)
        accepted = jnp.log(jax.random.uniform(k_accept, dtype=dt)) < comp

        da = state.da
        if adapt_cfg is not None:
            accept_stat = jnp.exp(comp)
            da_new = adaptation.da_update(da, accept_stat,
                                          adapt_cfg["target"])
            da = jax.tree_util.tree_map(
                lambda new, old: jnp.where(adapting, new, old), da_new, da)

        sel = lambda a, b: jnp.where(accepted, a, b)
        new_state = MMALAState(
            position=sel(proposal, state.position),
            log_prob=sel(prop_lp, state.log_prob),
            grad=sel(prop_g, state.grad),
            chol=jnp.where(accepted, safe_L, state.chol),
            da=da, draw_ind=state.draw_ind + 1,
        )
        return new_state, {"accepted": accepted}

    return init, step


def mmala(initial_vals, log_kernel, metric_fn, settings=None, *,
          n_chains=None, key=None, mesh=None, checkpoint_dir=None,
          checkpoint_every=500, dtype=None, adapt_step_size=False,
          target_accept=None, thin=1, return_resume=False) -> SamplerResult:
    """Run simplified manifold MALA (module docstring).

    ``metric_fn(z) -> (n_vals, n_vals)`` SPD metric at the (unconstrained)
    point — the same convention as :func:`mcmc_tpu.rmhmc`, including
    :func:`mcmc_tpu.softabs_metric`. ``adapt_step_size=True`` dual-averages
    toward 0.574 acceptance during burn-in."""
    algo, s = resolve_settings(settings, "mmala_settings", MMALASettings)
    key = resolve_key(key, algo)
    if return_resume and checkpoint_dir is not None:
        raise ValueError("return_resume is incompatible with checkpoint_dir")
    if not callable(metric_fn):
        raise TypeError(
            f"metric_fn must be callable (z -> SPD matrix); got "
            f"{type(metric_fn).__name__}")

    prob = common.setup_problem(initial_vals, log_kernel, algo, n_chains,
                                dtype)
    adapt_cfg = None
    if adapt_step_size:
        adapt_cfg = {
            "n_burnin": s.n_burnin_draws,
            "target": target_accept or adaptation.TARGET_ACCEPT["mala"],
        }
    init, step = build_mmala_kernel(prob.box_log_kernel, metric_fn,
                                    s.step_size, adapt_cfg)
    state0 = jax.vmap(init, axis_name=common.CHAIN_AXIS_NAME)(prob.first_draw)

    def assemble(key, state0, n_burnin, n_keep):
        final_state, draws, infos = common.run_sampler_loop(
            key, state0, step, n_burnin, n_keep,
            collect_fn=lambda st: st.position, mesh=mesh,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            thin=thin,
        )
        n_accept = common.tally_accepts(infos)
        draws = common.finalize_draws(draws, prob)
        diagnostics = {}
        if adapt_step_size:
            diagnostics["adapted_step_size"] = jnp.exp(
                final_state.da.log_eps_bar)
        if prob.squeeze:
            draws = draws[:, 0, :]
            n_accept = n_accept[0]
            diagnostics = {k: v[0] for k, v in diagnostics.items()}
        if thin > 1:
            diagnostics["thin"] = int(thin)
        return SamplerResult(draws=draws, n_accept_draws=n_accept,
                             diagnostics=diagnostics), final_state

    result, final_state = assemble(key, state0, s.n_burnin_draws,
                                   s.n_keep_draws)
    if return_resume:
        common.attach_resume(result, assemble, final_state)
    return result
