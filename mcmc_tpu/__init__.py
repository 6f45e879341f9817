"""mcmc_tpu — a TPU-native MCMC inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of MCMCLib
(kthohr/mcmc, reference at /root/reference): seven MCMC samplers driven by a
user-supplied log-posterior kernel, re-architected TPU-first:

- the user target is a pure JAX function ``log_kernel(params) -> scalar``
  (autodiff via :func:`jax.grad` replaces the reference's ``grad_out*``
  callback convention and its external ``autodiff`` C++ library —
  see reference README.md:290-402);
- every sampler is a pure ``(key, state) -> (state, info)`` transition kernel,
  scanned over draws with :func:`jax.lax.scan` and vmapped over thousands of
  chains per chip;
- population/ladder samplers (DE-MCMC, AEES) treat chains as a sharded batch
  axis over a :class:`jax.sharding.Mesh`, with XLA collectives replacing the
  reference's OpenMP thread loops (reference src/de.cpp:161, src/aees.cpp:167).

Public API mirrors the reference's seven entry points
(reference include/mcmc/mcmc_algos.hpp):

    rwmh, mala, hmc, nuts, rmhmc, de, aees

plus the settings types of reference include/misc/mcmc_structs.hpp.
"""

from mcmc_tpu.settings import (
    AlgoSettings,
    RWMHSettings,
    MALASettings,
    HMCSettings,
    NUTSSettings,
    ChEESSettings,
    RMHMCSettings,
    DESettings,
    DEMCZSettings,
    AEESSettings,
    PTSettings,
    SMCSettings,
    StretchSettings,
    SGLDSettings,
    SGHMCSettings,
    EllipticalSettings,
    SliceSettings,
)
from mcmc_tpu.results import SamplerResult
from mcmc_tpu.samplers.rwmh import rwmh
from mcmc_tpu.samplers.mala import mala
from mcmc_tpu.samplers.hmc import hmc
from mcmc_tpu.samplers.nuts import nuts
from mcmc_tpu.samplers.chees import chees
from mcmc_tpu.samplers.rmhmc import rmhmc
from mcmc_tpu.samplers.de import de
from mcmc_tpu.samplers.demcz import demcz
from mcmc_tpu.samplers.aees import aees
from mcmc_tpu.samplers.pt import pt
from mcmc_tpu.samplers.smc import smc
from mcmc_tpu.samplers.stretch import stretch
from mcmc_tpu.samplers.sgld import sgld, sghmc
from mcmc_tpu.samplers.ellipse import elliptical_slice
from mcmc_tpu.samplers.slice import slice_sampler
from mcmc_tpu.laplace import map_laplace, LaplaceResult
from mcmc_tpu.model_compare import (
    pointwise_log_lik,
    waic,
    psis_loo,
    compare,
)
from mcmc_tpu.pytree import ravel_model, unravel_draws, bounds_like
from mcmc_tpu.metrics import softabs_metric
from mcmc_tpu.predictive import generated_quantities, posterior_predictive
from mcmc_tpu.sbc import sbc
from mcmc_tpu import bounds
from mcmc_tpu import stats
from mcmc_tpu import diagnostics
from mcmc_tpu import models

import jax
import jax.numpy as jnp

__version__ = "0.1.0"

_SAMPLERS = {
    "rwmh": rwmh, "mala": mala, "hmc": hmc, "nuts": nuts, "chees": chees,
    "rmhmc": rmhmc, "de": de, "demcz": demcz, "aees": aees, "pt": pt,
    "smc": smc,
    "stretch": stretch, "sgld": sgld, "sghmc": sghmc,
    "elliptical": elliptical_slice,
    "slice": slice_sampler,
}


def sample(algorithm, initial_vals, log_kernel, settings=None, **kwargs):
    """One-call dispatcher over the samplers (the reference seven plus
    the TPU-native extensions).

    ``sample("nuts", x0, log_kernel, settings, n_chains=..., ...)`` is
    equivalent to calling the named entry point directly. RM-HMC requires
    a ``metric_fn=`` keyword; SGLD interprets ``log_kernel`` as the
    log-PRIOR and requires ``log_lik=`` and ``data=`` keywords (the
    minibatched likelihood lives outside the single-callback convention);
    ``"elliptical"`` interprets ``log_kernel`` as the log-LIKELIHOOD only
    (the Gaussian prior is passed via ``prior_mean=``/``prior_cov=``).
    """
    try:
        fn = _SAMPLERS[algorithm]
    except KeyError:
        raise ValueError(
            f"unknown algorithm {algorithm!r}; choose from {sorted(_SAMPLERS)}"
        ) from None
    if algorithm == "rmhmc":
        metric_fn = kwargs.pop("metric_fn", None)
        if metric_fn is None:
            raise ValueError("rmhmc requires metric_fn=")
        return fn(initial_vals, log_kernel, metric_fn, settings, **kwargs)
    if algorithm in ("sgld", "sghmc"):
        log_lik = kwargs.pop("log_lik", None)
        data = kwargs.pop("data", None)
        if log_lik is None or data is None:
            raise ValueError(f"{algorithm} requires log_lik= and data= "
                             f"(log_kernel is the log-prior)")
        return fn(initial_vals, log_kernel, log_lik, data, settings, **kwargs)
    return fn(initial_vals, log_kernel, settings, **kwargs)


def fit(initial_vals, log_kernel, *, n_chains=8, n_warmup=1000, n_draws=1000,
        key=None, mesh=None, algorithm="nuts", dense_mass=False,
        target_accept=None, max_tree_depth=10, init=None,
        lower_bounds=None, upper_bounds=None,
        rhat_target=None, min_ess=None, max_rounds=8):
    """One-call posterior fit with full automatic warmup.

    ``algorithm="nuts"`` (default) runs NUTS with pooled dual-averaging
    step-size adaptation and windowed mass-matrix adaptation (diagonal, or
    full-covariance with ``dense_mass=True``); ``algorithm="chees"`` runs
    ChEES-HMC with diagonal mass — the recommended choice for large chain
    batches on TPU (~9x NUTS min-ESS/s on the flagship benchmark).
    ``target_accept`` defaults per algorithm (0.8 NUTS / 0.651 ChEES);
    ``dense_mass`` selects full-covariance mass for either algorithm;
    ``max_tree_depth`` is NUTS-only. ``algorithm="stretch"`` runs the
    affine-invariant ensemble — the derivative-free choice when
    ``log_kernel`` is not differentiable (``n_chains`` maps to walkers,
    min ``max(2 * dim, 32)`` and even; no tuning parameters exist to warm
    up, so ``n_warmup`` is plain burn-in). ``algorithm="slice"`` runs
    slice-within-Gibbs — derivative-free with per-coordinate self-tuning
    brackets; prefer it over ``"stretch"`` at small ``n_chains`` or when
    walkers cannot span the dimension. ``algorithm="demcz"`` runs DE-MC(Z)
    — derivative-free with a tiny population (``n_chains`` maps to
    ``n_pop``, min 4): archive-based difference proposals span the space
    even when the walkers cannot. ``init="laplace"`` first finds
    the posterior mode (:func:`mcmc_tpu.map_laplace`, batched-Adam MAP) and
    starts every chain from an overdispersed draw of the Laplace Gaussian
    instead of ``initial_vals`` directly. ``lower_bounds``/``upper_bounds``
    (either or both, per-dimension, inf = unbounded) apply the same box-
    constraint transform stack as the sampler entry points.

    Run-until-converged: setting ``rhat_target`` (e.g. 1.01, checked
    against the max rank-normalized split R-hat) and/or ``min_ess``
    (checked against the min bulk ESS) keeps extending the run in warm
    ``n_draws``-sized segments — no re-warmup, adapted step size / mass /
    trajectory state carried — until the gates pass or ``max_rounds``
    segments have run. ``diagnostics["n_rounds"]`` and
    ``diagnostics["converged"]`` record the outcome; per-draw trace
    diagnostics reflect the final segment only. All algorithms
    attach
    ``diagnostics.summary`` (mean, sd, MCSE, quantiles, HDI, split/rank
    R-hat, bulk/tail ESS). The "it just works" entry point the reference's
    fixed-settings API cannot offer.
    """
    if init not in (None, "laplace"):
        raise ValueError(f"fit init must be None or 'laplace', got {init!r}")
    extend = rhat_target is not None or min_ess is not None
    if (extend or init == "laplace") and key is None:
        key = jax.random.PRNGKey(0)
    bounded = lower_bounds is not None or upper_bounds is not None
    def _algo(inner):
        kw = dict(vals_bound=bounded, lower_bounds=lower_bounds,
                  upper_bounds=upper_bounds) if bounded else {}
        return AlgoSettings(**kw, **inner)
    if init == "laplace":
        key, k_map, k_init = jax.random.split(key, 3)
        lap = map_laplace(initial_vals, log_kernel, _algo({}), key=k_map)
        _laplace_init = lambda n: lap.draw_init(k_init, n)
    # Reserve a disjoint key for the sampler run: the extension loop below
    # keeps splitting `key`, and jax.random.split(k, 2) rows are a prefix of
    # split(k, n) rows, so handing the sampler the same `key` we later split
    # would exactly replay its internal streams in the extension segments.
    k_run = None
    if key is not None:
        key, k_run = jax.random.split(key)
    if algorithm == "chees":
        if init == "laplace":
            initial_vals = _laplace_init(n_chains)
        cs = ChEESSettings(n_burnin_draws=n_warmup, n_keep_draws=n_draws)
        if target_accept is not None:
            cs.target_accept_rate = target_accept
        cs = _algo({"chees_settings": cs})
        out = chees(initial_vals, log_kernel, cs, n_chains=n_chains, key=k_run,
                    mesh=mesh, return_resume=extend,
                    adapt_mass_matrix="dense" if dense_mass else "diag")
    elif algorithm == "nuts":
        if init == "laplace":
            initial_vals = _laplace_init(n_chains)
        s = NUTSSettings(
            n_burnin_draws=n_warmup, n_keep_draws=n_draws, n_adapt_draws=n_warmup,
            target_accept_rate=0.8 if target_accept is None else target_accept,
            max_tree_depth=max_tree_depth,
        )
        s = _algo({"nuts_settings": s})
        out = nuts(initial_vals, log_kernel, s, n_chains=n_chains, key=k_run,
                   mesh=mesh, pooled_adaptation=True, return_resume=extend,
                   adapt_mass_matrix="dense" if dense_mass else "diag")
    elif algorithm == "slice":
        if init == "laplace":
            initial_vals = _laplace_init(n_chains)
        sls = SliceSettings(n_burnin_draws=n_warmup, n_keep_draws=n_draws)
        sls = _algo({"slice_settings": sls})
        out = slice_sampler(initial_vals, log_kernel, sls,
                            n_chains=n_chains, key=k_run, mesh=mesh,
                            return_resume=extend)
    elif algorithm == "stretch":
        import numpy as _np
        dim = int(_np.asarray(initial_vals).shape[-1])
        n_walkers = max(int(n_chains), 2 * dim, 32)
        n_walkers += n_walkers % 2
        if mesh is not None:   # two shardable halves per device
            m = 2 * int(_np.prod(list(mesh.shape.values())))
            n_walkers = ((n_walkers + m - 1) // m) * m
        ss = StretchSettings(n_walkers=n_walkers, n_burnin_draws=n_warmup,
                             n_keep_draws=n_draws)
        if init == "laplace":
            # ensemble centers on the MAP with curvature-matched spread
            # (the walker ball lives in unconstrained space, as does cov)
            initial_vals = lap.mode
            ss.init_spread = jnp.sqrt(jnp.diagonal(lap.cov))
        ss = _algo({"stretch_settings": ss})
        out = stretch(initial_vals, log_kernel, ss, key=k_run, mesh=mesh,
                      return_resume=extend)
    elif algorithm == "demcz":
        if mesh is not None:
            raise ValueError(
                "fit(algorithm='demcz') does not take mesh: the population "
                "is deliberately tiny (scale by replicating runs instead)")
        zs = DEMCZSettings(n_pop=max(int(n_chains), 4),
                           n_burnin_draws=n_warmup, n_keep_draws=n_draws)
        if init == "laplace":
            # center the initial box on the MAP with curvature-matched
            # half-width; init_box builds it in unconstrained space (where
            # lap.cov lives) and maps back, so bounded parameters get a
            # correctly scaled constrained-space box
            initial_vals = lap.mode
            zs.initial_lb, zs.initial_ub = lap.init_box(2.0)
        zs = _algo({"demcz_settings": zs})
        out = demcz(initial_vals, log_kernel, zs, key=k_run,
                    return_resume=extend)
    else:
        raise ValueError(
            f"fit algorithm must be 'nuts', 'chees', 'stretch', 'slice', "
            f"or 'demcz', got {algorithm!r}")
    if extend:
        resume = out.diagnostics.pop("resume")
        segs, accepts, rounds = [out.draws], [out.n_accept_draws], 1
        while True:
            d = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
            ok = (rhat_target is None
                  or float(diagnostics.rank_normalized_rhat(d).max())
                  <= rhat_target)
            if ok and min_ess is not None:
                ok = float(diagnostics.bulk_ess(d).min()) >= min_ess
            if ok or rounds >= max_rounds:
                break
            key, k_ext = jax.random.split(key)
            out = resume(k_ext, n_draws)
            resume = out.diagnostics.pop("resume")
            segs.append(out.draws)
            accepts.append(out.n_accept_draws)
            rounds += 1
        n_acc = accepts[0]
        for a in accepts[1:]:
            n_acc = n_acc + a
        out = SamplerResult(
            draws=d, n_accept_draws=n_acc,
            diagnostics={**out.diagnostics, "n_rounds": rounds,
                         "converged": ok})
    out.diagnostics["summary"] = diagnostics.summary(out.draws)
    return out

__all__ = [
    "rwmh", "mala", "hmc", "nuts", "chees", "rmhmc", "de", "demcz", "aees",
    "pt", "smc", "stretch", "sgld", "sghmc", "elliptical_slice",
    "slice_sampler",
    "sample", "fit", "map_laplace", "LaplaceResult",
    "AlgoSettings", "RWMHSettings", "MALASettings", "HMCSettings",
    "NUTSSettings", "ChEESSettings", "RMHMCSettings", "DESettings",
    "DEMCZSettings", "AEESSettings", "PTSettings", "SMCSettings",
    "StretchSettings",
    "SGLDSettings", "SGHMCSettings", "EllipticalSettings", "SliceSettings",
    "SamplerResult", "bounds", "stats", "diagnostics", "models",
    "pointwise_log_lik", "waic", "psis_loo", "compare",
    "ravel_model", "unravel_draws", "bounds_like", "softabs_metric",
    "generated_quantities", "posterior_predictive", "sbc",
]
