"""Predictive model comparison: WAIC and PSIS-LOO cross-validation.

Beyond-reference capability (MCMCLib has no model-comparison facilities of
any kind; pairs with :mod:`mcmc_tpu.samplers.smc`'s log-evidence estimate to
complete the model-assessment toolbox). All computations are fully
vectorized over observations and posterior draws — a single fused XLA
program per call, no per-observation Python loops — so they run on-device
at any (S, n_obs) scale.

Algorithms:

- **WAIC** (Watanabe 2010; Gelman, Hwang & Vehtari 2014): pointwise
  ``elpd_i = lpd_i - p_waic_i`` with ``lpd_i = log mean_s exp ll_si`` and
  ``p_waic_i = Var_s[ll_si]``.
- **PSIS-LOO** (Vehtari, Gelman & Gabry 2017): leave-one-out importance
  ratios ``r_si = 1 / p(y_i | theta_s)`` stabilized by fitting a
  generalized Pareto distribution to the ``M = min(0.2 S, 3 sqrt(S))``
  largest ratios per observation and replacing them with the fitted
  quantiles (expected order statistics), truncated at the raw maximum.
  The GPD fit is the Zhang & Stephens (2009) empirical-Bayes profile
  estimator with the weak ``(k + 0.5·10)/(n + 10)`` prior regularization
  of Vehtari et al. The per-observation shape ``pareto_k`` is returned as
  the reliability diagnostic (k > 0.7 = unreliable, per the paper).

Shapes: ``log_lik`` is ``(n_draws, n_chains, n_obs)`` (the layout
:func:`pointwise_log_lik` produces from a :class:`SamplerResult`) or a
flattened ``(S, n_obs)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["pointwise_log_lik", "waic", "psis_loo", "compare", "gpd_fit"]


def pointwise_log_lik(draws, log_lik_fn):
    """Evaluate a pointwise log-likelihood ``log_lik_fn(theta) -> (n_obs,)``
    over every kept draw.

    ``draws`` is ``(n_draws, d)`` or ``(n_draws, n_chains, d)`` (the
    ``SamplerResult.draws`` layouts); returns ``(n_draws, n_obs)`` or
    ``(n_draws, n_chains, n_obs)`` respectively, ready for :func:`waic` /
    :func:`psis_loo`.
    """
    draws = jnp.asarray(draws)
    if draws.ndim == 2:
        return jax.vmap(log_lik_fn)(draws)
    if draws.ndim == 3:
        return jax.vmap(jax.vmap(log_lik_fn))(draws)
    raise ValueError(f"draws must be 2-D or 3-D, got shape {draws.shape}")


def _flatten_ll(log_lik):
    ll = jnp.asarray(log_lik)
    if ll.ndim == 3:
        ll = ll.reshape(ll.shape[0] * ll.shape[1], ll.shape[2])
    if ll.ndim != 2:
        raise ValueError(
            f"log_lik must be (S, n_obs) or (n_draws, n_chains, n_obs), "
            f"got shape {ll.shape}")
    return ll


def _summarize(elpd_i, p_i, extra=None):
    n = elpd_i.shape[0]
    out = {
        "elpd": jnp.sum(elpd_i),
        "p_eff": jnp.sum(p_i),
        "se": jnp.sqrt(n * jnp.var(elpd_i)),
        "pointwise": elpd_i,
        "n_obs": n,
    }
    if extra:
        out.update(extra)
    return out


def waic(log_lik):
    """Widely applicable information criterion.

    Returns a dict with ``elpd`` (expected log pointwise predictive
    density, higher is better), ``p_eff`` (effective parameter count),
    ``se`` (standard error of ``elpd``), and ``pointwise`` (per-obs elpd,
    feeds :func:`compare`).
    """
    ll = _flatten_ll(log_lik)
    S = ll.shape[0]
    lpd = logsumexp(ll, axis=0) - jnp.log(jnp.asarray(S, ll.dtype))
    p_waic = jnp.var(ll, axis=0, ddof=1)
    return _summarize(lpd - p_waic, p_waic)


# -- generalized Pareto fit (Zhang & Stephens 2009, profile posterior mean,
#    with the Vehtari-et-al. prior regularization of k) --------------------

_PRIOR_BS = 3.0
_PRIOR_K = 10.0


def gpd_fit(x):
    """Fit GPD(k, sigma) to exceedances ``x`` (1-D, all > 0, ASCENDING).

    Returns ``(k, sigma)`` in the Vehtari-et-al. sign convention
    (k > 0 = heavy tail). Pure jnp (static shapes), vmap-safe.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    m_est = 30 + int(math.isqrt(n))
    jj = jnp.arange(1, m_est + 1, dtype=x.dtype)
    xstar = x[int(n / 4 + 0.5) - 1]  # first-quartile order statistic
    # tied draws can make the lower tail exactly 0 (discrete likelihoods,
    # f32 rounding); a zero quartile would put inf into the b grid and NaN
    # the fit, so fall back to the smallest POSITIVE exceedance
    pos_min = jnp.min(jnp.where(x > 0, x, x[-1]))
    xstar = jnp.where(xstar > 0, xstar, pos_min)
    b = 1.0 / x[-1] + (1.0 - jnp.sqrt(m_est / (jj - 0.5))) / (_PRIOR_BS * xstar)
    # profile log-likelihood of theta=b: k(b) = mean log1p(-b x)
    k_b = jnp.mean(jnp.log1p(-b[:, None] * x[None, :]), axis=1)   # (m_est,)
    profile = n * (jnp.log(-b / k_b) - k_b - 1.0)
    w = jax.nn.softmax(profile)          # posterior weights over the grid
    b_post = jnp.sum(b * w)
    k_post = jnp.mean(jnp.log1p(-b_post * x))
    # sigma comes from the UNregularized k: the prior pull toward 0.5 can
    # flip k's sign relative to b, which would make sigma negative and the
    # fitted quantiles invalid
    sigma = -k_post / b_post
    k_reg = (n * k_post + _PRIOR_K * 0.5) / (n + _PRIOR_K)
    return k_reg, sigma


def _gpd_quantiles(p, k, sigma):
    """Inverse CDF of GPD(k, sigma): sigma/k * ((1-p)^-k - 1); the k -> 0
    limit -sigma*log1p(-p) is taken through expm1 for stability."""
    k_safe = jnp.where(jnp.abs(k) < 1e-12, 1.0, k)
    general = sigma / k_safe * jnp.expm1(-k_safe * jnp.log1p(-p))
    limit = -sigma * jnp.log1p(-p)
    return jnp.where(jnp.abs(k) < 1e-12, limit, general)


def _psis_smooth_one(lw, M):
    """Smooth one observation's log importance ratios ``lw (S,)``.

    Returns (normalized smoothed log-weights, pareto_k). The top-M ratios
    are replaced by the fitted GPD's expected order statistics
    (quantiles at (j+0.5)/M), truncated at the raw maximum, as in
    Vehtari, Gelman & Gabry 2017 §3.2.
    """
    S = lw.shape[0]
    lw_max = jnp.max(lw)
    lw = lw - lw_max                      # ratios in (0, 1]; max ratio = 1
    order = jnp.argsort(lw)
    lw_sorted = lw[order]
    cutoff_lw = lw_sorted[S - M - 1]
    tail_lw = lw_sorted[S - M:]
    cut = jnp.exp(cutoff_lw)
    x = jnp.exp(tail_lw) - cut            # exceedances, ascending
    # Two degenerate tails, with OPPOSITE reliability semantics:
    #  - flat: no spread above the cutoff (tied weights) — the importance
    #    distribution is well behaved; report k = 0, nothing to smooth.
    #  - concentrated: the (S-M-1)th ratio underflows vs the max, i.e.
    #    essentially ALL importance mass sits in <= M draws (the LOO
    #    estimate rides on a handful of draws) — maximally unreliable;
    #    report k = +inf so every "k > 0.7" check fires. Never use a
    #    low-k sentinel here: it would label the worst case as the best.
    flat = x[-1] <= 0
    concentrated = cutoff_lw <= jnp.log(jnp.finfo(lw.dtype).tiny)
    fit_ok = ~flat & ~concentrated
    x_safe = jnp.where(fit_ok, x, jnp.arange(1, M + 1, dtype=lw.dtype))
    k, sigma = gpd_fit(x_safe)
    p = (jnp.arange(M, dtype=lw.dtype) + 0.5) / M
    smoothed = jnp.log(cut + _gpd_quantiles(p, k, sigma))
    smoothed = jnp.minimum(smoothed, 0.0)  # truncate at the raw max ratio
    ok = fit_ok & jnp.isfinite(k) & jnp.isfinite(sigma) & (sigma > 0)
    new_tail = jnp.where(ok, smoothed, tail_lw)
    out = lw.at[order[S - M:]].set(new_tail)
    out = out - logsumexp(out)             # self-normalize
    inf = jnp.asarray(jnp.inf, lw.dtype)
    k_out = jnp.where(flat, 0.0, jnp.where(ok, k, inf))
    return out, k_out


def psis_loo(log_lik):
    """Pareto-smoothed importance-sampling leave-one-out cross-validation.

    Returns a dict with ``elpd``, ``p_eff``, ``se``, ``pointwise``, and
    ``pareto_k`` (per-observation GPD shape; k > 0.7 flags observations
    whose LOO estimate is unreliable — refit without them or use K-fold).
    Degenerate tails report conservative shapes: exactly-tied tail weights
    give ``pareto_k = 0`` (benign), while a tail so concentrated the fit
    is impossible (importance mass in a handful of draws) gives
    ``pareto_k = inf`` (always flagged).
    """
    ll = _flatten_ll(log_lik)
    S, n_obs = ll.shape
    M = int(min(0.2 * S, 3.0 * math.sqrt(S)))
    if M < 5:
        raise ValueError(
            f"PSIS needs a tail of >= 5 draws to fit; got M={M} from "
            f"S={S} total draws — run the sampler for more draws")
    lw, khat = jax.vmap(lambda col: _psis_smooth_one(col, M),
                        in_axes=1, out_axes=(1, 0))(-ll)
    elpd_i = logsumexp(ll + lw, axis=0)    # lw normalized per obs
    lpd_i = logsumexp(ll, axis=0) - jnp.log(jnp.asarray(S, ll.dtype))
    return _summarize(elpd_i, lpd_i - elpd_i, extra={"pareto_k": khat})


def compare(results):
    """Rank models by elpd.

    ``results`` maps model name -> the dict returned by :func:`waic` or
    :func:`psis_loo` (or any dict with a ``pointwise`` per-observation elpd
    vector over the SAME observations). Returns a list of dicts, best
    first, each with ``name``, ``rank``, ``elpd``, ``se``, ``elpd_diff``
    (vs the best model) and ``se_diff`` (paired SE of the difference —
    the right uncertainty for "is A better than B", Vehtari et al. 2017
    §5.2). A |elpd_diff| > 2*se_diff is conventionally decisive.
    """
    if len(results) < 2:
        raise ValueError("compare needs at least two models")
    pw = {}
    n_ref = None
    for name, r in results.items():
        p = jnp.asarray(r["pointwise"])
        if n_ref is None:
            n_ref = p.shape[0]
        elif p.shape[0] != n_ref:
            raise ValueError(
                f"model {name!r} has {p.shape[0]} pointwise terms, "
                f"others have {n_ref}; models must score the same data")
        pw[name] = p
    order = sorted(pw, key=lambda k: -float(jnp.sum(pw[k])))
    best = pw[order[0]]
    out = []
    for rank, name in enumerate(order):
        d = best - pw[name]
        n = d.shape[0]
        out.append({
            "name": name,
            "rank": rank,
            "elpd": float(jnp.sum(pw[name])),
            "se": float(jnp.sqrt(n * jnp.var(pw[name]))),
            "elpd_diff": float(jnp.sum(d)),
            "se_diff": float(jnp.sqrt(n * jnp.var(d))),
        })
    return out
