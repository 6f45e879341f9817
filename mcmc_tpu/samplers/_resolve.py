"""Settings/key resolution shared by sampler entry points."""

from __future__ import annotations

import jax

from mcmc_tpu.settings import AlgoSettings

__all__ = ["resolve_settings", "resolve_key"]


def resolve_settings(settings, attr_name, per_algo_cls):
    """Accept an :class:`AlgoSettings` umbrella, a bare per-sampler settings
    object, or ``None`` (all defaults) — the analog of the reference's
    4-arg / 5-arg overload pair (reference src/rwmh.cpp:176-199)."""
    if settings is None:
        algo = AlgoSettings()
        return algo, getattr(algo, attr_name)
    if isinstance(settings, AlgoSettings):
        return settings, getattr(settings, attr_name)
    if isinstance(settings, per_algo_cls):
        return AlgoSettings(), settings
    raise TypeError(
        f"settings must be AlgoSettings, {per_algo_cls.__name__}, or None; "
        f"got {type(settings).__name__}"
    )


def resolve_key(key, algo: AlgoSettings):
    if key is not None:
        return key
    return jax.random.PRNGKey(int(algo.rng_seed_value))
