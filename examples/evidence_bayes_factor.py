"""Bayes factors by power-posterior path sampling: estimate log marginal
likelihoods for two competing models with `thermo_evidence`, cross-check the
stepping-stone headline against corrected TI, SMC's particle estimate, and
the Laplace shortcut, then report the Bayes factor.

No counterpart in the reference — MCMCLib cannot produce log Z at all. The
replica ladder runs as one (K, d) batch per chain with DEO even/odd swaps,
and the independent vmapped ladders supply the cross-chain standard error.
"""

from _common import setup

jax = setup()
import jax.numpy as jnp

import mcmc_tpu
from mcmc_tpu import AlgoSettings, EvidenceSettings, SMCSettings

# data generated from the quadratic model; model A = linear (misspecified),
# model B = quadratic
key = jax.random.PRNGKey(0)
k_x, k_y = jax.random.split(key)
n = 60
x = jax.random.normal(k_x, (n,))
y = 0.5 + 1.2 * x + 0.8 * x**2 + 0.5 * jax.random.normal(k_y, (n,))
SIG2 = 0.25  # known noise variance


def make_model(degree):
    feats = jnp.stack([x**p for p in range(degree + 1)], axis=1)  # (n, d)
    d = degree + 1

    def log_prior(th):  # N(0, 2^2) iid — normalized
        return jnp.sum(-0.5 * th**2 / 4.0 - 0.5 * jnp.log(2 * jnp.pi * 4.0))

    def log_lik(th):
        r = y - feats @ th
        return jnp.sum(-0.5 * r**2 / SIG2 - 0.5 * jnp.log(2 * jnp.pi * SIG2))

    return d, log_prior, log_lik


s = AlgoSettings()
s.evidence_settings = EvidenceSettings(
    n_burnin_draws=800, n_keep_draws=800, n_temps=24)

log_zs = {}
for name, degree in [("linear", 1), ("quadratic", 2)]:
    d, log_prior, log_lik = make_model(degree)
    res = mcmc_tpu.thermo_evidence(jnp.zeros(d), log_prior, log_lik, s,
                                   n_chains=16, key=jax.random.PRNGKey(1))
    log_zs[name] = float(res.log_z)

    # independent estimators on the same model
    lap = mcmc_tpu.map_laplace(
        jnp.zeros(d), lambda th: log_prior(th) + log_lik(th),
        n_steps=600, learning_rate=0.1, key=jax.random.PRNGKey(2))
    smc_s = AlgoSettings()
    smc_s.smc_settings = SMCSettings(n_particles=2048, init_scale=2.0)
    smc_res = mcmc_tpu.smc(
        jnp.zeros(d), lambda th: log_prior(th) + log_lik(th), smc_s,
        key=jax.random.PRNGKey(3))

    # nested sampling over the same model through the unit-cube transform
    from jax.scipy.special import ndtri
    ns = mcmc_tpu.nested_sampling(
        lambda u: 2.0 * ndtri(u),          # the N(0, 2^2) iid prior
        log_lik, d, n_live=512, key=jax.random.PRNGKey(4))

    print(f"{name:10s} log Z: stepping-stone {res.log_z:9.2f} "
          f"+- {float(res.log_z_se):.3f} | corrected TI {res.log_z_ti:9.2f} "
          f"+- {float(res.log_z_ti_se):.3f} | Laplace "
          f"{float(lap.log_evidence):9.2f} | SMC "
          f"{float(smc_res.diagnostics['log_z']):9.2f} | nested "
          f"{float(ns.log_z):9.2f} +- {float(ns.log_z_err):.2f}")
    print(f"{'':10s} per-rung accept in "
          f"[{float(res.accept_rate.min()):.2f}, "
          f"{float(res.accept_rate.max()):.2f}], min swap rate "
          f"{float(res.swap_accept_rate.min()):.2f}")

log_bf = log_zs["quadratic"] - log_zs["linear"]
print(f"\nlog Bayes factor (quadratic vs linear) = {log_bf:.1f} "
      f"({'decisive for quadratic' if log_bf > 4.6 else 'inconclusive'})")
