"""Compositional block-Gibbs on a semi-conjugate hierarchical model.

Sixteen-groups random-effects model (a hierarchical normal):

    theta_j | mu, tau ~ N(mu, tau^2)        j = 1..16  (group effects)
    y_j | theta_j     ~ N(theta_j, s_j^2)              (observed)
    mu ~ N(0, 5^2),  tau ~ half-N(0, 8^2)

The theta_j conditionals are exactly Gaussian (conjugate), so the Gibbs
sweep draws them exactly — zero rejections, zero tuning — while the
non-conjugate (mu, log tau) block runs an adapted HMC kernel on its
conditional. This mixed exact/HMC composition is the classic pattern no
monolithic sampler (reference or otherwise) can express.

(The group count/noise here keep tau identified away from zero; a
weakly-identified tau — the eight-schools funnel — mixes slowly under
ANY centered-parameterization Gibbs sweep, which is a property of the
posterior, not of the composition.)

Run: python examples/gibbs_semi_conjugate.py
"""

import _common

jax = _common.setup()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import mcmc_tpu  # noqa: E402

# synthetic data: 16 groups, true mu = 4, tau = 6, obs noise s_j = 4
J = 16
_k1, _k2 = jax.random.split(jax.random.PRNGKey(42))
sigma = jnp.full((J,), 4.0)
_theta_true = 4.0 + 6.0 * jax.random.normal(_k1, (J,))
y = _theta_true + sigma * jax.random.normal(_k2, (J,))

# parameter vector: [theta_1..theta_J, mu, log_tau]
IDX_THETA = list(range(J))
IDX_HYPER = [J, J + 1]


def log_kernel(v):
    theta, mu, log_tau = v[:J], v[J], v[J + 1]
    tau = jnp.exp(log_tau)
    lp = -0.5 * jnp.sum((y - theta) ** 2 / sigma ** 2)
    lp += -0.5 * jnp.sum((theta - mu) ** 2) / tau ** 2 - J * log_tau
    lp += -0.5 * mu ** 2 / 25.0
    lp += -0.5 * tau ** 2 / 64.0 + log_tau  # half-normal prior + Jacobian
    return lp


def cond_theta(key, full):
    """Exact conjugate conditional: theta_j | mu, tau, y_j is Gaussian with
    precision 1/s_j^2 + 1/tau^2."""
    mu, tau = full[J], jnp.exp(full[J + 1])
    prec = 1.0 / sigma ** 2 + 1.0 / tau ** 2
    mean = (y / sigma ** 2 + mu / tau ** 2) / prec
    return mean + jax.random.normal(key, (J,), full.dtype) / jnp.sqrt(prec)


def main():
    out = mcmc_tpu.gibbs(
        jnp.zeros(J + 2), log_kernel,
        mcmc_tpu.GibbsSettings(n_burnin_draws=2000, n_keep_draws=4000),
        blocks=[
            (IDX_THETA, cond_theta),                       # exact draws
            (IDX_HYPER, "hmc", {"step_size": 0.1, "n_leap_steps": 8}),
        ],
        n_chains=64, key=jax.random.PRNGKey(0))
    # note: the centered parameterization couples theta and tau (the
    # eight-schools funnel), so tau mixes slowest — more sweeps, not a
    # different block kernel, is the lever here

    d = np.asarray(out.draws).reshape(-1, J + 2)
    rate = np.asarray(out.diagnostics["block_accept_rate"]).mean(axis=0)
    print(f"block methods      : {out.diagnostics['block_methods']}")
    print(f"block accept rates : theta(exact)={rate[0]:.3f} "
          f"hyper(hmc)={rate[1]:.3f}")
    print(f"posterior mu       : {d[:, J].mean():6.2f} "
          f"+- {d[:, J].std():.2f}")
    print(f"posterior tau      : {np.exp(d[:, J+1]).mean():6.2f}")
    print(f"theta_1 (shrunk)   : {d[:, 0].mean():6.2f}  "
          f"(raw y_1 = {float(y[0]):.1f})")
    summ = mcmc_tpu.diagnostics.summary(
        np.asarray(out.draws)[:, :, [J, J + 1]])
    print("hyper R-hat        :", np.asarray(summ["rhat"]).round(3))


if __name__ == "__main__":
    main()
