"""Built-in target models.

The reference ships its targets as example programs
(reference examples/{armadillo,eigen}/*.cpp); here they are first-class pure
JAX log-kernels, reusable by tests and benchmarks. Each factory returns a
``log_kernel(params) -> scalar`` closure (closures replace the reference's
``void* target_data``) plus helpers where useful.
"""

from mcmc_tpu.models.targets import (
    gaussian_mean_model,
    gaussian_mean_scale_model,
    logistic_regression_model,
    make_logistic_regression_data,
    ill_conditioned_gaussian,
    banana_model,
    gaussian_mixture_model,
    normal_fisher_metric,
    neals_funnel,
    eight_schools_model,
    poisson_regression_model,
    student_t_regression_model,
    horseshoe_regression_model,
    rbf_kernel,
    latent_gp_poisson_model,
    gp_regression_exact_posterior,
)

__all__ = [
    "gaussian_mean_model",
    "gaussian_mean_scale_model",
    "logistic_regression_model",
    "make_logistic_regression_data",
    "ill_conditioned_gaussian",
    "banana_model",
    "gaussian_mixture_model",
    "normal_fisher_metric",
    "neals_funnel",
    "eight_schools_model",
    "poisson_regression_model",
    "student_t_regression_model",
    "horseshoe_regression_model",
    "rbf_kernel",
    "latent_gp_poisson_model",
    "gp_regression_exact_posterior",
]
