from mcmc_tpu.ops import fused_logreg
from mcmc_tpu.ops.fused_logreg import studentt_link
from mcmc_tpu.ops.fused_sampler import (
    fused_glm_hmc, fused_gaussian_hmc, run_fused_step)

__all__ = ["fused_logreg", "studentt_link",
           "fused_glm_hmc", "fused_gaussian_hmc", "run_fused_step"]
