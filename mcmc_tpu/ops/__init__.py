from mcmc_tpu.ops import fused_logreg

__all__ = ["fused_logreg"]
