from mcmc_tpu.runtime.drawsink import DrawSink, read_draws

__all__ = ["DrawSink", "read_draws"]
