from mcmc_tpu.samplers.rwmh import rwmh
from mcmc_tpu.samplers.mala import mala
from mcmc_tpu.samplers.hmc import hmc
from mcmc_tpu.samplers.nuts import nuts
from mcmc_tpu.samplers.chees import chees
from mcmc_tpu.samplers.rmhmc import rmhmc
from mcmc_tpu.samplers.de import de
from mcmc_tpu.samplers.aees import aees
from mcmc_tpu.samplers.mclmc import mclmc, mams
from mcmc_tpu.samplers.barker import barker

__all__ = ["rwmh", "mala", "hmc", "nuts", "chees", "rmhmc", "de", "aees",
           "mclmc", "mams", "barker"]
