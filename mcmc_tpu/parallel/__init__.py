from mcmc_tpu.parallel.mesh import (
    make_mesh, make_grid_mesh, chain_sharding, shard_chain_axis,
    shard_data_axis, data_parallel_kernel,
)
from mcmc_tpu.parallel.de_sharded import build_sharded_de_sweep
from mcmc_tpu.parallel.aees_sharded import aees_sharded
from mcmc_tpu.parallel.pt_sharded import pt_sharded
from mcmc_tpu.parallel.distributed import (
    init_distributed, global_chain_array, global_mesh,
)

__all__ = ["make_mesh", "make_grid_mesh", "chain_sharding",
           "shard_chain_axis", "shard_data_axis", "data_parallel_kernel",
           "build_sharded_de_sweep", "aees_sharded", "pt_sharded",
           "init_distributed", "global_chain_array", "global_mesh"]
