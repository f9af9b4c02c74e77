from .sharding import (make_mesh, solve_batch_sharded, exchange_incumbent,
                       solve_miqp_sharded, ShardedStats)
