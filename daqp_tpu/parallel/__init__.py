from .sharding import (make_mesh, solve_batch_sharded, exchange_incumbent,
                       ShardedStats)
