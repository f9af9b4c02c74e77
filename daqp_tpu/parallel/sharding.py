"""Multi-chip scaling: mesh-sharded batch solves with XLA collectives.

The reference is strictly single-core C with no communication backend
(SURVEY.md §2.3/§5); the distributed dimension is new here and built the
TPU-native way: a 1-D ``jax.sharding.Mesh`` over all chips, the QP batch
sharded on the batch axis via ``shard_map`` (compute rides each chip's MXU;
nothing crosses ICI during the solve), and collectives only for
  * solve statistics (``psum`` of iteration/optimal counts — the analogue
    of DAQPResult.iter/solve_time aggregation, include/api.h:14-26), and
  * the MIQP incumbent bound (``psum``-min of fval_bound between BnB
    frontier waves — the only value whose exchange changes solver behavior,
    reference src/bnb.c:29-31,62).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code then spans hosts with batch shards placed host-locally and
the statistics collectives riding ICI within a slice and DCN across hosts.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import batch as batch_mod
from ..types import Settings


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "batch"
              ) -> Mesh:
    """1-D device mesh over the batch axis (all local + remote devices)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


class ShardedStats(NamedTuple):
    total_iterations: jnp.ndarray   # () global sum
    n_optimal: jnp.ndarray          # () global count
    max_iterations: jnp.ndarray     # () global max


def solve_batch_sharded(H, f, A, bupper, blower, sense, st: Settings,
                        mesh: Mesh, ms: int = 0, repair_rounds: int = 2):
    """Batch-sharded QP solve over a mesh; returns (BatchResult, stats).

    The batch dimension B must be divisible by the mesh size. Results come
    back sharded (device-local lanes stay on their device); the stats tuple
    is a cross-device ``psum``/``pmax`` reduction.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()))
    def shard_solve(H, f, A, bu, bl, sense):
        res = jax.vmap(functools.partial(
            batch_mod._solve_one, ms=ms, st=st, K=A.shape[-1] + 1,
            repair_rounds=repair_rounds))(H, f, A, bu, bl, sense)
        stats = ShardedStats(
            total_iterations=jax.lax.psum(
                jnp.sum(res.iterations), axis),
            n_optimal=jax.lax.psum(
                jnp.sum((res.exitflag == 1).astype(jnp.int32)), axis),
            max_iterations=jax.lax.pmax(jnp.max(res.iterations), axis),
        )
        return res, stats

    return jax.jit(shard_solve)(H, f, A, bupper, blower, sense)


def exchange_incumbent(fval_bound_local, axis: str):
    """psum-min of the BnB incumbent bound across devices — the distributed
    dominance cut (reference fval_bound pruning, src/bnb.c:29-31,62;
    src/daqp.c:20-23). Call between frontier waves inside shard_map."""
    return -jax.lax.pmax(-fval_bound_local, axis)
