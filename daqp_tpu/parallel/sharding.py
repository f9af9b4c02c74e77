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

Multi-host: ``parallel.distributed.initialize()`` joins the process group
and ``distributed.global_mesh()`` spans all hosts' devices; the same code
then runs with batch shards placed host-locally and the statistics
collectives riding ICI within a slice and DCN across hosts (proven by the
2-process CPU test ``tests/test_multihost.py``).
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
                        mesh: Mesh, ms: int = 0, repair_rounds: int = 2,
                        tier: str = "flat", lane_chunk: int = 512,
                        has_soft=None, interpret: bool = False, K=None):
    """Batch-sharded QP solve over a mesh; returns (BatchResult, stats).

    The batch dimension B must be divisible by the mesh size. Results come
    back sharded (device-local lanes stay on their device); the stats tuple
    is a cross-device ``psum``/``pmax`` reduction.

    ``tier`` selects the per-device solver (the multi-chip axis composes
    with every single-chip tier, not just the slowest one):
      * ``"flat"``   (default) — the branch-free slot-table solver,
        lane-chunked (``batch._flat_batch_core``);
      * ``"pallas"`` — the VMEM mega-kernel (``batch._pallas_batch_core``;
        per-device shard must be a multiple of 128 lanes; pass
        ``interpret=True`` off-TPU);
      * ``"naive"``  — the ordered-working-set reference-shaped solver
        (kept for differential testing).
    """
    axis = mesh.axis_names[0]
    n = A.shape[-1]
    # Host-side sense inspection only works when the array is addressable;
    # in a multi-host run pass has_soft / K explicitly for soft batches.
    inspectable = (not isinstance(sense, jax.Array)
                   or sense.is_fully_addressable)
    if tier == "pallas" and has_soft is None:
        from ..types import SOFT
        has_soft = bool(np.any(np.asarray(sense) & SOFT)) if inspectable \
            else False
    if K is None:
        if tier == "flat" and inspectable:
            from ..types import SOFT
            max_ns = int(np.max(np.sum((np.asarray(sense) & SOFT) > 0,
                                       axis=-1), initial=0))
            K = n + max_ns + 1
        else:
            K = n + 1

    try:
        fn = _sharded_solve_fn(mesh, axis, tier, ms, K, lane_chunk,
                               bool(has_soft), interpret, repair_rounds, st)
    except TypeError:
        # unhashable Settings (array-valued fields): fall back to an
        # uncached build — correct, but retraces per call
        fn = _sharded_solve_fn.__wrapped__(
            mesh, axis, tier, ms, K, lane_chunk, bool(has_soft),
            interpret, repair_rounds, st)
    return fn(H, f, A, bupper, blower, sense)


@functools.lru_cache(maxsize=64)
def _sharded_solve_fn(mesh, axis, tier, ms, K, lane_chunk, has_soft,
                      interpret, repair_rounds, st):
    """Build-and-cache the jitted shard_map solve for one static config.

    ``solve_batch_sharded`` used to wrap a freshly defined closure in
    ``jax.jit`` on every call, so every call RETRACED the whole per-shard
    solver (measured on a v5e: 133 solves/s sharded vs 55k direct purely
    from per-call retracing).  All config is hashable (``Settings`` is a
    NamedTuple of Python floats), so cache the compiled callable."""

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()))
    def shard_solve(H, f, A, bu, bl, sense):
        if tier == "flat":
            res = batch_mod._flat_batch_core(
                H, f, A, bu, bl, sense, st, ms=ms, K=K,
                lane_chunk=lane_chunk)
        elif tier == "pallas":
            res = batch_mod._pallas_batch_core(
                H, f, A, bu, bl, sense, st, ms=ms,
                interpret=interpret, has_soft=has_soft)
        elif tier == "prox":
            # batched proximal driver per shard (semidefinite-H
            # batches).  fused=False: the fused outer-loop kernel is
            # chip-validated outside shard_map only (its aliased
            # multi-buffer pallas_call under shard_map is untested on
            # real multi-chip); the XLA per-pass path shards cleanly.
            res = batch_mod.solve_batch_prox_pallas_jit(
                H, f, A, bu, bl, sense, st, ms=ms, interpret=interpret,
                fused=False)
        else:
            res = jax.vmap(functools.partial(
                batch_mod._solve_one, ms=ms, st=st, K=K,
                repair_rounds=repair_rounds))(H, f, A, bu, bl, sense)
        stats = ShardedStats(
            total_iterations=jax.lax.psum(
                jnp.sum(res.iterations), axis),
            n_optimal=jax.lax.psum(
                jnp.sum((res.exitflag == 1).astype(jnp.int32)), axis),
            max_iterations=jax.lax.pmax(jnp.max(res.iterations), axis),
        )
        return res, stats

    return jax.jit(shard_solve)


def solve_batch_miqp_sharded(H, f, A, bupper, blower, sense, st: Settings,
                             mesh: Mesh, ms: int = 0, bin_ids: tuple = (),
                             interpret: bool = False):
    """Instance-parallel batched MIQP over the mesh: each device runs the
    node-wave BnB driver (``solve_batch_miqp_pallas_jit``) on its shard.

    Instances are independent so nothing crosses ICI during the solve
    (statistics are reduced at the end); for ONE hard MIQP whose TREE is
    sharded across devices with incumbent-bound exchange, use
    :func:`solve_miqp_sharded` instead."""
    try:
        fn = _sharded_miqp_fn(mesh, ms, bin_ids, interpret, st)
    except TypeError:   # unhashable Settings — uncached fallback
        fn = _sharded_miqp_fn.__wrapped__(mesh, ms, bin_ids, interpret, st)
    return fn(H, f, A, bupper, blower, sense)


@functools.lru_cache(maxsize=64)
def _sharded_miqp_fn(mesh, ms, bin_ids, interpret, st):
    """Cached jitted shard_map MIQP solve (see ``_sharded_solve_fn``:
    a per-call ``jax.jit`` of a fresh closure retraces on every call)."""
    from .. import batch as batch_mod
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()))
    def shard_solve(H, f, A, bu, bl, se):
        res = batch_mod.solve_batch_miqp_pallas_jit(
            H, f, A, bu, bl, se, st, ms=ms, bin_ids=bin_ids,
            interpret=interpret)
        stats = ShardedStats(
            total_iterations=jax.lax.psum(jnp.sum(res.iterations), axis),
            n_optimal=jax.lax.psum(
                jnp.sum((res.exitflag == 1).astype(jnp.int32)), axis),
            max_iterations=jax.lax.pmax(jnp.max(res.iterations), axis),
        )
        return res, stats

    return jax.jit(shard_solve)


def exchange_incumbent(fval_bound_local, axis: str):
    """psum-min of the BnB incumbent bound across devices — the distributed
    dominance cut (reference fval_bound pruning, src/bnb.c:29-31,62;
    src/daqp.c:20-23). Call between frontier waves inside shard_map."""
    return -jax.lax.pmax(-fval_bound_local, axis)


def solve_miqp_sharded(H, f, A, bupper, blower, sense, ms: int,
                       st: Settings, mesh: Mesh, rounds: int = 16,
                       node_budget: int = 32):
    """One MIQP, its branch-and-bound TREE sharded over the mesh.

    Each device owns the subtree obtained by pre-fixing the first
    log2(n_devices) binary constraints to the bits of its device index
    (as immutable equalities, the same mechanism BnB itself uses to fix a
    binary, bnb.c:106-107).  Devices run resumable DFS waves of
    ``node_budget`` nodes and exchange ONLY the incumbent dominance bound
    by a min-reduction between waves — the single value whose exchange
    changes solver behavior (bnb.c:29-31,62) — then the globally best
    incumbent is selected by an all_gather + argmin.

    The reference has no distributed mode at all (SURVEY.md §2.3); this is
    the TPU-native scale-out of its warm-started DFS.
    """
    from ..types import BINARY

    D = int(np.prod([d for d in mesh.devices.shape]))
    kfix = max(0, int(np.log2(D)))
    sense_arr = np.asarray(sense, np.int32)
    bin_ids_all = tuple(int(i) for i in np.where(sense_arr & BINARY)[0])
    kfix = min(kfix, len(bin_ids_all))
    fixed_ids = bin_ids_all[:kfix]
    free_ids = bin_ids_all  # fixed ones carry ACTIVE and are never branched
    n = np.asarray(A).shape[1]
    K = n + 1
    try:
        fn = _sharded_tree_miqp_fn(mesh, ms, st, rounds, node_budget,
                                   fixed_ids, free_ids, K)
    except TypeError:   # unhashable Settings — uncached fallback
        fn = _sharded_tree_miqp_fn.__wrapped__(
            mesh, ms, st, rounds, node_budget, fixed_ids, free_ids, K)
    return fn(H, f, A, bupper, blower, jnp.asarray(sense_arr))


@functools.lru_cache(maxsize=64)
def _sharded_tree_miqp_fn(mesh, ms, st, rounds, node_budget, fixed_ids,
                          free_ids, K):
    """Cached jitted tree-sharded BnB worker (see ``_sharded_solve_fn``)."""
    from .. import bnb as bnb_mod
    from .. import transform
    from ..types import (ACTIVE, IMMUTABLE, LOWER, DAQP_INF,
                         EXIT_INFEASIBLE, EXIT_OPTIMAL)

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()))
    def worker(H, f, A, bu, bl, sense):
        d = jax.lax.axis_index(axis)
        # pre-fix this device's subtree: binary i at bit i of d
        for i, bid in enumerate(fixed_ids):
            side_lo = ((d >> i) & 1) > 0       # 1 -> lower endpoint
            bits = jnp.where(side_lo,
                             sense[bid] | (ACTIVE | LOWER | IMMUTABLE),
                             (sense[bid] | (ACTIVE | IMMUTABLE)) & ~LOWER)
            sense = sense.at[bid].set(bits.astype(jnp.int32))

        ldpd = transform.build_ldp(H, f, A, bu, bl, sense, ms, st)
        bin_arr = jnp.asarray(free_ids, jnp.int32)
        c = bnb_mod.bnb_init(ldpd, bin_arr, st, K)

        def wave(_, c):
            c = bnb_mod.bnb_run(c, bin_arr, st, node_budget=node_budget)
            gbound = -jax.lax.pmax(-c.bound, axis)   # min over devices
            return c._replace(bound=gbound)

        c = jax.lax.fori_loop(0, rounds, wave, c)
        c = bnb_mod.bnb_run(c, bin_arr, st)          # drain remainder

        # the LOCAL incumbent's objective, computed from its own u —
        # NOT from bnb_finalize's folded bound: the exchanged GLOBAL
        # bound contaminates c.bound, so a device without the best
        # incumbent would claim the global fval while gathering its own
        # x (observed at the config-5 dryrun shape: returned x had
        # direct objective +30.7 while reporting -36.2)
        x = transform.ldp_to_qp_solution(ldpd, c.incumbent_u)
        fldp = c.incumbent_u @ c.incumbent_u
        fval = 0.5 * (fldp - ldpd.v @ ldpd.v)
        my = jnp.where(c.incumbent_found, fval,
                       jnp.asarray(DAQP_INF, fval.dtype))
        # winner selection across devices
        all_f = jax.lax.all_gather(my, axis)         # (D,)
        all_x = jax.lax.all_gather(x, axis)          # (D, n)
        widx = jnp.argmin(all_f)
        found_any = jnp.min(all_f) < DAQP_INF
        xg = all_x[widx]
        # report the winner's objective recomputed from x directly: the
        # LDP-space 0.5*(u'u - v'v) cancellation loses ~5e-2 in f32 at
        # this scale (observed vs the f64 reference)
        hi = jax.lax.Precision.HIGHEST
        fg = 0.5 * jnp.einsum('i,ij,j->', xg, H, xg, precision=hi) \
            + jnp.einsum('i,i->', f, xg, precision=hi)
        status = jnp.where(found_any, EXIT_OPTIMAL,
                           EXIT_INFEASIBLE).astype(jnp.int32)
        nodes = jax.lax.psum(c.nodecount, axis)
        return xg, fg, status, nodes

    return jax.jit(worker)
