"""Batched QP solving: vmap over thousands of independent instances.

This is the scaling axis of the framework (reference DAQP is one QP per call
on one CPU core; see SURVEY.md §2.3): the entire transform + active-set
solve is vmapped over a struct-of-arrays batch, so the per-iteration masked
GEMVs become (B, K, K) x (B, K) batched GEMMs on the MXU, and the whole
batch runs in lockstep until every lane converges.

The rare repair/refinement numerics run as batched post-pass rounds between
lockstep sweeps (see ``ldp.batch_post_pass``) so they never tax the hot
loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import Settings, DAQP_INF, EXIT_OPTIMAL, EXIT_RUNNING


# f32 conditioning floor for the batched hierarchical tier's level
# penalty (see solve_batch_hiqp_pallas_jit); measured on chip via
# scripts/hiqp_rho_scan.py
_HIQP_RHO_FLOOR = 3e-2

# v5e miscompilation guard (VERDICT r4 weak #8 / scripts/
# repro_v5e_bool_scatter.py): ANY fused batched iterated program at
# B >= 1024 lanes in ONE program silently corrupts state on v5e
# (B = 1016 is clean; the trigger is purely the vmapped batch size).
# Every whole-batch kernel driver therefore splits batches above this
# bound into independent lane chunks run through lax.map — the same
# proven guard as solve_batch_flat_jit's 512 chunk.
_LANE_GUARD = 512          # must be a multiple of the 128-lane tile


def _lane_chunk_map(fn, arrays, B):
    """Split the (padded, divisible) leading dim into _LANE_GUARD
    chunks and lax.map ``fn`` over them, restoring the batch shape."""
    C = B // _LANE_GUARD
    data = tuple(None if a is None else
                 a.reshape((C, _LANE_GUARD) + a.shape[1:])
                 for a in arrays)
    parts = lax.map(fn, data)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((B,) + x.shape[2:]), parts)


class BatchResult(NamedTuple):
    x: jnp.ndarray          # (B, n)
    lam: jnp.ndarray        # (B, m)
    fval: jnp.ndarray       # (B,)
    exitflag: jnp.ndarray   # (B,) int32
    iterations: jnp.ndarray  # (B,) int32
    soft_slack: jnp.ndarray  # (B,)


def _solve_one(H, f, A, bupper, blower, sense, ms: int, st: Settings,
               K: int, repair_rounds: int):
    """Single-lane body for vmap: transform + warm activate + batched-mode
    LDP with deferred repair rounds + extraction."""
    ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st)
    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    act_flag, state = ldp_mod.activate_constraints(state, st)
    unc_ok, _ = transform.check_unconstrained(
        ldpd._replace(sense=state.sense), st)
    pre = jnp.where(ldpd.error < 0, ldpd.error,
                    jnp.where(act_flag < 0, act_flag,
                              jnp.where(unc_ok, EXIT_OPTIMAL, EXIT_RUNNING)))
    state = state._replace(status=pre.astype(jnp.int32))
    state = ldp_mod.ldp_solve_batched_lane(state, st, rounds=repair_rounds)

    x = transform.ldp_to_qp_solution(ldpd, state.u)
    lam = solve_mod.extract_duals(state)
    fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
    return BatchResult(x=x, lam=lam, fval=fval,
                       exitflag=state.status, iterations=state.iterations,
                       soft_slack=state.soft_slack)


@functools.partial(jax.jit,
                   static_argnames=("ms", "K", "repair_rounds"))
def solve_batch_jit(H, f, A, bupper, blower, sense, st: Settings,
                    ms: int = 0, K: Optional[int] = None,
                    repair_rounds: int = 2) -> BatchResult:
    """Jitted batched strictly-convex QP solve.

    All arrays carry a leading batch dimension B; (n, m, ms) are shared
    across the batch (pad instances to common dimensions as needed).
    Semidefinite H is NOT handled here (use ``api.solve`` per instance or
    the batched prox driver); the Hessians must be PD like the reference's
    plain ``daqp_ldp`` dispatch path (api.c:16-32 with n_prox == 0).

    For batches with SOFT constraints pass ``K = n + max_ns + 1`` (the
    reference's per-instance allocation, api.c:288-305) — the default
    K = n + 1 caps the working set below what soft active sets can
    legally reach (the ``solve_batch`` wrapper computes this for you; an
    under-allocated K degrades to a pending-add/cycle exit, never a
    silent slot overwrite).
    """
    n = A.shape[-1]
    if K is None:
        K = n + 1
    fn = functools.partial(_solve_one, ms=ms, st=st, K=K,
                           repair_rounds=repair_rounds)
    return jax.vmap(fn)(H, f, A, bupper, blower, sense)


def _solve_one_flat(H, f, A, bupper, blower, sense, sw, ms: int,
                    st: Settings, K: int, late=None):
    """Single-lane body for the flat (slot-based) batched solver: the
    branch-free hot path (see ``ldp_flat``).

    ``sw`` is an optional per-lane ``SoftWeights`` (raw user units; it is
    scaling-normalized here exactly like the single-instance path,
    utils.c:99-110).

    Traced under ``jax.default_matmul_precision('highest')``: TPU lowers
    cholesky / triangular_solve (the QP->LDP transform) to blocked
    dot_generals at the *default* matmul precision, which is bf16 — fatal
    for f32 solves (observed 1e-1 primal errors from the transform alone).
    """
    from . import ldp_flat
    from .types import SOFT, SoftWeights
    ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st)
    sw_n = None
    if sw is not None:
        dtype = ldpd.M.dtype
        soft_m = (ldpd.sense & SOFT) > 0
        sc = ldpd.scaling
        z = jnp.zeros_like(sc)
        sw_n = SoftWeights(
            d_ls=jnp.where(soft_m, jnp.asarray(sw.d_ls, dtype) / sc, z),
            d_us=jnp.where(soft_m, jnp.asarray(sw.d_us, dtype) / sc, z),
            rho_ls=jnp.where(soft_m,
                             jnp.asarray(sw.rho_ls, dtype) * sc * sc, z),
            rho_us=jnp.where(soft_m,
                             jnp.asarray(sw.rho_us, dtype) * sc * sc, z))
    s = ldp_flat.flat_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                           ldpd.scaling, K=K, sw=sw_n)
    s = ldp_flat.flat_activate(s, st)
    unc_ok, _ = transform.check_unconstrained(
        ldpd._replace(sense=s.sense), st)
    # activation failures (inconsistent redundant equality ->
    # EXIT_OVERDETERMINED_INITIAL) take precedence over the
    # unconstrained shortcut
    pre = jnp.where(ldpd.error < 0, ldpd.error,
                    jnp.where(s.status != EXIT_RUNNING, s.status,
                              jnp.where(unc_ok, EXIT_OPTIMAL,
                                        EXIT_RUNNING)))
    if late is not None:
        # chunk-granularity wall-clock bound: a chunk starting past the
        # deadline returns EXIT_TIMELIMIT instead of solving
        from .types import EXIT_TIMELIMIT
        pre = jnp.where(late & (pre == EXIT_RUNNING), EXIT_TIMELIMIT, pre)
    s = s._replace(status=pre.astype(jnp.int32))
    s = ldp_flat.flat_solve(s, st)

    x = transform.ldp_to_qp_solution(ldpd, s.u)
    lam = ldp_flat.flat_extract_duals(s)
    fval = 0.5 * (s.fval - ldpd.v @ ldpd.v)
    return BatchResult(x=x, lam=lam, fval=fval,
                       exitflag=s.status, iterations=s.iterations,
                       soft_slack=s.soft_slack)


def _flat_batch_core(H, f, A, bupper, blower, sense, st: Settings,
                     ms: int = 0, K: Optional[int] = None,
                     lane_chunk: int = 512, sw=None,
                     deadline=None) -> BatchResult:
    """Traceable core of the flat batched solve (called directly by the
    sharded path inside ``shard_map``; jitted by ``solve_batch_flat_jit``).

    ``sw``: optional batched ``SoftWeights`` with (B, m) fields —
    SOFT_WEIGHTS slack-bound semantics on the batched tier
    (auxiliary.c:199-274).

    ``deadline``: optional absolute perf_counter seconds (traced f64);
    the wall clock is checked once per 512-lane CHUNK (io_callback
    cannot run under the per-lane vmap) — chunks starting past it
    return per-lane EXIT_TIMELIMIT (daqp.c:95-103 at batch granularity).
    """
    n = A.shape[-1]
    if K is None:
        K = n + 1
    fn = functools.partial(_solve_one_flat, ms=ms, st=st, K=K)
    B = H.shape[0]

    def late_now():
        from .utils.timers import now_callback
        return now_callback() > deadline

    with jax.default_matmul_precision('highest'):
        if B <= lane_chunk or B % lane_chunk != 0:
            late = None if deadline is None else late_now()
            return jax.vmap(functools.partial(fn, late=late))(
                H, f, A, bupper, blower, sense, sw)
        C = B // lane_chunk

        def chunk(args):
            late = None if deadline is None else late_now()
            return jax.vmap(functools.partial(fn, late=late))(*args)

        data = tuple(x.reshape((C, lane_chunk) + x.shape[1:])
                     for x in (H, f, A, bupper, blower, sense))
        sw_c = None if sw is None else jax.tree_util.tree_map(
            lambda x: x.reshape((C, lane_chunk) + x.shape[1:]), sw)
        parts = jax.lax.map(chunk, data + (sw_c,))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((B,) + x.shape[2:]), parts)


@functools.partial(jax.jit, static_argnames=("ms", "K", "lane_chunk"))
def solve_batch_flat_jit(H, f, A, bupper, blower, sense, st: Settings,
                         ms: int = 0, K: Optional[int] = None,
                         lane_chunk: int = 512, sw=None,
                         deadline=None) -> BatchResult:
    """Jitted batched strictly-convex QP solve on the flat hot path.

    The batch is processed in vmapped chunks of ``lane_chunk`` lanes via
    ``lax.map``.  Two reasons: (a) lockstep waste — a chunk ends when its
    own slowest lane converges, not the whole batch's; (b) a v5e
    miscompilation was observed for this program at batch >= ~1024 lanes
    (bitwise-correct trajectories at B<=768, systematically corrupt state
    at B=1024, same HLO) — chunked shapes stay in the well-compiled
    regime.

    For batches with SOFT constraints pass ``K = n + max_ns + 1`` (see
    ``solve_batch_jit``); the ``solve_batch`` wrapper computes it.
    ``sw``: optional batched ``SoftWeights`` ((B, m) fields) for
    SOFT_WEIGHTS slack-bound semantics (auxiliary.c:199-274).
    ``deadline``: optional absolute wall-clock deadline (see
    ``_flat_batch_core``).
    """
    return _flat_batch_core(H, f, A, bupper, blower, sense, st, ms=ms,
                            K=K, lane_chunk=lane_chunk, sw=sw,
                            deadline=deadline)


def solve_batch_pallas_jit(H, f, A, bupper, blower, sense, st: Settings,
                           ms: int = 0, interpret: bool = False,
                           has_soft=None, deadline=None,
                           sw=None, guess_cap=None) -> BatchResult:
    """Batched strictly-convex QP solve on the Pallas mega-kernel path
    (``ops.pallas_batch``): the whole active-set loop runs VMEM-resident
    in 128-lane tiles; numerical repair runs between kernel rounds on the
    MXU.  Scope: hard/soft two-sided constraints, equality/warm bulk
    activation, cold start (the throughput path).

    ``has_soft`` selects the kernel variant (compile-time): hard batches
    run the SLOT-SPACE kernel (``ops.pallas_slot``: the inverse Gram and
    working-set state live on K = n+1 slots instead of m constraint
    rows — ~2x less VMEM traffic per iteration); soft batches run the
    dense-mask kernel (a soft working set can exceed n+1 slots).
    ``None`` (default) dispatches automatically from the concrete
    ``sense`` array; inside an enclosing trace pass it explicitly.  An
    explicit ``has_soft=False`` with soft rows present marks those lanes
    ``EXIT_UNSUPPORTED`` instead of silently dropping the rows.

    ``sw``: optional batched ``SoftWeights`` ((B, m) fields, raw user
    units) — SOFT_WEIGHTS slack-bound semantics on the dense-mask kernel
    (auxiliary.c:199-274: slack state machine, per-side rho, transition
    re-adds + kink guard), a separate compile-time kernel variant.
    """
    from .types import SOFT
    if sw is not None:
        has_soft = True
    if has_soft is None:
        try:
            has_soft = bool(np.any(np.asarray(sense) & SOFT))
        except jax.errors.TracerArrayConversionError:
            raise ValueError(
                "solve_batch_pallas_jit: sense is traced; pass "
                "has_soft=True/False explicitly when calling under jit")
    if H.shape[0] > _LANE_GUARD:
        # v5e B>=1024 miscompile guard: the core's round loop is a fused
        # whole-batch iterated program — route oversized batches through
        # the streaming wrapper's per-chunk lax.map
        return solve_batch_pallas_stream_jit(
            H, f, A, bupper, blower, sense, st, ms=ms,
            chunk=_LANE_GUARD, has_soft=bool(has_soft),
            deadline=deadline, sw=sw, interpret=interpret,
            guess_cap=guess_cap)
    return _solve_batch_pallas_impl(H, f, A, bupper, blower, sense, st,
                                    ms=ms, interpret=interpret,
                                    has_soft=bool(has_soft),
                                    deadline=deadline, sw=sw,
                                    guess_cap=guess_cap)


@functools.partial(jax.jit, static_argnames=("st", "ms", "interpret",
                                             "has_soft", "guess_cap"))
def _solve_batch_pallas_impl(H, f, A, bupper, blower, sense, st: Settings,
                             ms: int = 0, interpret: bool = False,
                             has_soft: bool = False,
                             deadline=None, sw=None,
                             guess_cap=None) -> BatchResult:
    return _pallas_batch_core(H, f, A, bupper, blower, sense, st, ms=ms,
                              interpret=interpret, has_soft=has_soft,
                              deadline=deadline, sw=sw,
                              guess_cap=guess_cap)


@functools.partial(jax.jit, static_argnames=("st", "ms", "chunk",
                                             "has_soft", "interpret",
                                             "sort_stream", "guess_cap"))
def solve_batch_pallas_stream_jit(H, f, A, bupper, blower, sense,
                                  st: Settings, ms: int = 0,
                                  chunk: int = 256, has_soft: bool = False,
                                  deadline=None, sw=None,
                                  interpret: bool = False,
                                  sort_stream: bool = False,
                                  guess_cap=None) -> BatchResult:
    """One-dispatch streaming variant of ``solve_batch_pallas_jit``: the
    whole (large) batch is processed in ``chunk``-lane kernel waves
    inside a single jitted program via ``lax.map``.

    Why this exists (measured on v5e through the axon tunnel, round 4):
    each separately-enqueued jit call costs ~0.5-1.5 ms of host/tunnel
    dispatch and the final sync fetch ~25 ms of round-trip latency —
    40 x 256-lane calls in bench.py paid ~45 ms of a 154 ms wall in
    pure dispatch overhead.  One dispatch + one fetch makes host wall
    track device compute.  Chunking inside the program keeps the
    per-wave tile-convergence dynamics of small batches (a chunk's
    tiles stop at the CHUNK's own max iteration, and the 128-lane tiles
    within it at their own — see the kernel early exit) while the map
    serializes waves back-to-back with no host involvement.

    ``sort_stream=True`` additionally sorts the WHOLE stream by the
    difficulty proxy (violated-constraint count at the unconstrained
    optimum) before chunking.  Round-5 measurement on BASELINE config 2
    (corr(proxy, true iters) = 0.023): the proxy carries ~no signal on
    THAT family (initial-violation counts barely vary when ~40
    constraints are active by construction) — occupancy 0.728 sorted
    ~= unsorted, vs 0.988 for an oracle sort by true iterations.  The
    sort is kept because it is nearly free (the factorization computed
    for the proxy is REUSED by the chunk solves) and helps families
    whose initial violations do vary.  Outputs are returned in input
    order.

    ``B`` need not divide ``chunk``: the remainder is padded with
    trivial instances inside ``_pallas_batch_core``'s own lane padding
    by rounding B up to a chunk multiple here.
    """
    if sw is not None:
        has_soft = True          # SW batches run the dense-mask kernel
    B = H.shape[0]
    n = A.shape[-1]
    pad = (-B) % chunk
    if pad:
        mg, mm = A.shape[1], bupper.shape[-1]

        def padded(x, fill):
            blk = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                   (pad,) + x.shape[1:])
            return jnp.concatenate([x, blk], axis=0)

        out = solve_batch_pallas_stream_jit(
            padded(H, jnp.eye(n)), padded(f, jnp.zeros((n,))),
            padded(A, jnp.zeros((mg, n))), padded(bupper, jnp.ones((mm,))),
            padded(blower, -jnp.ones((mm,))),
            padded(sense, jnp.zeros((mm,), jnp.int32)),
            st, ms=ms, chunk=chunk, has_soft=has_soft, deadline=deadline,
            sw=None if sw is None else jax.tree_util.tree_map(
                lambda x: padded(x, jnp.zeros(x.shape[1:])), sw),
            interpret=interpret, sort_stream=sort_stream,
            guess_cap=guess_cap)
        return jax.tree_util.tree_map(lambda x: x[:B], out)

    fact = None
    unsort = None
    if sort_stream:
        # Global difficulty sort.  The tile-layout factorization kernel
        # handles the full stream in one grid launch (grid-based Pallas,
        # not a vmapped XLA loop — outside the v5e B>=1024 miscompile
        # class, see scripts/repro_v5e_bool_scatter.py); its Rinv is
        # reused by the chunk solves below so the proxy costs two
        # batched matvecs, not a second factorization.
        use_tile = (jax.default_backend() == 'tpu') and not interpret \
            and H.dtype == jnp.float32 and (B % 128 == 0)
        if use_tile:
            from .ops import chol as chol_ops
            with jax.default_matmul_precision('high'):
                fact = chol_ops.batched_rinv_regularized(H, st)
            nv = _difficulty_nviol(H, f, A, bupper, blower, ms,
                                   Rinv_b=fact[0])
        else:
            nv = _difficulty_nviol(H, f, A, bupper, blower, ms)
        order = jnp.argsort(nv)
        unsort = jnp.argsort(order)
        H, f, A, bupper, blower, sense = (
            x[order] for x in (H, f, A, bupper, blower, sense))
        if sw is not None:
            sw = jax.tree_util.tree_map(lambda x: x[order], sw)
        if fact is not None:
            fact = jax.tree_util.tree_map(lambda x: x[order], fact)

    C = B // chunk
    data = tuple(x.reshape((C, chunk) + x.shape[1:])
                 for x in (H, f, A, bupper, blower, sense))
    sw_c = None if sw is None else jax.tree_util.tree_map(
        lambda x: x.reshape((C, chunk) + x.shape[1:]), sw)
    fact_c = None if fact is None else jax.tree_util.tree_map(
        lambda x: x.reshape((C, chunk) + x.shape[1:]), fact)

    def one(args):
        return _pallas_batch_core(*args[:6], st=st, ms=ms,
                                  has_soft=has_soft, deadline=deadline,
                                  sw=args[6], interpret=interpret,
                                  fact=args[7], guess_cap=guess_cap)

    parts = lax.map(one, data + (sw_c, fact_c))
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((B,) + x.shape[2:]), parts)
    if unsort is not None:
        out = jax.tree_util.tree_map(lambda x: x[unsort], out)
    return out


def _difficulty_nviol(H, f, A, bupper, blower, ms: int, Rinv_b=None):
    """Violated-constraint count at the unconstrained optimum — the
    difficulty proxy used for iteration-homogeneous 128-lane tiling
    (tracks the number of active-set changes the solver must make).

    Equivalent to the in-core LDP-space count (``dupper < 0 | dlower >
    0``: row normalization preserves signs) but computed pre-transform,
    so it can order the stream BEFORE per-chunk LDP builds.  With
    ``Rinv_b`` given, ``x_unc = -Rinv Rinv' f``; else a batched dense
    solve (CPU/test path).
    """
    if Rinv_b is not None:
        x_unc = -jnp.einsum('bij,bkj,bk->bi', Rinv_b, Rinv_b, f,
                            precision=lax.Precision.HIGHEST)
    else:
        Hs = 0.5 * (H + jnp.swapaxes(H, 1, 2))
        x_unc = jnp.linalg.solve(Hs, -f[..., None])[..., 0]
    Ax = jnp.einsum('bmn,bn->bm', A, x_unc,
                    precision=lax.Precision.HIGHEST)
    vals = jnp.concatenate([x_unc[:, :ms], Ax], axis=1)
    return jnp.sum((vals > bupper) | (vals < blower), axis=-1)


def _pallas_batch_core(H, f, A, bupper, blower, sense, st: Settings,
                       ms: int = 0, interpret: bool = False,
                       has_soft: bool = False,
                       deadline=None, sw=None, fact=None,
                       guess_cap=None) -> BatchResult:
    """Traceable core of the Pallas-kernel batched solve (called directly
    by the sharded path inside ``shard_map``).

    ``fact``: optional precomputed ``(Rinv, ok, reg_mask, eps_used)``
    from ``ops.chol.batched_rinv_regularized`` (the sorted-stream path
    computes it once globally for the difficulty proxy and reuses it
    here instead of refactorizing per chunk).
    """
    from .ops import pallas_batch as pb
    from .types import IMMUTABLE, EXIT_UNSUPPORTED

    B = H.shape[0]
    n = A.shape[-1]
    lane_pad = (-B) % pb.LANES
    if lane_pad:
        # pad to a whole 128-lane tile with trivial instances (H = I,
        # zero A rows, loose bounds): they go optimal at u = 0 in the
        # first pricing pass and are sliced off below
        mg = A.shape[1]
        mm = bupper.shape[-1]

        def padded(x, fill):
            pad_block = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                         (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, pad_block], axis=0)

        H = padded(H, jnp.eye(n))
        f = padded(f, jnp.zeros((n,)))
        A = padded(A, jnp.zeros((mg, n)))
        bupper = padded(bupper, jnp.ones((mm,)))
        blower = padded(blower, -jnp.ones((mm,)))
        sense = padded(sense, jnp.zeros((mm,), jnp.int32))
        if sw is not None:
            sw = jax.tree_util.tree_map(lambda x: padded(x, 0.0), sw)
        if fact is not None:
            Rp, okp, regp, epsp = fact
            fact = (padded(Rp, jnp.eye(n)), padded(okp, True),
                    padded(regp, False), padded(epsp, 0.0))
        out = _pallas_batch_core(H, f, A, bupper, blower, sense, st,
                                 ms=ms, interpret=interpret,
                                 has_soft=has_soft, deadline=deadline,
                                 sw=sw, fact=fact, guess_cap=guess_cap)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    # 'high' (3-pass bf16, ~f32 accurate) for the decomposition internals
    # (cholesky/triangular expanders follow the context); the numerically
    # critical contractions pin Precision.HIGHEST explicitly in
    # transform.py / the kernel driver regardless.
    with jax.default_matmul_precision('high'):
        # Batched factorization on the tile-layout Pallas kernel (exact
        # arithmetic, no MXU): replaces the XLA cholesky+triangular_solve
        # expanders, the round-1 throughput wall (38 of 69 ms per
        # 1024-lane batch; see ops/chol.py).  Semantics: dense full-shift
        # retry-doubling regularization per lane (utils.c:253-283); a
        # still-failing lane is flagged EXIT_NONCONVEX.  The diagonal-H
        # semi-proximal fast path is NOT taken here (batch path requires
        # PD H; dense factorization of a PD diagonal H is identical).
        use_tile = fact is not None or (
            (jax.default_backend() == 'tpu') and not interpret
            and H.dtype == jnp.float32 and (H.shape[0] % 128 == 0))
        if use_tile:
            from .ops import chol as chol_ops
            from .types import EXIT_NONCONVEX
            if fact is not None:
                Rinv_b, okl, regl, eps_l = fact
            else:
                Rinv_b, okl, regl, eps_l = \
                    chol_ops.batched_rinv_regularized(H, st)
            ldpd = jax.vmap(
                lambda H_, f_, A_, bu_, bl_, se_, R_: transform.build_ldp(
                    H_, f_, A_, bu_, bl_, se_, ms, st, Rinv=R_))(
                H, f, A, bupper, blower, sense, Rinv_b)
            ldpd = ldpd._replace(
                error=jnp.where(okl, ldpd.error,
                                EXIT_NONCONVEX).astype(jnp.int32),
                n_prox=jnp.where(regl, n, 0).astype(jnp.int32),
                eps_used=eps_l.astype(ldpd.eps_used.dtype))
        else:
            ldpd = jax.vmap(
                functools.partial(transform.build_ldp, ms=ms, st=st))(
                    H, f, A, bupper, blower, sense)
        # Difficulty-sorted tiling: a 128-lane tile runs until its slowest
        # lane converges, so a random lane→tile assignment makes every
        # tile pay ~the global max iteration count (median 97 / max 141 on
        # BASELINE config 2 ⇒ ~30% wasted lane-steps).  Sorting lanes by a
        # cheap difficulty proxy — the violated-constraint count at the
        # unconstrained optimum u = 0, which tracks the number of
        # active-set changes the solver must make — groups
        # similar-iteration lanes into the same tile; with the kernel's
        # step-level early exit each tile then stops at ITS OWN max.
        # Outputs are unsorted before returning.
        nviol = jnp.sum((ldpd.dupper < 0) | (ldpd.dlower > 0), axis=-1)
        order = jnp.argsort(nviol)
        unsort = jnp.argsort(order)
        ldpd = jax.tree_util.tree_map(lambda a: a[order], ldpd)
        from .types import ACTIVE, LOWER, SOFT
        sw_n = None
        if sw is not None:
            # scaling-normalize the SW slack data against the SORTED
            # lanes, zeroed on hard rows (utils.c:99-110; same as
            # _solve_one_flat)
            from .types import SoftWeights
            sw_s = jax.tree_util.tree_map(lambda x: x[order], sw)
            dtype_n = ldpd.M.dtype
            soft_m = (ldpd.sense & SOFT) > 0
            sc_n = ldpd.scaling
            z_n = jnp.zeros_like(sc_n)
            sw_n = SoftWeights(
                d_ls=jnp.where(soft_m, sw_s.d_ls.astype(dtype_n) / sc_n,
                               z_n),
                d_us=jnp.where(soft_m, sw_s.d_us.astype(dtype_n) / sc_n,
                               z_n),
                rho_ls=jnp.where(soft_m, sw_s.rho_ls.astype(dtype_n)
                                 * sc_n * sc_n, z_n),
                rho_us=jnp.where(soft_m, sw_s.rho_us.astype(dtype_n)
                                 * sc_n * sc_n, z_n))
        immut = ((ldpd.sense & IMMUTABLE) > 0).astype(jnp.float32)
        soft_b = ((ldpd.sense & SOFT) > 0).astype(jnp.float32)
        m = ldpd.M.shape[1]
        # LDP-space dominance bound = 2*fval_bound (same convention as the
        # flat tier, ldp_flat.py:289 / daqp.c:10 "internal objective is
        # twice the nominal")
        fb = jnp.full((H.shape[0],), 2.0, jnp.float32) \
            * jnp.asarray(st.fval_bound, jnp.float32)
        # equalities / warm starts: bulk-activate sense-ACTIVE rows (a
        # whole-batch branch: the clean cold-start path never pays the
        # activation Cholesky)
        act_bits = (ldpd.sense & ACTIVE) > 0                # (B, m)
        lo_bits = act_bits & ((ldpd.sense & LOWER) > 0)
        up_l = jnp.moveaxis(jnp.pad(act_bits & ~lo_bits,
                                    ((0, 0), (0, (-m) % 8))), 0, -1)
        lo_l = jnp.moveaxis(jnp.pad(lo_bits,
                                    ((0, 0), (0, (-m) % 8))), 0, -1)
        if has_soft:
            # dense-mask kernel: a soft working set can exceed n+1 slots
            s = pb.dense_init(ldpd.M, ldpd.dupper, ldpd.dlower,
                              ldpd.scaling, immut, soft_b, fbound_b=fb,
                              sw_b=sw_n)
            s = jax.lax.cond(jnp.any(act_bits),
                             lambda s: pb.dense_activate(s, up_l, lo_l,
                                                         st),
                             lambda s: s, s)
            s = pb.dense_solve(s, st, n_true=n, interpret=interpret,
                               has_soft=True, deadline=deadline)
            act = s.act_up + s.act_lo
            lam = jnp.moveaxis(s.lam_star * act * s.scaling,
                               -1, 0)[:, :m]
            if sw_n is not None:
                rho_w = s.act_lo * s.sw_rls + s.act_up * s.sw_rus
                slack = jnp.sum(s.soft * act * rho_w
                                * s.lam_star * s.lam_star, axis=0)
            else:
                slack = st.rho_soft * jnp.sum(
                    s.soft * act * s.lam_star * s.lam_star, axis=0)
        else:
            # slot-space kernel (ops.pallas_slot): hard-only throughput
            # path.  Any lane carrying SOFT bits is flagged
            # EXIT_UNSUPPORTED below instead of silently dropping rows.
            from .ops import pallas_slot as ps
            from .ldp_flat import EXIT_REFACTOR
            s = ps.slot_init(ldpd.M, ldpd.dupper, ldpd.dlower,
                             ldpd.scaling, immut, n_true=n, fbound_b=fb)

            def user_act(s):
                return ps.slot_activate(s, up_l, lo_l, st)

            gcap = 0 if guess_cap is None else guess_cap

            def guess_act(s):
                # Primal-init active-set guess (the batched analogue of
                # the reference's warm-start activation,
                # daqp_primal_init_active api.c:555-592, applied at the
                # unconstrained optimum u = 0): bulk-activate the top-k
                # most-violated rows with ONE batched activation
                # Cholesky instead of ~k pricing/add kernel steps.
                # Wrongly guessed rows are dual-infeasible at the first
                # CSP and leave through the ordinary blocking search; a
                # lane whose guessed set is numerically dependent
                # reverts to its cold start below.
                #
                # DEFAULT OFF — measured a NET LOSS on v5e (BASELINE
                # config 2, scripts/guess_scan.py, round 5): the top-10
                # guessed rows are essentially always correct (cap=10
                # cuts median iters 97->87, exactly the cap) but the
                # saving saturates at ~16 iterations by cap=30 while the
                # activation branch costs ~1.5 ms per 256-lane chunk —
                # scan: cap 0 = 56.8k solves/s, cap 10/20/30/40 = 43.2 /
                # 43.0 / 45.1 / 43.7k.  Kept as an opt-in variant
                # (guess_cap=k) for shapes where cold iterations
                # dominate harder.
                if gcap <= 0:
                    return s
                viol = jnp.maximum(-ldpd.dupper, ldpd.dlower)  # (B, m)
                elig = (viol > 0) & (immut <= 0)
                order = jnp.argsort(
                    jnp.where(elig, -viol, jnp.inf), axis=-1)
                rank = jnp.argsort(order, axis=-1)
                pick = elig & (rank < gcap)
                gup = pick & (ldpd.dupper < 0)
                glo = pick & ~(ldpd.dupper < 0)
                pad8 = (-m) % 8
                gup_l = jnp.moveaxis(
                    jnp.pad(gup, ((0, 0), (0, pad8))), 0, -1)
                glo_l = jnp.moveaxis(
                    jnp.pad(glo, ((0, 0), (0, pad8))), 0, -1)
                s_g = ps.slot_activate(s, gup_l, glo_l, st)
                okg = s_g.status[0] != EXIT_REFACTOR       # (B,)

                def sel(a, b):
                    return jnp.where(
                        okg.reshape((1,) * (a.ndim - 1) + (-1,)), a, b)

                return s_g._replace(
                    W=sel(s_g.W, s.W), used=sel(s_g.used, s.used),
                    sid=sel(s_g.sid, s.sid), slo=sel(s_g.slo, s.slo),
                    simm=sel(s_g.simm, s.simm), dsl=sel(s_g.dsl, s.dsl),
                    act_up=sel(s_g.act_up, s.act_up),
                    act_lo=sel(s_g.act_lo, s.act_lo),
                    lam=sel(s_g.lam, s.lam), E=sel(s_g.E, s.E),
                    status=sel(s_g.status,
                               s.status).astype(jnp.int32))

            s = jax.lax.cond(jnp.any(act_bits), user_act, guess_act, s)
            s = ps.slot_solve(s, st, n_true=n, interpret=interpret,
                              deadline=deadline)
            lam = jnp.moveaxis(ps.slot_duals_dense(s), -1, 0)[:, :m]
            slack = jnp.zeros((H.shape[0],), jnp.float32)

        u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]               # (B, n)
        x = jax.vmap(transform.ldp_to_qp_solution)(ldpd, u_b)
        fval = 0.5 * (s.fval[0] - jnp.einsum('bk,bk->b', ldpd.v, ldpd.v))
        exitflag = jnp.where(ldpd.error < 0, ldpd.error, s.status[0])
        if not has_soft:
            soft_lane = jnp.any(soft_b > 0, axis=-1)
            exitflag = jnp.where(soft_lane, EXIT_UNSUPPORTED, exitflag)
        res = BatchResult(x=x, lam=lam, fval=fval,
                          exitflag=exitflag.astype(jnp.int32),
                          iterations=s.iterations[0].astype(jnp.int32),
                          soft_slack=slack.astype(x.dtype))
        return jax.tree_util.tree_map(lambda a: a[unsort], res)


@functools.partial(jax.jit, static_argnames=("st", "ms", "interpret",
                                             "max_outer", "fused"))
def solve_batch_prox_pallas_jit(H, f, A, bupper, blower, sense,
                                st: Settings, ms: int = 0,
                                interpret: bool = False,
                                max_outer: int = 200,
                                deadline=None,
                                fused: bool = True) -> BatchResult:
    """Batched semidefinite-H QP solve: proximal-point outer loop on the
    Pallas kernel tier (``daqp_prox.c`` full-shift regime, batched).

    The naive vmap(prox(single-lane)) nesting pays the per-lane solver's
    cost at every inner iteration AND runs every lane's repair machinery
    as selects; here ONE outer ``lax.while_loop`` carries the whole-batch
    VMEM-kernel state — per outer pass only v and d are recomputed
    (batched GEMMs), the warm kernel re-solves in a few iterations, and
    converged lanes' tiles skip their DMA + compute entirely via the
    kernel's early exit.  Measured on v5e (B=256, n=50 rank-30 H,
    m=100): 88 -> see bench_extra config 4.

    Scope: hard constraints, PD or semidefinite H (per-lane retry-doubling
    shift, utils.c:253-283).  Soft/binary lanes use the XLA paths.
    """
    from .ops import pallas_batch as pb
    from .ops import chol as chol_ops
    from .types import (EXIT_NONCONVEX, EXIT_OPTIMAL, EXIT_ITERLIMIT,
                        IMMUTABLE)
    from .prox import _auto_eta

    B, n = H.shape[0], H.shape[-1]
    m = bupper.shape[-1]
    lane_pad = (-B) % (_LANE_GUARD if B > _LANE_GUARD else pb.LANES)
    if lane_pad:
        def padded(x, fill):
            pad_block = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                         (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, pad_block], axis=0)
        out = solve_batch_prox_pallas_jit(
            padded(H, jnp.eye(n)), padded(f, jnp.zeros((n,))),
            padded(A, jnp.zeros((A.shape[1], n))),
            padded(bupper, jnp.ones((m,))),
            padded(blower, -jnp.ones((m,))),
            padded(sense, jnp.zeros((m,), jnp.int32)),
            st, ms=ms, interpret=interpret, max_outer=max_outer,
            deadline=deadline, fused=fused)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    if B > _LANE_GUARD:
        return _lane_chunk_map(
            lambda a: solve_batch_prox_pallas_jit(
                *a, st=st, ms=ms, interpret=interpret,
                max_outer=max_outer, deadline=deadline, fused=fused),
            (H, f, A, bupper, blower, sense), B)

    f32 = jnp.float32
    with jax.default_matmul_precision('high'):
        Rinv_b, okl, regl, eps_l = chol_ops.batched_rinv_regularized(
            H.astype(f32), st, interpret=interpret)
        ldpd = jax.vmap(
            lambda H_, f_, A_, bu_, bl_, se_, R_: transform.build_ldp(
                H_, f_, A_, bu_, bl_, se_, ms, st, Rinv=R_))(
            H.astype(f32), f.astype(f32), A.astype(f32),
            bupper.astype(f32), blower.astype(f32), sense, Rinv_b)
        eps = jnp.where(regl, eps_l, 0.0).astype(f32)       # (B,)
        eta = jnp.asarray(_auto_eta(st), f32)
        tol_stat = eta / jnp.maximum(eps, 1e-30)

        immut = ((ldpd.sense & IMMUTABLE) > 0).astype(f32)
        from .ops import pallas_slot as ps
        s0 = ps.slot_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.scaling,
                          immut, n_true=n)
        mp = s0.dupper.shape[0]
        row_real = jnp.arange(mp)[:, None] < m
        big = jnp.asarray(DAQP_INF, f32)
        bu_s = bupper.astype(f32) * ldpd.scaling
        bl_s = blower.astype(f32) * ldpd.scaling

        _HIP = jax.lax.Precision.HIGHEST

        def set_bounds(s, v_b):
            Mv = jnp.einsum('bmj,bj->bm', ldpd.M, v_b, precision=_HIP)
            du = jnp.moveaxis(jnp.pad(bu_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            dl = jnp.moveaxis(jnp.pad(bl_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            return ps.slot_refresh_bounds(
                s, jnp.where(row_real, du, big),
                jnp.where(row_real, dl, -big))

        def carry_solve(s, v_b, lane_run):
            # converged/failed lanes stay terminal so their tiles skip
            s = set_bounds(s, v_b)
            s = s._replace(
                status=jnp.where(lane_run[None, :], EXIT_RUNNING,
                                 s.status).astype(jnp.int32),
                iterations=jnp.zeros_like(s.iterations),
                cycle=jnp.zeros_like(s.cycle),
                repaired=jnp.zeros_like(s.repaired),
                best_fval=jnp.zeros_like(s.best_fval) - 1.0,
                pend=s.pend * (1.0 - lane_run[None, :]))
            return ps.slot_solve(s, st, n_true=n, steps=64,
                                 interpret=interpret, deadline=deadline)

        fz = f.astype(f32)

        def v_of(x_b):
            return jnp.einsum(
                'bji,bj->bi', Rinv_b,
                fz - eps[:, None] * x_b, precision=_HIP)

        def cond_gen(budget):
            def cond(c):
                k, s, x, lane_run, stall, best_diff, lane_flag, tot = c
                return (k < budget) & jnp.any(lane_run)
            return cond

        def body(c):
            k, s, x, lane_run, stall, best_diff, lane_flag, tot = c
            v_b = v_of(x)
            s = carry_solve(s, v_b, lane_run)
            tot = tot + jnp.where(lane_run, s.iterations[0], 0.0)
            inner_flag = s.status[0]                        # (B,)
            u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]
            x_new = jnp.einsum('bij,bj->bi', Rinv_b, u_b - v_b,
                               precision=_HIP)
            inner_ok = inner_flag > 0
            max_diff = jnp.max(jnp.abs(x_new - x), axis=-1)
            pd_lane = eps == 0
            converged = pd_lane | (max_diff < tol_stat)
            # arithmetic-floor stagnation acceptance (see prox.py)
            improved = max_diff < 0.9 * best_diff
            best_next = jnp.minimum(max_diff, best_diff)
            stall_next = jnp.where(improved | ~lane_run, 0, stall + 1)
            converged = converged | (stall_next >= 8)
            # over-relaxation when the active set froze
            froze = (s.iterations[0] <= 1) & ~converged & inner_ok
            x_next = jnp.where(
                lane_run[:, None],
                jnp.where(froze[:, None], x + 1.5 * (x_new - x), x_new),
                x)
            done = lane_run & (converged | ~inner_ok)
            lane_flag = jnp.where(
                done, jnp.where(inner_ok, EXIT_OPTIMAL, inner_flag),
                lane_flag)
            lane_run2 = lane_run & ~done
            return (k + 1, s, x_next, lane_run2, stall_next,
                    best_next, lane_flag.astype(jnp.int32), tot)

        x0 = jnp.zeros((B, n), f32)
        lane_run0 = okl                                     # (B,) bool
        lane_flag0 = jnp.where(okl, EXIT_RUNNING,
                               EXIT_NONCONVEX).astype(jnp.int32)
        use_fused = (fused == "force") or (
            bool(fused) and not interpret
            and jax.default_backend() == 'tpu')
        if not use_fused:
            c0 = (jnp.zeros((), jnp.int32), s0, x0, lane_run0,
                  jnp.zeros((B,), jnp.int32),
                  jnp.full((B,), jnp.inf, f32),
                  lane_flag0, jnp.zeros((B,), f32))
            (k, s, x, lane_run, _, _, lane_flag,
             tot_iters) = lax.while_loop(cond_gen(max_outer), body, c0)
        else:
            # Fused outer loop (the config-4 analogue of the fused MPC
            # horizon): P proximal passes per kernel launch with
            # E/W/M/Rinv VMEM-resident — measured on config 4, the
            # per-pass XLA glue was ~1.5 ms around ~0.1 ms of kernel
            # work.  Frozen (cycling-after-retry) lanes resume through
            # the existing XLA repair path under lax.cond per segment.
            np_pad = s0.u.shape[0]
            pad_n = np_pad - n
            Rinv_l = jnp.moveaxis(
                jnp.pad(Rinv_b, ((0, 0), (0, pad_n), (0, pad_n))),
                0, -1)
            fz_l = jnp.moveaxis(jnp.pad(fz, ((0, 0), (0, pad_n))),
                                0, -1)
            bus_l = jnp.where(
                row_real,
                jnp.moveaxis(jnp.pad(bu_s, ((0, 0), (0, mp - m))),
                             0, -1), big)
            bls_l = jnp.where(
                row_real,
                jnp.moveaxis(jnp.pad(bl_s, ((0, 0), (0, mp - m))),
                             0, -1), -big)
            eps_ll = eps[None, :]
            tst_l = tol_stat[None, :]
            PSEG = 8

            def seg_cond(c):
                k, s, x_l, lr, stl, bd, lf, tt = c
                return (k < max_outer) & jnp.any(lr > 0)

            def seg_body(c):
                k, s_c, x_l, lr, stl, bd, lf, tt = c
                (s2, x2, lr2, stl2, bd2, lf2, tt2,
                 failed) = ps.run_prox_segment(
                    s_c, x_l, lr, stl, bd, lf, tt, Rinv_l, fz_l, bus_l,
                    bls_l, eps_ll, tst_l, st, n, P=PSEG, steps=64,
                    interpret=interpret)

                def slow(args):
                    s_f, x_f, lr_f, stl_f, bd_f, lf_f, tt_f = args
                    x_bn = jnp.moveaxis(x_f, -1, 0)[:, :n]
                    cfb = (jnp.zeros((), jnp.int32), s_f, x_bn,
                           failed > 0, stl_f[0].astype(jnp.int32),
                           bd_f[0], lf_f[0].astype(jnp.int32),
                           tt_f[0])
                    (_, s3, x3, lr3, stl3, bd3, lf3,
                     tt3) = lax.while_loop(cond_gen(PSEG), body, cfb)
                    x3l = jnp.moveaxis(
                        jnp.pad(x3, ((0, 0), (0, pad_n))), 0, -1)
                    fm = (failed > 0)[None, :]

                    def msel(a, b):
                        return jnp.where(
                            (failed > 0).reshape(
                                (1,) * (a.ndim - 1) + (-1,)), a, b)

                    return (jax.tree_util.tree_map(msel, s3, s_f),
                            jnp.where(fm, x3l, x_f),
                            jnp.where(fm, lr3.astype(f32)[None, :],
                                      lr_f),
                            jnp.where(fm, stl3.astype(f32)[None, :],
                                      stl_f),
                            jnp.where(fm, bd3[None, :], bd_f),
                            jnp.where(fm, lf3[None, :],
                                      lf_f).astype(jnp.int32),
                            jnp.where(fm, tt3[None, :], tt_f))

                def fast(args):
                    return args

                s2, x2, lr2, stl2, bd2, lf2, tt2 = lax.cond(
                    jnp.any(failed > 0), slow, fast,
                    (s2, x2, lr2, stl2, bd2, lf2, tt2))
                # inter-segment drift hygiene (the XLA path's slot_solve
                # Newton-refreshes every round; here once per segment)
                s2 = ps.newton_refresh(s2)
                return (k + PSEG, s2, x2, lr2, stl2, bd2, lf2, tt2)

            c0f = (jnp.zeros((), jnp.int32), s0,
                   jnp.zeros((np_pad, B), f32),
                   lane_run0.astype(f32)[None, :],
                   jnp.zeros((1, B), f32),
                   jnp.full((1, B), jnp.inf, f32),
                   lane_flag0[None, :],
                   jnp.zeros((1, B), f32))
            (k, s, x_l, lr_f, _, _, lf_f,
             tt_f) = lax.while_loop(seg_cond, seg_body, c0f)
            x = jnp.moveaxis(x_l, -1, 0)[:, :n]
            lane_run = lr_f[0] > 0
            lane_flag = lf_f[0]
            tot_iters = tt_f[0]
            # Final hygiene pass: the in-kernel passes run without the
            # between-round polish, so the LAST inner solve is looser
            # than the XLA path's (measured max constraint violation
            # 1.1e-2 vs 1.6e-3 at the accepted prox fixed point).  One
            # driver-side warm pass with the full repair/polish
            # machinery at the final v restores it for ~5% of the wall.
            fin = lane_flag == EXIT_OPTIMAL
            v_fin = v_of(x)
            s = carry_solve(s, v_fin, fin)
            ok_fin = fin & (s.status[0] > 0)
            u_fin = jnp.moveaxis(s.u, -1, 0)[:, :n]
            x_fin = jnp.einsum('bij,bj->bi', Rinv_b, u_fin - v_fin,
                               precision=_HIP)
            x = jnp.where(ok_fin[:, None], x_fin, x)
            tot_iters = tot_iters + jnp.where(fin, s.iterations[0],
                                              0.0)
        lane_flag = jnp.where(lane_run, EXIT_ITERLIMIT, lane_flag)
        lane_flag = jnp.where(ldpd.error < 0, ldpd.error, lane_flag)

        lam = jnp.moveaxis(ps.slot_duals_dense(s), -1, 0)[:, :m]
        fval = (0.5 * jnp.einsum('bi,bij,bj->b', x, H.astype(f32), x,
                                 precision=_HIP)
                + jnp.einsum('bi,bi->b', fz, x, precision=_HIP))
        return BatchResult(
            x=x, lam=lam, fval=fval,
            exitflag=lane_flag.astype(jnp.int32),
            iterations=tot_iters.astype(jnp.int32),
            soft_slack=jnp.zeros((B,), f32))


@functools.partial(jax.jit, static_argnames=("st", "ms", "interpret",
                                             "max_outer", "fused"))
def solve_batch_lp_pallas_jit(f, A, bupper, blower, sense, st: Settings,
                              ms: int = 0, interpret: bool = False,
                              max_outer: int = 120,
                              deadline=None,
                              fused: bool = False) -> BatchResult:
    """Batched LP solve: the adaptive-eps proximal LP regime
    (daqp_prox.c:21-271; selected in the reference by n_prox = n at
    api.c:175-177) carried by ONE outer loop over the whole-batch slot
    kernel state — the same architecture as the batched prox/MIQP/MPC
    drivers (never vmap(outer(single-lane))).

    Per outer pass only v = f*eps - x and d are re-formed (batched
    GEMMs); the warm kernel re-solves in a few iterations; per-lane
    adaptive eps (x10 on interior stall / x0.9, cap 1e3,
    daqp_prox.c:55-63) with the eps-normalized stagnation acceptance of
    ``linprog_core`` (f32 arithmetic-floor fixed points); the gradient
    step's ray search + blocking-row activation is batched
    (``slot_add_row``); duals are rescaled by eps at exit
    (daqp_prox.c:171-173).  A converged vertex lane (n active) gets an
    exact solve of its active system through the inverse Gram with one
    refinement pass (the vertex-polish stage of ``linprog_core``).

    Scope: hard constraints.  Differential tests vs ``linprog_core``:
    tests/test_batch_lp.py::test_batch_lp_*.

    ``fused=True`` (opt-in) runs the outer loop IN-KERNEL
    (ops.pallas_slot.run_lp_segment, incl. the gradient step) — measured
    on v5e at the suite shape: 6.1k LP/s vs 1.09k, BUT ~9/256 of the
    numerically-marginal (degenerate ping-pong) lanes exit LOUDLY
    (EXIT_CYCLE) that the XLA per-pass path lands on-certificate: their
    f32 trajectories are compilation-context-sensitive, and neither a
    cold nor a continuation XLA retry inside the fused program
    reproduces the XLA-program rounding that saves them.  The default
    therefore stays the 100%-on-tier XLA path; choose ``fused=True``
    for throughput when loud failures may flow to the host backstop
    (``backstop_resolve_lp``).
    """
    from .ops import pallas_slot as ps
    from .ops import pallas_batch as pb
    from .types import (EXIT_OPTIMAL, EXIT_ITERLIMIT, EXIT_UNBOUNDED,
                        IMMUTABLE, ACTIVE, LOWER)
    from .types import EXIT_CYCLE as EXIT_CYCLE_C
    from .prox import _auto_eta

    A = jnp.atleast_3d(A)
    B, n = f.shape
    m = bupper.shape[-1]
    lane_pad = (-B) % (_LANE_GUARD if B > _LANE_GUARD else pb.LANES)
    if lane_pad:
        def padded(x, fill):
            blk = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                   (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, blk], axis=0)
        out = solve_batch_lp_pallas_jit(
            padded(f, jnp.zeros((n,))), padded(A, jnp.zeros((A.shape[1],
                                                             n))),
            padded(bupper, jnp.ones((m,))), padded(blower,
                                                   -jnp.ones((m,))),
            padded(sense, jnp.zeros((m,), jnp.int32)),
            st, ms=ms, interpret=interpret, max_outer=max_outer,
            deadline=deadline, fused=fused)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    if B > _LANE_GUARD:
        return _lane_chunk_map(
            lambda a: solve_batch_lp_pallas_jit(
                *a, st=st, ms=ms, interpret=interpret,
                max_outer=max_outer, deadline=deadline, fused=fused),
            (f, A, bupper, blower, sense), B)

    f32 = jnp.float32
    with jax.default_matmul_precision('high'):
        ldpd = jax.vmap(
            lambda A_, bu_, bl_, se_: transform.build_ldp(
                None, None, A_, bu_, bl_, se_, ms, st))(
            A.astype(f32), bupper.astype(f32), blower.astype(f32), sense)
        eta = jnp.asarray(_auto_eta(st), f32)

        immut = ((ldpd.sense & IMMUTABLE) > 0).astype(f32)
        from .ops import pallas_slot as ps
        s0 = ps.slot_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.scaling,
                          immut, n_true=n)
        # warm/equality activation (linprog_core's activate_constraints)
        act_bits = (ldpd.sense & ACTIVE) > 0
        lo_bits = act_bits & ((ldpd.sense & LOWER) > 0)
        mp = s0.dupper.shape[0]
        up_l = jnp.moveaxis(jnp.pad(act_bits & ~lo_bits,
                                    ((0, 0), (0, mp - m))), 0, -1)
        lo_l = jnp.moveaxis(jnp.pad(lo_bits, ((0, 0), (0, mp - m))),
                            0, -1)
        s0 = jax.lax.cond(jnp.any(act_bits),
                          lambda s: ps.slot_activate(s, up_l, lo_l, st),
                          lambda s: s, s0)

        row_real = jnp.arange(mp)[:, None] < m
        big = jnp.asarray(DAQP_INF, f32)
        bu_s = bupper.astype(f32) * ldpd.scaling
        bl_s = blower.astype(f32) * ldpd.scaling
        bu_r = bupper.astype(f32)
        bl_r = blower.astype(f32)
        fz = f.astype(f32)
        _HIP = jax.lax.Precision.HIGHEST

        def set_bounds(s, v_b):
            Mv = jnp.einsum('bmj,bj->bm', ldpd.M, v_b, precision=_HIP)
            du = jnp.moveaxis(jnp.pad(bu_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            dl = jnp.moveaxis(jnp.pad(bl_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            return ps.slot_refresh_bounds(
                s, jnp.where(row_real, du, big),
                jnp.where(row_real, dl, -big))

        def carry_solve(s, v_b, lane_run, st_k):
            s = set_bounds(s, v_b)
            s = s._replace(
                status=jnp.where(lane_run[None, :], EXIT_RUNNING,
                                 s.status).astype(jnp.int32),
                iterations=jnp.zeros_like(s.iterations),
                cycle=jnp.zeros_like(s.cycle),
                repaired=jnp.zeros_like(s.repaired),
                best_fval=jnp.zeros_like(s.best_fval) - 1.0,
                pend=s.pend * (1.0 - lane_run[None, :]))
            return ps.slot_solve(s, st_k, n_true=n, steps=64,
                                 interpret=interpret, deadline=deadline)

        def grad_step(s, x_new, x_old, need):
            # batched gradient_step (daqp_prox.c:201-271): ray
            # x_new + alpha (x_new - x_old) to the first blocking
            # ORIGINAL-row bound, which is activated
            delta = x_new - x_old                            # (B, n)
            ax = jnp.einsum('bmj,bj->bm', ldpd.M, x_new,
                            precision=_HIP) / ldpd.scaling
            ds = jnp.einsum('bmj,bj->bm', ldpd.M, delta,
                            precision=_HIP) / ldpd.scaling
            act = jnp.moveaxis(s.act_up + s.act_lo, -1, 0)[:, :m]
            skip = (act > 0) | (immut > 0)
            up_ok = ~skip & (ds > 0) & (bu_r < DAQP_INF)
            lo_ok = ~skip & (ds < 0) & (bl_r > -DAQP_INF)
            a_up = jnp.where(up_ok, (bu_r - ax)
                             / jnp.where(up_ok, ds, 1.0), DAQP_INF)
            a_lo = jnp.where(lo_ok, (bl_r - ax)
                             / jnp.where(lo_ok, ds, 1.0), DAQP_INF)
            cand = jnp.minimum(a_up, a_lo)
            j = jnp.argmin(cand, axis=1)                     # (B,)
            alpha = jnp.take_along_axis(cand, j[:, None], 1)[:, 0]
            found = alpha < DAQP_INF
            is_lo = (jnp.take_along_axis(a_lo, j[:, None], 1)
                     < jnp.take_along_axis(a_up, j[:, None], 1))[:, 0]
            apply = need & found
            x2 = jnp.where(apply[:, None],
                           x_new + alpha[:, None] * delta, x_new)
            oh = (jnp.arange(m)[None, :] == j[:, None]).astype(f32)
            oh_l = jnp.moveaxis(jnp.pad(oh, ((0, 0), (0, mp - m))),
                                0, -1)                        # (mp, B)
            lo_1 = is_lo.astype(f32)[None, :]
            # active-side bound of the ray's blocker, in the CURRENT
            # d units (rebuilt next pass anyway; sid/slo drive it)
            dv = jnp.where(is_lo,
                           jnp.take_along_axis(
                               jnp.moveaxis(s.dlower, -1, 0), j[:, None],
                               1)[:, 0],
                           jnp.take_along_axis(
                               jnp.moveaxis(s.dupper, -1, 0), j[:, None],
                               1)[:, 0])[None, :]
            s = ps.slot_add_row(s, oh_l, lo_1, dv,
                                apply.astype(f32)[None, :], st, n)
            return s, x2, found

        def run_regime(s_in, run0, flag_in, st_k, budget,
                       x_init=None, eps_init=None):
            """The adaptive-eps outer loop over the kernel state, from a
            cold start, for the ``run0`` lanes (others keep ``flag_in``
            and their state rides along terminal).  ``budget`` bounds
            the outer passes: a stagnating ping-pong lane burns the
            whole budget without converging (the final KKT certificate
            rescues the ones that stagnated AT the optimum), so the
            budget is the WALL COST of the batch's worst lane —
            measured: the old 400-pass default read as 413 LP/s on
            chip, the capped budgets restore throughput at identical
            accuracy."""

            def cond(c):
                k, s, x, eps, lane_run, stall, best, flag, tot = c
                return (k < budget) & jnp.any(lane_run)

            def body(c):
                k, s, x, eps, lane_run, stall, best, flag, tot = c
                v_b = fz * eps[:, None] - x
                s = carry_solve(s, v_b, lane_run, st_k)
                tot = tot + jnp.where(lane_run, s.iterations[0], 0.0)
                inner_flag = s.status[0]
                inner_ok = inner_flag > 0
                u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]
                x_new = u_b - v_b
                it1 = s.iterations[0] <= 1
                nact = jnp.sum(s.used, axis=0)
                at_vertex = nact >= n
                diff = jnp.max(jnp.abs(x_new - x), axis=-1)
                converged = diff < eta * eps
                # eps-normalized stagnation acceptance (linprog_core)
                ndiff = diff / eps
                improved = ndiff < 0.9 * best
                best2 = jnp.minimum(ndiff, best)
                stall2 = jnp.where(improved | ~(it1 & at_vertex)
                                   | ~lane_run, 0, stall + 1)
                converged = converged | (inner_ok & (stall2 >= 3))
                need_grad = it1 & ~at_vertex & ~converged & lane_run \
                    & inner_ok
                s, x_new, found = grad_step(s, x_new, x, need_grad)
                unbounded = need_grad & ~found
                # adaptive eps after the first pass (daqp_prox.c:55-63,
                # interior-stall-only growth — see linprog_core)
                grow = it1 & ~at_vertex
                eps2 = jnp.where((k > 0) & lane_run,
                                 jnp.minimum(eps * jnp.where(grow, 10.0,
                                                             0.9), 1e3),
                                 eps)
                done = lane_run & (converged | ~inner_ok | unbounded)
                flag2 = jnp.where(
                    done,
                    jnp.where(unbounded, EXIT_UNBOUNDED,
                              jnp.where(inner_ok, EXIT_OPTIMAL,
                                        inner_flag)),
                    flag)
                # a lane exiting on an inner-solve FAILURE keeps its
                # last good outer iterate, not the failed solve's x —
                # the final KKT certificate then judges the best point
                # the lane reached (often already optimal)
                bad_exit = done & ~inner_ok
                x2 = jnp.where((lane_run & ~bad_exit)[:, None], x_new,
                               x)
                return (k + 1, s, x2, eps2, lane_run & ~done, stall2,
                        best2, flag2.astype(jnp.int32), tot)

            # lanes outside run0 must be TERMINAL in the kernel or they
            # would re-solve inside carry_solve's rounds
            s_in = s_in._replace(status=jnp.where(
                run0[None, :], s_in.status, EXIT_OPTIMAL
            ).astype(jnp.int32))
            x0 = (jnp.zeros((B, n), f32) if x_init is None else x_init)
            e0 = (jnp.ones((B,), f32) if eps_init is None else eps_init)
            c0 = (jnp.zeros((), jnp.int32), s_in, x0, e0, run0,
                  jnp.zeros((B,), jnp.int32),
                  jnp.full((B,), jnp.inf, f32), flag_in,
                  jnp.zeros((B,), f32))
            (k, s, x, eps, lane_run, _, _, flag, tot) = lax.while_loop(
                cond, body, c0)
            flag = jnp.where(lane_run, EXIT_ITERLIMIT, flag)
            return s, x, eps, flag, tot

        lane_run0 = ldpd.error >= 0
        flag0 = jnp.where(ldpd.error < 0, ldpd.error,
                          EXIT_RUNNING).astype(jnp.int32)
        use_fused = (fused == "force") or (
            bool(fused) and not interpret
            and jax.default_backend() == 'tpu')
        if not use_fused:
            s, x, eps, flag, tot = run_regime(s0, lane_run0, flag0, st,
                                              max_outer)
        else:
            # Fused adaptive-eps outer loop (ops.pallas_slot.
            # run_lp_segment): P passes per kernel launch incl. the
            # in-kernel gradient step; frozen (cycling) lanes turn loud
            # and flow into the Bland cold retry below, exactly like
            # XLA-path failures.
            npad0 = s0.u.shape[0]
            pad_n0 = npad0 - n
            fz_ll = jnp.moveaxis(jnp.pad(fz, ((0, 0), (0, pad_n0))),
                                 0, -1)
            mv_pad = lambda a: jnp.moveaxis(
                jnp.pad(a, ((0, 0), (0, mp - m))), 0, -1)
            bus_ll = jnp.where(row_real, mv_pad(bu_s), big)
            bls_ll = jnp.where(row_real, mv_pad(bl_s), -big)
            bur_ll = jnp.where(row_real, mv_pad(bu_r), big)
            blr_ll = jnp.where(row_real, mv_pad(bl_r), -big)
            data_l = (fz_ll, bus_ll, bls_ll, bur_ll, blr_ll)
            PSEG = 10
            s0f = s0._replace(status=jnp.full_like(s0.status,
                                                   EXIT_OPTIMAL))
            vars0 = (jnp.zeros((npad0, B), f32),
                     jnp.ones((1, B), f32),
                     jnp.zeros((1, B), f32),
                     jnp.full((1, B), jnp.inf, f32),
                     lane_run0.astype(f32)[None, :],
                     flag0[None, :],
                     jnp.zeros((1, B), f32),
                     jnp.zeros((1, B), f32))

            def lp_seg_cond(c):
                k, s_c, v_c, rsc = c
                return (k < max_outer) & jnp.any(v_c[4] > 0)

            def lp_seg_body(c):
                k, s_c, v_c, rsc = c
                from .prox import _auto_eta_static
                s2, v2, failed = ps.run_lp_segment(
                    s_c, v_c, data_l, st, n, _auto_eta_static(st),
                    P=PSEG, steps=192, interpret=interpret)
                (x_l, ep_l, stl_l, bd_l, lr_l, lf_l, tt_l, ps_l) = v2
                # a frozen (in-kernel-cycling) lane is RESUMABLE: the
                # inter-segment Newton refresh below rebuilds the E the
                # drift corrupted, and the lane re-enters the next
                # segment; demote loud only after two failed resumes
                # (then the Bland cold retry takes it)
                fm = failed > 0
                rsc = rsc + fm.astype(f32)[None, :]
                give_up = (rsc[0] > 2.0) & fm
                lf_l = jnp.where(give_up[None, :], EXIT_CYCLE_C,
                                 lf_l).astype(jnp.int32)
                lr_l = jnp.where(give_up[None, :], 0.0, lr_l)
                s2 = ps.newton_refresh(s2)
                return (k + PSEG, s2, (x_l, ep_l, stl_l, bd_l, lr_l,
                                       lf_l, tt_l, ps_l), rsc)

            _, s, v_f, _ = lax.while_loop(
                lp_seg_cond, lp_seg_body,
                (jnp.zeros((), jnp.int32), s0f, vars0,
                 jnp.zeros((1, B), f32)))
            x = jnp.moveaxis(v_f[0], -1, 0)[:, :n]
            eps = v_f[1][0]
            flag = jnp.where(v_f[4][0] > 0, EXIT_ITERLIMIT, v_f[5][0])
            tot = v_f[6][0]

        # Cold Bland retry of loud-failed lanes (the batch analogue of
        # the reference's cold restart on cycling, bnb.c:118-125 /
        # daqp.c's reorder+refactor repair): CYCLE / false-INFEASIBLE /
        # ITERLIMIT lanes re-run from scratch under Bland's anti-cycling
        # rule; measured failure census on the suite shape (B=256,
        # scripts/lp_diag.py): 13/256 split -2 (cycling, wrong x),
        # -1 (false infeasibility), -4 (stagnating ping-pong at the
        # right answer).  UNBOUNDED is a certificate (a feasible
        # unbounded ray), not a failure — no retry.
        def retry_stage(s_cur, x_cur, eps_cur, flag_cur, tot_cur,
                        st_k, budget, cont=False):
            fail_m = (flag_cur < 0) & (flag_cur != EXIT_UNBOUNDED)

            def do_retry(_):
                if cont:
                    # CONTINUATION retry: resume the failed lanes from
                    # their current (state, x, eps) through the XLA
                    # per-pass path, whose between-round EXACT repair
                    # carries a degenerate-cycling lane past the point
                    # the kernel's cold retry replays deterministically;
                    # the lane then lands where the final KKT
                    # certificate can judge it
                    return run_regime(s_cur, fail_m, flag_cur, st_k,
                                      budget, x_init=x_cur,
                                      eps_init=eps_cur)
                return run_regime(s0, fail_m, flag_cur, st_k, budget)

            def no_retry(_):
                return s_cur, x_cur, eps_cur, flag_cur, tot_cur

            s_r, x_r, eps_r, flag_r, tot_r = lax.cond(
                jnp.any(fail_m), do_retry, no_retry, 0)

            # per-lane merge (SlotState is lanes-last throughout)
            def mrg(a, b):
                return jnp.where(
                    fail_m.reshape((1,) * (a.ndim - 1) + (-1,)), a, b)

            return (jax.tree_util.tree_map(mrg, s_r, s_cur),
                    jnp.where(fail_m[:, None], x_r, x_cur),
                    jnp.where(fail_m, eps_r, eps_cur),
                    jnp.where(fail_m, flag_r, flag_cur),
                    tot_cur + jnp.where(fail_m, tot_r, 0.0))

        if use_fused:
            # continuation retry through the XLA per-pass path for
            # fused-frozen lanes (resumes from their state/x/eps with
            # the between-round exact repair)
            s, x, eps, flag, tot = retry_stage(
                s, x, eps, flag, tot, st, min(max_outer, 60),
                cont=True)
        s, x, eps, flag, tot = retry_stage(
            s, x, eps, flag, tot, st._replace(pricing=1),
            min(max_outer, 60))
        fail = (flag < 0) & (flag != EXIT_UNBOUNDED)

        # crossover to a vertex (linprog_core stage 2): near-dual-
        # degenerate faces leave converged lanes OFF-vertex with a tiny
        # objective gap; projected steepest descent within the active
        # face to the nearest blocking row (activated) pins them in
        # <= n rounds so the exact vertex polish below applies
        npad = s.W.shape[1]
        f_l = jnp.moveaxis(jnp.pad(fz, ((0, 0), (0, npad - n))), 0, -1)

        def cx_cond(c):
            k2, s, x = c
            nact = jnp.sum(s.used, axis=0)
            return (k2 < n + 1) & jnp.any((flag == EXIT_OPTIMAL)
                                          & (nact < n))

        def cx_body(c):
            k2, s, x = c
            nact = jnp.sum(s.used, axis=0)
            need = (flag == EXIT_OPTIMAL) & (nact < n)
            Wf = jnp.einsum('knb,nb->kb', s.W, f_l,
                            precision=_HIP) * s.used
            t = jnp.einsum('kjb,jb->kb', s.E, Wf, precision=_HIP)
            d_l = -(f_l - jnp.einsum('knb,kb->nb', s.W, t * s.used,
                                     precision=_HIP))
            d_b = jnp.moveaxis(d_l, -1, 0)[:, :n]
            need = need & (jnp.linalg.norm(d_b, axis=1) > 1e-10)
            s, x2, _found = grad_step(s, x, x - d_b, need)
            x = jnp.where(need[:, None], x2, x)
            return k2 + 1, s, x

        _, s, x = lax.while_loop(cx_cond, cx_body,
                                 (jnp.zeros((), jnp.int32), s, x))

        # vertex polish (linprog_core stage 3): lanes that converged at
        # a full vertex get the active system solved exactly through the
        # inverse Gram, one refinement pass for drift.  The system is
        # W u = dsl with the LAST v: x = u - v.
        v_last = fz * eps[:, None] - x
        s = set_bounds(s, v_last)
        nact = jnp.sum(s.used, axis=0)
        do_vx = (flag == EXIT_OPTIMAL) & (nact >= n)
        rhs = s.dsl * s.used
        lamv = jnp.einsum('kjb,jb->kb', s.E, rhs, precision=_HIP)
        u_vx = jnp.einsum('knb,kb->nb', s.W, lamv, precision=_HIP)
        # mixed-precision iterative refinement: the f32 residual of the
        # vertex system floors x at ~kappa*eps_f32 (observed 2.3e-4 vs
        # the 1e-4 reference gate); an f64 residual with the f32 inverse
        # as preconditioner reaches the f64 floor in 2 passes
        W64 = s.W.astype(jnp.float64)
        rhs64 = rhs.astype(jnp.float64)
        for _ in range(2):
            r64 = (jnp.einsum('knb,nb->kb', W64,
                              u_vx.astype(jnp.float64),
                              precision=_HIP)
                   - rhs64) * s.used
            dl2 = jnp.einsum('kjb,jb->kb', s.E.astype(jnp.float64), r64,
                             precision=_HIP)
            u_vx = (u_vx.astype(jnp.float64)
                    - jnp.einsum('knb,kb->nb', W64, dl2,
                                 precision=_HIP)).astype(u_vx.dtype)
        x_vx = jnp.moveaxis(u_vx, -1, 0)[:, :n] - v_last
        okv = jnp.all(jnp.isfinite(x_vx), axis=-1)
        x = jnp.where((do_vx & okv)[:, None], x_vx, x)

        lam = jnp.moveaxis(ps.slot_duals_dense(s), -1, 0)[:, :m] \
            / eps[:, None]
        fval = jnp.einsum('bi,bi->b', fz, x, precision=_HIP)

        # Final LP KKT certificate: a loud-failed lane (CYCLE /
        # ITERLIMIT / INFEASIBLE — typically a stagnating ping-pong that
        # ended AT the optimum, see scripts/lp_diag.py) whose final x
        # satisfies primal feasibility, stationarity f + G'lam = 0 and
        # complementary slackness within the reference tolerances IS
        # optimal — the certificate is the definition, not a flag
        # rewrite (daqp_prox exits on the same conditions).  The duals
        # are RE-FIT from the final working set (lam = -E W f in slot
        # space — the stale inner-QP duals of an eps ping-pong don't
        # certify an x that is itself optimal; measured: lane with
        # gap 3e-8 / feas 5e-7 but stale-dual stationarity 0.4).
        vals = jnp.concatenate(
            [x[:, :ms],
             jnp.einsum('bmj,bj->bm', A.astype(f32), x,
                        precision=_HIP)], axis=1)           # (B, m)
        feas_v = jnp.maximum(
            jnp.max(vals - bu_r, axis=1), jnp.max(bl_r - vals, axis=1))
        bscale = 1.0 + jnp.max(jnp.abs(jnp.where(
            jnp.isfinite(bu_r), bu_r, 0.0)), axis=1)
        feas_ok = feas_v < 10.0 * st.primal_tol * bscale
        fail_c = (flag < 0) & (flag != EXIT_UNBOUNDED)
        # audit EVERY optimal-flagged lane too: the convergence path's
        # eta*eps acceptance can stop one pivot short of the optimal
        # vertex (measured: a clean-flag lane at a 2e-4 RELATIVE
        # objective gap) — a refuted clean lane is demoted loud below
        cand_c = fail_c | (flag == EXIT_OPTIMAL)

        def refit_duals(_):
            # the ping-pong's final WORKING SET need not equal the tight
            # set at its (optimal) x — rebuild from the rows tight AT x
            # (daqp_primal_init_active semantics, api.c:555-592) with
            # one bulk activation Cholesky, then lam = -E W f
            from .ldp_flat import EXIT_REFACTOR
            tol_t = 10.0 * st.primal_tol * bscale[:, None]
            tight_u = (bu_r - vals < tol_t) & cand_c[:, None]
            tight_l = (vals - bl_r < tol_t) & cand_c[:, None] & \
                ~(bu_r - vals < tol_t)
            up_lm = jnp.moveaxis(
                jnp.pad(tight_u, ((0, 0), (0, mp - m))), 0, -1)
            lo_lm = jnp.moveaxis(
                jnp.pad(tight_l, ((0, 0), (0, mp - m))), 0, -1)
            s_c = ps.slot_activate(s0, up_lm, lo_lm, st)
            ok_act = s_c.status[0] != EXIT_REFACTOR       # (B,)
            Wf_c = jnp.einsum('knb,nb->kb', s_c.W, f_l,
                              precision=_HIP) * s_c.used
            lam_fs = -jnp.einsum('kjb,jb->kb', s_c.E, Wf_c,
                                 precision=_HIP) * s_c.used
            # iterative refinement of the least-squares duals: lam =
            # -E W f is the NORMAL-EQUATIONS solve, which squares the
            # tight-set conditioning — raw f32 stationarity measured
            # 6e-3 vs the 5e-4 certificate gate.  Two residual passes
            # through the same inverse contract it well below the gate
            # (f64 when x64 is enabled; still contracting in f32).
            W64 = s_c.W.astype(jnp.float64)
            f64l = f_l.astype(jnp.float64)
            for _ in range(2):
                res_n = f64l + jnp.einsum(
                    'knb,kb->nb', W64,
                    (lam_fs * s_c.used).astype(jnp.float64),
                    precision=_HIP)
                rK = jnp.einsum('knb,nb->kb', W64, res_n,
                                precision=_HIP).astype(f32) * s_c.used
                lam_fs = lam_fs - jnp.einsum(
                    'kjb,jb->kb', s_c.E, rK,
                    precision=_HIP) * s_c.used
            lam_f = jnp.moveaxis(
                ps.slot_duals_dense(s_c._replace(lam_star=lam_fs)),
                -1, 0)[:, :m]
            # exact vertex of the tight face (v = 0 in LP space, so
            # W u = dsl IS A_act x = b_act): the certificate must judge
            # the EXACT face point, not the loose-tolerance x that
            # selected the face (a point ~1e-3 inside a wrong face
            # passed the loose checks while 2.6e-3 off the optimum)
            rhs_c = s_c.dsl * s_c.used
            lam_x = jnp.einsum('kjb,jb->kb', s_c.E, rhs_c,
                               precision=_HIP)
            u_c = jnp.einsum('knb,kb->nb', s_c.W, lam_x, precision=_HIP)
            W64c = s_c.W.astype(jnp.float64)
            rhs64c = rhs_c.astype(jnp.float64)
            for _ in range(2):
                r64c = (jnp.einsum('knb,nb->kb', W64c,
                                   u_c.astype(jnp.float64),
                                   precision=_HIP)
                        - rhs64c) * s_c.used
                dlc = jnp.einsum('kjb,jb->kb',
                                 s_c.E.astype(jnp.float64), r64c,
                                 precision=_HIP)
                u_c = (u_c.astype(jnp.float64)
                       - jnp.einsum('knb,kb->nb', W64c, dlc,
                                    precision=_HIP)).astype(f32)
            x_f = jnp.moveaxis(u_c, -1, 0)[:, :n]
            full_vx = jnp.sum(s_c.used, axis=0) >= n
            ok_act = ok_act & full_vx \
                & jnp.all(jnp.isfinite(x_f), axis=-1)
            return lam_f, ok_act, x_f

        lam_fit, refit_ok, x_fit = lax.cond(
            jnp.any(cand_c), refit_duals,
            lambda _: (jnp.zeros_like(lam), jnp.zeros((B,), bool),
                       jnp.zeros_like(x)), 0)
        # re-evaluate feasibility/complementarity AT the exact face
        # point for the candidate lanes
        vals_fit = jnp.concatenate(
            [x_fit[:, :ms],
             jnp.einsum('bmj,bj->bm', A.astype(f32), x_fit,
                        precision=_HIP)], axis=1)
        ref_lane = cand_c & refit_ok
        vals = jnp.where(ref_lane[:, None], vals_fit, vals)
        feas_v = jnp.where(
            ref_lane,
            jnp.maximum(jnp.max(vals_fit - bu_r, axis=1),
                        jnp.max(bl_r - vals_fit, axis=1)), feas_v)
        feas_ok = feas_v < 10.0 * st.primal_tol * bscale
        grad = fz + jnp.einsum('bmj,bm->bj', A.astype(f32),
                               lam_fit[:, ms:], precision=_HIP)
        if ms > 0:
            grad = grad.at[:, :ms].add(lam_fit[:, :ms])
        # tight: a looser 1e-4 gate was measured to certify a vertex
        # with a 2e-4 RELATIVE objective gap (silent suboptimality —
        # the failure class this framework never converts to a clean
        # flag); at 1e-5 the refined-dual residual of a genuinely
        # optimal face (~1e-6) still passes
        stat_ok = jnp.max(jnp.abs(grad), axis=1) \
            < 1e-5 * (1.0 + jnp.max(jnp.abs(fz), axis=1))
        # complementarity + dual sign in one: a positive multiplier is
        # only legal on a near-upper-tight row, a negative one on a
        # near-lower-tight row (this subsumes the per-side sign check)
        ltol = 1e-6
        comp_bad = jnp.any(
            ((lam_fit > ltol) & (bu_r - vals > 10.0 * st.primal_tol
                                 * bscale[:, None]))
            | ((lam_fit < -ltol) & (vals - bl_r > 10.0 * st.primal_tol
                                    * bscale[:, None])), axis=1)
        cert_ok = refit_ok & feas_ok & stat_ok & ~comp_bad
        certified = cand_c & cert_ok
        # a clean-flag lane the certificate REFUTES (its tight-set
        # vertex solves exactly but fails stationarity/complementarity
        # — i.e. one or more pivots short of optimal) turns loud; the
        # production backstop re-solves loud lanes.  A clean-flag lane
        # whose x fails the FEASIBILITY gate is demoted regardless of
        # whether the refit was conclusive (feasibility needs no duals;
        # measured: eta*eps acceptance stopping at points ~1.5e-4
        # outside the polytope with flag 1)
        demote = (flag == EXIT_OPTIMAL) & ((refit_ok & ~cert_ok)
                                           | ~feas_ok)
        flag = jnp.where(certified, EXIT_OPTIMAL, flag)
        flag = jnp.where(demote, EXIT_CYCLE_C, flag)
        lam = jnp.where(certified[:, None], lam_fit, lam)
        x = jnp.where(certified[:, None], x_fit, x)
        fval = jnp.where(certified,
                         jnp.einsum('bi,bi->b', fz, x_fit,
                                    precision=_HIP), fval)
        return BatchResult(
            x=x, lam=lam, fval=fval, exitflag=flag.astype(jnp.int32),
            iterations=tot.astype(jnp.int32),
            soft_slack=jnp.zeros((B,), f32))


@functools.partial(jax.jit, static_argnames=("st", "ms", "interpret",
                                             "max_outer", "fused"))
def solve_batch_avi_pallas_jit(H, f, A, bupper, blower, sense,
                               st: Settings, ms: int = 0,
                               interpret: bool = False,
                               max_outer: int = 500,
                               deadline=None,
                               fused: bool = True) -> BatchResult:
    """Batched affine variational inequalities: the Douglas-Rachford
    splitting of ``daqp_solve_avi`` (avi.c:6-101) carried by ONE outer
    loop over the whole-batch slot-kernel state (the same architecture
    as the batched prox/LP/MIQP/MPC drivers).

    Per outer pass (all batched): the inner projection QP in the
    per-lane ``sym(H) + rho I`` metric re-solves warm on the kernel
    (only v/d re-form, batched GEMMs); stable-active-set lanes
    (inner iterations == 1 for ``terminate_limit`` consecutive passes)
    get the exact KKT/Schur solve on the ORIGINAL asymmetric H
    (avi.c:103-184, batched ``(B, K, K)`` solves) with KKT
    verification (avi.c:187-221); Newton steps that increase the
    natural residual revert and extend the limit (avi.c:44-61).

    Scope: hard constraints (soft AVIs use the single-instance
    ``daqp_tpu.avi``).  Differential tests vs ``avi_core``:
    tests/test_batch_avi.py.
    """
    from .ops import pallas_slot as ps
    from .ops import pallas_batch as pb
    from .types import (IMMUTABLE, ACTIVE, EXIT_OPTIMAL, EXIT_ITERLIMIT)

    A = jnp.atleast_3d(A)
    B, n = H.shape[0], H.shape[-1]
    m = bupper.shape[-1]
    lane_pad = (-B) % (_LANE_GUARD if B > _LANE_GUARD else pb.LANES)
    if lane_pad:
        def padded(x, fill):
            blk = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                   (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, blk], axis=0)
        out = solve_batch_avi_pallas_jit(
            padded(H, jnp.eye(n)), padded(f, jnp.zeros((n,))),
            padded(A, jnp.zeros((A.shape[1], n))),
            padded(bupper, jnp.ones((m,))),
            padded(blower, -jnp.ones((m,))),
            padded(sense, jnp.zeros((m,), jnp.int32)),
            st, ms=ms, interpret=interpret, max_outer=max_outer,
            deadline=deadline, fused=fused)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    if B > _LANE_GUARD:
        return _lane_chunk_map(
            lambda a: solve_batch_avi_pallas_jit(
                *a, st=st, ms=ms, interpret=interpret,
                max_outer=max_outer, deadline=deadline, fused=fused),
            (H, f, A, bupper, blower, sense), B)

    f32 = jnp.float32
    _HIP = jax.lax.Precision.HIGHEST
    with jax.default_matmul_precision('high'):
        Hb = H.astype(f32)
        fb = f.astype(f32)
        bu = bupper.astype(f32)
        bl = blower.astype(f32)
        Hsym = 0.5 * (Hb + jnp.swapaxes(Hb, 1, 2))
        diag = jnp.diagonal(Hsym, axis1=1, axis2=2)
        min_diag = jnp.min(diag, axis=1)
        max_rs = jnp.max(jnp.sum(jnp.abs(Hsym), axis=2), axis=1)
        fro = jnp.sqrt(jnp.sum(Hb * Hb, axis=(1, 2)))
        rho = jnp.where((min_diag > 0) & (max_rs > 0),
                        jnp.sqrt(jnp.maximum(min_diag * max_rs, 1e-30)),
                        fro / 2)                                 # (B,)
        eyen = jnp.eye(n, dtype=f32)
        Hs_rho = Hsym + rho[:, None, None] * eyen
        H_rho = Hb + rho[:, None, None] * eyen
        H_lu = jax.vmap(jax.scipy.linalg.lu_factor)(Hb)
        H_rho_lu = jax.vmap(jax.scipy.linalg.lu_factor)(H_rho)
        lu_solve = jax.vmap(jax.scipy.linalg.lu_solve)
        if ms > 0:
            Aall = jnp.concatenate(
                [jnp.broadcast_to(eyen[:ms], (B, ms, n)),
                 A.astype(f32)], axis=1)
        else:
            Aall = A.astype(f32)

        ldpd = jax.vmap(
            lambda H_, A_, bu_, bl_, se_: transform.build_ldp(
                H_, None, A_, bu_, bl_, se_, ms, st))(
            Hs_rho, A.astype(f32), bu, bl, sense)
        immut = ((ldpd.sense & IMMUTABLE) > 0).astype(f32)
        s0 = ps.slot_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.scaling,
                          immut, n_true=n)
        mp = s0.dupper.shape[0]
        row_real = jnp.arange(mp)[:, None] < m
        big = jnp.asarray(DAQP_INF, f32)
        bu_s = bu * ldpd.scaling
        bl_s = bl * ldpd.scaling
        iota_m = jnp.arange(m, dtype=f32)

        # unconstrained shortcut (utils.c:547-551)
        x_unc = lu_solve(H_lu, -fb)
        r_unc = jnp.einsum('bmn,bn->bm', Aall, x_unc, precision=_HIP)
        unc_ok = jnp.all((r_unc <= bu + st.primal_tol)
                         & (r_unc >= bl - st.primal_tol), axis=1) \
            & ~jnp.any((ldpd.sense & (ACTIVE | IMMUTABLE)) > 0, axis=1)

        def set_bounds(s, v_b):
            Mv = jnp.einsum('bmj,bj->bm', ldpd.M, v_b, precision=_HIP)
            du = jnp.moveaxis(jnp.pad(bu_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            dl = jnp.moveaxis(jnp.pad(bl_s + Mv, ((0, 0), (0, mp - m))),
                              0, -1)
            return ps.slot_refresh_bounds(
                s, jnp.where(row_real, du, big),
                jnp.where(row_real, dl, -big))

        def kkt_all(s, lane_do):
            # batched exact KKT/Schur on the original asymmetric H
            # (avi.c:103-184) for the slot working sets
            K = s.E.shape[0]
            used_b = jnp.moveaxis(s.used, -1, 0)             # (B, K)
            sid_b = jnp.moveaxis(s.sid, -1, 0)
            slo_b = jnp.moveaxis(s.slo, -1, 0)
            oh = (sid_b[:, :, None] == iota_m[None, None, :]) \
                .astype(f32) * used_b[:, :, None]            # (B, K, m)
            Aw = jnp.einsum('bkm,bmn->bkn', oh, Aall, precision=_HIP)
            T = lu_solve(H_lu, jnp.swapaxes(Aw, 1, 2))       # (B, n, K)
            S = jnp.einsum('bkn,bnj->bkj', Aw, T, precision=_HIP)
            mask2 = used_b[:, :, None] * used_b[:, None, :]
            eyeK = jnp.eye(K, dtype=f32)
            S = S * mask2 + eyeK * (1.0 - used_b)[:, :, None]
            Hinv_f = lu_solve(H_lu, fb)
            b_sel = jnp.einsum(
                'bkm,bm->bk', oh,
                bl, precision=_HIP) * slo_b + jnp.einsum(
                'bkm,bm->bk', oh, bu, precision=_HIP) * (1.0 - slo_b)
            rhs = -(b_sel + jnp.einsum('bkn,bn->bk', Aw, Hinv_f,
                                       precision=_HIP)) * used_b
            lamK = jnp.linalg.solve(S, rhs[..., None])[..., 0] * used_b
            x_kkt = lu_solve(
                H_lu, -fb - jnp.einsum('bkn,bk->bn', Aw, lamK,
                                       precision=_HIP))
            # KKT verification (avi.c:187-221)
            simm_b = jnp.moveaxis(s.simm, -1, 0)
            dual_ok = jnp.all(
                jnp.where(used_b * (1.0 - simm_b) > 0,
                          jnp.where(slo_b > 0, lamK <= st.dual_tol,
                                    lamK >= -st.dual_tol), True), axis=1)
            r = jnp.einsum('bmn,bn->bm', Aall, x_kkt, precision=_HIP)
            act_m = jnp.moveaxis(s.act_up + s.act_lo, -1, 0)[:, :m]
            primal_ok = jnp.all(
                jnp.where(act_m > 0, True,
                          (r <= bu + st.primal_tol)
                          & (r >= bl - st.primal_tol)), axis=1)
            # STATIONARITY residual — feasibility + dual signs alone do
            # NOT certify: an ill-conditioned f32 Schur solve can yield
            # an x_kkt with O(1) stationarity error that still passes
            # both (found by the fuzzer: a clean-flag lane 1.3e-2 off
            # with residual 1.12).  The residual is the definition of
            # the KKT point; a failing lane keeps iterating / exits
            # loud and flows to backstop_resolve_avi.
            g_res = (jnp.einsum('bij,bj->bi', Hb, x_kkt,
                                precision=_HIP) + fb
                     + jnp.einsum('bkn,bk->bn', Aw, lamK,
                                  precision=_HIP))
            stat_ok = jnp.max(jnp.abs(g_res), axis=1) \
                < 1e-3 * (1.0 + jnp.max(jnp.abs(fb), axis=1))
            return x_kkt, lamK, lane_do & dual_ok & primal_ok & stat_ok

        def cond(c):
            (k, s, x, y, xold, lamK, minres, ctr, tlim, lane_run, flag,
             tot) = c
            return (k < max_outer) & jnp.any(lane_run)

        def body(c):
            (k, s, x, y, xold, lamK, minres, ctr, tlim, lane_run, flag,
             tot) = c
            Hx = jnp.einsum('bij,bj->bi', Hb, x, precision=_HIP)
            xtemp = Hx + fb - jnp.einsum('bij,bj->bi', Hs_rho, x,
                                         precision=_HIP)
            v_b = jnp.einsum('bji,bj->bi', ldpd.Rinv, xtemp,
                             precision=_HIP)
            s = set_bounds(s, v_b)
            s = s._replace(
                status=jnp.where(lane_run[None, :], EXIT_RUNNING,
                                 s.status).astype(jnp.int32),
                iterations=jnp.zeros_like(s.iterations),
                cycle=jnp.zeros_like(s.cycle),
                repaired=jnp.zeros_like(s.repaired),
                best_fval=jnp.zeros_like(s.best_fval) - 1.0,
                pend=s.pend * (1.0 - lane_run[None, :]))
            s = ps.slot_solve(s, st, n_true=n, steps=64,
                              interpret=interpret, deadline=deadline)
            tot = tot + jnp.where(lane_run, s.iterations[0], 0.0)
            inner_flag = s.status[0]
            inner_ok = inner_flag > 0
            u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]
            y_inner = jnp.einsum('bij,bj->bi', ldpd.Rinv, u_b - v_b,
                                 precision=_HIP)

            # Newton-step progress bookkeeping (avi.c:44-61)
            at_limit = ctr == tlim
            res2 = jnp.sum((x - y_inner) ** 2, axis=1)
            worse = at_limit & (res2 > minres)
            x = jnp.where(worse[:, None], xold, x)
            tlim = jnp.where(worse, jnp.minimum(tlim + 5, 30), tlim)
            minres = jnp.where(at_limit & ~worse, res2, minres)
            y = jnp.where((at_limit & worse)[:, None], y, y_inner)

            stable = s.iterations[0] <= 1
            ctr = jnp.where(stable & lane_run, ctr + 1, 0)
            do_kkt = stable & (ctr == tlim) & lane_run & inner_ok

            def with_kkt(args):
                x, lamK, xold, flag = args
                x_kkt, lam_new, opt = kkt_all(s, do_kkt)
                xold2 = jnp.where(do_kkt[:, None], x, xold)
                x2 = jnp.where(do_kkt[:, None], x_kkt, x)
                lam2 = jnp.where(do_kkt[:, None], lam_new, lamK)
                flag2 = jnp.where(opt & (flag == EXIT_RUNNING),
                                  EXIT_OPTIMAL, flag)
                return x2, lam2, xold2, flag2.astype(jnp.int32)

            x, lamK, xold, flag = jax.lax.cond(
                jnp.any(do_kkt), with_kkt, lambda a: a,
                (x, lamK, xold, flag))

            # DR outer update for non-KKT running lanes (avi.c:84-96)
            xtemp2 = rho[:, None] * y + Hx + 0.5 * jnp.einsum(
                'bij,bj->bi', Hsym, y - x, precision=_HIP)
            x_dr = lu_solve(H_rho_lu, xtemp2)
            move = lane_run & ~do_kkt & inner_ok
            x = jnp.where(move[:, None], x_dr, x)

            flag = jnp.where(lane_run & ~inner_ok, inner_flag, flag)
            done = lane_run & ((flag != EXIT_RUNNING) | ~inner_ok)
            return (k + 1, s, x, y, xold, lamK, minres, ctr, tlim,
                    lane_run & ~done, flag.astype(jnp.int32), tot)

        x0 = jnp.zeros((B, n), f32)
        lane_run0 = (ldpd.error >= 0) & ~unc_ok
        flag0 = jnp.where(ldpd.error < 0, ldpd.error,
                          jnp.where(unc_ok, EXIT_OPTIMAL,
                                    EXIT_RUNNING)).astype(jnp.int32)
        K = s0.E.shape[0]
        use_fused = (fused == "force") or (
            bool(fused) and not interpret
            and jax.default_backend() == 'tpu')
        if not use_fused:
            c0 = (jnp.zeros((), jnp.int32), s0, x0, x0,
                  jnp.zeros((B, n), f32), jnp.zeros((B, K), f32),
                  jnp.full((B,), DAQP_INF, f32),
                  jnp.zeros((B,), jnp.int32),
                  jnp.full((B,), 5, jnp.int32), lane_run0, flag0,
                  jnp.zeros((B,), f32))
            (k, s, x, y, xold, lamK, minres, ctr, tlim, lane_run, flag,
             tot) = lax.while_loop(cond, body, c0)
        else:
            # Fused DR outer loop (ops.pallas_slot.run_avi_segment —
            # the AVI analogue of the fused prox loop): P passes per
            # kernel launch with E/W/M + the per-lane Rinv/G/Hrho^-1
            # matrices VMEM-resident; the exact-KKT acceleration and
            # inner-failure repair run at the driver between segments
            # through freeze channels.
            np_pad = s0.u.shape[0]
            pad_n = np_pad - n

            def padM(Mx):
                return jnp.moveaxis(
                    jnp.pad(Mx, ((0, 0), (0, pad_n), (0, pad_n))),
                    0, -1)

            Rinv_l = padM(ldpd.Rinv)
            G1_l = padM(Hb - Hs_rho)
            G2_l = padM(0.5 * Hsym + rho[:, None, None] * eyen)
            G3_l = padM(Hb - 0.5 * Hsym)
            Hri_l = padM(lu_solve(H_rho_lu, jnp.broadcast_to(
                eyen, (B, n, n))))
            fz_l = jnp.moveaxis(jnp.pad(fb, ((0, 0), (0, pad_n))),
                                0, -1)
            bus_l = jnp.where(
                row_real,
                jnp.moveaxis(jnp.pad(bu_s, ((0, 0), (0, mp - m))),
                             0, -1), big)
            bls_l = jnp.where(
                row_real,
                jnp.moveaxis(jnp.pad(bl_s, ((0, 0), (0, mp - m))),
                             0, -1), -big)
            mats = (Rinv_l, G1_l, G2_l, G3_l, Hri_l, fz_l, bus_l,
                    bls_l)
            PSEG = 8
            zn = jnp.zeros((np_pad, B), f32)
            vars0 = (zn, zn, zn,
                     jnp.full((1, B), DAQP_INF, f32),
                     jnp.zeros((1, B), f32),
                     jnp.full((1, B), 5.0, f32),
                     lane_run0.astype(f32)[None, :],
                     flag0[None, :],
                     jnp.zeros((1, B), f32))

            def to_body_carry(s_a, v_a, lamK_a):
                (x_l, y_l, xo_l, mr_l, ct_l, tl_l, lr_l, lf_l,
                 tt_l) = v_a
                mvx = lambda a: jnp.moveaxis(a, -1, 0)[:, :n]
                return (jnp.zeros((), jnp.int32), s_a, mvx(x_l),
                        mvx(y_l), mvx(xo_l), lamK_a, mr_l[0],
                        ct_l[0].astype(jnp.int32),
                        tl_l[0].astype(jnp.int32), lr_l[0] > 0,
                        lf_l[0], tt_l[0])

            def from_body_carry(c_a):
                (_, s_a, x_a, y_a, xo_a, lamK_a, mr_a, ct_a, tl_a,
                 lr_a, lf_a, tt_a) = c_a
                pl_ = lambda a: jnp.moveaxis(
                    jnp.pad(a, ((0, 0), (0, pad_n))), 0, -1)
                return s_a, (pl_(x_a), pl_(y_a), pl_(xo_a),
                             mr_a[None, :],
                             ct_a.astype(f32)[None, :],
                             tl_a.astype(f32)[None, :],
                             lr_a.astype(f32)[None, :],
                             lf_a[None, :],
                             tt_a[None, :]), lamK_a

            def seg_cond(c):
                k, s_c, v_c, lamK_c = c
                return (k < max_outer) & jnp.any(v_c[6] > 0)

            def seg_body(c):
                k, s_c, v_c, lamK_c = c
                s2, v2, failed, kktq = ps.run_avi_segment(
                    s_c, v_c, mats, st, n, P=PSEG, steps=64,
                    interpret=interpret)

                def kkt_service(args):
                    s_a, v_a, lamK_a = args
                    (x_l, y_l, xo_l, mr_l, ct_l, tl_l, lr_l, lf_l,
                     tt_l) = v_a
                    x_a = jnp.moveaxis(x_l, -1, 0)[:, :n]
                    do_k = kktq > 0
                    x_kkt, lam_new, opt = kkt_all(s_a, do_k)
                    xo2 = jnp.where(
                        do_k[None, :],
                        jnp.moveaxis(jnp.pad(x_a, ((0, 0), (0, pad_n))),
                                     0, -1), xo_l)
                    x2 = jnp.where(
                        do_k[None, :],
                        jnp.moveaxis(jnp.pad(x_kkt,
                                             ((0, 0), (0, pad_n))),
                                     0, -1), x_l)
                    lam2 = jnp.where(do_k[:, None], lam_new, lamK_a)
                    lf2 = jnp.where((opt & (lf_l[0] == EXIT_RUNNING)
                                     )[None, :],
                                    EXIT_OPTIMAL, lf_l)
                    lr2 = jnp.where((opt)[None, :], 0.0, lr_l)
                    return (s_a, (x2, y_l, xo2, mr_l, ct_l, tl_l, lr2,
                                  lf2.astype(jnp.int32), tt_l), lam2)

                s2, v2, lamK_c = lax.cond(
                    jnp.any(kktq > 0), kkt_service, lambda a: a,
                    (s2, v2, lamK_c))

                def repair(args):
                    s_a, v_a, lamK_a = args
                    cfb = to_body_carry(s_a, v_a, lamK_a)
                    # run ONLY the frozen lanes through the XLA body
                    cfb = cfb[:9] + (failed > 0,) + cfb[10:]
                    cfb = lax.while_loop(
                        lambda cc: (cc[0] < PSEG) & jnp.any(cc[9]),
                        body, cfb)
                    s_b, v_b, lamK_b = from_body_carry(cfb)
                    fm1 = (failed > 0)[None, :]

                    def msel(a, b):
                        return jnp.where(
                            (failed > 0).reshape(
                                (1,) * (a.ndim - 1) + (-1,)), a, b)

                    s_m = jax.tree_util.tree_map(msel, s_b, s_a)
                    v_m = tuple(
                        jnp.where(fm1, nb_, ob_).astype(ob_.dtype)
                        for nb_, ob_ in zip(v_b, v_a))
                    lam_m = jnp.where((failed > 0)[:, None], lamK_b,
                                      lamK_a)
                    return s_m, v_m, lam_m

                s2, v2, lamK_c = lax.cond(
                    jnp.any(failed > 0), repair, lambda a: a,
                    (s2, v2, lamK_c))
                s2 = ps.newton_refresh(s2)
                return (k + PSEG, s2, v2, lamK_c)

            c0f = (jnp.zeros((), jnp.int32), s0, vars0,
                   jnp.zeros((B, K), f32))
            (k, s, v_f, lamK) = lax.while_loop(seg_cond, seg_body, c0f)
            x = jnp.moveaxis(v_f[0], -1, 0)[:, :n]
            lane_run = v_f[6][0] > 0
            flag = v_f[7][0]
            tot = v_f[8][0]
        flag = jnp.where(lane_run, EXIT_ITERLIMIT, flag)
        x = jnp.where(unc_ok[:, None], x_unc, x)

        # scatter the KKT duals to constraint space
        used_b = jnp.moveaxis(s.used, -1, 0)
        sid_b = jnp.moveaxis(s.sid, -1, 0)
        oh = (sid_b[:, :, None] == iota_m[None, None, :]).astype(f32) \
            * used_b[:, :, None]
        lam = jnp.einsum('bkm,bk->bm', oh, lamK, precision=_HIP)
        fval = jnp.einsum('bi,bi->b', fb, x, precision=_HIP)
        return BatchResult(
            x=x, lam=lam, fval=fval, exitflag=flag.astype(jnp.int32),
            iterations=jnp.maximum(tot, 1.0).astype(jnp.int32),
            soft_slack=jnp.zeros((B,), f32))


@functools.partial(jax.jit, static_argnames=("st", "ms", "break_points",
                                             "interpret", "rho_floor"))
def solve_batch_hiqp_pallas_jit(H, f, A, bupper, blower, sense,
                                st: Settings, ms: int = 0,
                                break_points: tuple = (),
                                interpret: bool = False,
                                deadline=None,
                                rho_floor: float = None) -> BatchResult:
    """Batched hierarchical (lexicographic least-squares) QP solve: the
    level walk of ``daqp_hiqp`` (hierarchical.c:5-108) carried by ONE
    unrolled loop over the whole-batch dense-mask kernel state — the
    second half of BASELINE config 4 on the scaling axis.

    Per level (all batched): the level's rows are SOFTened (uniform
    rho_soft — the dense kernel's plain-soft support) and rows beyond
    the level IMMUTABLE (the reference truncates work->m,
    hierarchical.c:24), the whole batch re-solves warm on the kernel,
    the optimal soft violations w = lam* rho are frozen into d
    (hierarchical.c:51-65) and reported as output duals, the level is
    hardened and the working set rebuilt by sequential masked re-adds
    with dependent-entry drops (``dense_reactivate``,
    hierarchical.c:72-95), and per-lane degrees-of-freedom accounting
    stops exhausted lanes (hierarchical.c:97).

    ``break_points`` is a static strictly-increasing tuple ending at m,
    shared across the batch.  ``H=None`` uses the identity metric (the
    common hierarchical-control use).  Warm ACTIVE bits are honored for
    the pre-hierarchy hard rows (< break_points[0]); per-level warm
    starts are not supported on this tier (use ``hiqp_core``).
    Differential tests vs ``hiqp_core``: tests/test_batch_hiqp.py.
    """
    from .ops import pallas_batch as pb
    from .types import ACTIVE, IMMUTABLE, LOWER, EXIT_OPTIMAL, \
        EXIT_ITERLIMIT
    from .hierarchical import EXIT_NO_DOF

    A = jnp.atleast_3d(A)
    B = bupper.shape[0]
    m = bupper.shape[-1]
    n = A.shape[-1] if A.size else (H.shape[-1] if H is not None else ms)
    bp = tuple(int(b) for b in break_points)
    assert len(bp) >= 2 and bp[-1] == m, (bp, m)
    lane_pad = (-B) % (_LANE_GUARD if B > _LANE_GUARD else pb.LANES)
    if lane_pad:
        def padded(x, fill):
            blk = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                   (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, blk], axis=0)
        out = solve_batch_hiqp_pallas_jit(
            None if H is None else padded(H, jnp.eye(n)),
            None if f is None else padded(f, jnp.zeros((n,))),
            padded(A, jnp.zeros((A.shape[1], n))),
            padded(bupper, jnp.ones((m,))),
            padded(blower, -jnp.ones((m,))),
            padded(sense, jnp.zeros((m,), jnp.int32)),
            st, ms=ms, break_points=bp, interpret=interpret,
            deadline=deadline, rho_floor=rho_floor)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    if B > _LANE_GUARD:
        Hc = None
        if H is not None:
            Hc = H.reshape((B // _LANE_GUARD, _LANE_GUARD)
                           + H.shape[1:])
        fc = None
        if f is not None:
            fc = f.reshape((B // _LANE_GUARD, _LANE_GUARD)
                           + f.shape[1:])
        C = B // _LANE_GUARD
        data = tuple(x.reshape((C, _LANE_GUARD) + x.shape[1:])
                     for x in (A, bupper, blower, sense))
        parts = lax.map(
            lambda a: solve_batch_hiqp_pallas_jit(
                a[4], a[5], a[0], a[1], a[2], a[3], st, ms=ms,
                break_points=bp, interpret=interpret,
                deadline=deadline, rho_floor=rho_floor),
            data + (Hc, fc))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((B,) + x.shape[2:]), parts)

    # f32 conditioning floor for the level penalty: a conflicting soft
    # add's Schur pivot is ~rho, and rank-one updates through such a
    # pivot amplify f32 rounding by 1/rho.  Round-4 measurement (3-level
    # test batch, no between-level refresh): 51/128 INFEASIBLE lanes at
    # rho 1e-4.  Round 5 added the between-level Newton refresh below;
    # re-measured (scripts/hiqp_rho_scan.py): the INFEASIBLE storms are
    # GONE at every rho down to 1e-4 — chip numbers: diff-vs-f64-walk
    # 5.2e-4 at 3e-2, 9.2e-4 at 1e-2, then 3e-1+ at <= 1e-3, with the
    # loud exit-3 (DOF) count growing 8 -> 59 as rho shrinks (the
    # reactivation's dependent-entry drops misclassify at ~rho pivots,
    # shifting the DOF accounting and hence which levels freeze).  The
    # default floor stays the conservative 3e-2; ``rho_floor`` lets
    # callers trade agreement for tighter levels (1e-2 measured usable
    # on chip; loud exit-3 either way), and exact tight-rho semantics
    # live in the f64 single-instance ``hiqp_core``.
    st = st._replace(rho_soft=max(
        float(st.rho_soft),
        _HIQP_RHO_FLOOR if rho_floor is None else float(rho_floor)))

    f32 = jnp.float32
    with jax.default_matmul_precision('high'):
        if H is None:
            H_b = jnp.broadcast_to(jnp.eye(n, dtype=f32), (B, n, n))
        else:
            H_b = H.astype(f32)
        f_b = (jnp.zeros((B, n), f32) if f is None else f.astype(f32))
        ldpd = jax.vmap(
            lambda H_, f_, A_, bu_, bl_, se_: transform.build_ldp(
                H_, f_, A_, bu_, bl_, se_, ms, st))(
            H_b, f_b, A.astype(f32), bupper.astype(f32),
            blower.astype(f32), sense)
        immut0 = ((ldpd.sense & IMMUTABLE) > 0).astype(f32)
        s = pb.dense_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.scaling,
                          immut0)
        mp = s.dupper.shape[0]
        iota_row = jnp.arange(mp)[:, None]                  # (mp, 1)
        immut_base = s.immut                 # incl. padded-row immut

        # pre-hierarchy hard warm/equality rows (< bp[0])
        act_bits = ((ldpd.sense & ACTIVE) > 0) \
            & (jnp.arange(m)[None, :] < bp[0])
        lo_bits = act_bits & ((ldpd.sense & LOWER) > 0)
        up_l = jnp.moveaxis(jnp.pad(act_bits & ~lo_bits,
                                    ((0, 0), (0, mp - m))), 0, -1)
        lo_l = jnp.moveaxis(jnp.pad(lo_bits, ((0, 0), (0, mp - m))),
                            0, -1)
        s = jax.lax.cond(jnp.any(act_bits),
                         lambda s: pb.dense_activate(s, up_l, lo_l, st),
                         lambda s: s, s)

        lam_out = jnp.zeros((mp, B), f32)
        lane_flag = jnp.where(ldpd.error < 0, ldpd.error,
                              EXIT_RUNNING).astype(jnp.int32)
        done = lane_flag != EXIT_RUNNING
        nfree = jnp.full((B,), float(n), f32)
        u_best = s.u
        tot = jnp.zeros((B,), f32)
        rho = jnp.asarray(st.rho_soft, f32)
        ptol = jnp.asarray(st.primal_tol, f32)
        nh = len(bp)

        for i in range(1, nh):
            start, end = bp[i - 1], bp[i]
            lvl = ((iota_row >= start) & (iota_row < end)).astype(f32)
            beyond = (iota_row >= end).astype(f32)
            lane_run = ~done
            run_m = lane_run.astype(f32)[None, :]            # (1, B)
            s = s._replace(
                soft=jnp.broadcast_to(lvl, s.soft.shape),
                immut=jnp.minimum(immut_base + beyond, 1.0))
            u_prev = s.u
            s = s._replace(
                status=jnp.where(lane_run[None, :], EXIT_RUNNING,
                                 s.status).astype(jnp.int32),
                iterations=jnp.zeros_like(s.iterations),
                cycle=jnp.zeros_like(s.cycle),
                repaired=jnp.zeros_like(s.repaired),
                best_fval=jnp.zeros_like(s.best_fval) - 1.0,
                pend=s.pend * (1.0 - run_m))
            s = pb.dense_solve(s, st, n_true=n, interpret=interpret,
                               has_soft=True, deadline=deadline)
            tot = tot + jnp.where(lane_run, s.iterations[0], 0.0)
            flag_i = s.status[0]
            failed = lane_run & (flag_i < 0)

            # freeze the level's optimal soft violations into d and
            # record them as output duals (hierarchical.c:51-65).  The
            # extra symmetric ptol margin on the level's rows is an
            # f32-robustness addition beyond the reference: the frozen
            # bounds pass exactly through the level's optimum, so after
            # hardening, ~1e-5 of kernel drift makes hardened/dropped
            # rows look marginally violated at later levels and the
            # resulting singular-add storms exit INFEASIBLE (observed:
            # 50/128 lanes at level 3 without the margin; the f64
            # single-instance path never sees violations above its
            # noise floor).  The lexicographic solution moves O(ptol).
            act = s.act_up + s.act_lo
            wv = s.lam_star * rho * act * s.soft             # (mp, B)
            s = s._replace(
                dupper=s.dupper + (jnp.where(wv > ptol, wv, 0.0)
                                   + ptol * lvl) * run_m,
                dlower=s.dlower + (jnp.where(wv < -ptol, wv, 0.0)
                                   - ptol * lvl) * run_m)
            soft_act = (act * s.soft > 0) & lane_run[None, :]
            lam_out = jnp.where(soft_act, wv, lam_out)

            # harden the level (hierarchical.c:68)
            s = s._replace(soft=jnp.zeros_like(s.soft))
            if i < nh - 1:
                s2, n_imm = pb.dense_reactivate(s, st, n, start)
                # between-level E hygiene (VERDICT r4 #8): the
                # reactivation re-adds are rank-one f32 updates through
                # the PREVIOUS levels' conflicting-soft pivots (~rho),
                # so drift compounds ACROSS levels — the measured
                # INFEASIBLE storms at low rho hit level 3, not level 1.
                # One Newton refresh against the exact Gram between
                # levels is a whole-batch barrier anyway and lowered the
                # usable floor (see the rho scan in
                # scripts/hiqp_rho_scan.py).
                s2 = pb.newton_refresh(s2, st)
                s = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        lane_run[None] if a.ndim == 2
                        else (lane_run[None, None] if a.ndim == 3
                              else lane_run), b, a), s, s2)
                nfree = nfree - jnp.where(lane_run, n_imm, 0.0)

            iterlim = lane_run & ~failed & (tot >= st.iter_limit)
            lane_flag = jnp.where(failed, EXIT_NO_DOF, lane_flag)
            lane_flag = jnp.where(iterlim, EXIT_ITERLIMIT, lane_flag)
            u_best = jnp.where(lane_run[None, :],
                               jnp.where(failed[None, :], u_prev, s.u),
                               u_best)
            done = done | failed | iterlim | (nfree <= 0)

        u_b = jnp.moveaxis(u_best, -1, 0)[:, :n]
        x = jax.vmap(transform.ldp_to_qp_solution)(ldpd, u_b)
        if H is None and f is not None:
            fval = jnp.einsum('bi,bi->b', f_b, x,
                              precision=jax.lax.Precision.HIGHEST)
        else:
            fval = 0.5 * (jnp.sum(u_b * u_b, axis=1)
                          - jnp.einsum('bk,bk->b', ldpd.v, ldpd.v))
        lane_flag = jnp.where(lane_flag == EXIT_RUNNING, EXIT_OPTIMAL,
                              lane_flag)
        lam_b = jnp.moveaxis(lam_out, -1, 0)[:, :m]
        return BatchResult(
            x=x, lam=lam_b, fval=fval,
            exitflag=lane_flag.astype(jnp.int32),
            iterations=jnp.maximum(tot, 1.0).astype(jnp.int32),
            soft_slack=jnp.zeros((B,), f32))


@functools.partial(jax.jit, static_argnames=("st", "ms", "bin_ids",
                                             "interpret", "max_waves",
                                             "warm_ws",
                                             "report_kernel_iters"))
def solve_batch_miqp_pallas_jit(H, f, A, bupper, blower, sense,
                                st: Settings, ms: int = 0,
                                bin_ids: tuple = (),
                                interpret: bool = False,
                                max_waves: int = 512,
                                deadline=None,
                                warm_ws: bool = True,
                                report_kernel_iters: bool = False
                                ) -> BatchResult:
    """Batched MIQP branch-and-bound with node relaxations solved as
    whole-batch Pallas kernel WAVES.

    The vmap(bnb(single-lane)) nesting pays the slow per-lane solver at
    every relaxation iteration; here each lane carries its own DFS stack
    (a node is a fixed-set and a fixed-side bitmask over the binary rows,
    each a (NW,)-word int32 vector with 31 binaries per word — no
    binary-count cap), and one outer while_loop pops every live lane's
    next
    node, solves ALL relaxations in one batched kernel call (fixed
    binaries entered as immutable equalities via the bulk activation
    Cholesky), then applies the lane-local BnB bookkeeping — dominance
    prune against the incumbent (bnb.c:29-31,62 semantics, compared in
    LDP fval space where the v'v shift is node-independent),
    first-off-endpoint branch selection with nearest-endpoint-first
    order (bnb.c:130-156), incumbent update.  Lanes whose trees are
    exhausted turn terminal and their tiles skip work via the kernel
    early exit.

    Reference BnB semantics carried at batch level:

    * the live incumbent bound (with ``rel_subopt``/``abs_subopt``
      folded in exactly as ``bnb_core`` does, bnb.c:29-31,68) is passed
      into every wave's relaxations as the kernel's per-lane dominance
      cut, so dominated nodes exit early instead of solving to
      optimality (daqp.c:20-23);
    * each pushed child stores the parent's final working set
      (act_up/act_lo row masks) and the pop bulk-activates it alongside
      the fixed binaries — the batch analogue of tree_WS replay
      (bnb.c:92-128,190-222).  A lane whose warm set turns dependent
      falls back to fixed+equality-only activation (the reference drops
      dependent mutable adds, auxiliary.c:446-469).

    Scope: hard constraints + BINARY rows, strictly convex H.
    """
    from .ops import pallas_batch as pb
    from .ops import pallas_slot as ps
    from .types import (ACTIVE, LOWER, IMMUTABLE, BINARY, EXIT_NONCONVEX,
                        EXIT_OPTIMAL, EXIT_INFEASIBLE, EXIT_ITERLIMIT)

    B, n = H.shape[0], H.shape[-1]
    m = bupper.shape[-1]
    nb = len(bin_ids)
    assert nb >= 1, "no binary rows; use solve_batch_pallas_jit"
    # nodes are multi-word int32 bitmasks (31 binaries per word), so
    # there is NO binary-count cap (the reference BnB sizes tree_WS
    # dynamically, bnb.c:23-90; round 4's single-word encoding capped
    # nb < 31)
    NW = (nb + 30) // 31
    lane_pad = (-B) % (_LANE_GUARD if B > _LANE_GUARD else pb.LANES)
    if lane_pad:
        def padded(x, fill):
            pad_block = jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                                         (lane_pad,) + x.shape[1:])
            return jnp.concatenate([x, pad_block], axis=0)
        # pad lanes carry NO BINARY bits: they solve trivially once and
        # are sliced off (lane_is_bin gates branching per lane)
        out = solve_batch_miqp_pallas_jit(
            padded(H, jnp.eye(n)), padded(f, jnp.zeros((n,))),
            padded(A, jnp.zeros((A.shape[1], n))),
            padded(bupper, jnp.ones((m,))),
            padded(blower, -jnp.ones((m,))),
            padded(sense, jnp.zeros((m,), jnp.int32)),
            st, ms=ms, bin_ids=bin_ids, interpret=interpret,
            max_waves=max_waves, deadline=deadline, warm_ws=warm_ws,
            report_kernel_iters=report_kernel_iters)
        return jax.tree_util.tree_map(lambda x: x[:B], out)
    if B > _LANE_GUARD:
        return _lane_chunk_map(
            lambda a: solve_batch_miqp_pallas_jit(
                *a, st=st, ms=ms, bin_ids=bin_ids, interpret=interpret,
                max_waves=max_waves, deadline=deadline, warm_ws=warm_ws,
                report_kernel_iters=report_kernel_iters),
            (H, f, A, bupper, blower, sense), B)

    f32 = jnp.float32
    bin_idx = jnp.asarray(bin_ids, jnp.int32)            # (nb,)
    cap = nb + 2
    BIGF = jnp.asarray(DAQP_INF, f32)

    with jax.default_matmul_precision('high'):
        use_tile = (jax.default_backend() == 'tpu') and not interpret \
            and (H.shape[0] % 128 == 0)
        if use_tile:
            from .ops import chol as chol_ops
            Rinv_b, okl, regl, eps_l = chol_ops.batched_rinv_regularized(
                H.astype(f32), st)
            ldpd = jax.vmap(
                lambda H_, f_, A_, bu_, bl_, se_, R_: transform.build_ldp(
                    H_, f_, A_, bu_, bl_, se_, ms, st, Rinv=R_))(
                H.astype(f32), f.astype(f32), A.astype(f32),
                bupper.astype(f32), blower.astype(f32), sense, Rinv_b)
            err0 = jnp.where(okl & ~regl, ldpd.error, EXIT_NONCONVEX)
        else:
            ldpd = jax.vmap(
                functools.partial(transform.build_ldp, ms=ms, st=st))(
                    H.astype(f32), f.astype(f32), A.astype(f32),
                    bupper.astype(f32), blower.astype(f32), sense)
            err0 = jnp.where(ldpd.n_prox > 0, EXIT_NONCONVEX, ldpd.error)

        vv = jnp.einsum('bk,bk->b', ldpd.v, ldpd.v)
        du0 = ldpd.dupper                                  # (B, m)
        dl0 = ldpd.dlower
        scaling = ldpd.scaling
        immut0 = ((ldpd.sense & IMMUTABLE) > 0)
        eq_act = (ldpd.sense & ACTIVE) > 0                 # pre-equalities
        eq_lo = eq_act & ((ldpd.sense & LOWER) > 0)
        bin_du = jnp.take_along_axis(du0, bin_idx[None, :], 1)  # (B, nb)
        bin_dl = jnp.take_along_axis(dl0, bin_idx[None, :], 1)
        bin_tol = st.primal_tol * jnp.take_along_axis(
            scaling, bin_idx[None, :], 1)
        _HIP = jax.lax.Precision.HIGHEST
        # binary k lives in word k // 31, bit k % 31
        word_of = jnp.arange(nb, dtype=jnp.int32) // 31    # (nb,)
        bit_of = jnp.left_shift(
            jnp.int32(1), jnp.arange(nb, dtype=jnp.int32) % 31)  # (nb,)

        # one-hot bin->row expansion matrix (static): NO bool scatters
        # (v5e miscompiles them at batch >= 1024, see
        # scripts/repro_v5e_bool_scatter.py)
        bin_onehot = (bin_idx[:, None]
                      == jnp.arange(m, dtype=jnp.int32)[None, :]
                      ).astype(f32)                        # (nb, m)
        # lanes may carry no BINARY bit on a shared bin_id row (padding
        # lanes, mixed batches): they never branch on it
        lane_is_bin = (jnp.take_along_axis(
            jnp.asarray(sense, jnp.int32), bin_idx[None, :], 1)
            & BINARY) > 0                                   # (B, nb)

        def bits_to_bin(bits):
            """(B, NW) int32 bitmask words -> (B, nb) bool per binary."""
            return (jnp.take(bits, word_of, axis=1)
                    & bit_of[None, :]) > 0

        def rows_from_bits(bits):
            """(B, NW) int32 bitmask words -> (B, m) bool row mask."""
            kb = bits_to_bin(bits).astype(f32)
            return jnp.einsum('bk,km->bm', kb, bin_onehot,
                              precision=_HIP) > 0.5

        M_l, sc_l = ps.slot_precompute(ldpd.M, scaling)

        # rel/abs suboptimality folding (bnb.c:29-31,68 / bnb.py:191,305),
        # in LDP fval space (2x the QP objective, v'v shift dropped — it is
        # node-independent, same convention as the reference's internal cut)
        eps_r = 1.0 / (1.0 + jnp.asarray(st.rel_subopt, f32))
        abs2 = 2.0 * jnp.asarray(st.abs_subopt, f32)
        bound0 = (2.0 * jnp.asarray(st.fval_bound, f32) - abs2) * eps_r

        def wave(c):
            (k, stack_fx, stack_lo, stack_wu, stack_wl, sp, best_fldp,
             bound_fldp, best_u, best_lam, found, nodes, kit,
             lane_err) = c
            live = (sp > 0) & (lane_err == 0)
            idx = jnp.maximum(sp - 1, 0)
            fx = jnp.take_along_axis(stack_fx, idx[:, None, None],
                                     1)[:, 0]              # (B, NW)
            lo = jnp.take_along_axis(stack_lo, idx[:, None, None],
                                     1)[:, 0]
            # parent working-set replay masks (tree_WS, bnb.c:92-128)
            wu = jnp.take_along_axis(stack_wu, idx[:, None, None],
                                     1)[:, 0]              # (B, m) f32
            wl = jnp.take_along_axis(stack_wl, idx[:, None, None],
                                     1)[:, 0]
            sp = sp - live.astype(jnp.int32)
            nodes = nodes + live.astype(jnp.int32)

            fixed_rows = rows_from_bits(fx) & live[:, None]
            lower_rows = rows_from_bits(fx & lo) & live[:, None]
            du_node = jnp.where(fixed_rows,
                                jnp.where(lower_rows, dl0, du0), du0)
            dl_node = jnp.where(fixed_rows,
                                jnp.where(lower_rows, dl0, du0), dl0)

            # live incumbent bound into the kernel's per-lane dominance
            # cut; slot-space tier (relaxations are hard-only, and the
            # per-wave bulk-activation Cholesky is (B, K, K), not
            # (B, m, m)).  M/scaling transposes hoisted out of the wave
            # loop (slot_precompute).
            s = ps.slot_init_from(M_l, sc_l, du_node, dl_node,
                                  (immut0 | fixed_rows).astype(f32),
                                  n_true=n, fbound_b=bound_fldp)
            mpad = s.dupper.shape[0]
            up_f = (fixed_rows & ~lower_rows) | (eq_act & ~eq_lo)
            lo_f = lower_rows | eq_lo
            # warm_ws=False is the measurement A/B switch (cold nodes,
            # the pre-round-3 behavior)
            warm_free = (~fixed_rows & ~eq_act & live[:, None]) \
                if warm_ws else jnp.zeros_like(fixed_rows)
            up_b = up_f | ((wu > 0.5) & warm_free)
            lo_b = lo_f | ((wl > 0.5) & warm_free & ~(wu > 0.5))
            lane = lambda x: jnp.moveaxis(
                jnp.pad(x, ((0, 0), (0, mpad - m))), 0, -1)
            s0 = s
            s = ps.slot_activate(s0, lane(up_b), lane(lo_b), st)

            def drop_warm(sw):
                # a dependent warm set falls back to fixed+equality-only
                # activation per lane (the reference clears dependent
                # mutable adds, auxiliary.c:446-469); paid only when some
                # lane actually parked
                sf = ps.slot_activate(s0, lane(up_f), lane(lo_f), st)
                parked = sw.status[0] == ps.EXIT_REFACTOR   # (B,)

                def mrg(a, b):
                    pk = parked.reshape((1,) * (a.ndim - 1) + (-1,))
                    return jnp.where(pk, b, a)

                return jax.tree_util.tree_map(mrg, sw, sf)

            s = lax.cond(jnp.any(s.status[0] == ps.EXIT_REFACTOR),
                         drop_warm, lambda sw: sw, s)
            # exhausted / errored lanes turn terminal so their tiles skip
            s = s._replace(status=jnp.where(
                live[None, :], s.status, EXIT_OPTIMAL).astype(jnp.int32))
            s = ps.slot_solve(s, st, n_true=n, steps=64,
                              interpret=interpret, deadline=deadline)

            flag = s.status[0]
            fldp = s.fval[0]
            kit = kit + jnp.where(live, s.iterations[0], 0.0)
            u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]
            viable = live & (flag > 0) & (fldp < bound_fldp)
            hard_fail = live & (flag < 0) & (flag != EXIT_INFEASIBLE) \
                & (flag != EXIT_RUNNING)
            lane_err = jnp.where(hard_fail, flag, lane_err)

            # branch selection over the ORIGINAL relaxation bounds
            mu = jnp.einsum('bmj,bj->bm', ldpd.M, u_b, precision=_HIP)
            mu_bin = jnp.take_along_axis(mu, bin_idx[None, :], 1)
            diff = 0.5 * (bin_du + bin_dl) - mu_bin        # (B, nb)
            dist = 0.5 * (bin_du - bin_dl) - jnp.abs(diff)
            is_fixed = bits_to_bin(fx)
            frac = (~is_fixed) & (dist > bin_tol) & lane_is_bin
            has_branch = jnp.any(frac, axis=1)
            pos = jnp.argmax(frac, axis=1).astype(jnp.int32)
            lower_first = jnp.take_along_axis(diff, pos[:, None],
                                              1)[:, 0] >= 0

            # integer-feasible -> incumbent; the prune bound folds the
            # subopt tolerances (bnb.c:68: bound = (fval - abs)*eps_r)
            take = viable & ~has_branch
            lam_full = jnp.moveaxis(ps.slot_duals_dense(s), -1, 0)[:, :m]
            best_fldp = jnp.where(take, fldp, best_fldp)
            bound_fldp = jnp.where(take, (fldp - abs2) * eps_r, bound_fldp)
            best_u = jnp.where(take[:, None], u_b, best_u)
            best_lam = jnp.where(take[:, None], lam_full, best_lam)
            found = found | take

            # push children: far endpoint first, nearest popped first;
            # both siblings snapshot THIS node's final working set
            # (tree_WS is written once at the branch point, bnb.c:211-222)
            push = viable & has_branch
            snap_u = jnp.moveaxis(s.act_up, -1, 0)[:, :m]    # (B, m) f32
            snap_l = jnp.moveaxis(s.act_lo, -1, 0)[:, :m]
            # per-lane one-hot WORD update of the branched bit
            in_word = (jnp.arange(NW, dtype=jnp.int32)[None, :]
                       == (pos // 31)[:, None])            # (B, NW)
            bitk = jnp.where(push[:, None] & in_word,
                             jnp.left_shift(jnp.int32(1),
                                            pos % 31)[:, None],
                             0).astype(jnp.int32)          # (B, NW)
            z32 = jnp.zeros_like(bitk)
            near_lo = jnp.where(lower_first[:, None], bitk, z32)
            far_lo = jnp.where(lower_first[:, None], z32, bitk)
            slot_iota = jnp.arange(cap)[None, :]
            far_fx, far_side = fx | bitk, lo | far_lo
            near_fx, near_side = fx | bitk, lo | near_lo
            at0 = push[:, None] & (slot_iota == sp[:, None])
            at1 = push[:, None] & (slot_iota == sp[:, None] + 1)
            stack_fx = jnp.where(at0[:, :, None], far_fx[:, None, :],
                                 jnp.where(at1[:, :, None],
                                           near_fx[:, None, :],
                                           stack_fx))
            stack_lo = jnp.where(at0[:, :, None], far_side[:, None, :],
                                 jnp.where(at1[:, :, None],
                                           near_side[:, None, :],
                                           stack_lo))
            at01 = (at0 | at1)[:, :, None]
            stack_wu = jnp.where(at01, snap_u[:, None, :], stack_wu)
            stack_wl = jnp.where(at01, snap_l[:, None, :], stack_wl)
            sp = sp + 2 * push.astype(jnp.int32)
            return (k + 1, stack_fx, stack_lo, stack_wu, stack_wl, sp,
                    best_fldp, bound_fldp, best_u, best_lam, found, nodes,
                    kit, lane_err)

        def cond(c):
            k, sp, lane_err = c[0], c[5], c[-1]
            return (k < max_waves) & jnp.any((sp > 0) & (lane_err == 0))

        zi = jnp.zeros((B, cap, NW), jnp.int32)
        zw = jnp.zeros((B, cap, m), f32)
        c0 = (jnp.zeros((), jnp.int32), zi, zi, zw, zw,
              jnp.where(err0 < 0, 0, 1).astype(jnp.int32),
              jnp.full((B,), BIGF),
              jnp.broadcast_to(bound0, (B,)).astype(f32),
              jnp.zeros((B, n), f32),
              jnp.zeros((B, m), f32), jnp.zeros((B,), bool),
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,), f32),
              jnp.where(err0 < 0, err0, 0).astype(jnp.int32))
        (k, _, _, _, _, sp, best_fldp, _, best_u, best_lam, found, nodes,
         kit, lane_err) = lax.while_loop(cond, wave, c0)

        x = jnp.einsum('bij,bj->bi', ldpd.Rinv, best_u - ldpd.v,
                       precision=_HIP)
        fval = 0.5 * (best_fldp - vv)
        exitflag = jnp.where(
            lane_err < 0, lane_err,
            jnp.where(found,
                      jnp.where(sp > 0, EXIT_ITERLIMIT, EXIT_OPTIMAL),
                      jnp.where(sp > 0, EXIT_ITERLIMIT,
                                EXIT_INFEASIBLE)))
        # report_kernel_iters: measurement aid — ``iterations`` carries
        # the ACCUMULATED KERNEL ITERATIONS across node waves instead of
        # node counts (quantifies the warm-start effect per node)
        return BatchResult(
            x=x, lam=best_lam, fval=fval,
            exitflag=exitflag.astype(jnp.int32),
            iterations=(kit if report_kernel_iters
                        else nodes).astype(jnp.int32),
            soft_slack=jnp.zeros((B,), f32))


@functools.partial(jax.jit, static_argnames=("ms", "bin_ids", "K"))
def solve_batch_miqp_jit(H, f, A, bupper, blower, sense, st: Settings,
                         ms: int = 0, bin_ids: tuple = (), K=None):
    """Batched MIQP: vmap the branch-and-bound solver over independent
    instances sharing the same binary-constraint indices (the BnB-node
    embarrassing parallelism of SURVEY.md §2.3, batched at instance
    granularity).  Returns a ``bnb.BnBOut`` with leading batch dims."""
    from . import bnb

    def one(H, f, A, bu, bl, sense):
        return bnb.bnb_core(H, f, A, bu, bl, sense, ms, st,
                            bin_ids=bin_ids, K=K)

    with jax.default_matmul_precision('highest'):
        return jax.vmap(one)(H, f, A, bupper, blower, sense)


def kkt_residuals(H, f, A, bupper, blower, sense, x, lam, ms: int = 0):
    """Per-lane f64 KKT check of a batched solve (host-side NumPy).

    Returns ``(stationarity, violation)``:
      * stationarity — relative ||H x + f + A' lam||_inf (the dual
        residual the reference's tests assert, core_tests.jl:210);
      * violation   — worst over HARD rows of: relative primal violation,
        AND complementarity/dual-sign violation — min(|lam_i|, slack of
        the side lam_i's sign claims active).  A wrong-working-set point
        can pass stationarity + feasibility while violating
        complementarity (observed before the polish dual re-check), so
        the backstop gate must include it.
    """
    H = np.asarray(H, float)
    f = np.asarray(f, float)
    A = np.asarray(A, float)
    bu = np.asarray(bupper, float)
    bl = np.asarray(blower, float)
    x = np.asarray(x, float)
    lam = np.asarray(lam, float)
    B, n = x.shape
    m = bu.shape[-1]
    sense = (np.zeros((B, m), np.int32) if sense is None
             else np.asarray(sense))

    grad = np.einsum('bij,bj->bi', H, x) + f
    if ms:
        grad[:, :ms] += lam[:, :ms]
    if A.shape[1]:
        grad += np.einsum('bri,br->bi', A, lam[:, ms:])
    denom = (np.abs(H).sum(-1).max(-1) * np.maximum(np.abs(x).max(-1), 1)
             + np.abs(f).max(-1) + 1.0)
    stat = np.abs(grad).max(-1) / denom

    vals = np.concatenate(
        [x[:, :ms], np.einsum('brj,bj->br', A, x)], axis=1) \
        if ms else np.einsum('brj,bj->br', A, x)
    bscale = 1.0 + np.maximum(np.abs(np.where(bu >= DAQP_INF, 0, bu)),
                              np.abs(np.where(bl <= -DAQP_INF, 0, bl)))
    viol = np.maximum(vals - bu, bl - vals) / bscale
    from .types import SOFT
    hard = (sense & SOFT) == 0
    # complementarity: lam_i > 0 claims the UPPER side active (slack
    # bu - a'x ~ 0), lam_i < 0 the LOWER side; min(|lam|, claimed slack)
    # must vanish.  Normalized by the dual scale so it composes with the
    # same kkt_tol gate.
    lscale = 1.0 + np.abs(lam).max(-1, keepdims=True)
    slack_claim = np.where(lam > 0, bu - vals, vals - bl)
    slack_claim = np.minimum(np.abs(slack_claim) / bscale,
                             np.abs(lam) / lscale)
    comp = np.where(hard, slack_claim, 0.0)
    viol = np.maximum(np.where(hard, viol, -np.inf), comp).max(-1)
    return stat, viol


def backstop_resolve_lp(res: BatchResult, f, A, bupper, blower,
                        sense=None, ms: int = 0,
                        settings: Optional[dict] = None) -> BatchResult:
    """LP analogue of ``backstop_resolve``: lanes whose exit flag is
    non-optimal (or non-finite x) are re-solved through the f64
    single-instance ``linprog`` (full adaptive-eps + cleanup semantics).
    Exit flags identify exactly the lanes that need escalation."""
    import daqp_tpu as _pkg
    from .types import EXIT_OPTIMAL, EXIT_UNBOUNDED

    flags = np.asarray(res.exitflag)
    x = np.array(np.asarray(res.x, float))
    lam = np.array(np.asarray(res.lam, float))
    fv = np.array(np.asarray(res.fval, float))
    bad = (flags != EXIT_OPTIMAL) & (flags != EXIT_UNBOUNDED)
    bad |= ~np.isfinite(x).all(axis=-1)
    if not bad.any():
        return res
    fn = np.asarray(f, float)
    An = np.asarray(A, float)
    bun = np.asarray(bupper, float)
    bln = np.asarray(blower, float)
    B = flags.shape[0]
    m = bun.shape[-1]
    sense_arr = (np.zeros((B, m), np.int32) if sense is None
                 else np.asarray(sense))
    flags2 = np.array(flags)
    for b in np.where(bad)[0]:
        one = _pkg.linprog(fn[b], An[b], bun[b], bln[b],
                           np.array(sense_arr[b]), ms=ms,
                           settings=settings)
        fl = int(one.exitflag)
        if fl == EXIT_OPTIMAL:
            x[b] = np.asarray(one.x, float)
            lam[b] = np.asarray(one.lam, float)
            fv[b] = float(one.fval)
        flags2[b] = fl
    return res._replace(x=jnp.asarray(x), lam=jnp.asarray(lam),
                        fval=jnp.asarray(fv),
                        exitflag=jnp.asarray(flags2, jnp.int32))


def backstop_resolve_avi(res: BatchResult, H, f, A, bupper, blower,
                         sense=None, ms: int = 0,
                         settings: Optional[dict] = None) -> BatchResult:
    """AVI analogue of ``backstop_resolve``: lanes whose exit flag is
    non-optimal (or non-finite x) are re-solved through the f64
    single-instance ``daqp_tpu.avi`` (DR splitting + exact-KKT
    acceleration + Newton revert) — completing the loud-failure
    escalation ladder for the batched AVI tier (its large-shape f32
    edge leaves a few percent of lanes loud, see
    scripts/fused_parity_sweep.py)."""
    import daqp_tpu as _pkg
    from .types import EXIT_OPTIMAL

    flags = np.asarray(res.exitflag)
    x = np.array(np.asarray(res.x, float))
    lam = np.array(np.asarray(res.lam, float))
    fv = np.array(np.asarray(res.fval, float))
    bad = flags != EXIT_OPTIMAL
    bad |= ~np.isfinite(x).all(axis=-1)
    if not bad.any():
        return res
    Hn = np.asarray(H, float)
    fn = np.asarray(f, float)
    An = np.asarray(A, float)
    bun = np.asarray(bupper, float)
    bln = np.asarray(blower, float)
    B = flags.shape[0]
    m = bun.shape[-1]
    sense_arr = (np.zeros((B, m), np.int32) if sense is None
                 else np.asarray(sense))
    flags2 = np.array(flags)
    for b in np.where(bad)[0]:
        one = _pkg.avi(Hn[b], fn[b], An[b], bun[b], bln[b],
                       np.array(sense_arr[b]), ms=ms,
                       settings=settings)
        fl = int(one.exitflag)
        if fl == EXIT_OPTIMAL:
            x[b] = np.asarray(one.x, float)
            lam[b] = np.asarray(one.lam, float)
            fv[b] = float(one.fval)
        flags2[b] = fl
    return res._replace(x=jnp.asarray(x), lam=jnp.asarray(lam),
                        fval=jnp.asarray(fv),
                        exitflag=jnp.asarray(flags2, jnp.int32))


def backstop_resolve_hiqp(res: BatchResult, H, f, A, bupper, blower,
                          sense=None, ms: int = 0,
                          break_points: tuple = (),
                          settings: Optional[dict] = None
                          ) -> BatchResult:
    """Hierarchical analogue of ``backstop_resolve``: lanes whose exit
    flag is NEGATIVE (iteration limit / numerical failure — the loud
    DOF exit 3 is a semantic outcome, not a failure) re-solve through
    the f64 single-instance lexicographic walk (``hiqp_core`` via the
    public dispatch)."""
    import daqp_tpu as _pkg

    flags = np.asarray(res.exitflag)
    x = np.array(np.asarray(res.x, float))
    lam = np.array(np.asarray(res.lam, float))
    fv = np.array(np.asarray(res.fval, float))
    bad = flags < 0
    bad |= ~np.isfinite(x).all(axis=-1)
    if not bad.any():
        return res
    fn = np.asarray(f, float) if f is not None else None
    Hn = np.asarray(H, float) if H is not None else None
    An = np.asarray(A, float)
    bun = np.asarray(bupper, float)
    bln = np.asarray(blower, float)
    B = flags.shape[0]
    m = bun.shape[-1]
    sense_arr = (np.zeros((B, m), np.int32) if sense is None
                 else np.asarray(sense))
    flags2 = np.array(flags)
    for b in np.where(bad)[0]:
        one = _pkg.quadprog(
            None if Hn is None else Hn[b],
            np.zeros(An.shape[-1]) if fn is None else fn[b],
            An[b], bun[b], bln[b], np.array(sense_arr[b]), ms=ms,
            break_points=break_points, settings=settings)
        fl = int(one.exitflag)
        if fl > 0:
            x[b] = np.asarray(one.x, float)
            lam[b] = np.asarray(one.lam, float)
            fv[b] = float(one.fval)
        flags2[b] = fl
    return res._replace(x=jnp.asarray(x), lam=jnp.asarray(lam),
                        fval=jnp.asarray(fv),
                        exitflag=jnp.asarray(flags2, jnp.int32))


def backstop_resolve(res: BatchResult, H, f, A, bupper, blower, sense=None,
                     ms: int = 0, settings: Optional[dict] = None,
                     kkt_tol: float = 1e-4, sw=None) -> BatchResult:
    """f32 outlier backstop: re-solve the lanes whose exit flag is
    non-optimal or whose f64 KKT residual exceeds ``kkt_tol`` through the
    f64 NumPy oracle (the loop-based executable spec with full reference
    semantics).  Exit flags identify exactly the lanes that need
    escalation; on well-conditioned batches this is a no-op.

    Lanes carrying BINARY bits are left untouched (the oracle has no
    BnB).  If the batch was solved with SOFT_WEIGHTS slack data, pass the
    same ``sw`` here: the oracle has no SW semantics, so those lanes are
    escalated through the f64 SINGLE-INSTANCE solver instead (which has
    full SW support) rather than silently re-solved as plain-soft.
    Returns a new ``BatchResult`` with the repaired lanes substituted.
    """
    from oracle import daqp_numpy as oracle
    from .types import (BINARY, EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL)

    flags = np.asarray(res.exitflag)
    x = np.asarray(res.x, float)
    lam = np.asarray(res.lam, float)
    B = flags.shape[0]
    m = np.asarray(bupper).shape[-1]
    sense_arr = (np.zeros((B, m), np.int32) if sense is None
                 else np.asarray(sense))

    stat, viol = kkt_residuals(H, f, A, bupper, blower, sense_arr, x, lam,
                               ms=ms)
    bad = (~np.isin(flags, (EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL))
           | (stat > kkt_tol) | (viol > kkt_tol))
    bad &= ~np.any(sense_arr & BINARY, axis=-1)
    if not bad.any():
        return res

    st = dict(settings) if isinstance(settings, dict) else {}
    if settings is not None and not isinstance(settings, dict):
        st = settings._asdict()
    # f64 oracle settings: reference defaults, not the f32 relaxations
    for k in ('primal_tol', 'dual_tol', 'zero_tol', 'pivot_tol',
              'progress_tol', 'sing_tol'):
        st.pop(k, None)

    Hn = np.asarray(H, float)
    fn = np.asarray(f, float)
    An = np.asarray(A, float)
    bun = np.asarray(bupper, float)
    bln = np.asarray(blower, float)
    xs, lams = np.array(x), np.array(lam)
    fvals = np.array(np.asarray(res.fval, float))
    flags2 = np.array(flags)
    for b in np.where(bad)[0]:
        if sw is not None and np.any(sense_arr[b] & 8):
            # SW lanes: the oracle has no slack-bound semantics — use
            # the f64 single-instance solver (full SW support)
            import daqp_tpu as _pkg
            one = _pkg.quadprog(
                Hn[b], fn[b], An[b], bun[b], bln[b],
                np.array(sense_arr[b]), ms=ms, settings=st or None,
                soft_weights={'d_ls': np.asarray(sw.d_ls, float)[b],
                              'd_us': np.asarray(sw.d_us, float)[b],
                              'rho_ls': np.asarray(sw.rho_ls, float)[b],
                              'rho_us': np.asarray(sw.rho_us, float)[b]})
            fl = int(one.exitflag)
            if fl in (EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL):
                xs[b] = np.asarray(one.x, float)
                lams[b] = np.asarray(one.lam, float)
                fvals[b] = float(one.fval)
            flags2[b] = fl
            continue
        out = oracle.quadprog(Hn[b], fn[b], An[b], bun[b], bln[b],
                              sense=np.array(sense_arr[b]), ms=ms,
                              settings=st)
        if out['exitflag'] in (EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL):
            xs[b] = out['x']
            lams[b] = out['lam']
            fvals[b] = out['fval']
        flags2[b] = out['exitflag']
    dtype = res.x.dtype
    return res._replace(
        x=jnp.asarray(xs, dtype), lam=jnp.asarray(lams, dtype),
        fval=jnp.asarray(fvals, dtype),
        exitflag=jnp.asarray(flags2, jnp.int32))


def solve_batch(H, f, A, bupper, blower, sense=None, ms: int = 0,
                settings: Optional[Settings] = None,
                soft_weights=None) -> BatchResult:
    """Convenience wrapper: batched dense strictly-convex QP solve on the
    flat (slot-table) hot path.

    ``soft_weights``: optional SOFT_WEIGHTS slack data — a ``SoftWeights``
    with (B, m) fields or a dict of them (same keys as the single-
    instance ``solve``; auxiliary.c:199-274 semantics on the batched
    tier).

    The Pallas VMEM kernel (``solve_batch_pallas_jit``) is 10-30x faster
    at steady state but is deliberately NOT the convenience default: a
    Mosaic compile for a NEW (n, m) shape takes 15+ minutes on this
    toolchain (measured), which is hostile as a first-call surprise;
    throughput users opt in explicitly (bench.py does).  The working-set
    capacity is sized K = n + max_ns + 1 over the batch (the reference
    allocates n + ns + 1 per instance, api.c:288-305): with soft
    constraints the active set can legally exceed n + 1."""
    H = jnp.asarray(H)
    B = H.shape[0]
    m = jnp.asarray(bupper).shape[-1]
    n = jnp.asarray(A).shape[-1]
    dtype = H.dtype
    if sense is None:
        sense = jnp.zeros((B, m), jnp.int32)
        max_ns = 0
    else:
        from .types import SOFT
        max_ns = int(np.max(np.sum(
            (np.asarray(sense) & SOFT) > 0, axis=-1), initial=0))
    if settings is None:
        from .api import _as_settings
        settings = _as_settings(None, dtype)
    # wall-clock limit: absolute deadline computed host-side at entry
    # (daqp.c:95-103 analogue; checked at chunk granularity)
    deadline = None
    if float(settings.time_limit) > 0:
        import time
        deadline = jnp.asarray(time.perf_counter()
                               + float(settings.time_limit), jnp.float64)
    sw = None
    if soft_weights is not None:
        from .types import SoftWeights
        if isinstance(soft_weights, dict):
            zm = jnp.zeros((B, int(m)), dtype)
            rm_ = jnp.full((B, int(m)), float(settings.rho_soft), dtype)
            sw = SoftWeights(
                d_ls=jnp.asarray(soft_weights.get('d_ls', zm), dtype),
                d_us=jnp.asarray(soft_weights.get('d_us', zm), dtype),
                rho_ls=jnp.asarray(soft_weights.get('rho_ls', rm_), dtype),
                rho_us=jnp.asarray(soft_weights.get('rho_us', rm_),
                                   dtype))
        else:
            sw = SoftWeights(*(jnp.asarray(v, dtype)
                               for v in soft_weights))
    return solve_batch_flat_jit(H, jnp.asarray(f), jnp.asarray(A),
                                jnp.asarray(bupper), jnp.asarray(blower),
                                jnp.asarray(sense), settings, ms=ms,
                                K=int(n) + max_ns + 1, deadline=deadline,
                                sw=sw)
