"""Batch-parallel Cholesky + triangular inverse, lanes-last.

XLA's cholesky HLO lowers to a blocked, per-matrix-sequential algorithm;
for (B, n, n) batches of SMALL matrices it is the single most expensive
op in the batched QP pipeline (measured 38 ms of a 69 ms solve for
B=1024, n=50 on v5e — more than the whole active-set kernel).  Here the
batch is the minor (lane) dimension and the factorization runs as n
sequential steps of (n, B)-wide vector ops — the classic right-looking
algorithm with the parallelism where the hardware wants it.

Returns Rinv = R^{-1} (upper, H = R'R), i.e. exactly what the QP->LDP
transform consumes (reference ``daqp_update_Rinv``, utils.c:137-297,
which also fuses factorization and inversion).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _chol_kernel(n: int, H_ref, R_ref, Hc, Ls):
    """Right-looking Cholesky + forward-substitution inverse for one
    128-lane tile.  All working matrices live in VMEM scratch refs and
    the j/i loops are UNROLLED (n is static), so every slice is static
    and shrinks with j.  MEASURED: 34 ms per (1024, 50, 50) batch on v5e
    vs 38 ms for the XLA expander — Mosaic has a per-step cost floor
    (~40 us) that ~2n small dependent steps cannot amortize, unlike the
    active-set kernel whose steps carry ~10x more work.  Accuracy f32-
    exact (4e-7); kept for documentation and larger-n regimes."""
    # Mosaic restrictions: ref slices on the second-minor dim must be
    # 8-aligned -> all partial slicing is on dim 0 (arbitrary offsets
    # allowed) and column access goes through one-hot contractions; the
    # one-hots are built from iota comparisons (captured numpy constants
    # are rejected by pallas_call).  Hc stays symmetric throughout, so
    # "column j" == "row j".
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    f32 = jnp.float32
    iota_r = lax.broadcasted_iota(jnp.int32, (n, 1), 0)     # (n, 1)
    iota_c3 = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)  # (1, n, 1)
    # input stays in HBM (ANY); DMA the lane slice straight into scratch
    L_SZ = Hc.shape[-1]
    g = pl.program_id(0)
    idx = (slice(None), slice(None),
           pl.ds(pl.multiple_of(g * L_SZ, L_SZ), L_SZ))

    def load(sem):
        cp = pltpu.make_async_copy(H_ref.at[idx], Hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    for j in range(n):                       # static unroll
        row_j = Hc[j:j + 1][0]               # (n, L): col j by symmetry
        oh = (iota_r == j).astype(f32)
        piv = jnp.sqrt(jnp.maximum(
            jnp.sum(row_j * oh, axis=0, keepdims=True), 1e-30))
        mask = (iota_r >= j).astype(f32)
        coln = row_j / piv * mask            # (n, L)
        Ls[j:j + 1] = coln[None]             # row j of L' (= column of L)
        if j + 1 < n:
            cj = coln[j + 1:]
            Hc[j + 1:] = Hc[j + 1:] - cj[:, None, :] * coln[None, :, :]

    Xs = Hc                                  # Hc is dead: reuse as X
    for i in range(n):                       # static unroll
        # L[i, k] = Ls[k, i]: select column i of the row-block Ls[:i]
        oh3 = (iota_c3 == i).astype(f32)     # (1, n, 1)
        Lii = jnp.sum(Ls[i:i + 1][0] * oh3[0], axis=0,
                      keepdims=True)         # (1, L)
        if i == 0:
            acc = jnp.zeros_like(Ls[0:1][0])
        else:
            li = jnp.sum(Ls[:i] * oh3, axis=1)   # (i, L)
            acc = jnp.sum(li[:, None, :] * Xs[:i], axis=0)
        ei = (iota_r == i).astype(f32)       # (n, 1)
        Xs[i:i + 1] = ((ei - acc) / Lii)[None]

    R_ref[:] = jnp.swapaxes(Xs[:], 0, 1)     # Rinv = (L^{-1})'


def batched_invsqrt(H_bnn: jnp.ndarray, iters: int = 14) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) symmetric S = H^{-1/2} by the coupled
    Newton-Schulz (Denman-Beavers) iteration — batched GEMMs only.

    The LDP transform needs SOME factor H = R'R, not a triangular one
    (M = A R^{-1} is consumed by generic matmuls and row-normalized
    afterwards); with S symmetric, R = S^{-1} satisfies R'R = (S^2)^{-1}
    = H.  That frees the factorization from sequential substitution
    entirely.  MEASURED (v5e, B=1024, n=50): full-HIGHEST NS 63 ms —
    slower than the 38 ms XLA Cholesky expander (batched 50x50 matmuls
    underutilize the MXU: ~0.5 TFLOP/s effective); mixed bf16/HIGHEST is
    35 ms but the coupled iteration is NOT self-correcting and bf16 drift
    destroys accuracy.  Kept as the record of the experiment and for
    future larger-n use where the GEMMs amortize; the production
    transform uses the XLA Cholesky.
    """
    B, n, _ = H_bnn.shape
    dtype = H_bnn.dtype
    hi = lax.Precision.HIGHEST
    I = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))
    # scale into the NS convergence basin: ||I - H/c|| < 1
    c = jnp.sum(H_bnn * H_bnn, axis=(1, 2), keepdims=True) ** 0.5
    Y = H_bnn / c
    Z = I

    def make_step(prec):
        def step(_, carry):
            Y, Z = carry
            T = 1.5 * I - 0.5 * jnp.einsum('bij,bjk->bik', Z, Y,
                                           precision=prec)
            Y = jnp.einsum('bij,bjk->bik', Y, T, precision=prec)
            Z = jnp.einsum('bij,bjk->bik', T, Z, precision=prec)
            return Y, Z
        return step

    # All iterations at HIGHEST: the coupled DB iteration tracks an
    # invariant (Y Z = Z Y = sqrt-pair of H/c) that bf16 drift breaks —
    # measured 6e-2 relative error with mixed precision vs 2e-6 here.
    Y, Z = lax.fori_loop(0, iters, make_step(hi), (Y, Z))
    # Z -> (H/c)^{-1/2}  =>  H^{-1/2} = Z / sqrt(c)
    return Z / jnp.sqrt(c)


def batched_chol_rinv_pallas(H_bnn: jnp.ndarray,
                             interpret: bool = False,
                             lanes: int = 256) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) Rinv via the Pallas tile kernel.
    B must be a multiple of ``lanes``.  MEASURED: 128 and 256 lanes both
    ~33 ms per (1024, 50, 50) batch — the cost is thin-row-block VPU
    underutilization (~40 GB/s effective on (k, n, L) updates), not
    per-step overhead, so wider tiles do not help."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = H_bnn.shape
    LANES = min(lanes, B)
    assert B % LANES == 0, B
    n0 = n
    pad = (-n) % 8
    if pad:
        # DMA tiling needs 8-aligned dims; pad with an identity block
        # (decoupled: off-diagonal zeros), slice the result back
        H_bnn = jnp.pad(H_bnn, ((0, 0), (0, pad), (0, pad)))
        eye_pad = jnp.pad(jnp.zeros((n, n), H_bnn.dtype),
                          ((0, pad), (0, pad)),
                          constant_values=0) \
            + jnp.diag(jnp.concatenate([jnp.zeros((n,), H_bnn.dtype),
                                        jnp.ones((pad,), H_bnn.dtype)]))
        H_bnn = H_bnn + eye_pad[None]
        n = n + pad
    Hl = jnp.moveaxis(H_bnn, 0, -1)                  # (n, n, B)
    grid = (B // LANES,)
    spec = pl.BlockSpec((n, n, LANES), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [pltpu.VMEM((n, n, LANES), Hl.dtype) for _ in range(2)]
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n),
        grid=grid, in_specs=[any_spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(Hl.shape, Hl.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(Hl)
    return jnp.moveaxis(out, -1, 0)[:, :n0, :n0]


def _tile_chol_kernel(n: int, tiny: float, H_ref, X_ref, Hc):
    """In-place Cholesky + triangular inversion for SUB*128 lanes, laid out
    so every matrix element is a NATIVE (SUB, 128) tile.

    Layout (n, n, SUB, 128): dims 0/1 are *major* (untiled) so every
    slice/step below is whole-tile work and every broadcast is a major-dim
    broadcast — no sublane broadcasts, no layout shuffles.  This is the
    fix for the round-1 kernel's 40 GB/s effective VMEM bandwidth: the
    (n, n, L) lanes-last layout made each rank-1 update a (k, 1, L) ->
    (k, n, L) SUBLANE broadcast, which Mosaic lowers to shuffles.

    Phase 1: right-looking in-place Cholesky, L overwrites the lower
    triangle, the strictly-upper triangle is zeroed as it dies.
    Phase 2: in-place row-wise forward substitution X = L^{-1} (row i
    consumes L[i, :i] *before* overwriting it, and X rows < i already
    computed in place).  The caller transposes majors to get
    Rinv = (L^{-1})' (H = R'R with R = L').
    Reference semantics: ``daqp_update_Rinv`` (utils.c:137-297), which
    also fuses factorization and inversion.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    SUB = Hc.shape[2]
    idx = (slice(None), slice(None),
           pl.ds(pl.multiple_of(g * SUB, SUB), SUB), slice(None))

    def load(sem):
        cp = pltpu.make_async_copy(H_ref.at[idx], Hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    one = jnp.asarray(1.0, Hc.dtype)
    eps = jnp.asarray(tiny, Hc.dtype)
    # --- phase 1: in-place Cholesky (static unroll, shrinking slices) ---
    for j in range(n):
        piv = jnp.sqrt(jnp.maximum(Hc[j, j], eps))
        Hc[j, j] = piv
        if j + 1 < n:
            col = Hc[j + 1:, j] / piv[None]          # (k, SUB, 128)
            Hc[j + 1:, j] = col
            # trailing symmetric Schur update: (k,1,S,128)*(1,k,S,128)
            Hc[j + 1:, j + 1:] = Hc[j + 1:, j + 1:] \
                - col[:, None] * col[None, :]
            Hc[j, j + 1:] = jnp.zeros_like(col)      # upper dies -> 0
    # --- phase 2: in-place X = L^{-1} (row-wise, top-down) ---
    for i in range(n):
        inv = one / Hc[i, i]
        if i:
            acc = jnp.sum(Hc[i, :i][:, None] * Hc[:i, :i], axis=0)
            Hc[i, :i] = -inv[None] * acc
        Hc[i, i] = inv

    def store(sem):
        cp = pltpu.make_async_copy(Hc, X_ref.at[idx], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(store, pltpu.SemaphoreType.DMA(()))


def _tile_chol_kernel_loop(n: int, tiny: float, H_ref, X_ref, Hc):
    """fori_loop variant of ``_tile_chol_kernel``: same math, but every
    step has STATIC shapes (full-array masked updates, dynamic slices only
    on the untiled major dims) so Mosaic compiles ONE loop body instead of
    ~2n distinct-shape statement groups.  The unrolled variant pays a
    per-statement cost floor (measured 34 ms / 1024 lanes, barely beating
    the 40 ms XLA expander, with a 380 s compile); the active-set kernel
    shows static-shape loop bodies run at ~5 ns per (8,128) tile-op.
    The masked formulation does ~3x the arithmetic of the shrinking-slice
    form — a good trade against a ~100x per-statement penalty.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    SUB = Hc.shape[2]
    idx = (slice(None), slice(None),
           pl.ds(pl.multiple_of(g * SUB, SUB), SUB), slice(None))

    def load(sem):
        cp = pltpu.make_async_copy(H_ref.at[idx], Hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    one = jnp.asarray(1.0, Hc.dtype)
    eps = jnp.asarray(tiny, Hc.dtype)
    row4 = lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0)
    col4 = lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
    # CH=8 is a measured PRODUCTION optimum, not a guess: CH=16 (with a
    # 26 MB scoped-vmem raise to fit its larger chunk temporaries) is
    # 11% faster in a standalone micro-bench (7.35 vs 8.28 ms/1024) but
    # drops the FULL pipeline from 41.6k to 24-25k solves/s — the bigger
    # VMEM stack interacts with the whole module's scheduling.  Chunk-
    # skipping (pl.when on sub-pivot chunks / lax.cond on reduce chunks)
    # is traffic-neutral in practice: measured no standalone gain and the
    # same full-pipeline regression.  Benchmark bench.py, not the kernel
    # alone, before touching this.
    CH = 8                                   # row chunk for RMW passes
    nch = -(-n // CH)

    # --- phase 1: in-place Cholesky, masked full-width steps ---
    def chol_step(j, _):
        piv = jnp.sqrt(jnp.maximum(Hc[pl.ds(j, 1), pl.ds(j, 1)], eps))
        colfull = Hc[:, pl.ds(j, 1)]                     # (n,1,S,128)
        col = jnp.where(row4 > j, colfull / piv, 0.0)
        Hc[:, pl.ds(j, 1)] = jnp.where(row4 == j, piv, col)
        colt = col.reshape(1, n, SUB, 128)               # free: metadata
        for c in range(nch):                             # chunked RMW
            r0, r1 = c * CH, min(n, (c + 1) * CH)
            Hc[r0:r1] = Hc[r0:r1] - col[r0:r1] * colt
        return 0

    lax.fori_loop(0, n, chol_step, 0)
    # zero the strictly-upper garbage once (phase 2 reads full rows)
    for c in range(nch):
        r0, r1 = c * CH, min(n, (c + 1) * CH)
        Hc[r0:r1] = jnp.where(row4[r0:r1] >= col4, Hc[r0:r1], 0.0)

    # --- phase 2: in-place X = L^{-1}, masked full-width rows ---
    def inv_step(i, _):
        inv = one / Hc[pl.ds(i, 1), pl.ds(i, 1)]         # (1,1,S,128)
        Lrow = Hc[pl.ds(i, 1), :]                        # (1,n,S,128)
        Lrow_m = jnp.where(col4 < i, Lrow, 0.0)
        LrowT = Lrow_m.reshape(n, 1, SUB, 128)           # free: metadata
        acc = jnp.zeros((n, SUB, 128), Hc.dtype)
        for c in range(nch):                             # chunked reduce
            r0, r1 = c * CH, min(n, (c + 1) * CH)
            acc = acc + jnp.sum(LrowT[r0:r1] * Hc[r0:r1], axis=0)
        row_new = jnp.where(row4[:, 0] == i, inv[0], -inv[0] * acc)
        Hc[pl.ds(i, 1), :] = row_new.reshape(1, n, SUB, 128)
        return 0

    lax.fori_loop(0, n, inv_step, 0)

    def store(sem):
        cp = pltpu.make_async_copy(Hc, X_ref.at[idx], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(store, pltpu.SemaphoreType.DMA(()))


def _tile_chol_kernel_blk(n: int, nch: int, tiny: float, H_ref, X_ref, Hc):
    """Blocked (panel-8) variant of ``_tile_chol_kernel_loop``: same
    math and layout, ~8x fewer full-buffer passes.

    The rank-1 kernel reads+writes the whole (n, n, SUB, 128) buffer at
    every pivot (~3 passes x n pivots) and runs at ~5% VPU utilization —
    the cost is buffer traffic and per-step floors, not arithmetic.
    Blocking by a panel of PB = 8 pivots:

      phase 1 per block: factor the 8-column panel with 8 micro-steps
      that touch only (n, <=8) slices, then apply the rank-8 Schur
      downdate to the trailing matrix in ONE chunked read-modify-write
      pass (8 fused FMAs per element);
      phase 2 per block: accumulate the off-block substitution
      sum_{k<i0} L[i,k] X[k,:] for all 8 rows in ONE chunked pass over
      the finished X rows, then solve the 8x8 lower-triangular block
      sequentially on (n,)-row values (micro work).

    Both dims 0/1 of the tile layout are MAJOR (untiled), so panel
    slices at dynamic offsets are legal on either dim — none of the
    one-hot extraction passes the dense-mask kernel needs.
    MEASURED (v5e, B=1024, n=50->56 padded): see profile_stages.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    SUB = Hc.shape[2]
    PB = 8
    assert n % PB == 0
    CH = n // nch
    idx = (slice(None), slice(None),
           pl.ds(pl.multiple_of(g * SUB, SUB), SUB), slice(None))

    def load(sem):
        cp = pltpu.make_async_copy(H_ref.at[idx], Hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    f = Hc.dtype
    one = jnp.asarray(1.0, f)
    eps = jnp.asarray(tiny, f)
    iota_r = lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
    iota_p = lax.broadcasted_iota(jnp.int32, (1, PB, 1, 1), 1)

    # --- phase 1: blocked right-looking Cholesky ---
    def chol_blk(jb, _):
        j0 = jb * PB
        # factor the panel: micro-steps touch only (n, <=PB) slices
        for t in range(PB):
            j = j0 + t
            piv = jnp.sqrt(jnp.maximum(
                Hc[pl.ds(j, 1), pl.ds(j, 1)][0, 0], eps))    # (SUB, 128)
            colfull = Hc[:, pl.ds(j, 1)][:, 0]               # (n, SUB, 128)
            col = jnp.where(iota_r[:, 0] > j, colfull / piv, 0.0)
            Hc[:, pl.ds(j, 1)] = \
                (col + (iota_r[:, 0] == j).astype(f) * piv)[:, None]
            if t + 1 < PB:
                # downdate the REMAINING panel columns only; the panel
                # rows of the finished column are re-read from the ref
                # (dims 0/1 are major: dynamic ref offsets are legal,
                # dynamic_slice on VALUES is not lowerable in Mosaic)
                rest = Hc[:, pl.ds(j + 1, PB - 1 - t)]       # (n, r, S, 128)
                cpan = Hc[pl.ds(j + 1, PB - 1 - t), pl.ds(j, 1)][:, 0]
                Hc[:, pl.ds(j + 1, PB - 1 - t)] = \
                    rest - col[:, None] * cpan[None]
        # one rank-PB trailing downdate (cols >= j0 + PB only)
        pan = Hc[:, pl.ds(j0, PB)]                           # (n, PB, S, 128)
        pan = pan * (iota_r > (j0 + iota_p)).astype(f)       # strictly-below
        cmask = (iota_c[0] >= j0 + PB).astype(f)             # (n, 1, 1)
        for c in range(nch):
            r0 = c * CH
            blk = Hc[r0:r0 + CH]
            for t in range(PB):
                blk = blk - pan[r0:r0 + CH, t][:, None] \
                    * (pan[:, t] * cmask)[None]
            Hc[r0:r0 + CH] = blk
        return 0

    lax.fori_loop(0, n // PB, chol_blk, 0)
    # zero the strictly-upper garbage once (phase 2 reads full rows)
    for c in range(nch):
        r0 = c * CH
        Hc[r0:r0 + CH] = jnp.where(iota_r[r0:r0 + CH] >= iota_c,
                                   Hc[r0:r0 + CH], 0.0)

    # --- phase 2: blocked in-place X = L^{-1} ---
    iota_ch = lax.broadcasted_iota(jnp.int32, (1, CH, 1, 1), 1)

    def inv_blk(ib, _):
        i0 = ib * PB
        P = Hc[pl.ds(i0, PB)]                # (PB, n, S, 128) L-rows
        # off-block substitution in one chunked pass over finished X rows
        acc = jnp.zeros((PB, n, SUB, 128), f)
        for c in range(nch):
            r0 = c * CH
            Xc = Hc[r0:r0 + CH]              # (CH, n, S, 128)
            C = P[:, r0:r0 + CH] * ((r0 + iota_ch) < i0).astype(f)
            for t in range(CH):
                acc = acc + C[:, t][:, None] * Xc[t][None]
        # within-block sequential solve on (n,)-row values; the diagonal
        # block is re-read from the ref (P is a value: no dynamic_slice)
        Pb = Hc[pl.ds(i0, PB), pl.ds(i0, PB)]         # (PB, PB, S, 128)
        rows = []
        for t in range(PB):
            i = i0 + t
            inv = one / Pb[t, t]                      # (S, 128)
            r = acc[t]
            for s in range(t):
                r = r + Pb[t, s][None] * rows[s]
            row_new = jnp.where(iota_c[0] == i, inv[None],
                                -inv[None] * r)
            rows.append(jnp.where(iota_c[0] > i, 0.0, row_new))
        Hc[pl.ds(i0, PB)] = jnp.stack(rows, axis=0)
        return 0

    lax.fori_loop(0, n // PB, inv_blk, 0)

    def store(sem):
        cp = pltpu.make_async_copy(Hc, X_ref.at[idx], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(store, pltpu.SemaphoreType.DMA(()))


def _chol_kernel_dense(n: int, nch: int, tiny: float, H_ref, X_ref, Hc):
    """Dense-mask lanes-last Cholesky + in-place triangular inversion:
    the formulation that finally beats the XLA expander.

    Exactly the idiom of the (fast) active-set kernel
    (``pallas_batch._kernel_body``): state (n, n, L) lanes-last in VMEM
    scratch, a ``fori_loop`` whose body has only STATIC shapes, one-hot
    masks for every j-dependent selection, and row-chunked
    read-modify-write passes.  Each step does 3 full passes over the
    (n, n, L) buffer (~3x the arithmetic of shrinking slices) — the
    winning trade, because the alternatives are far worse:
      * fully-unrolled shrinking slices: ~100 distinct-shape statement
        groups, a per-statement cost floor -> 34 ms / 1024 lanes and a
        380 s Mosaic compile (``_tile_chol_kernel``);
      * fori_loop + dynamic slices on untiled dims: compile time explodes
        with n (n=8: 86 s, n=16: >300 s) (``_tile_chol_kernel_loop``);
      * XLA cholesky + triangular_solve expanders: 38-40 ms.

    Phase 1 step j: extract column j by one-hot contraction, form the
    scaled Cholesky column, then one fused RMW pass applies the Schur
    rank-one downdate AND writes column j (the column-j write masks out
    the downdate there, and the masked column is zero at row <= j so the
    downdate never touches written columns).
    Phase 2 step i: extract row i (one-hot over the major dim), masked
    accumulate acc[c] = sum_k L[i, k<i] X[k, c], write row i of
    X = L^{-1} in place.  Upper-triangle garbage is masked dead by the
    k<i row mask — X rows are written full-width with explicit zeros.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    L_SZ = Hc.shape[-1]
    CH = n // nch
    idx = (slice(None), slice(None),
           pl.ds(pl.multiple_of(g * L_SZ, L_SZ), L_SZ))

    def load(sem):
        cp = pltpu.make_async_copy(H_ref.at[idx], Hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA(()))

    f = Hc.dtype
    one = jnp.asarray(1.0, f)
    eps = jnp.asarray(tiny, f)
    iota_r = lax.broadcasted_iota(jnp.int32, (n, 1), 0)      # (n, 1)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)   # (1, n, 1)

    def chol_step(j, _):
        ohc = (iota_c == j).astype(f)                        # (1, n, 1)
        # extract column j (one-hot contraction over the sublane dim)
        cols = []
        for c in range(nch):
            r0 = c * CH
            cols.append(jnp.sum(Hc[r0:r0 + CH] * ohc, axis=1))
        col = jnp.concatenate(cols, axis=0)                  # (n, L)
        d = jnp.sum(col * (iota_r == j).astype(f), axis=0,
                    keepdims=True)                           # (1, L)
        piv = jnp.sqrt(jnp.maximum(d, eps))
        colL = jnp.where(iota_r > j, col / piv, 0.0)         # (n, L)
        Lcol = colL + (iota_r == j).astype(f) * piv          # (n, L)
        # fused RMW: Schur downdate everywhere except column j, which
        # receives the finished Cholesky column
        for c in range(nch):
            r0 = c * CH
            blk = Hc[r0:r0 + CH]
            blk = (blk - colL[r0:r0 + CH][:, None, :] * colL[None, :, :]) \
                * (1.0 - ohc) + ohc * Lcol[r0:r0 + CH][:, None, :]
            Hc[r0:r0 + CH] = blk
        return 0

    lax.fori_loop(0, n, chol_step, 0)

    def inv_step(i, _):
        ohr2 = (iota_r == i).astype(f)                       # (n, 1)
        # extract row i (one-hot contraction over the major dim)
        rows = []
        for c in range(nch):
            r0 = c * CH
            rows.append(jnp.sum(Hc[r0:r0 + CH]
                                * ohr2[r0:r0 + CH][:, None, :], axis=0))
        Lrow = sum(rows)                                     # (n, L)
        dii = jnp.sum(Lrow * (iota_c == i).astype(f)[0], axis=0,
                      keepdims=True)                         # (1, L)
        inv = one / dii
        Lm = jnp.where(iota_c[0] < i, Lrow, 0.0)             # cols < i
        acc = jnp.zeros_like(Lrow)
        for c in range(nch):
            r0 = c * CH
            # rows k in [r0, r0+CH): weight L[i, k], masked dead at
            # k >= i by Lm; garbage above the diagonal of X rows is
            # multiplied by zero weights
            acc = acc + jnp.sum(Hc[r0:r0 + CH]
                                * Lm[r0:r0 + CH][:, None, :], axis=0)
        row_new = jnp.where(iota_c[0] == i, inv, -inv * acc)
        row_new = jnp.where(iota_c[0] > i, 0.0, row_new)     # (n, L)
        for c in range(nch):
            r0 = c * CH
            m = ohr2[r0:r0 + CH][:, None, :]
            Hc[r0:r0 + CH] = Hc[r0:r0 + CH] * (1.0 - m) \
                + m * row_new[None, :, :]
        return 0

    lax.fori_loop(0, n, inv_step, 0)

    def store(sem):
        cp = pltpu.make_async_copy(Hc, X_ref.at[idx], sem)
        cp.start()
        cp.wait()

    pl.run_scoped(store, pltpu.SemaphoreType.DMA(()))


def batched_chol_rinv_dense(H_bnn: jnp.ndarray, tiny: float = 1e-30,
                            interpret: bool = False,
                            lanes: int = 512) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) upper-triangular Rinv with H = R'R via
    the dense-mask lanes-last kernel (``_chol_kernel_dense``).  B must be
    a multiple of ``lanes`` (or equal a smaller multiple of 128)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = H_bnn.shape
    dtype = H_bnn.dtype
    itemsize = jnp.dtype(dtype).itemsize
    n0 = n
    pad = (-n) % 8
    if pad:
        # DMA slices need 8-aligned dims: pad with a decoupled identity
        # block (chol/inverse of blkdiag(H, I) = blkdiag(chol(H), I))
        eye_pad = jnp.zeros((n + pad, n + pad), dtype).at[
            jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        H_bnn = jnp.pad(H_bnn, ((0, 0), (0, pad), (0, pad))) + eye_pad
        n = n + pad
    L_SZ = min(lanes, B)
    while L_SZ > 128 and (B % L_SZ or n * n * L_SZ * itemsize
                          > 13 * 2 ** 20):
        L_SZ //= 2
    assert B % L_SZ == 0, (B, L_SZ)
    nch = 1
    while (n % nch) or (n // nch) * n * L_SZ * itemsize > 2 ** 21:
        nch += 1
    Hl = jnp.moveaxis(H_bnn, 0, -1)                  # (n, n, B)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        functools.partial(_chol_kernel_dense, n, nch, tiny),
        grid=(B // L_SZ,),
        in_specs=[any_spec], out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, B), dtype),
        scratch_shapes=[pltpu.VMEM((n, n, L_SZ), dtype)],
        interpret=interpret,
    )(Hl)
    # out[i, j, b] = L^{-1}[i, j] = Rinv[j, i]
    return jnp.moveaxis(out, -1, 0).transpose(0, 2, 1)[:, :n0, :n0]


def batched_chol_rinv_tile(H_bnn: jnp.ndarray, tiny: float = 1e-30,
                           interpret: bool = False,
                           unroll: bool = False) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) upper-triangular Rinv with H = R'R via
    the tile-layout kernel (see ``_tile_chol_kernel_loop``).  B must be a
    multiple of 128.  A non-PD lane produces a clamped-pivot factor whose
    inverse diagonal is huge — callers detect it from diag(Rinv) (the
    pivot-ratio check of utils.c:253-283) and re-regularize."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = H_bnn.shape
    assert B % 128 == 0, B
    G = B // 128
    dtype = H_bnn.dtype
    itemsize = jnp.dtype(dtype).itemsize
    SUB = 8
    while SUB > 1 and ((G % SUB) or (n * n * SUB * 128 * itemsize
                                     > 14 * 2 ** 20)):
        SUB //= 2
    assert G % SUB == 0, (B, SUB)
    Hl = jnp.transpose(H_bnn.reshape(G, 128, n, n), (2, 3, 0, 1))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    kern = _tile_chol_kernel if unroll else _tile_chol_kernel_loop
    out = pl.pallas_call(
        functools.partial(kern, n, tiny),
        grid=(G // SUB,),
        in_specs=[any_spec], out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, G, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n, n, SUB, 128), dtype)],
        interpret=interpret,
    )(Hl)
    # X[i, j, g, l] = L^{-1}[i, j] for lane g*128+l; Rinv = X' per lane
    return jnp.transpose(out, (2, 3, 1, 0)).reshape(B, n, n)


def batched_chol_rinv_blk(H_bnn: jnp.ndarray, tiny: float = 1e-30,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) upper-triangular Rinv with H = R'R via
    the BLOCKED tile kernel (``_tile_chol_kernel_blk``).  B must be a
    multiple of 128.  Non-PD lanes produce clamped-pivot factors whose
    inverse diagonal is huge — same caller contract as
    ``batched_chol_rinv_tile``."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = H_bnn.shape
    assert B % 128 == 0, B
    G = B // 128
    dtype = H_bnn.dtype
    itemsize = jnp.dtype(dtype).itemsize
    n0 = n
    pad = (-n) % 8
    if pad:
        # panel width 8: pad with a decoupled identity block
        eye_pad = jnp.zeros((n + pad, n + pad), dtype).at[
            jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        H_bnn = jnp.pad(H_bnn, ((0, 0), (0, pad), (0, pad))) + eye_pad
        n = n + pad
    SUB = 8
    # tighter VMEM budget than the rank-1 kernel: the blocked body keeps
    # ~4 (8, n, SUB, 128) panel temporaries alive alongside Hc
    while SUB > 1 and ((G % SUB) or (n * n * SUB * 128 * itemsize
                                     > 8 * 2 ** 20)):
        SUB //= 2
    assert G % SUB == 0, (B, SUB)
    nch = 1
    while (n % nch) or (n // nch) % 8 or \
            (n // nch) * n * SUB * 128 * itemsize > 2 ** 22:
        nch += 1
    Hl = jnp.transpose(H_bnn.reshape(G, 128, n, n), (2, 3, 0, 1))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        functools.partial(_tile_chol_kernel_blk, n, nch, tiny),
        grid=(G // SUB,),
        in_specs=[any_spec], out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, G, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n, n, SUB, 128), dtype)],
        interpret=interpret,
    )(Hl)
    return jnp.transpose(out, (2, 3, 1, 0)).reshape(B, n, n)[:, :n0, :n0]


def _chol_small_inv(A: jnp.ndarray, tiny: float):
    """(B, p, p) SPD -> (R, Rinv), both upper, A = R'R.  Fully unrolled
    classic Cholesky + back-substitution for SMALL static p (the 8-wide
    diagonal blocks of the blocked MXU factorization).  Non-PD pivots
    clamp to ``tiny`` (huge inverse diagonal; caller's pivot-ratio check
    detects it, utils.c:253-283 contract)."""
    B, p, _ = A.shape
    dtype = A.dtype
    col = jnp.arange(p)
    rows = []
    for i in range(p):
        acc = A[:, i, :]                                   # (B, p)
        for k in range(i):
            acc = acc - rows[k][:, i:i + 1] * rows[k]
        piv = jnp.sqrt(jnp.maximum(acc[:, i], tiny))       # (B,)
        r = jnp.where(col >= i, acc / piv[:, None], 0.0)
        rows.append(r.astype(dtype))
    R = jnp.stack(rows, axis=1)
    xrows = [None] * p
    for i in reversed(range(p)):
        inv = 1.0 / rows[i][:, i]                          # (B,)
        acc = jnp.zeros((B, p), dtype)
        for k in range(i + 1, p):
            acc = acc + rows[i][:, k:k + 1] * xrows[k]
        xi = jnp.where(col == i, inv[:, None], -inv[:, None] * acc)
        xrows[i] = jnp.where(col >= i, xi, 0.0).astype(dtype)
    Rinv = jnp.stack(xrows, axis=1)
    return R, Rinv


def batched_chol_rinv_mxu(H_bnn: jnp.ndarray,
                          tiny: float = 1e-30) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) upper Rinv with H = R'R via a BLOCKED
    right-looking Cholesky + blocked triangular inversion whose panel
    and trailing updates are batched GEMMs (MXU), with only the 8x8
    diagonal blocks factored by unrolled scalar-free vector ops.

    Rationale: the lanes-last VPU kernels are ISSUE-limited (~6.5-8.5 ms
    per 1024 x 50x50 on v5e; the blocked-panel VPU variant with 8x less
    buffer traffic measures the SAME, so bandwidth is not the limit),
    while the total factorization+inverse FLOP count (~2n^3/3 per lane)
    is tiny for the MXU even at the measured ~0.24 TFLOP/s effective
    rate of HIGHEST-precision batched small GEMMs.  All GEMMs pin
    Precision.HIGHEST (f32-exact): this path feeds M/v/d and the
    accuracy gates.  Reference semantics: ``daqp_update_Rinv``
    (utils.c:137-297) fused factorization+inversion."""
    hi = lax.Precision.HIGHEST
    B, n0, _ = H_bnn.shape
    dtype = H_bnn.dtype
    PB = 8
    pad = (-n0) % PB
    if pad:
        eye_pad = jnp.zeros((n0 + pad, n0 + pad), dtype).at[
            jnp.arange(n0, n0 + pad), jnp.arange(n0, n0 + pad)].set(1.0)
        H_bnn = jnp.pad(H_bnn, ((0, 0), (0, pad), (0, pad))) + eye_pad
    n = n0 + pad
    nb = n // PB

    A22 = H_bnn
    panels = []                       # (Rkk_inv, Rk_rest) per block row
    for k in range(nb):
        Akk = A22[:, :PB, :PB]
        _, Rkk_inv = _chol_small_inv(Akk, tiny)
        rest = A22[:, :PB, PB:]                            # (B, PB, r)
        # Rk_rest = Rkk^{-T} @ rest  (Rkk upper => Rkk^{-T} = Rkk_inv')
        Rk_rest = jnp.einsum('bki,bkj->bij', Rkk_inv, rest, precision=hi)
        if Rk_rest.shape[-1]:
            A22 = A22[:, PB:, PB:] - jnp.einsum(
                'bki,bkj->bij', Rk_rest, Rk_rest, precision=hi)
        panels.append((Rkk_inv, Rk_rest))

    # blocked back-substitution for Rinv: bottom-up, X = R^{-1} upper;
    # X[i, i] = Rkk_inv(i); X[i, >i] = -Rkk_inv(i) @ R[i, >i] @ X[>i, >i]
    Xlow = panels[-1][0]
    for i in reversed(range(nb - 1)):
        Dinv, Ri_rest = panels[i]
        T = jnp.einsum('bik,bkj->bij', Ri_rest, Xlow, precision=hi)
        Xi = jnp.concatenate(
            [Dinv, -jnp.einsum('bik,bkj->bij', Dinv, T, precision=hi)],
            axis=2)
        r = Xlow.shape[-1]
        Xlow = jnp.concatenate(
            [Xi, jnp.concatenate([jnp.zeros((B, r, PB), dtype), Xlow],
                                 axis=2)], axis=1)
    return Xlow[:, :n0, :n0]


def batched_rinv_regularized(H_bnn: jnp.ndarray, st, interpret: bool = False):
    """Batched dense factorization with the reference's full-shift
    retry-doubling regularization (``daqp_update_Rinv``, utils.c:253-283)
    applied per lane.

    Returns ``(Rinv, ok, reg_mask, eps_used)``:
      * ``ok``       (B,) bool — factorization healthy (possibly after
                      regularization); a False lane is nonconvex.
      * ``reg_mask`` (B,) bool — lane needed an H + eps*I shift (its Rinv
                      factors the *shifted* Hessian; full reference
                      semantics route such lanes through the proximal
                      outer loop — batched callers surface this per lane).
      * ``eps_used`` (B,) effective shift.
    """
    B, n, _ = H_bnn.shape
    dtype = H_bnn.dtype
    zero_tol = jnp.asarray(st.zero_tol, dtype)
    Hs = 0.5 * (H_bnn + jnp.swapaxes(H_bnn, 1, 2))
    diag = jnp.diagonal(Hs, axis1=1, axis2=2)            # (B, n)
    hessian_scale = jnp.max(jnp.abs(diag), axis=1)       # (B,)
    eps0 = jnp.maximum(jnp.asarray(st.eps_prox, dtype),
                       jnp.sqrt(zero_tol) * hessian_scale)
    eps0 = jnp.where(st.eps_prox > 0, eps0,
                     jnp.asarray(st.eps_prox, dtype))
    eye = jnp.eye(n, dtype=dtype)

    def attempt(Hb):
        Rinv = batched_chol_rinv_tile(Hb, interpret=interpret)
        rd = jnp.diagonal(Rinv, axis1=1, axis2=2)
        piv = 1.0 / jnp.maximum(rd * rd, 1e-38)          # pivots of R'R
        finite = jnp.all(jnp.isfinite(Rinv), axis=(1, 2))
        ok = finite & (jnp.min(piv, axis=1)
                       > jnp.sqrt(zero_tol) * jnp.max(piv, axis=1))
        return Rinv, ok

    R0, ok0 = attempt(Hs)

    def regularize(args):
        R0, ok0 = args

        def cond(c):
            eps, tries, _, ok, _ = c
            return jnp.any(~ok) & (tries < 16)

        def body(c):
            eps, tries, R, ok, eps_used = c
            Hshift = Hs + (eps * (~ok))[:, None, None] * eye
            R1, ok1 = attempt(Hshift)
            R = jnp.where(ok[:, None, None], R, R1)
            eps_used = jnp.where(~ok & ok1, eps, eps_used)
            return eps * 2.0, tries + 1, R, ok | ok1, eps_used

        _, _, R, ok, eps_used = lax.while_loop(
            cond, body, (eps0, jnp.zeros((), jnp.int32), R0, ok0,
                         jnp.zeros((B,), dtype)))
        return R, ok, eps_used.astype(dtype)

    R, ok, eps_used = lax.cond(
        jnp.all(ok0),
        lambda args: (args[0], args[1], jnp.zeros((B,), dtype)),
        regularize, (R0, ok0))
    return R, ok, (~ok0) & ok, eps_used


def batched_chol_rinv(H_bnn: jnp.ndarray) -> jnp.ndarray:
    """(B, n, n) SPD -> (B, n, n) upper-triangular Rinv with H = R'R.

    Lanes-last internally; O(n) sequential steps of (n, B) vector work.
    No pivoting (inputs are SPD by contract; a non-PD lane produces NaNs
    that the caller's guards catch).
    """
    B, n, _ = H_bnn.shape
    dtype = H_bnn.dtype
    Hl = jnp.moveaxis(H_bnn, 0, -1)                  # (n, n, B)
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    # --- right-looking Cholesky: L lower with H = L L' ---
    def chol_step(j, carry):
        Hc, L = carry
        d = lax.dynamic_slice(Hc, (j, j, 0), (1, 1, B))[0]     # (1, B)
        piv = jnp.sqrt(jnp.maximum(d, 1e-30))
        col = lax.dynamic_slice(Hc, (0, j, 0), (n, 1, B))[:, 0]  # (n, B)
        col = jnp.where(iota >= j, col / piv, 0.0)
        Hc = Hc - col[:, None, :] * col[None, :, :]
        L = lax.dynamic_update_slice(L, col[:, None, :], (0, j, 0))
        return Hc, L

    L = jnp.zeros_like(Hl)
    _, L = lax.fori_loop(0, n, chol_step, (Hl, L))

    # --- forward substitution: X = L^{-1} (row at a time) ---
    eye = jnp.eye(n, dtype=dtype)

    def inv_step(i, X):
        Li = lax.dynamic_slice(L, (i, 0, 0), (1, n, B))[0]      # (n, B)
        Lii = lax.dynamic_slice(L, (i, i, 0), (1, 1, B))[0]     # (1, B)
        below = jnp.where(iota < i, Li, 0.0)                    # L[i, :i]
        acc = jnp.sum(below[:, None, :] * X, axis=0)            # (n, B)
        ei = lax.dynamic_slice(eye, (i, 0), (1, n))[0]          # (n,)
        Xi = (ei[:, None] - acc) / Lii
        return lax.dynamic_update_slice(X, Xi[None, :, :], (i, 0, 0))

    X = lax.fori_loop(0, n, inv_step, jnp.zeros_like(Hl))       # L^{-1}
    # Rinv = R^{-1} = (L')^{-1} = (L^{-1})'
    Rinv = jnp.swapaxes(jnp.moveaxis(X, -1, 0), 1, 2)           # (B, n, n)
    return Rinv
