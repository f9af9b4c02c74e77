"""Pallas TPU mega-kernel: the whole dual active-set iteration in VMEM.

The XLA-composed batched solver (``ldp_flat``) is correct but pays ~3 ms
per lockstep iteration for a 512-lane chunk: every iteration is ~30
separate HLO ops, each a full HBM round-trip over (B, K, K) state.  At
~50 kFLOPs per lane-iteration the arithmetic is trivial — the cost is all
memory traffic and kernel dispatch.  This kernel removes both:

  * **One ``pallas_call`` runs up to ``STEPS`` iterations for a tile of
    L = 128 lanes with every piece of solver state resident in VMEM**
    (E: (m, m, L) inverse Gram, M: (m, n, L) rows, bounds, masks,
    per-lane scalars).  m = 100, n = 50 uses ~9 MB of the ~16 MB VMEM.
  * **Lanes-last layout**: the batch is the minor (lane) dimension, so
    every scalar op of the reference C loop becomes one (sublane, 128)
    vector op on the VPU — the tiling the hardware wants.
  * **Gather-free dense-mask formulation**: the reference's ordered
    working set (and ldp_flat's slot table) index by position; here a
    constraint's OWN row/column of E is its slot.  Working-set membership
    is a pair of (m, L) masks (upper/lower side), selections are one-hot
    masks built by comparing a broadcasted iota with an argmin — there is
    no gather, no scatter, no compaction anywhere.  E is (m, m) instead
    of (K, K); the extra zero block costs FLOPs the VPU has to spare.

Algorithmic content is identical to ``ldp_flat``/``ldp`` (reference
``src/daqp.c``, ``src/auxiliary.c``, ``src/factorization.c``): CSP via the
explicit inverse, min-ratio blocking removal with a pivot-stability guard,
Dantzig pricing, bordered addition with pending-singular handling, cycle
guard.  Numerical repair (Newton polish / exact Cholesky refactorization /
iterative refinement) stays OUTSIDE the kernel in the JAX driver
(``pallas_flat_solve``), between kernel rounds — it runs on the MXU over
the full batch and only every ``STEPS`` iterations.

Scope (v1): strictly convex QPs, two-sided bounds, hard constraints, cold
start — the throughput path (BASELINE config 2).  Soft/binary/warm paths
use the XLA solvers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from ..types import (Settings, DAQP_INF, EXIT_CYCLE, EXIT_INFEASIBLE,
                     EXIT_ITERLIMIT, EXIT_OPTIMAL, EXIT_RUNNING,
                     EXIT_SOFT_OPTIMAL)
from ..ldp_flat import EXIT_REFACTOR

LANES = 128          # lanes per kernel program (TPU lane width)


class DenseState(NamedTuple):
    """Dense-mask batched solver state, lanes-last: trailing dim is B."""
    M: jnp.ndarray        # (m, n, B)
    dupper: jnp.ndarray   # (m, B)
    dlower: jnp.ndarray   # (m, B)
    scaling: jnp.ndarray  # (m, B)
    immut: jnp.ndarray    # (m, B) f32 0/1
    soft: jnp.ndarray     # (m, B) f32 0/1
    fbound: jnp.ndarray   # (1, B) LDP-space dual objective bound: a lane
                          # whose priced fval exceeds it exits
                          # EXIT_INFEASIBLE (dominance cut, daqp.c:20-23;
                          # = 2*fval_bound in QP space, ldp_flat.py:289)
    act_up: jnp.ndarray   # (m, B) f32 0/1
    act_lo: jnp.ndarray   # (m, B) f32 0/1
    E: jnp.ndarray        # (m, m, B)
    lam: jnp.ndarray      # (m, B) dual iterate (by constraint row)
    lam_star: jnp.ndarray  # (m, B) last CSP solution
    pend: jnp.ndarray     # (1, B) f32 0/1
    pend_oh: jnp.ndarray  # (m, B) one-hot of the pending constraint
    pend_lam: jnp.ndarray  # (1, B)
    pend_lo: jnp.ndarray  # (1, B) f32 0/1
    u: jnp.ndarray        # (n, B)
    fval: jnp.ndarray     # (1, B)
    best_fval: jnp.ndarray  # (1, B)
    cycle: jnp.ndarray    # (1, B) f32 counter
    repaired: jnp.ndarray  # (1, B) f32 0/1
    iterations: jnp.ndarray  # (1, B) f32
    status: jnp.ndarray   # (1, B) int32
    # SOFT_WEIGHTS slack data (reference optional build, types.h:168-180;
    # auxiliary.c:199-274 semantics): scaling-normalized per-row slack
    # bounds and per-side weights, plus the slack FIXED-state masks.  All
    # None on the plain path — the hard/plain-soft kernel variant compiles
    # unchanged (the buffers are not even passed to pallas_call).
    sw_dls: jnp.ndarray = None   # (m, B) lower slack bounds d_ls
    sw_dus: jnp.ndarray = None   # (m, B) upper slack bounds d_us
    sw_rls: jnp.ndarray = None   # (m, B) lower-side weights rho_ls
    sw_rus: jnp.ndarray = None   # (m, B) upper-side weights rho_us
    sfix: jnp.ndarray = None     # (m, B) f32 0/1: slack at its bound
                                 # (SLACK_FIXED — the row behaves hard)
    pfix: jnp.ndarray = None     # (1, B) f32 0/1: pending entry's state


def _row_chunks(m: int, target: int = 13):
    """Static row-chunk boundaries for E passes (VMEM temp control)."""
    rc = target
    while m % rc != 0:
        rc -= 1
    return [(i * rc, rc) for i in range(m // rc)]


def _kernel_body(st: Settings, m: int, n: int, n_true: int, steps: int,
                 has_soft: bool, has_sw: bool, always_copy: bool, *refs):
    """Up to ``steps`` masked dual active-set iterations for one 128-lane
    tile.

    ``refs`` layout (positional, built by ``run_kernel_round``):
    consts [M, du, dl, sc, imsf, fb (+ dls, dus, rls, rus when has_sw)],
    then the state inputs, the state outputs (E at index 2 of each), and
    the two VMEM scratch buffers (E, M).

    E lives in its (aliased) output ref and is read/updated in static row
    chunks — whole-array (m, m, L) temporaries would blow the ~16 MB VMEM
    budget (observed 27 MB scoped-stack OOM with the naive formulation).

    Lockstep-tail control (the ~30%% waste of round 1): the step loop is a
    ``lax.while_loop`` that exits as soon as EVERY lane of the tile is
    terminal, and a tile that arrives fully terminal skips the big E/M DMA
    and the loop entirely (small aliased state still passes through its
    output windows so the pipeline writes back unchanged values).  A
    converged tile therefore costs ~KBs of DMA per round instead of 64
    full iterations + 8 MB of traffic.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_const = 10 if has_sw else 6
    n_state = 18 if has_sw else 16
    const_refs = refs[:n_const]
    in_state = refs[n_const:n_const + n_state]
    out_state = refs[n_const + n_state:n_const + 2 * n_state]
    E_s, M_s = refs[n_const + 2 * n_state:]
    M_ref, du_ref, dl_ref, sc_ref, imsf_ref, fb_ref = const_refs[:6]
    sw_crefs = const_refs[6:]
    E_ref, E_o = in_state[2], out_state[2]
    stt_o = out_state[-1]

    # Big buffers (E, M) and the state inputs live UNBLOCKED in HBM; grid-
    # blocked VMEM windows are double-buffered by the pipeline, which blew
    # the 16 MB budget.  E and M use single-buffered VMEM *scratch* filled
    # by explicit DMA; the small states DMA into their (blocked) output
    # windows.
    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [r for i, r in enumerate(in_state) if i != 2]
    out_refs = [r for i, r in enumerate(out_state) if i != 2]

    def load_small(sems):
        # small aliased state always passes through its output windows (the
        # pipeline writes the windows back to the aliased HBM buffers, so
        # they must hold valid values even when the tile skips the solve)
        copies = []
        for i, (src_r, dst_r) in enumerate(zip(in_refs, out_refs)):
            nd = len(src_r.shape)
            idx = lane_idx3 if nd == 3 else lane_idx2
            copies.append(pltpu.make_async_copy(src_r.at[idx], dst_r,
                                                sems.at[i]))
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(load_small, pltpu.SemaphoreType.DMA((len(in_refs),)))

    iota_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)   # (m, 1)
    # without input_output_aliases (interpret mode) a skipped tile would
    # leave the E output buffer undefined — always take the copy path then
    # (the step loop still exits immediately when nothing runs)
    tile_live = jnp.any(stt_o[:] == EXIT_RUNNING) | always_copy

    @pl.when(tile_live)
    def solve_tile():
        def load_big(sems):
            copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                            sems.at[0]),
                      pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                            sems.at[1])]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((2,)))
        _solve_tile_live(st, m, n, n_true, steps, has_soft, has_sw,
                         iota_m, du_ref, dl_ref, sc_ref, imsf_ref, fb_ref,
                         sw_crefs, out_refs, E_s, M_s)

        def store_E(sem):
            cp = pltpu.make_async_copy(E_s, E_o.at[lane_idx3], sem)
            cp.start()
            cp.wait()

        pl.run_scoped(store_E, pltpu.SemaphoreType.DMA(()))


def _solve_tile_live(st: Settings, m: int, n: int, n_true: int, steps: int,
                     has_soft: bool, has_sw: bool, iota_m,
                     du_ref, dl_ref, sc_ref, imsf_ref, fb_ref,
                     sw_crefs, small_out, E_s, M_s):
    """The live-tile solve loop (state already staged into VMEM).

    ``has_sw`` compiles the SOFT_WEIGHTS slack state machine in
    (auxiliary.c:199-274 semantics, mirroring ``ldp_flat.flat_step``):
    per-side rho on the Gram diagonal of FREE slacks, slack-dual blocking
    with the FIXED/FREE skip rules + kink guard, the pend-transition
    virtual candidate, and the reference-order double add (pend retry +
    FIXED->FREE blocker re-add) — chained algebraically through the SAME
    three E passes as the plain path (contract pass 2 gains a third
    fused contraction; the update pass gains one fused rank-one term),
    so SW costs extra VPU math but no extra VMEM traffic."""
    f32 = jnp.float32
    BIG = f32(DAQP_INF)
    dtol = f32(st.dual_tol)
    ptol = f32(st.primal_tol)
    pivtol = f32(st.pivot_tol)
    singtol = f32(st.sing_tol)
    progtol = f32(st.progress_tol)
    cyctol = f32(st.cycle_tol)
    chunks = _row_chunks(m)

    if has_sw:
        (au_o, al_o, lam_o, ls_o, pd_o, po_o, pl_o, plo_o, sfx_o, pfx_o,
         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o) = small_out
    else:
        (au_o, al_o, lam_o, ls_o, pd_o, po_o, pl_o, plo_o,
         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o) = small_out

    du = du_ref[:]
    dl = dl_ref[:]
    sc = sc_ref[:]
    # immut and soft masks packed as im + 2*soft in one buffer (the extra
    # blocked window pair pushed VMEM 29 KB over the 16 MB limit); the
    # soft terms are compiled in only for batches that carry SOFT bits
    # (they cost ~2x on the clean cold-start path)
    imsf = imsf_ref[:]
    if has_soft:
        sf = jnp.floor(imsf * 0.5 + 0.25)
        im = imsf - 2.0 * sf
    else:
        im = imsf
        sf = None
    rho = f32(st.rho_soft)
    fb = fb_ref[:]        # (1, L) per-lane dual objective bound
    M = M_s[:]            # (m, n, L)
    if has_sw:
        dls = sw_crefs[0][:]
        dus = sw_crefs[1][:]
        rls = sw_crefs[2][:]
        rus = sw_crefs[3][:]
        # the lane's smallest legitimate soft pivot (see the sing gate)
        rho_min = jnp.min(jnp.where(sf > 0, jnp.minimum(rls, rus), BIG),
                          axis=0, keepdims=True)
        eps_k = f32(64.0 * np.finfo(np.float32).eps)

    def contractN(xs):
        # N contractions through ONE row-chunked pass over E:
        # out_t[i, l] = sum_j E[i, j, l] x_t[j, l]
        outs = [[] for _ in xs]
        for off, rc in chunks:
            Eb = E_s[off:off + rc]
            for t, x in enumerate(xs):
                outs[t].append(jnp.sum(Eb * x[None, :, :], axis=1))
        return [jnp.concatenate(o, axis=0) for o in outs]

    def update_E(c_del, e, c_add, w, keep, c_b=None, w_b=None):
        # one read-modify-write pass:
        # E <- (E + c_del e e') * keep_i keep_j [+ c_b w_b w_b'] + c_add w w'
        # (the optional middle rank-one is the SW double add's blocker
        # re-add; order matters — the main add's Schur vector w was
        # computed against the post-blocker inverse)
        for off, rc in chunks:
            Eb = E_s[off:off + rc]
            Eb = (Eb + c_del[None, :, :] * e[off:off + rc][:, None, :]
                  * e[None, :, :]) \
                * keep[off:off + rc][:, None, :] * keep[None, :, :]
            if c_b is not None:
                Eb = Eb + c_b[None, :, :] * w_b[off:off + rc][:, None, :] \
                    * w_b[None, :, :]
            Eb = Eb + c_add[None, :, :] * w[off:off + rc][:, None, :] \
                * w[None, :, :]
            E_s[off:off + rc] = Eb

    def rowdot(y):
        # out[i, l] = sum_k M[i, k, l] y[k, l]
        return jnp.sum(M * y[None, :, :], axis=1)

    def coldot(w):
        # out[k, l] = sum_i M[i, k, l] w[i, l]
        return jnp.sum(M * w[:, None, :], axis=0)

    def first_min_onehot(cand):
        # (m, L) -> one-hot (m, L) of the first row-minimum, + (1, L) min
        cmin = jnp.min(cand, axis=0, keepdims=True)
        idx = jnp.argmin(cand, axis=0, keepdims=True).astype(jnp.int32)
        oh = (iota_m == idx).astype(f32)
        return oh, cmin

    def body(_, carry):
        if has_sw:
            (au, al, lam, ls, pd, po, plm, plo, sfx, pfx, u, fv, bf, cy,
             rp, it, stt) = carry
        else:
            (au, al, lam, ls, pd, po, plm, plo, u, fv, bf, cy, rp, it,
             stt) = carry
        run = (stt == EXIT_RUNNING).astype(f32)          # (1, L)

        act = au + al                                     # (m, L) 0/1
        d_W = (au * du + al * dl)                         # (m, L)
        if has_sw:
            # CSP right-hand side: FREE soft slacks shift d_W by their
            # bound contribution (auxiliary.c:313-332, SW branch)
            free_soft = act * sf * (1.0 - sfx)
            d_W = d_W + free_soft * (al * (rls * dls) - au * (rus * dus))
        # (measured: gating these 2 M passes behind lax.cond(any(pd>0))
        # SLOWED the whole pipeline 41.6k -> 29.4k solves/s — a cond in
        # the Mosaic hot loop costs far more than the passes it skips)
        g_p = rowdot(coldot(po)) * act                    # pending Gram col
        # E pass 1: CSP + pending null direction
        lam_star_neg, a_p = contractN([d_W, g_p])
        lam_star = -lam_star_neg
        sgn_p = 1.0 - 2.0 * plo                           # (1, L)
        sdir = -a_p * sgn_p                               # auxiliary.c:356

        # blocking min-ratio line search (auxiliary.c:276-311; SW variant
        # auxiliary.c:199-274 line-searches the SLACK dual per side and
        # blocks at slack-bound transitions — see ldp_flat.flat_step)
        delta = pd * sdir + (1.0 - pd) * (lam_star - lam)
        signv = pd * sdir + (1.0 - pd) * lam_star
        # f32 mask algebra (Mosaic cannot select between i1 vectors)
        if has_sw:
            free_w = 1.0 - sfx
            neg = (delta < 0).astype(f32)
            pos = (delta > 0).astype(f32)
            sk_lo_f = ((delta < dtol)
                       | (signv <= -dls + dtol)).astype(f32)
            sk_lo_x = ((signv <= dtol)
                       & (signv + dtol >= -dls)).astype(f32) * (1.0 - pd)
            sk_up_f = ((delta > -dtol) | (signv >= dus)).astype(f32)
            sk_up_x = ((signv >= -dtol)
                       & (signv <= dtol + dus)).astype(f32) * (1.0 - pd)
            # kink guard: a soft dual AT its slack-bound transition in
            # the crossing direction is at its coordinate optimum —
            # searching it loops remove/re-add forever (ldp.remove_blocking)
            ktol_us = jnp.maximum(dtol, eps_k * (1.0 + jnp.abs(dus)))
            ktol_ls = jnp.maximum(dtol, eps_k * (1.0 + jnp.abs(dls)))
            at_us = (jnp.abs(lam - dus) <= ktol_us).astype(f32)
            at_ls = (jnp.abs(lam + dls) <= ktol_ls).astype(f32)
            kink = sf * (al * at_ls * (free_w + sfx * neg)
                         + au * at_us * (free_w + sfx * pos))
            skip = al * (free_w * sk_lo_f + sfx * sk_lo_x) \
                + au * (free_w * sk_up_f + sfx * sk_up_x) + kink
            # slack dual measured from the relevant transition
            lam_slack = lam + al * dls * (free_w + sfx * neg) \
                - au * dus * (free_w + sfx * pos)
            elig = act * (1.0 - im) * (skip < 0.5).astype(f32)
            ratio = -lam_slack / delta
        else:
            infeas = al * (signv > dtol).astype(f32) \
                + (1.0 - al) * (signv < -dtol).astype(f32)
            elig = infeas * act * (1.0 - im)
            ratio = -lam / delta
        # eligible slots always participate; nonfinite/negative ratios
        # clamp to a zero-step removal (see pallas_slot.py — dropping
        # them let a dual-infeasible point exit as optimal)
        ratio = jnp.where(jnp.isfinite(ratio),
                          jnp.maximum(ratio, 0.0), 0.0)
        cand = jnp.where(elig > 0, ratio, BIG)
        oh_rm, rmin = first_min_onehot(cand)
        if has_sw:
            # pend-transition virtual candidate: the parked singular
            # entry's OWN slack-bound transition is searched like a
            # (K+1)-th slot (ldp_flat.flat_step pend candidate; the
            # reference's parked entry sits IN the working set so its
            # search is implicit, factorization.c:92-97)
            p_dls = jnp.sum(po * dls, axis=0, keepdims=True)
            p_dus = jnp.sum(po * dus, axis=0, keepdims=True)
            p_free = 1.0 - pfx
            p_neg = (sgn_p < 0).astype(f32)
            p_pos = (sgn_p > 0).astype(f32)
            pskip = plo * p_free \
                * ((sgn_p < dtol) | (sgn_p <= -p_dls + dtol)).astype(f32) \
                + (1.0 - plo) * p_free \
                * ((sgn_p > -dtol) | (sgn_p >= p_dus)).astype(f32)
            pkt_us = jnp.maximum(dtol, eps_k * (1.0 + jnp.abs(p_dus)))
            pkt_ls = jnp.maximum(dtol, eps_k * (1.0 + jnp.abs(p_dls)))
            p_at_us = (jnp.abs(plm - p_dus) <= pkt_us).astype(f32)
            p_at_ls = (jnp.abs(plm + p_dls) <= pkt_ls).astype(f32)
            p_soft = jnp.sum(po * sf, axis=0, keepdims=True)
            pkink = p_soft * (plo * p_at_ls * (p_free + pfx * p_neg)
                              + (1.0 - plo) * p_at_us
                              * (p_free + pfx * p_pos))
            p_lam_slack = plm + plo * p_dls * (p_free + pfx * p_neg) \
                - (1.0 - plo) * p_dus * (p_free + pfx * p_pos)
            p_imm = jnp.sum(po * im, axis=0, keepdims=True)
            p_ratio = jnp.maximum(-p_lam_slack / sgn_p, 0.0)
            p_elig = pd * (1.0 - p_imm) \
                * ((pskip + pkink) < 0.5).astype(f32)
            pend_cand = jnp.where(p_elig > 0, p_ratio, BIG)
            # ties go to the slot candidates (flat: argmin-first order)
            pend_block = run * ((pend_cand < rmin)
                                & (pend_cand < BIG)).astype(f32)
            do_rm0 = run * (1.0 - pend_block) \
                * (rmin < BIG).astype(f32)                # pre-guard
        else:
            pend_block = jnp.zeros_like(run)
            do_rm0 = run * (rmin < BIG).astype(f32)       # pre-guard

        # primal + pricing (no E access; gates applied later)
        lam_sel = lam_star * act
        u_new = -coldot(lam_sel)
        if has_sw:
            # per-side weights (auxiliary.c:46-87, SW branch)
            rho_w = al * rls + au * rus
            soft_slack = jnp.sum(sf * act * rho_w * lam_star * lam_star,
                                 axis=0, keepdims=True)
        elif has_soft:
            soft_slack = rho * jnp.sum(sf * act * lam_star * lam_star,
                                       axis=0, keepdims=True)
        else:
            soft_slack = 0.0
        fv_new = jnp.sum(u_new * u_new, axis=0, keepdims=True) + soft_slack
        mu = rowdot(u_new)
        bound = -ptol * sc
        v_up = du - mu
        v_lo = mu - dl
        blocked = (act > 0) | (im > 0) | (po > 0)
        up_ok = (v_up < bound) & ~blocked
        lo_ok = (v_lo < bound) & ~blocked & ~up_ok
        cand2 = jnp.where(up_ok, v_up, jnp.where(lo_ok, v_lo, BIG))
        if int(st.pricing) == 1:
            # Bland's rule (anti-cycling: lowest violated index) — the
            # compile-time pricing variant, same as the slot kernel
            # (daqp_julia.jl:1,42-46; settings are static in the kernel)
            cand2 = jnp.where(up_ok | lo_ok, iota_m.astype(f32) - BIG,
                              BIG)
        oh_j, vmin = first_min_onehot(cand2)
        found = (vmin < 0).astype(f32)
        j_lo = jnp.sum(oh_j * lo_ok.astype(f32), axis=0, keepdims=True)

        # add candidate (retry pending after removal, or pricing winner;
        # SW adds two more sources: a removed soft blocker whose slack
        # dual has not crossed zero re-adds with the flipped FIXED/FREE
        # state, auxiliary.c:264-273, and a pend blocked at its OWN
        # transition re-enters flipped, factorization.c:92-97);
        # wrong-but-gated when the pivot guard cancels the removal below
        retry = pd * do_rm0
        price0 = run * (1.0 - do_rm0) * (1.0 - pd)
        padd0 = price0 * found
        if has_sw:
            # pre-guard line-search step (auxiliary.c:254: step just past
            # the transition so the blocker re-enters flipped)
            alpha0 = (do_rm0 + pend_block) * jnp.where(
                pend_block > 0,
                jnp.where(pend_cand < BIG, pend_cand, 0.0),
                jnp.where(rmin < BIG, rmin, 0.0)) * f32(1.001)
            lam_step0 = lam + alpha0 * delta * act
            plm_new = plm + alpha0 * sgn_p * pd
            ls_rm = jnp.sum(oh_rm * lam_step0, axis=0, keepdims=True)
            rm_was_soft = jnp.sum(oh_rm * sf, axis=0, keepdims=True)
            rm_was_lower = jnp.sum(oh_rm * al, axis=0, keepdims=True)
            rm_was_fixed = jnp.sum(oh_rm * sfx, axis=0, keepdims=True)
            crossed = rm_was_lower * (ls_rm > 0).astype(f32) \
                + (1.0 - rm_was_lower) * (ls_rm < 0).astype(f32)
            pend_crossed = plo * (plm_new > 0).astype(f32) \
                + (1.0 - plo) * (plm_new < 0).astype(f32)
            pend_readd = pend_block * (1.0 - pend_crossed)
            pend_drop = pend_block * pend_crossed
            sw_readd = do_rm0 * (1.0 - pd) * rm_was_soft * (1.0 - crossed)
            # double add (reference parity, see ldp_flat.flat_step): a
            # pend retry coinciding with a FIXED soft blocker performs
            # BOTH adds — the blocker re-enters FREE (gaining rho on the
            # Gram diagonal) and THEN the parked entry re-enters
            both0 = retry * rm_was_soft * (1.0 - crossed) * rm_was_fixed
            pend_take = retry + pend_readd
            add_oh = pend_take * po + sw_readd * oh_rm + padd0 * oh_j
            add_lo = pend_take * plo + sw_readd * rm_was_lower \
                + padd0 * j_lo
            add_lam = pend_take * plm_new + sw_readd * ls_rm \
                + padd0 * (1.0 - 2.0 * j_lo)
        else:
            add_oh = retry * po + padd0 * oh_j            # (m, L)
            add_lo = retry * plo + padd0 * j_lo
            add_lam = retry * plm + padd0 * (1.0 - 2.0 * j_lo)
        mj = coldot(add_oh)                               # (n, L)
        g = rowdot(mj) * act
        keep0 = 1.0 - oh_rm * do_rm0
        g_k = g * keep0
        add_soft = (jnp.sum(add_oh * sf, axis=0, keepdims=True)
                    if has_soft else 0.0)

        # E pass 2: removed column + Schur vector(s)
        if has_sw:
            mj_b = coldot(oh_rm)                          # (n, L)
            g_b = rowdot(mj_b) * act
            g_bk = g_b * keep0
            e, a_pre, ab_pre = contractN([oh_rm, g_k, g_bk])
        else:
            e, a_pre = contractN([oh_rm, g_k])
        err = jnp.sum(e * oh_rm, axis=0, keepdims=True)
        bad = (do_rm0 > 0) & (err < pivtol * jnp.max(jnp.abs(e), axis=0,
                                                     keepdims=True))
        stt = jnp.where(bad, EXIT_REFACTOR, stt)
        do_rm = do_rm0 * (1.0 - bad.astype(f32))
        keep = 1.0 - oh_rm * do_rm
        err_s = jnp.where(err != 0, err, 1.0)

        # post-deletion Schur vector without a third E pass:
        # a' = keep (a_pre - e (e.g_k)/err) when removing
        ec = jnp.sum(e * g_k, axis=0, keepdims=True) / err_s
        a_post = keep * (a_pre - do_rm * e * ec)
        if has_sw:
            ecb = jnp.sum(e * g_bk, axis=0, keepdims=True) / err_s
            ab_post = keep * (ab_pre - do_rm * e * ecb)

        # line-search dual update (masked removal; under SW also a
        # pend-transition block, which steps the duals with NO deletion)
        if has_sw:
            alpha = (do_rm + pend_block) * jnp.where(
                pend_block > 0,
                jnp.where(pend_cand < BIG, pend_cand, 0.0),
                jnp.where(rmin < BIG, rmin, 0.0)) * f32(1.001)
        else:
            alpha = do_rm * jnp.where(rmin < BIG, rmin, 0.0)
        lam = (lam + alpha * delta * act) * keep
        plm = plm + alpha * sgn_p * pd
        au = au * keep
        al = al * keep

        # pending with no blocker: repair once, then infeasible
        stuck = (stt == EXIT_RUNNING) & (pd > 0) & (do_rm == 0) & (run > 0)
        if has_sw:
            stuck = stuck & (pend_block == 0)
        stt = jnp.where(stuck,
                        jnp.where(rp > 0, EXIT_INFEASIBLE, EXIT_CYCLE),
                        stt)

        # dominance bound cut on the priced (dual-feasible) path
        # (daqp.c:20-23): the dual objective is monotone, so exceeding the
        # per-lane bound proves the lane can never beat it
        cut = (price0 > 0) & (stt == EXIT_RUNNING) & (fv_new > fb)
        stt = jnp.where(cut, EXIT_INFEASIBLE, stt)

        price = price0 * (stt == EXIT_RUNNING).astype(f32)
        if has_soft:
            opt_flag = jnp.where(soft_slack > ptol, EXIT_SOFT_OPTIMAL,
                                 EXIT_OPTIMAL)
        else:
            opt_flag = EXIT_OPTIMAL
        stt = jnp.where((price > 0) & (found == 0), opt_flag, stt)

        # cycle guard (daqp.c:66-85; repair deferred to the driver)
        no_prog = (fv_new - bf < progtol * (1.0 + jnp.abs(fv_new))
                   ).astype(f32)
        cy = price * (no_prog * (cy + 1.0)) + (1.0 - price) * cy
        bf = jnp.where((price > 0) & (no_prog == 0), fv_new, bf)
        stt = jnp.where((price > 0) & (cy > cyctol)
                        & (stt == EXIT_RUNNING), EXIT_CYCLE, stt)

        u = price * u_new + (1.0 - price) * u
        fv = price * fv_new + (1.0 - price) * fv
        ls = run * lam_star + (1.0 - run) * ls
        # promote lam <- lam* before a priced add (auxiliary.c:158-159)
        padd = padd0 * (stt == EXIT_RUNNING).astype(f32)
        lam = jnp.where(padd > 0, lam_star * act, lam)

        # Schur complement & singularity (factorization.c:7-98)
        if has_sw:
            # main add's Gram diagonal: per-side rho when the slack is
            # FREE (factorization.c:31-40 SW branch).  The FIXED/FREE
            # state is derived from the entering dual vs its slack bound
            # (auxiliary.c:30-36) — except on the two re-add paths, which
            # enter with the FLIPPED previous state (auxiliary.c:264-273)
            rho_side = add_lo * jnp.sum(add_oh * rls, axis=0,
                                        keepdims=True) \
                + (1.0 - add_lo) * jnp.sum(add_oh * rus, axis=0,
                                           keepdims=True)
            d_ls_add = jnp.sum(add_oh * dls, axis=0, keepdims=True)
            d_us_add = jnp.sum(add_oh * dus, axis=0, keepdims=True)
            free_der = add_lo * (add_lam <= -d_ls_add).astype(f32) \
                + (1.0 - add_lo) * (add_lam >= d_us_add).astype(f32)
            override = sw_readd + pend_readd
            free_val = pend_readd * pfx + sw_readd * rm_was_fixed
            free_main = override * free_val \
                + (1.0 - override) * free_der
            contributes = add_soft * free_main
            dii = jnp.sum(mj * mj, axis=0, keepdims=True) \
                + rho_side * contributes
        else:
            dii = jnp.sum(mj * mj, axis=0, keepdims=True) + rho * add_soft
        # post-removal counts: ``act`` is the top-of-iteration mask, so on
        # the pending-retry path (add after a blocking removal) the rank
        # cap must not count the just-removed row (ldp_flat counts
        # ``used`` after the masked removal)
        if has_sw:
            # the double add first: blocker re-enters FREE right after
            # its own deletion; its Schur chain rides the SAME E passes
            # (a_b against post-deletion E is ab_post; the main add's
            # Schur vector then gains the blocker's rank-one correction
            # algebraically instead of a fourth E pass)
            rho_b = rm_was_lower * jnp.sum(oh_rm * rls, axis=0,
                                           keepdims=True) \
                + (1.0 - rm_was_lower) * jnp.sum(oh_rm * rus, axis=0,
                                                 keepdims=True)
            dii_b = jnp.sum(mj_b * mj_b, axis=0, keepdims=True) + rho_b
            sval_b = dii_b - jnp.sum(g_bk * ab_post, axis=0,
                                     keepdims=True)
            both = both0 * (1.0 - bad.astype(f32))
            k_rm = jnp.sum(act, axis=0, keepdims=True) - do_rm
            fs_cnt = jnp.sum(act * sf * (1.0 - sfx), axis=0,
                             keepdims=True)
            fs_rm = do_rm * rm_was_soft * (1.0 - rm_was_fixed)
            gate_b = jnp.maximum(singtol,
                                 jnp.minimum(f32(1e-4) * dii_b,
                                             f32(0.25) * rho_b))
            sing_b = ((sval_b < gate_b)
                      | (k_rm >= n_true + fs_cnt - fs_rm + 1.0)
                      ).astype(f32)
            # a singular both-add is simply skipped (it is structurally
            # nonsingular — its pivot IS rho_b — and parking it would
            # clobber the held pend state); pricing re-selects the row
            ok_b = both * (1.0 - sing_b)
            w_b = jnp.where(oh_rm > 0, -1.0, ab_post * act)
            c_b = ok_b / jnp.where(sval_b != 0, sval_b, 1.0)
            # chain the main add's Schur data through the blocker's
            # rank-one: E2 = E1 + c_b w_b w_b', g2 = g_k + ok_b g_rm oh_rm
            g_rm = jnp.sum(oh_rm * g, axis=0, keepdims=True)
            cross = jnp.sum(w_b * g_k, axis=0, keepdims=True) \
                - ok_b * g_rm
            a_main = a_post + c_b * w_b * cross
            a_main_rm = jnp.sum(oh_rm * a_main, axis=0, keepdims=True)
            sval = dii - (jnp.sum(g_k * a_main, axis=0, keepdims=True)
                          + ok_b * g_rm * a_main_rm)
            k = k_rm + ok_b
            # rank cap counts FREE soft actives only (ldp_flat._try_add)
            ns_act = fs_cnt - fs_rm + ok_b + contributes
        else:
            a_main = a_post
            sval = dii - jnp.sum(g_k * a_post, axis=0, keepdims=True)
            k = jnp.sum(act, axis=0, keepdims=True) - do_rm
            if has_soft:
                rm_soft = do_rm * jnp.sum(oh_rm * sf, axis=0,
                                          keepdims=True)
                ns_act = (jnp.sum(act * sf, axis=0, keepdims=True)
                          - rm_soft + add_soft)
            else:
                ns_act = 0.0
        # relative pivot gate on top of the absolute sing_tol: in f32 a
        # ~1e-6 pivot passes the f64-era absolute gate but 1/s amplifies
        # the rank-one update's rounding into the whole inverse — a
        # Bland trajectory on this kernel exited OPTIMAL with x 5.8e-2
        # off through exactly such an add (same fix as the slot kernel;
        # a gated add goes PENDING, the reference's own singular path).
        # With SOFT rows in play, LEGITIMATE pivots go down to ~rho_soft:
        # a conflicting soft add's Schur complement IS rho
        # (factorization.c:31-40) and a hard add against an active
        # conflicting soft row gives rho/(1+rho) — so the soft variant's
        # gate is clamped below rho (observed: the 1e-4*dii gate sent
        # those adds to PENDING and conflicting-soft lanes exited
        # INFEASIBLE on the smoke case).  Under SW the clamp uses the
        # lane's smallest per-side rho over its soft rows.
        if has_sw:
            gate = jnp.maximum(singtol,
                               jnp.minimum(f32(1e-4) * dii,
                                           f32(0.25) * rho_min))
        elif has_soft:
            gate = jnp.maximum(singtol,
                               jnp.minimum(f32(1e-4) * dii,
                                           f32(0.25) * rho))
        else:
            gate = jnp.maximum(singtol, f32(1e-4) * dii)
        sing = ((sval < gate) | (k >= n_true + ns_act)).astype(f32)

        if has_sw:
            do_add = (retry + pend_readd + sw_readd) \
                * (1.0 - bad.astype(f32)) + padd
        else:
            do_add = retry * (1.0 - bad.astype(f32)) + padd
        ok = do_add * (1.0 - sing)
        w = jnp.where(add_oh > 0, -1.0, a_main * act)
        # E pass 3: combined deletion + rescale [+ blocker re-add]
        # + bordered addition
        if has_sw:
            update_E(-do_rm / err_s, e,
                     ok / jnp.where(sval != 0, sval, 1.0), w, keep,
                     c_b=c_b, w_b=w_b)
            au = jnp.minimum(au + ok_b * oh_rm * (1.0 - rm_was_lower),
                             1.0)
            al = jnp.minimum(al + ok_b * oh_rm * rm_was_lower, 1.0)
            lam = lam + ok_b * oh_rm * ls_rm
            sfx = sfx * (1.0 - ok_b * oh_rm)      # blocker re-adds FREE
        else:
            update_E(-do_rm / err_s, e,
                     ok / jnp.where(sval != 0, sval, 1.0), w, keep)
        au = jnp.minimum(au + ok * add_oh * (1.0 - add_lo), 1.0)
        al = jnp.minimum(al + ok * add_oh * add_lo, 1.0)
        lam = lam + ok * add_oh * add_lam

        mk_pend = do_add * sing
        if has_sw:
            sfx = sfx * (1.0 - ok * add_oh) \
                + ok * add_oh * (1.0 - free_main)
            pd = jnp.minimum(pd * (1.0 - retry) * (1.0 - pend_block)
                             + mk_pend, 1.0)
            pfx = jnp.where(mk_pend > 0, 1.0 - free_main, pfx)
        else:
            pd = jnp.minimum((1.0 - retry) * pd + mk_pend, 1.0)
        po = jnp.where(mk_pend > 0, add_oh, po) * pd
        plm = jnp.where(mk_pend > 0, add_lam, plm)
        plo = jnp.where(mk_pend > 0, add_lo, plo)

        it = it + run
        if has_sw:
            return (au, al, lam, ls, pd, po, plm, plo, sfx, pfx, u, fv,
                    bf, cy, rp, it, stt)
        return (au, al, lam, ls, pd, po, plm, plo, u, fv, bf, cy, rp,
                it, stt)

    if has_sw:
        carry = (jnp.zeros((), jnp.int32),
                 au_o[:], al_o[:], lam_o[:], ls_o[:],
                 pd_o[:], po_o[:], pl_o[:], plo_o[:], sfx_o[:], pfx_o[:],
                 u_o[:], fv_o[:], bf_o[:], cy_o[:], rp_o[:], it_o[:],
                 stt_o[:])
    else:
        carry = (jnp.zeros((), jnp.int32),
                 au_o[:], al_o[:], lam_o[:], ls_o[:],
                 pd_o[:], po_o[:], pl_o[:], plo_o[:], u_o[:],
                 fv_o[:], bf_o[:], cy_o[:], rp_o[:], it_o[:],
                 stt_o[:])

    # step-level early exit: stop as soon as every lane of the tile is
    # terminal instead of burning the full ``steps`` quota (the lockstep
    # tail); converged lanes inside a still-live tile are masked by ``run``
    def loop_cond(c):
        return (c[0] < steps) & jnp.any(c[-1] == EXIT_RUNNING)

    def loop_body(c):
        return (c[0] + 1,) + body(c[0], c[1:])

    carry = lax.while_loop(loop_cond, loop_body, carry)
    for ref, val in zip(small_out, carry[1:]):
        ref[:] = val


def run_kernel_round(s: DenseState, st: Settings, n_true: int,
                     steps: int = 64,
                     interpret: bool = False,
                     has_soft: bool = True) -> DenseState:
    """One kernel round: ``steps`` masked iterations per lane, tiled over
    the batch in 128-lane programs.  The SOFT_WEIGHTS variant is selected
    by the state itself (``s.sw_dls is not None``) — a separate Mosaic
    compile; the plain path's buffer/pass structure is unchanged."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)
    has_sw = s.sw_dls is not None
    if has_sw:
        has_soft = True

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    state_names = ['act_up', 'act_lo', 'E', 'lam', 'lam_star', 'pend',
                   'pend_oh', 'pend_lam', 'pend_lo'] \
        + (['sfix', 'pfix'] if has_sw else []) \
        + ['u', 'fval', 'best_fval', 'cycle', 'repaired', 'iterations',
           'status']
    in_state = [getattr(s, nm) for nm in state_names]
    const = [s.M, s.dupper, s.dlower, s.scaling,
             s.immut + 2.0 * s.soft, s.fbound] \
        + ([s.sw_dls, s.sw_dus, s.sw_rls, s.sw_rus] if has_sw else [])
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] + [spec(a.shape) for a in const[1:]] \
        + [any_spec for _ in in_state]
    out_specs = tuple(any_spec if a is s.E else spec(a.shape)
                      for a in in_state)
    out_shape = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in in_state)
    scratch_shapes = [pltpu.VMEM((m, m, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32)]
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_kernel_body, st, m, n, n_true, steps,
                               has_soft, has_sw, bool(interpret))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        # the XLA scoped-vmem default (16 MB) is below v5e's physical
        # VMEM; the skip-converged-tiles restructure sits at 16.12 MB
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(*const, *in_state)
    return s._replace(**dict(zip(state_names, outs)))


# ---------------------------------------------------------------------------
# JAX driver: init, between-round repair, outer loop, extraction
# ---------------------------------------------------------------------------
_HI = lax.Precision.HIGHEST


def dense_init(M_b, du_b, dl_b, sc_b, immut_b, soft_b=None,
               fbound_b=None, sw_b=None) -> DenseState:
    """Build lanes-last state from batch-leading LDP data arrays
    ((B, m, n), (B, m), ...).

    m and n are zero-padded to multiples of 8 (TPU DMA slice tiling);
    padded rows get infinite bounds and the IMMUTABLE mask so they never
    participate.  Callers slice outputs back to the true sizes.

    ``fbound_b`` is the optional per-lane LDP-space dual objective bound
    ((B,); defaults to +inf = no cut): 2*fval_bound in QP space, or a
    BnB incumbent bound (daqp.c:20-23, bnb.c:29-31).

    ``sw_b`` is an optional SOFT_WEIGHTS pytree with (B, m)
    scaling-NORMALIZED fields ``d_ls/d_us/rho_ls/rho_us`` (zeroed on
    hard rows — the caller normalizes like ``batch._solve_one_flat``);
    it selects the SW kernel variant.
    """
    B, m, n = M_b.shape
    f32 = jnp.float32
    mp = (-m) % 8
    np_ = (-n) % 8
    if mp or np_:
        M_b = jnp.pad(M_b, ((0, 0), (0, mp), (0, np_)))
        big = jnp.asarray(DAQP_INF, du_b.dtype)
        du_b = jnp.pad(du_b, ((0, 0), (0, mp)), constant_values=big)
        dl_b = jnp.pad(dl_b, ((0, 0), (0, mp)), constant_values=-big)
        sc_b = jnp.pad(sc_b, ((0, 0), (0, mp)), constant_values=1.0)
        immut_b = jnp.pad(immut_b, ((0, 0), (0, mp)), constant_values=1.0)
        if soft_b is not None:
            soft_b = jnp.pad(soft_b, ((0, 0), (0, mp)))
        if sw_b is not None:
            sw_b = jax.tree_util.tree_map(
                lambda x: jnp.pad(x, ((0, 0), (0, mp))), sw_b)
        m, n = m + mp, n + np_
    if soft_b is None:
        soft_b = jnp.zeros_like(immut_b)
    if fbound_b is None:
        fbound_b = jnp.full((B,), DAQP_INF, f32)
    T = lambda x: jnp.moveaxis(x, 0, -1)
    z_m = jnp.zeros((m, B), f32)
    z1 = jnp.zeros((1, B), f32)
    sw_fields = {}
    if sw_b is not None:
        sw_fields = dict(sw_dls=T(sw_b.d_ls).astype(f32),
                         sw_dus=T(sw_b.d_us).astype(f32),
                         sw_rls=T(sw_b.rho_ls).astype(f32),
                         sw_rus=T(sw_b.rho_us).astype(f32),
                         sfix=z_m, pfix=z1)
    return DenseState(
        M=T(M_b).astype(f32), dupper=T(du_b).astype(f32),
        dlower=T(dl_b).astype(f32), scaling=T(sc_b).astype(f32),
        immut=T(immut_b).astype(f32),
        soft=T(soft_b).astype(f32),
        fbound=fbound_b.astype(f32).reshape(1, B),
        act_up=z_m, act_lo=z_m, E=jnp.zeros((m, m, B), f32),
        lam=z_m, lam_star=z_m,
        pend=z1, pend_oh=z_m, pend_lam=z1, pend_lo=z1,
        u=jnp.zeros((n, B), f32), fval=z1, best_fval=z1 - 1.0,
        cycle=z1, repaired=z1, iterations=z1,
        status=jnp.full((1, B), EXIT_RUNNING, jnp.int32),
        **sw_fields)


def _gram(s: DenseState, st: Settings):
    """G = (act M)(act M)' on the active block, identity on inactive
    rows/cols; batch-last einsum (rides the MXU).  Under SOFT_WEIGHTS
    only FREE slacks carry their per-side rho on the diagonal
    (factorization.c:31-40 SW branch; mirrors ``ldp_flat.flat_gram``)."""
    m = s.M.shape[0]
    act = s.act_up + s.act_lo                     # (m, B)
    Ma = s.M * act[:, None, :]
    G = jnp.einsum('ikb,jkb->ijb', Ma, Ma, precision=_HI)
    G = G * (act[:, None, :] * act[None, :, :])
    eye = jnp.eye(m, dtype=G.dtype)[:, :, None]
    if s.sw_dls is not None:
        rho_w = s.act_lo * s.sw_rls + s.act_up * s.sw_rus
        diag = act * s.soft * (1.0 - s.sfix) * rho_w
    else:
        diag = act * s.soft * st.rho_soft
    return G + eye * (1.0 - act)[None, :, :] + eye * diag[None, :, :]


def _batched_gram_inverse(Gb, st: Settings, allow_tile: bool = False):
    """(B, m, m) SPD-on-used-block -> (inverse, ok_lane).

    With ``allow_tile`` (TPU, f32, 128-multiple batch) this runs the
    tile-layout factorization kernel (G = R'R -> G^{-1} = Rinv Rinv'):
    ~5x faster than the XLA cholesky + triangular-solve expanders at
    these shapes — paid per BnB node wave and per bulk activation.  The
    tile kernel clamps non-PD pivots instead of producing NaN, so a
    residual verification ||G E - I|| parks doubtful lanes (the clamp +
    pivot-ratio test alone passed lanes that should fail — caught by
    scripts/tpu_smoke.py as wrong exit flags on dependent/infeasible
    activation sets).  Repair paths must pass allow_tile=False: they are
    the exactness escape hatch.  Default path: XLA expanders at HIGHEST
    precision (the ambient 'high' 3-pass bf16 context leaves ~5e-3
    primal error on equality-heavy f32 lanes on the real chip)."""
    B, m, _ = Gb.shape
    dtype = Gb.dtype
    use_tile = allow_tile and (jax.default_backend() == 'tpu') \
        and dtype == jnp.float32 and (B % 128 == 0)
    if use_tile:
        from . import chol as chol_ops
        Rinv = chol_ops.batched_chol_rinv_tile(Gb)
        E = jnp.matmul(Rinv, jnp.swapaxes(Rinv, 1, 2),
                       precision=jax.lax.Precision.HIGHEST)
        P = jnp.matmul(Gb, E, precision=jax.lax.Precision.HIGHEST)
        eye = jnp.eye(m, dtype=dtype)
        resid = jnp.max(jnp.abs(P - eye), axis=(1, 2))
        ok_lane = jnp.all(jnp.isfinite(E), axis=(1, 2)) & (resid < 1e-2)
        return E, ok_lane
    with jax.default_matmul_precision('highest'):
        cF = jnp.linalg.cholesky(Gb)
        ok_lane = jnp.all(jnp.isfinite(cF), axis=(1, 2))
        cF = jnp.where(ok_lane[:, None, None], cF,
                       jnp.eye(m, dtype=dtype))
        E = jax.scipy.linalg.cho_solve(
            (cF, True), jnp.broadcast_to(jnp.eye(m, dtype=dtype),
                                         Gb.shape))
    ok_lane = ok_lane & jnp.all(jnp.isfinite(E), axis=(1, 2))
    return E, ok_lane


def dense_activate(s: DenseState, up_mask, lo_mask,
                   st: Settings) -> DenseState:
    """Bulk-activate a prescribed starting set (equalities and warm
    starts: the role of ``daqp_activate_constraints``,
    auxiliary.c:398-478): set the side masks and build the inverse Gram
    with one batched factorization.  A lane whose set is numerically
    dependent is parked for the driver's exact repair (which fails it
    loudly as EXIT_CYCLE rather than silently dropping an equality)."""
    dtype = s.E.dtype
    act_up = up_mask.astype(dtype)
    act_lo = lo_mask.astype(dtype)
    s2 = s._replace(act_up=act_up, act_lo=act_lo)
    if s.sw_dls is not None:
        # slack FIXED/FREE state of a bulk-activated row from its seed
        # dual lam = +-1 vs the slack bound (ldp_flat._try_add semantics)
        free_up = (s.sw_dus <= 1.0).astype(dtype)
        free_lo = (s.sw_dls <= 1.0).astype(dtype)
        s2 = s2._replace(sfix=act_up * (1.0 - free_up)
                         + act_lo * (1.0 - free_lo))
    G = _gram(s2, st)
    # allow_tile measured: no pipeline gain anywhere (configs 3-5 flat to
    # slightly down) — the activation factorization is not the wave
    # bottleneck, and the tile path needs an extra residual gate for
    # dependent/infeasible sets.  Keep the exact XLA path.
    E, ok_lane = _batched_gram_inverse(jnp.moveaxis(G, -1, 0), st)
    act = act_up + act_lo
    E = jnp.moveaxis(E, 0, -1) * (act[:, None, :] * act[None, :, :])
    lam0 = (act_up - act_lo).astype(dtype)
    status = jnp.where(ok_lane[None, :], s.status, EXIT_REFACTOR)
    return s2._replace(E=E, lam=lam0, status=status.astype(jnp.int32))


def dense_add_row(s: DenseState, oh_m, lo, lam_seed, mask,
                  st: Settings, n_true: int) -> "tuple":
    """Bordered addition of ONE constraint per lane into the dense-mask
    inverse Gram OUTSIDE the kernel (batched XLA einsums): the m-space
    analogue of ``slot_add_row`` — used by the batched hierarchical
    tier's reactivation (hierarchical.c:86-95).

    ``oh_m`` (m, B) one-hot row, ``lo``/``lam_seed``/``mask`` (1, B).
    Returns ``(state, ok)`` where ``ok`` (1, B) flags a non-singular
    applied add (a singular one is skipped — the caller drops the
    entry, hierarchical.c:89-93)."""
    dtype = s.E.dtype
    act = s.act_up + s.act_lo
    mj = jnp.einsum('mb,mnb->nb', oh_m, s.M, precision=_HI)    # (n, B)
    g = jnp.einsum('mnb,nb->mb', s.M, mj, precision=_HI) * act
    a = jnp.einsum('ijb,jb->ib', s.E, g, precision=_HI)
    soft_r = jnp.sum(oh_m * s.soft, axis=0, keepdims=True)
    rho = jnp.asarray(st.rho_soft, dtype)
    dii = jnp.sum(mj * mj, axis=0, keepdims=True) + rho * soft_r
    sval = dii - jnp.sum(g * a, axis=0, keepdims=True)
    gate = jnp.maximum(jnp.asarray(st.sing_tol, dtype),
                       jnp.minimum(1e-4 * dii, 0.25 * rho + 1e-30)
                       if True else 0)
    # soft adds legitimately pivot at rho; hard adds against soft
    # actives at ~rho/(1+rho) — clamp like the kernel's soft gate
    kcnt = jnp.sum(act, axis=0, keepdims=True)
    ns_act = jnp.sum(act * s.soft, axis=0, keepdims=True) + soft_r
    ok = mask * (sval >= gate).astype(dtype) \
        * (kcnt < n_true + ns_act).astype(dtype)
    w = a * act - oh_m
    c = ok / jnp.where(sval != 0, sval, 1.0)
    E = s.E + c[None, :, :] * w[:, None, :] * w[None, :, :]
    return s._replace(
        E=E,
        act_up=jnp.minimum(s.act_up + ok * oh_m * (1.0 - lo), 1.0),
        act_lo=jnp.minimum(s.act_lo + ok * oh_m * lo, 1.0),
        lam=s.lam + ok * oh_m * lam_seed), ok


def dense_reactivate(s: DenseState, st: Settings, n_true: int,
                     start: int):
    """Rebuild the inverse Gram from the current act masks by SEQUENTIAL
    masked re-adds in row order, dropping entries that became linearly
    dependent — the batched analogue of the reference's post-hardening
    reactivation (hierarchical.c:72-95; the explicit inverse has no
    reusable prefix, so the whole set is rebuilt — identical math, see
    ``hierarchical._reactivate``).

    Returns ``(state, n_imm)`` where ``n_imm`` (B,) counts IMMUTABLE
    rows at/after ``start`` that were successfully re-added (the
    reference's degrees-of-freedom decrement, hierarchical.c:94)."""
    dtype = s.E.dtype
    m = s.M.shape[0]
    up0, lo0 = s.act_up, s.act_lo
    lam0 = s.lam_star
    iota = jnp.arange(m, dtype=dtype)[:, None]
    s = s._replace(E=jnp.zeros_like(s.E),
                   act_up=jnp.zeros_like(up0),
                   act_lo=jnp.zeros_like(lo0),
                   lam=jnp.zeros_like(s.lam))

    def body(i, carry):
        s, n_imm = carry
        oh = (iota == i).astype(dtype) * jnp.ones_like(up0[0:1])
        was = jnp.sum(oh * (up0 + lo0), axis=0, keepdims=True)
        lo = jnp.sum(oh * lo0, axis=0, keepdims=True)
        seed = jnp.sum(oh * lam0, axis=0, keepdims=True)
        s, ok = dense_add_row(s, oh, lo, seed, was, st, n_true)
        imm_i = jnp.sum(oh * s.immut, axis=0, keepdims=True)
        in_lvl = (jnp.asarray(i, dtype) >= start).astype(dtype)
        n_imm = n_imm + (ok * imm_i * in_lvl)[0]
        return s, n_imm

    s, n_imm = jax.lax.fori_loop(
        0, m, body, (s, jnp.zeros((s.E.shape[-1],), dtype)))
    return s, n_imm


def warm_guess(s: DenseState, st: Settings, n_true: int) -> DenseState:
    """Bulk cold-start heuristic: activate the constraints violated at the
    unconstrained optimum u = 0 (capped at n_true - 1, most-violated
    first) and build their inverse Gram with ONE batched Cholesky on the
    MXU, so the kernel only corrects the guess instead of adding ~n_act
    constraints one iteration at a time.

    This is the reference's own warm-start machinery
    (``daqp_primal_init_active`` + ``daqp_activate_constraints``,
    api.c:555-592 / auxiliary.c:398-478) used as a cold-start heuristic;
    a lane whose guessed set is numerically dependent falls back to the
    empty start.

    Measured on BASELINE config 2 (random geometry, ~40 active): the
    guess cuts median iterations only 97 -> 82 while the batched Cholesky
    costs more than the saved iterations, so it is OFF by default; it
    pays off when the guess is informative (structured/MPC instances).
    """
    m, n, B = s.M.shape
    dtype = s.E.dtype
    # violation at u = 0: d_upper < 0 or d_lower > 0
    score = jnp.maximum(-s.dupper, s.dlower)             # (m, B)
    side_lo = s.dlower > -s.dupper
    viol = (score > st.primal_tol * s.scaling) & (s.immut == 0)
    order = jnp.argsort(jnp.where(viol, -score, jnp.inf), axis=0)
    rank = jnp.argsort(order, axis=0)
    keep = viol & (rank < n_true - 1)
    act_up = (keep & ~side_lo).astype(dtype)
    act_lo = (keep & side_lo).astype(dtype)
    s2 = s._replace(act_up=act_up, act_lo=act_lo)
    if s.sw_dls is not None:
        s2 = s2._replace(sfix=act_up * (s.sw_dus > 1.0).astype(dtype)
                         + act_lo * (s.sw_dls > 1.0).astype(dtype))

    G = _gram(s2, st)
    E, ok_lane = _batched_gram_inverse(jnp.moveaxis(G, -1, 0), st)
    act = act_up + act_lo
    E = jnp.moveaxis(E, 0, -1) * (act[:, None, :] * act[None, :, :])

    okb = ok_lane[None, :]
    lam0 = jnp.where(keep, jnp.where(side_lo, -1.0, 1.0),
                     0.0).astype(dtype)
    out = s._replace(
        act_up=jnp.where(okb, act_up, s.act_up),
        act_lo=jnp.where(okb, act_lo, s.act_lo),
        E=jnp.where(okb[None, :, :], E, s.E),
        lam=jnp.where(okb, lam0, s.lam))
    if s.sw_dls is not None:
        out = out._replace(sfix=jnp.where(okb, s2.sfix, s.sfix))
    return out


def exact_repair(s: DenseState, st: Settings) -> DenseState:
    """Exact Cholesky refactorization of E for parked / cycling lanes
    (the escape hatch for the kernel's deletion-pivot guard and the
    one-shot cycle repair, daqp.c:66-85).  Call under a lax.cond gated on
    ``jnp.any(repair_needed(s))`` — it prices a batched (B, m, m)
    Cholesky."""
    m = s.M.shape[0]
    act = s.act_up + s.act_lo
    actm = act[:, None, :] * act[None, :, :]
    G = _gram(s, st)
    Gb = jnp.moveaxis(G, -1, 0)                  # (B, m, m)
    Eb = jnp.moveaxis(s.E, -1, 0)

    parked = s.status[0] == EXIT_REFACTOR
    cyc = (s.status[0] == EXIT_CYCLE) & (s.repaired[0] == 0)
    need = parked | cyc
    E_exact, exact_ok = _batched_gram_inverse(Gb, st)
    fix = need & exact_ok
    Eb = jnp.where(fix[:, None, None], E_exact, Eb)
    E2 = jnp.moveaxis(Eb, 0, -1) * actm
    status = jnp.where(fix[None, :], EXIT_RUNNING, s.status)
    status = jnp.where((parked & ~exact_ok)[None, :], EXIT_CYCLE, status)
    # a cycling lane's pending constraint is dropped and re-priced
    drop = (cyc & exact_ok)[None, :].astype(s.pend.dtype)
    return s._replace(
        E=E2, status=status,
        pend=s.pend * (1 - drop),
        pend_oh=s.pend_oh * (1 - drop),
        repaired=jnp.minimum(s.repaired + (cyc & exact_ok)[None, :], 1.0),
        cycle=s.cycle * (1 - fix[None, :]),
        best_fval=jnp.where(fix[None, :], -1.0, s.best_fval))


def repair_needed(s: DenseState):
    return (s.status[0] == EXIT_REFACTOR) \
        | ((s.status[0] == EXIT_CYCLE) & (s.repaired[0] == 0))


def newton_refresh(s: DenseState, st: Settings) -> DenseState:
    """One Newton step E <- E(2I - G E) of the inverse Gram against the
    exactly-rebuilt Gram — the dense-mask analogue of
    ``pallas_slot.newton_refresh`` (see its docstring for the failure
    mode it repairs).  Guarded by the contraction condition
    ||G E - I|| < 1/2 per lane.  Without it, the refinement in ``polish``
    corrects through a drifted f32 inverse and can STALL: an SW lane with
    an ill-conditioned 7-row working set exited SOFT_OPTIMAL with a hard
    ACTIVE row violated by 2.4e-4 (the active-row residual is invisible
    to the re-price, which only checks inactive rows) —
    tests/test_pallas_sw.py's defaults differential caught it."""
    act = s.act_up + s.act_lo
    actm = act[:, None, :] * act[None, :, :]
    G = _gram(s, st)                              # (m, m, B)
    m = s.M.shape[0]
    eye = jnp.eye(m, dtype=s.E.dtype)[:, :, None]
    Iu = eye * act[None, :, :]
    P = jnp.einsum('ikb,kjb->ijb', G, s.E, precision=_HI) * actm
    resid = jnp.max(jnp.abs(P - Iu), axis=(0, 1))          # (B,)
    E_new = jnp.einsum('ikb,kjb->ijb', s.E, 2.0 * Iu - P,
                       precision=_HI) * actm
    okf = (resid < 0.5).astype(s.E.dtype)[None, None, :]
    return s._replace(E=okf * E_new + (1.0 - okf) * s.E)


def polish(s: DenseState, st: Settings, refine_steps: int = 2) -> DenseState:
    """``refine_steps`` chained iterative-refinement steps of (lam*, u)
    for optimal lanes plus a re-price that re-opens a lane if a violation
    survives (auxiliary.c:497-588 + the optimal-path re-check,
    daqp.c:47-63).  Runs OUTSIDE the round loop — accuracy work, not
    progress work.  E is Newton-polished against the exact Gram first so
    the refinement corrects through a tight inverse (see
    ``newton_refresh``).  Two chained steps for the same reason as
    ``ldp_flat.flat_polish``: one step through a drifted f32 E left a
    soft-heavy lane 2.5e-4 off with a clean flag."""
    s = newton_refresh(s, st)
    act = s.act_up + s.act_lo
    is_opt = (s.status[0] == EXIT_OPTIMAL) \
        | (s.status[0] == EXIT_SOFT_OPTIMAL)
    d_W = s.act_up * s.dupper + s.act_lo * s.dlower
    if s.sw_dls is not None:
        free_soft = act * s.soft * (1.0 - s.sfix)
        rho_w = s.act_lo * s.sw_rls + s.act_up * s.sw_rus
        d_slack = s.act_lo * s.sw_dls - s.act_up * s.sw_dus

    def residual(lam_star, u):
        # lanes-last multiply-reduce contractions: a batch-last einsum
        # would physically transpose the 40+ MB E buffer every call
        r = jnp.sum(s.M * u[None, :, :], axis=1) - d_W
        if s.sw_dls is not None:
            # FREE soft slacks: per-side weight + slack-bound term in the
            # residual (auxiliary.c:522-533; ldp_flat.flat_polish)
            return (r - free_soft * rho_w * (lam_star + d_slack)) * act
        return (r - st.rho_soft * s.soft * lam_star) * act

    lam_star, u2, okl = s.lam_star, s.u, is_opt
    for _ in range(refine_steps):
        dlam = jnp.sum(s.E * residual(lam_star, u2)[None, :, :], axis=1)
        okl = okl & jnp.all(jnp.isfinite(dlam), axis=0)
        dlam = jnp.where(okl[None, :], dlam * act, 0)
        lam_star = lam_star + dlam
        u2 = u2 - jnp.sum(s.M * dlam[:, None, :], axis=0)
    lam_star = jnp.where(okl[None, :], lam_star, s.lam_star)
    u2 = jnp.where(okl[None, :], u2, s.u)
    if s.sw_dls is not None:
        slack2 = jnp.sum(s.soft * act * rho_w * lam_star * lam_star,
                         axis=0, keepdims=True)
    else:
        slack2 = st.rho_soft * jnp.sum(s.soft * act * lam_star
                                       * lam_star, axis=0, keepdims=True)
    fv2 = jnp.sum(u2 * u2, axis=0, keepdims=True) + slack2
    mu = jnp.sum(s.M * u2[None, :, :], axis=1)
    blocked = (act > 0) | (s.immut > 0)
    viol = (((s.dupper - mu) < -st.primal_tol * s.scaling)
            | ((mu - s.dlower) < -st.primal_tol * s.scaling)) & ~blocked
    # dual re-check (see pallas_slot.polish): a refined lam* with the
    # wrong sign on a mutable active row reveals a working set the
    # drifted E had wrongly accepted — re-open the lane
    up_bad = (lam_star < -st.dual_tol).astype(act.dtype)
    lo_bad = (lam_star > st.dual_tol).astype(act.dtype)
    bad_rows = (s.act_lo * lo_bad + s.act_up * up_bad) * (1.0 - s.immut)
    if s.sw_dls is not None:
        # SW soft rows follow the slack-bound rules, not the hard sign
        # convention (ldp_flat.flat_polish)
        bad_rows = bad_rows * (1.0 - s.soft)
    dual_bad = jnp.any(bad_rows > 0, axis=0)
    reopen = okl & (jnp.any(viol, axis=0) | dual_bad)
    return s._replace(
        lam_star=jnp.where(okl[None, :], lam_star, s.lam_star),
        u=u2,
        fval=jnp.where(okl[None, :], fv2, s.fval),
        status=jnp.where(reopen[None, :], EXIT_RUNNING, s.status))


def dense_solve(s: DenseState, st: Settings, n_true: int = None,
                steps: int = 192,
                max_rounds: int = 16, interpret: bool = False,
                warm: bool = False, has_soft: bool = True,
                deadline=None) -> DenseState:
    """Kernel rounds until every lane is terminal; exact repair runs only
    when some lane actually needs it (a real branch at batch level — a
    whole-batch lax.cond, unlike per-lane conds under vmap); refinement
    polish runs after convergence, with up to two bounded re-open cycles
    for lanes whose refined iterate still shows a violation.

    ``steps`` default measured on v5e at the BASELINE config-2 shape
    with per-call batch 256: 64 -> 49.5k, 128 -> 49.2k, 192 -> 50.5k,
    256 -> 49.8k solves/s — with the in-kernel early exit, overshooting
    a tile's need is nearly free while extra rounds cost driver passes
    (a parked EXIT_REFACTOR lane does wait out the round before its
    repair, a latency-only effect)."""
    iter_limit = jnp.minimum(
        jnp.asarray(st.iter_limit, jnp.float32),
        jnp.asarray(steps * max_rounds, jnp.float32))
    nt = s.M.shape[1] if n_true is None else n_true
    if warm:
        s = warm_guess(s, st, nt)
    # lanes parked by a failed bulk activation get their exact-repair shot
    # before the first kernel round
    s = lax.cond(jnp.any(repair_needed(s)),
                 lambda s: exact_repair(s, st), lambda s: s, s)

    def check_deadline(s):
        # wall-clock check between kernel ROUNDS (daqp.c:95-103 analogue);
        # deadline=None (static) compiles the host callback out
        if deadline is None:
            return s
        from ..utils.timers import now_callback
        from ..types import EXIT_TIMELIMIT
        t = now_callback()
        return s._replace(status=jnp.where(
            (t > deadline) & (s.status == EXIT_RUNNING),
            EXIT_TIMELIMIT, s.status).astype(jnp.int32))

    s = check_deadline(s)

    def rounds(c):
        r, s = c

        def cond(c):
            r, s = c
            return (r < max_rounds) & jnp.any(
                (s.status == EXIT_RUNNING) & (s.iterations < iter_limit))

        def body(c):
            r, s = c
            s = run_kernel_round(s, st, nt, steps=steps,
                                 interpret=interpret, has_soft=has_soft)
            s = lax.cond(jnp.any(repair_needed(s)),
                         lambda s: exact_repair(s, st), lambda s: s, s)
            s = check_deadline(s)
            return r + 1, s

        return lax.while_loop(cond, body, (r, s))

    r, s = rounds((jnp.zeros((), jnp.int32), s))
    for _ in range(2):
        s = polish(s, st)
        r, s = rounds((r, s))

    done_running = (s.status == EXIT_RUNNING) | (s.status == EXIT_REFACTOR)
    return s._replace(status=jnp.where(
        done_running & (s.iterations >= iter_limit),
        EXIT_ITERLIMIT,
        jnp.where(done_running, EXIT_CYCLE, s.status)).astype(jnp.int32))
