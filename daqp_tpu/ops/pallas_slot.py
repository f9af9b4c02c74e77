"""Slot-space Pallas TPU mega-kernel: the dual active-set loop in VMEM with
the inverse Gram held in SLOT space.

The dense-mask kernel (``pallas_batch.py``) keys the inverse Gram by
constraint row: E is (m, m, L), so every CSP / Schur / update pass moves
O(m^2 L) of VMEM.  At the BASELINE config-2 shape (m = 104 padded,
n = 50) the step loop is ~100% VMEM-bandwidth-bound at ~22 us/step
against a 10-12 us roofline, and ~3 E passes + 6 M passes per step put
most of that traffic in E (ROUND2.md accounting).

This kernel moves the working-set state to K = n+1 SLOTS (56 padded vs
104): an active constraint occupies a slot, identified by ``sid``; E is
(K, K, L) (~3.4x less E traffic) and the active rows are gathered ONCE
into a slot-row table W (K, n, L) at activation/addition time, making
CSP, Schur vectors and the primal update (K-, not m-sized) contractions.
This is exactly ``ldp_flat``'s slot-table formulation (itself the
batched re-architecture of the reference's ordered working set,
``src/daqp.c`` / ``auxiliary.c`` / ``factorization.c``) carried into the
VMEM-resident kernel:

  * deletion ``E -= e e'/e_rr`` zeroes exactly the freed slot's row and
    column, and the bordered addition ``E += w w'/s`` works into ANY
    free slot — no compaction, no gathers; the free slot is a one-hot
    built from an argmin over the ``used`` bitmap;
  * the pending (singular) constraint is held OUT of the table as a
    cached row vector (``prow``), so its Gram column needs a W pass, not
    an m-row M pass;
  * m-space state is reduced to what pricing needs: the act_up/act_lo
    side masks, bounds, and one M pass for mu = M u plus one M pass to
    fetch the priced row.

Per-step VMEM traffic at config 2: ~4 E passes x 1.6 MB + ~5 W passes x
1.4 MB + 2 M passes x 2.7 MB ~= 19 MB vs ~40 MB for the dense-mask
kernel.

The per-lane ``fbound`` input implements the dual-objective dominance
cut (daqp.c:20-23) so BnB incumbents prune node relaxations in-kernel.

Scope: strictly convex QPs, two-sided bounds, HARD constraints
(soft batches route to the dense-mask kernel — a soft working set can
exceed n+1 slots).  Warm/equality activation is supported through
``slot_activate`` (bulk Cholesky in slot space: (B, K, K), ~4x cheaper
than the dense-mask activation).
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
                     EXIT_UNBOUNDED)
from ..ldp_flat import EXIT_REFACTOR

LANES = 128


class SlotState(NamedTuple):
    """Slot-space batched solver state, lanes-last (trailing dim is B)."""
    # problem data (const)
    M: jnp.ndarray        # (m, n, B)
    dupper: jnp.ndarray   # (m, B)
    dlower: jnp.ndarray   # (m, B)
    scaling: jnp.ndarray  # (m, B)
    immut: jnp.ndarray    # (m, B) f32 0/1
    fbound: jnp.ndarray   # (1, B) LDP-space dual objective bound
    # m-space activation masks (pricing + extraction)
    act_up: jnp.ndarray   # (m, B) f32 0/1
    act_lo: jnp.ndarray   # (m, B) f32 0/1
    # slot table
    W: jnp.ndarray        # (K, n, B) active rows by slot
    E: jnp.ndarray        # (K, K, B) inverse Gram on used slots
    dsl: jnp.ndarray      # (K, B) active-side bound value per slot
    used: jnp.ndarray     # (K, B) f32 0/1
    sid: jnp.ndarray      # (K, B) f32 constraint id (-1 = free)
    slo: jnp.ndarray      # (K, B) f32 side (1 = lower)
    simm: jnp.ndarray     # (K, B) f32 immutable slot
    lam: jnp.ndarray      # (K, B)
    lam_star: jnp.ndarray  # (K, B)
    # pending singular addition (held out of the table)
    pend: jnp.ndarray     # (1, B) f32 0/1
    prow: jnp.ndarray     # (n, B) pending row
    plam: jnp.ndarray     # (1, B)
    plo: jnp.ndarray      # (1, B)
    pid: jnp.ndarray      # (1, B) f32 constraint id
    pdd: jnp.ndarray      # (1, B) pending bound value
    # iterates / control
    u: jnp.ndarray        # (n, B)
    fval: jnp.ndarray     # (1, B)
    best_fval: jnp.ndarray  # (1, B)
    cycle: jnp.ndarray    # (1, B)
    repaired: jnp.ndarray  # (1, B)
    iterations: jnp.ndarray  # (1, B)
    status: jnp.ndarray   # (1, B) int32


def _kernel_body(st: Settings, m: int, n: int, K: int, n_true: int,
                 steps: int, always_copy: bool, ablate: frozenset,
                 multi_add: int,
                 M_ref, du_ref, dl_ref, sc_ref, im_ref, si_ref, fb_ref,
                 au_ref, al_ref, W_ref, E_ref, dsl_ref, us_ref, sidr,
                 slor, lam_ref, ls_ref, pd_ref, pr_ref, plm_ref, plo_ref,
                 pid_ref, pdd_ref, u_ref, fv_ref, bf_ref, cy_ref, rp_ref,
                 it_ref, stt_ref,
                 au_o, al_o, W_o, E_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                 ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o,
                 bf_o, cy_o, rp_o, it_o, stt_o,
                 E_s, W_s, M_s):
    """Up to ``steps`` masked slot-space iterations for one 128-lane tile.

    Same tile control as the dense kernel (``pallas_batch._kernel_body``):
    big buffers (E, W, M) live UNBLOCKED in HBM, staged into
    single-buffered VMEM scratch by explicit DMA; small state passes
    through blocked, aliased output windows; a fully terminal tile skips
    the big DMA and the step loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [au_ref, al_ref, dsl_ref, us_ref, sidr, slor, lam_ref,
               ls_ref, pd_ref, pr_ref, plm_ref, plo_ref, pid_ref, pdd_ref,
               u_ref, fv_ref, bf_ref, cy_ref, rp_ref, it_ref, stt_ref]
    out_refs = [au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o, pd_o,
                pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o, bf_o, cy_o,
                rp_o, it_o, stt_o]

    def load_small(sems):
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

    tile_live = jnp.any(stt_o[:] == EXIT_RUNNING) | always_copy

    @pl.when(tile_live)
    def solve_tile():
        def load_big(sems):
            copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                            sems.at[0]),
                      pltpu.make_async_copy(W_ref.at[lane_idx3], W_s,
                                            sems.at[1]),
                      pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                            sems.at[2])]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((3,)))
        _solve_tile_live(st, m, n, K, n_true, steps, ablate, multi_add,
                         du_ref[:], dl_ref[:], sc_ref[:], im_ref[:],
                         si_ref[:], fb_ref[:],
                         au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                         ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                         E_s, W_s, M_s)

        def store_big(sems):
            copies = [pltpu.make_async_copy(E_s, E_o.at[lane_idx3],
                                            sems.at[0]),
                      pltpu.make_async_copy(W_s, W_o.at[lane_idx3],
                                            sems.at[1])]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        pl.run_scoped(store_big, pltpu.SemaphoreType.DMA((2,)))


def _solve_tile_live(st: Settings, m: int, n: int, K: int, n_true: int,
                     steps: int, ablate, multi_add,
                     du, dl, sc, im, simm, fb,
                     au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o,
                     pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o,
                     bf_o, cy_o, rp_o, it_o, stt_o,
                     E_s, W_s, M_s, chunk: int = 8):
    """The live-tile solve loop (state already staged into VMEM).

    ``ablate`` (frozenset of section names, normally empty) is DEV-ONLY
    instrumentation: it stubs out named step sections with shape-matched
    dummies so the per-step cost can be decomposed by differential
    timing on the real chip (scripts/step_ablation.py).  Ablated kernels
    compute WRONG results by design."""
    f32 = jnp.float32
    BIG = f32(DAQP_INF)
    dtol = f32(st.dual_tol)
    ptol = f32(st.primal_tol)
    pivtol = f32(st.pivot_tol)
    singtol = f32(st.sing_tol)
    progtol = f32(st.progress_tol)
    cyctol = f32(st.cycle_tol)

    M = M_s[:]                    # (m, n, L)

    iota_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    iota_mf = iota_m.astype(f32)
    iota_K = lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    iota_Kf = iota_K.astype(f32)

    def contract2_E(x1, x2):
        # out_i = sum_j E[i, j, l] x[j, l], two RHS through one E pass
        E = E_s[:]
        o1 = jnp.sum(E * x1[None, :, :], axis=1)
        o2 = jnp.sum(E * x2[None, :, :], axis=1)
        return o1, o2

    def contractN_E(*xs):
        # N RHS through one E pass
        E = E_s[:]
        return tuple(jnp.sum(E * x[None, :, :], axis=1) for x in xs)

    def rowdot_W(y):
        # out[k, l] = sum_j W[k, j, l] y[j, l]
        return jnp.sum(W_s[:] * y[None, :, :], axis=1)

    def rowdot_W2(y1, y2):
        # two RHS through one W pass
        W = W_s[:]
        return (jnp.sum(W * y1[None, :, :], axis=1),
                jnp.sum(W * y2[None, :, :], axis=1))

    def coldot_W(w):
        # out[j, l] = sum_k W[k, j, l] w[k, l]
        return jnp.sum(W_s[:] * w[:, None, :], axis=0)

    def rowdot_M(y):
        return jnp.sum(M * y[None, :, :], axis=1)

    def coldot_M(w):
        return jnp.sum(M * w[:, None, :], axis=0)

    def first_min_onehot(cand, iota):
        cmin = jnp.min(cand, axis=0, keepdims=True)
        idx = jnp.argmin(cand, axis=0, keepdims=True).astype(jnp.int32)
        oh = (iota == idx).astype(f32)
        return oh, cmin

    def body(carry):
        # lam_star (the CSP solve) and a_p (the pending null direction)
        # are CARRIED: they are computed at the END of the previous step
        # fused into the E/W update passes (write + contract in one
        # buffer pass), saving one full E read and one full W read per
        # step vs recomputing them here (~3 MB of the 19 MB step).
        (i, au, al, dsl, used, sid, slo, lam, ls, pd, prow, plm, plo,
         pid, pdd, u, fv, bf, cy, rp, it, stt, lam_star, a_p) = carry
        run = (stt == EXIT_RUNNING).astype(f32)           # (1, L)

        sgn_p = 1.0 - 2.0 * plo                           # (1, L)
        sdir = -a_p * sgn_p

        # blocking min-ratio line search (auxiliary.c:276-311)
        delta = pd * sdir + (1.0 - pd) * (lam_star - lam)
        signv = pd * sdir + (1.0 - pd) * lam_star
        infeas = slo * (signv > dtol).astype(f32) \
            + (1.0 - slo) * (signv < -dtol).astype(f32)
        elig = infeas * used * (1.0 - simm)
        if 'block2' in ablate:
            elig = used * 0.0
        ratio = -lam / delta
        # An ELIGIBLE (dual-infeasible lam*) slot must ALWAYS be a
        # blocking candidate — the reference's exit gate is "no
        # dual-infeasible lam* entry" (auxiliary.c:283-287), and dropping
        # nonfinite-ratio candidates (delta ~ 0 <=> lam itself at/past
        # the boundary) let a dual-infeasible point exit as optimal
        # (observed: a Bland trajectory returning x 1.5e-2 off with a
        # clean flag).  Nonfinite/negative ratios clamp to a ZERO-step
        # removal — the method's own recovery for a boundary dual.
        ratio = jnp.where(jnp.isfinite(ratio),
                          jnp.maximum(ratio, 0.0), 0.0)
        cand = jnp.where(elig > 0, ratio, BIG)
        if 'argmin' in ablate:
            oh_rm = (iota_K == 0).astype(f32)
            rmin = jnp.min(cand[0:1], axis=0, keepdims=True)
        else:
            oh_rm, rmin = first_min_onehot(cand, iota_K)
        do_rm0 = run * (rmin < BIG).astype(f32)
        if 'sred2' in ablate:
            rm_id, rm_lo = pd * 0.0 - 1.0, pd * 0.0
        else:
            rm_id = jnp.sum(sid * oh_rm, axis=0, keepdims=True)
            rm_lo = jnp.sum(slo * oh_rm, axis=0, keepdims=True)

        # primal + pricing (W pass 2 + M passes)
        u_new = u if 'unew' in ablate else -coldot_W(lam_star * used)
        fv_new = jnp.sum(u_new * u_new, axis=0, keepdims=True)
        mu = (du * 0.0) if 'mu' in ablate else rowdot_M(u_new)  # (m, L)
        bound = -ptol * sc
        if 'pmask2' in ablate:
            up_ok = mu < bound
            lo_ok = mu > -bound
            cand2 = mu
        else:
            v_up = du - mu
            v_lo = mu - dl
            act = au + al
            pblock = pd * (iota_mf == pid).astype(f32)
            blocked = (act > 0) | (im > 0) | (pblock > 0)
            up_ok = (v_up < bound) & ~blocked
            lo_ok = (v_lo < bound) & ~blocked & ~up_ok
            cand2 = jnp.where(up_ok, v_up, jnp.where(lo_ok, v_lo, BIG))
        if int(st.pricing) == 1:
            # Bland's rule (anti-cycling: lowest violated index); a
            # compile-time variant — settings are static in the kernel
            cand2 = jnp.where(up_ok | lo_ok, iota_mf - BIG, BIG)
        if 'argmin' in ablate:
            oh_j = (iota_m == 0).astype(f32)
            vmin = jnp.min(cand2[0:1], axis=0, keepdims=True)
        else:
            oh_j, vmin = first_min_onehot(cand2, iota_m)
        found = (vmin < 0).astype(f32)
        if 'sred2' in ablate:
            j_lo, j_idx, d_j = pd * 0.0, pd * 0.0, pd * 0.0 + 1.0
        else:
            j_lo = jnp.sum(oh_j * lo_ok.astype(f32), axis=0,
                           keepdims=True)
            j_idx = jnp.sum(oh_j * iota_mf, axis=0, keepdims=True)
            d_j = j_lo * jnp.sum(oh_j * dl, axis=0, keepdims=True) \
                + (1.0 - j_lo) * jnp.sum(oh_j * du, axis=0,
                                         keepdims=True)
        if multi_add >= 2:
            # multiple pricing: the runner-up violated constraint is
            # added in the SAME step by a chained bordered update (any
            # primal-violated constraint is a valid add for the dual
            # active-set method — Dantzig's most-violated is a
            # heuristic, auxiliary.c:88-166; measured on the oracle:
            # 0.70x iterations at full accuracy on BASELINE config 2)
            cand2b = jnp.where(oh_j > 0, BIG, cand2)
            if 'argmin' in ablate:
                oh_j2 = (iota_m == 1).astype(f32)
                vmin2 = jnp.min(cand2b[0:1], axis=0, keepdims=True)
            else:
                oh_j2, vmin2 = first_min_onehot(cand2b, iota_m)
            found2 = (vmin2 < 0).astype(f32)
            if 'sred2' in ablate:
                j2_lo, j2_idx, d_j2 = pd * 0.0, pd * 0.0, pd * 0.0 + 1.0
            else:
                j2_lo = jnp.sum(oh_j2 * lo_ok.astype(f32), axis=0,
                                keepdims=True)
                j2_idx = jnp.sum(oh_j2 * iota_mf, axis=0, keepdims=True)
                d_j2 = j2_lo * jnp.sum(oh_j2 * dl, axis=0,
                                       keepdims=True) \
                    + (1.0 - j2_lo) * jnp.sum(oh_j2 * du, axis=0,
                                              keepdims=True)

        # add candidate: pending retry after a removal, or pricing winner
        retry = pd * do_rm0
        price0 = run * (1.0 - do_rm0) * (1.0 - pd)
        padd0 = price0 * found
        if 'mj' in ablate:
            mj = mj2 = prow
        elif multi_add >= 2:
            # both priced rows through ONE M pass
            M_ = M
            mj = jnp.sum(M_ * oh_j[:, None, :], axis=0)
            mj2 = jnp.sum(M_ * oh_j2[:, None, :], axis=0)
        else:
            mj = coldot_M(oh_j)                           # (n, L) M pass
        add_row = retry * prow + padd0 * mj
        add_lo = retry * plo + padd0 * j_lo
        add_lam = retry * plm + padd0 * (1.0 - 2.0 * j_lo)
        add_id = retry * pid + padd0 * j_idx
        add_d = retry * pdd + padd0 * d_j
        # W pass 3: Gram column(s) of the add(s)
        if 'gram' in ablate:
            g = g2 = used * 0.0
        elif multi_add >= 2:
            g, g2 = rowdot_W2(add_row, mj2)
            g = g * used
            g2 = g2 * used
        else:
            g = rowdot_W(add_row) * used
        keep0 = 1.0 - oh_rm * do_rm0
        g_k = g * keep0

        # E pass 2: removed column + Schur vector(s)
        if 'epass2' in ablate:
            e, a_pre = oh_rm, g_k
            a2_base = g2 if multi_add >= 2 else None
        elif multi_add >= 2:
            e, a_pre, a2_base = contractN_E(oh_rm, g_k, g2)
        else:
            e, a_pre = contract2_E(oh_rm, g_k)
        if 'sred2' in ablate:
            err = pd * 0.0 + 1.0
            bad = pd > 2.0
            ec = pd * 0.0
        else:
            err = jnp.sum(e * oh_rm, axis=0, keepdims=True)
            bad = (do_rm0 > 0) & (err < pivtol
                                  * jnp.max(jnp.abs(e), axis=0,
                                            keepdims=True))
            ec = jnp.sum(e * g_k, axis=0, keepdims=True) \
                / jnp.where(err != 0, err, 1.0)
        stt = jnp.where(bad, EXIT_REFACTOR, stt)
        do_rm = do_rm0 * (1.0 - bad.astype(f32))
        keep = 1.0 - oh_rm * do_rm
        err_s = jnp.where(err != 0, err, 1.0)
        a_post = keep * (a_pre - do_rm * e * ec)

        # line-search dual update + masked removal bookkeeping
        if 'book2' not in ablate:
            alpha = do_rm * jnp.where(rmin < BIG, rmin, 0.0)
            lam = (lam + alpha * delta * used) * keep
            plm = plm + alpha * sgn_p * pd
            used = used * keep
            dsl = dsl * keep
            slo = slo * keep
            sid = sid * keep - (1.0 - keep)     # freed slot -> -1
            oh_rm_m = (iota_mf == rm_id).astype(f32) * do_rm
            au = au * (1.0 - oh_rm_m * (1.0 - rm_lo))
            al = al * (1.0 - oh_rm_m * rm_lo)

        if 'stat2' in ablate:
            price = price0
        else:
            # pending with no blocker: repair once, then infeasible
            stuck = (stt == EXIT_RUNNING) & (pd > 0) & (do_rm == 0) \
                & (run > 0)
            stt = jnp.where(stuck,
                            jnp.where(rp > 0, EXIT_INFEASIBLE,
                                      EXIT_CYCLE), stt)

            # dominance bound cut on the priced path (daqp.c:20-23)
            cut = (price0 > 0) & (stt == EXIT_RUNNING) & (fv_new > fb)
            stt = jnp.where(cut, EXIT_INFEASIBLE, stt)

            price = price0 * (stt == EXIT_RUNNING).astype(f32)
            stt = jnp.where((price > 0) & (found == 0), EXIT_OPTIMAL, stt)

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
        padd = padd0 * (stt == EXIT_RUNNING).astype(f32)
        # promote lam <- lam* before a priced add (auxiliary.c:158-159)
        lam = jnp.where(padd > 0, lam_star * used, lam)

        # Schur complement & singularity (factorization.c:7-98).  The
        # singularity gate is RELATIVE to the row's Gram diagonal on
        # top of the absolute sing_tol: in f32 a pivot of ~1e-6 passes
        # the absolute gate but c = 1/s amplifies the rank-one update's
        # rounding into the whole inverse (observed: one such add took
        # ||G E - I|| from 3.7e-7 to 7e-2 and the lane later exited
        # OPTIMAL at a wrong 8-active set, x off by 5e-2).  A gated add
        # goes PENDING — the reference's own singular-add path.
        if 'sred2' in ablate:
            sval = pd * 0.0 + 1.0
            sing = pd * 0.0
        else:
            dii = jnp.sum(add_row * add_row, axis=0, keepdims=True)
            sval = dii - jnp.sum(g_k * a_post, axis=0, keepdims=True)
            kcnt = jnp.sum(used, axis=0, keepdims=True)
            gate = jnp.maximum(singtol, f32(1e-4) * dii)
            sing = ((sval < gate) | (kcnt >= n_true)).astype(f32)
        do_add = retry * (1.0 - bad.astype(f32)) + padd
        ok = do_add * (1.0 - sing)

        # first free slot (post-removal)
        if 'argmin' in ablate:
            oh_free = (iota_K == 0).astype(f32)
        else:
            oh_free, _ = first_min_onehot(iota_Kf + used * BIG, iota_K)
        w = a_post * used - oh_free
        # deletion + rescale + bordered-addition coefficients; the E
        # update itself is DEFERRED to the fused tail below (one RMW
        # pass that also produces the next step's CSP/pending prefix)
        c_del = -do_rm / err_s
        c_add = ok / jnp.where(sval != 0, sval, 1.0)

        if multi_add >= 2:
            # chained SECOND bordered add (priced steps only: no removal
            # or pend interplay — price0 excludes both).  With E1 =
            # E + c1 w1 w1', the second Schur vector on used u {p1} is
            #   a2 = E1 g2' = (E g2) + c1 (w1 . g2') w1,
            # where g2' carries the new slot's Gram entry m12 = m_j1.m_j2
            # and w1[p1] = -1 makes (w1 . g2') = (a_post o used).g2 - m12.
            # A singular second pivot simply skips the add (the row is
            # re-priced next step) — no pend state.  The accelerator is
            # gated on PROGRESS (cy == 0): a marginal runner-up can
            # churn add/remove without moving fval on degenerate lanes,
            # so once the cycle counter is nonzero the lane falls back
            # to the reference's conservative single Dantzig add.
            # Both pivots must be COMFORTABLY nonsingular for the
            # accelerator to fire: rows are unit-normalized so the
            # Schur scale is O(1), and an s near the f64-era sing_tol
            # (3.7e-11) in f32 makes c = 1/s blow the inverse apart —
            # observed: a chained add through such a pivot left a lane
            # at a wrong 8-active set with a CLEAN optimal flag, 5e-2
            # off.  Skipping only costs one re-price next step.
            PIV2 = f32(1e-3)
            padd2 = padd * found2 * (1.0 - sing) \
                * (cy == 0).astype(f32) * (rp == 0).astype(f32) \
                * (sval >= PIV2).astype(f32)
            m12 = jnp.sum(add_row * mj2, axis=0, keepdims=True)
            dot1 = jnp.sum(a_post * used * g2, axis=0, keepdims=True)
            t2 = c_add * (dot1 - m12)
            a2_new = a2_base * keep + t2 * w
            if 'sred2' in ablate:
                s2 = pd * 0.0 + 1.0
                sing2 = pd * 0.0
            else:
                d22 = jnp.sum(mj2 * mj2, axis=0, keepdims=True)
                s2 = d22 - (jnp.sum(g2 * a2_new, axis=0, keepdims=True)
                            - m12 * t2)
                kcnt1 = kcnt + ok
                sing2 = ((s2 < PIV2 * jnp.maximum(d22, 1.0))
                         | (kcnt1 >= n_true)).astype(f32)
            ok2 = padd2 * (1.0 - sing2) \
                * (stt == EXIT_RUNNING).astype(f32)
            used1 = jnp.minimum(used + ok * oh_free, 1.0)
            if 'argmin' in ablate:
                oh_free2 = (iota_K == 1).astype(f32)
            else:
                oh_free2, _ = first_min_onehot(iota_Kf + used1 * BIG,
                                               iota_K)
            w2 = a2_new * used1 - oh_free2
            c_add2 = ok2 / jnp.where(s2 != 0, s2, 1.0)

        E_prev = E_s[:]
        # W update: zero the freed slot row, write the added row(s) (the
        # new value feeds the fused pending-Gram contraction below)
        if 'wupd' in ablate:
            W_new = W_s[:]
        else:
            W_new = W_s[:] * keep[:, None, :] \
                + (ok * oh_free)[:, None, :] * add_row[None, :, :]
            if multi_add >= 2:
                W_new = W_new \
                    + (ok2 * oh_free2)[:, None, :] * mj2[None, :, :]
            W_s[:] = W_new

        mk_pend = do_add * sing
        if 'book2' not in ablate:
            used = jnp.minimum(used + ok * oh_free, 1.0)
            sid = sid + ok * oh_free * (add_id + 1.0)
            slo = slo + ok * oh_free * add_lo
            dsl = dsl + ok * oh_free * add_d
            lam = lam + ok * oh_free * add_lam
            add_oh_m = retry * (iota_mf == pid).astype(f32) + padd * oh_j
            au = jnp.minimum(au + ok * add_oh_m * (1.0 - add_lo), 1.0)
            al = jnp.minimum(al + ok * add_oh_m * add_lo, 1.0)
            if multi_add >= 2:
                used = jnp.minimum(used + ok2 * oh_free2, 1.0)
                sid = sid + ok2 * oh_free2 * (j2_idx + 1.0)
                slo = slo + ok2 * oh_free2 * j2_lo
                dsl = dsl + ok2 * oh_free2 * d_j2
                lam = lam + ok2 * oh_free2 * (1.0 - 2.0 * j2_lo)
                au = jnp.minimum(au + ok2 * oh_j2 * (1.0 - j2_lo), 1.0)
                al = jnp.minimum(al + ok2 * oh_j2 * j2_lo, 1.0)

            pd = jnp.minimum((1.0 - retry) * pd + mk_pend, 1.0)
            prow = mk_pend * add_row + (1.0 - mk_pend) * prow
            plm = jnp.where(mk_pend > 0, add_lam, plm)
            plo = jnp.where(mk_pend > 0, add_lo, plo)
            pid = jnp.where(mk_pend > 0, add_id, pid)
            pdd = jnp.where(mk_pend > 0, add_d, pdd)

        # fused next-step prefix: the W/E updates produce their new
        # values ONCE; the next step's CSP (lam* = -E (dsl o used)) and
        # pending Gram direction (a_p = E W prow) contract against those
        # values inside the same buffer passes.
        g_p = used if 'gp' in ablate else \
            jnp.sum(W_new * prow[None, :, :], axis=1) * used
        rhs = dsl * used
        if 'eupd' in ablate:
            E_new = E_prev
        else:
            E_new = (E_prev + c_del[None, :, :] * e[:, None, :]
                     * e[None, :, :]) \
                * keep[:, None, :] * keep[None, :, :] \
                + c_add[None, :, :] * w[:, None, :] * w[None, :, :]
            if multi_add >= 2:
                E_new = E_new + c_add2[None, :, :] * w2[:, None, :] \
                    * w2[None, :, :]
            E_s[:] = E_new
        if 'csp' in ablate:
            lam_star, a_p = rhs, g_p
        else:
            lam_star = -jnp.sum(E_new * rhs[None, :, :], axis=1)
            a_p = jnp.sum(E_new * g_p[None, :, :], axis=1)
        if 'noexit' in ablate:
            stt = stt * 0 + EXIT_RUNNING

        it = it + run + (ok2 if multi_add >= 2 else 0.0)
        return (i + 1, au, al, dsl, used, sid, slo, lam, ls, pd, prow,
                plm, plo, pid, pdd, u, fv, bf, cy, rp, it, stt,
                lam_star, a_p)

    # prefix for the first step (the in-loop values are produced fused
    # into the previous step's update passes)
    g_p0 = jnp.sum(W_s[:] * pr_o[:][None, :, :], axis=1) * us_o[:]
    ls0_neg, a_p0 = contract2_E(dsl_o[:] * us_o[:], g_p0)

    carry = (jnp.zeros((), jnp.int32),
             au_o[:], al_o[:], dsl_o[:], us_o[:], sid_o[:], slo_o[:],
             lam_o[:], ls_o[:], pd_o[:], pr_o[:], plm_o[:], plo_o[:],
             pid_o[:], pdd_o[:], u_o[:], fv_o[:], bf_o[:], cy_o[:],
             rp_o[:], it_o[:], stt_o[:], -ls0_neg, a_p0)

    def loop_cond(c):
        return (c[0] < steps) & jnp.any(c[21] == EXIT_RUNNING)

    # steps run in STATIC chunks (default 8) inside the convergence-
    # checked while: a masked step on a terminal lane is a no-op
    # (run = 0), so up to chunk-1 wasted masked steps trade against
    # Mosaic scheduling a static-trip-count body (and chunk-x fewer
    # cross-lane any() reductions).  The MPC horizon kernel passes a
    # smaller chunk: a ~3-iteration warm step would waste 5 of 8.
    def chunk_body(c):
        return lax.fori_loop(0, chunk, lambda _, cc: body(cc), c)

    carry = lax.while_loop(loop_cond, chunk_body, carry)
    (_, au, al, dsl, used, sid, slo, lam, ls, pd, prow, plm, plo, pid,
     pdd, u, fv, bf, cy, rp, it, stt, _ls_c, _ap_c) = carry
    au_o[:] = au
    al_o[:] = al
    dsl_o[:] = dsl
    us_o[:] = used
    sid_o[:] = sid
    slo_o[:] = slo
    lam_o[:] = lam
    ls_o[:] = ls
    pd_o[:] = pd
    pr_o[:] = prow
    plm_o[:] = plm
    plo_o[:] = plo
    pid_o[:] = pid
    pdd_o[:] = pdd
    u_o[:] = u
    fv_o[:] = fv
    bf_o[:] = bf
    cy_o[:] = cy
    rp_o[:] = rp
    it_o[:] = it
    stt_o[:] = stt


def run_slot_round(s: SlotState, st: Settings, n_true: int,
                   steps: int = 192,
                   interpret: bool = False,
                   ablate: frozenset = frozenset(),
                   multi_add: int = 1) -> SlotState:
    """One kernel round: ``steps`` masked iterations per lane, tiled over
    the batch in 128-lane programs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    K = s.E.shape[0]
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    const = [s.M, s.dupper, s.dlower, s.scaling, s.immut, s.simm,
             s.fbound]
    in_state = [s.act_up, s.act_lo, s.W, s.E, s.dsl, s.used, s.sid,
                s.slo, s.lam, s.lam_star, s.pend, s.prow, s.plam, s.plo,
                s.pid, s.pdd, s.u, s.fval, s.best_fval, s.cycle,
                s.repaired, s.iterations, s.status]
    big = {2, 3}                      # W, E indices within in_state
    in_specs = [any_spec] + [spec(a.shape) for a in const[1:]] \
        + [any_spec for _ in in_state]
    out_specs = tuple(any_spec if i in big else spec(a.shape)
                      for i, a in enumerate(in_state))
    out_shape = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in in_state)
    scratch_shapes = [pltpu.VMEM((K, K, LANES), jnp.float32),
                      pltpu.VMEM((K, n, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32)]
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_kernel_body, st, m, n, K, n_true, steps,
                               bool(interpret), frozenset(ablate),
                               int(multi_add))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024 * max(1, LANES // 128)),
    )(*const, *in_state)
    return s._replace(
        act_up=outs[0], act_lo=outs[1], W=outs[2], E=outs[3], dsl=outs[4],
        used=outs[5], sid=outs[6], slo=outs[7], lam=outs[8],
        lam_star=outs[9], pend=outs[10], prow=outs[11], plam=outs[12],
        plo=outs[13], pid=outs[14], pdd=outs[15], u=outs[16],
        fval=outs[17], best_fval=outs[18], cycle=outs[19],
        repaired=outs[20], iterations=outs[21], status=outs[22])


def _mpc_kernel_body(st: Settings, m: int, n: int, K: int, n_true: int,
                     steps: int, P: int,
                     M_ref, sc_ref, im_ref, si_ref, fb_ref, duq_ref,
                     dlq_ref,
                     au_ref, al_ref, W_ref, E_ref, dsl_ref, us_ref, sidr,
                     slor, lam_ref, ls_ref, pd_ref, pr_ref, plm_ref,
                     plo_ref, pid_ref, pdd_ref, u_ref, fv_ref, bf_ref,
                     cy_ref, rp_ref, it_ref, stt_ref,
                     au_o, al_o, W_o, E_o, dsl_o, us_o, sid_o, slo_o,
                     lam_o, ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                     u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                     useq_o, fvseq_o, itseq_o, stseq_o, fail_o,
                     E_s, W_s, M_s):
    """P consecutive MPC horizon steps for one 128-lane tile with the
    big solver state (E, W, M) staged into VMEM ONCE (the round-4 bench
    decomposition: a warm step needs ~2-3 iterations but the per-step
    ``slot_solve`` round paid the full ~19 MB/tile staging + the XLA
    round overhead every step — VERDICT r4 #3).

    Per step p: refresh the slot-table bound values from the streamed
    per-step d (the UPDATE_d contract, utils.c:410-455), reset the
    per-solve control state, run the ordinary fused step loop
    (``_solve_tile_live``), record (u, fval, iters, status).  A lane
    that ends a step in trouble (RUNNING at the step cap, CYCLE,
    REFACTOR — states the between-round driver repair would normally
    fix) FREEZES for the rest of the segment and raises ``fail_o``; the
    driver redoes the whole segment through the per-step repair path
    (rare), so the in-kernel fast path needs no repair machinery.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [au_ref, al_ref, dsl_ref, us_ref, sidr, slor, lam_ref,
               ls_ref, pd_ref, pr_ref, plm_ref, plo_ref, pid_ref, pdd_ref,
               u_ref, fv_ref, bf_ref, cy_ref, rp_ref, it_ref, stt_ref]
    out_refs = [au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o, pd_o,
                pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o, bf_o, cy_o,
                rp_o, it_o, stt_o]

    def load_small(sems):
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

    def load_big(sems):
        copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                        sems.at[0]),
                  pltpu.make_async_copy(W_ref.at[lane_idx3], W_s,
                                        sems.at[1]),
                  pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                        sems.at[2])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((3,)))

    sc = sc_ref[:]
    im = im_ref[:]
    simm = si_ref[:]
    fb = fb_ref[:]
    iota_m3 = lax.broadcasted_iota(jnp.int32, (1, m, 1),
                                   1).astype(f32)         # (1, m, 1)

    def step_p(p, failed):
        du_t = duq_ref[pl.ds(p, 1)][0]                    # (m, L)
        dl_t = dlq_ref[pl.ds(p, 1)][0]
        # dsl refresh from sid/slo (slot_refresh_bounds in-kernel)
        sid = sid_o[:]
        slo = slo_o[:]
        used = us_o[:]
        oh = (sid[:, None, :] == iota_m3).astype(f32)     # (K, m, L)
        du_sel = jnp.sum(oh * du_t[None, :, :], axis=1)
        dl_sel = jnp.sum(oh * dl_t[None, :, :], axis=1)
        dsl_o[:] = (slo * dl_sel + (1.0 - slo) * du_sel) * used
        # per-solve control reset (mirrors the driver step); frozen
        # lanes keep their non-RUNNING status => run = 0 in the loop
        live = failed == 0.0                              # (1, L)
        stt_o[:] = jnp.where(live, EXIT_RUNNING, stt_o[:])
        it_o[:] = jnp.zeros_like(it_o[:])
        cy_o[:] = jnp.zeros_like(cy_o[:])
        rp_o[:] = jnp.zeros_like(rp_o[:])
        bf_o[:] = jnp.zeros_like(bf_o[:]) - 1.0
        pd_o[:] = jnp.zeros_like(pd_o[:])
        _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                         du_t, dl_t, sc, im, simm, fb,
                         au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                         ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                         E_s, W_s, M_s, chunk=4)
        cycled = (stt_o[:] == EXIT_CYCLE) | (stt_o[:] == EXIT_REFACTOR)

        @pl.when(jnp.any(cycled))
        def cold_retry():
            # In-kernel cycling recovery (the reference's cold restart,
            # bnb.c:118-125 / the driver's exact_repair role): clear the
            # lane's working set entirely and re-solve this step from
            # scratch.  Measured necessity: without it, warm-horizon
            # cycling events accumulate to ~45/512 lanes by step 19 and
            # every segment falls back to the slow path.  (Slot-immut
            # flags are per-activation consts here; the MPC tier carries
            # no IMMUTABLE rows.)
            cyc = cycled.astype(f32)                      # (1, L)
            keepl = 1.0 - cyc
            us_o[:] = us_o[:] * keepl
            au_o[:] = au_o[:] * keepl
            al_o[:] = al_o[:] * keepl
            dsl_o[:] = dsl_o[:] * keepl
            slo_o[:] = slo_o[:] * keepl
            sid_o[:] = sid_o[:] * keepl - cyc             # freed -> -1
            lam_o[:] = lam_o[:] * keepl
            ls_o[:] = ls_o[:] * keepl
            pd_o[:] = pd_o[:] * keepl
            u_o[:] = u_o[:] * keepl
            fv_o[:] = fv_o[:] * keepl
            bf_o[:] = jnp.where(cycled, -1.0, bf_o[:])
            cy_o[:] = cy_o[:] * keepl
            E_s[:] = E_s[:] * keepl[None]
            W_s[:] = W_s[:] * keepl[None]
            stt_o[:] = jnp.where(cycled, EXIT_RUNNING,
                                 stt_o[:]).astype(jnp.int32)
            _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                             du_t, dl_t, sc, im, simm, fb,
                             au_o, al_o, dsl_o, us_o, sid_o, slo_o,
                             lam_o, ls_o, pd_o, pr_o, plm_o, plo_o,
                             pid_o, pdd_o, u_o, fv_o, bf_o, cy_o, rp_o,
                             it_o, stt_o, E_s, W_s, M_s, chunk=8)

        stt = stt_o[:]
        bad_now = ((stt == EXIT_RUNNING) | (stt == EXIT_CYCLE)
                   | (stt == EXIT_REFACTOR)).astype(f32)
        failed = jnp.maximum(failed, bad_now)
        useq_o[pl.ds(p, 1)] = u_o[:][None]
        fvseq_o[pl.ds(p, 1)] = fv_o[:][None]
        itseq_o[pl.ds(p, 1)] = it_o[:][None]
        stseq_o[pl.ds(p, 1)] = stt[None]
        return failed

    failed = lax.fori_loop(0, P, step_p,
                           jnp.zeros((1, LANES), f32))
    fail_o[:] = failed

    def store_big(sems):
        copies = [pltpu.make_async_copy(E_s, E_o.at[lane_idx3],
                                        sems.at[0]),
                  pltpu.make_async_copy(W_s, W_o.at[lane_idx3],
                                        sems.at[1])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(store_big, pltpu.SemaphoreType.DMA((2,)))


def _prox_kernel_body(st: Settings, m: int, n: int, K: int, n_true: int,
                      steps: int, P: int,
                      M_ref, sc_ref, im_ref, si_ref, fb_ref, Rinv_ref,
                      fz_ref, bus_ref, bls_ref, eps_ref, tst_ref,
                      au_ref, al_ref, W_ref, E_ref, dsl_ref, us_ref,
                      sidr, slor, lam_ref, ls_ref, pd_ref, pr_ref,
                      plm_ref, plo_ref, pid_ref, pdd_ref, u_ref, fv_ref,
                      bf_ref, cy_ref, rp_ref, it_ref, stt_ref,
                      x_ref, lr_ref, stl_ref, bd_ref, lf_ref, tt_ref,
                      au_o, al_o, W_o, E_o, dsl_o, us_o, sid_o, slo_o,
                      lam_o, ls_o, pd_o, pr_o, plm_o, plo_o, pid_o,
                      pdd_o, u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                      x_o, lr_o, stl_o, bd_o, lf_o, tt_o,
                      fail_o,
                      E_s, W_s, M_s, R_s):
    """P proximal-point outer passes for one 128-lane tile with the
    solver state (E, W, M) AND the per-lane factorization (Rinv) staged
    into VMEM once (VERDICT r5 follow-on to the fused MPC horizon:
    measured on config 4, each outer pass cost ~1.5 ms of XLA glue
    around ~0.1 ms of kernel work).

    Per pass (daqp_prox.c:21-189 full-shift regime, in-kernel):
    v = Rinv'(f - eps*x), d = b_s + M v, warm inner solve
    (``_solve_tile_live`` + the in-kernel cold retry), x = Rinv(u - v),
    fixed-point test ||x - x_old||_inf < eta/eps with the
    arithmetic-floor stagnation acceptance and 1.5x over-relaxation on
    a frozen active set.  PD lanes (eps = 0) converge after one pass.
    Lanes whose inner solve stays in trouble after the retry freeze and
    raise ``fail_o`` for the driver's repair fallback."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [au_ref, al_ref, dsl_ref, us_ref, sidr, slor, lam_ref,
               ls_ref, pd_ref, pr_ref, plm_ref, plo_ref, pid_ref,
               pdd_ref, u_ref, fv_ref, bf_ref, cy_ref, rp_ref, it_ref,
               stt_ref, x_ref, lr_ref, stl_ref, bd_ref, lf_ref, tt_ref]
    out_refs = [au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o,
                pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o, bf_o,
                cy_o, rp_o, it_o, stt_o, x_o, lr_o, stl_o, bd_o, lf_o,
                tt_o]

    def load_small(sems):
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

    def load_big(sems):
        copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                        sems.at[0]),
                  pltpu.make_async_copy(W_ref.at[lane_idx3], W_s,
                                        sems.at[1]),
                  pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                        sems.at[2]),
                  pltpu.make_async_copy(Rinv_ref.at[lane_idx3], R_s,
                                        sems.at[3])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((4,)))

    sc = sc_ref[:]
    im = im_ref[:]
    simm = si_ref[:]
    fb = fb_ref[:]
    fz = fz_ref[:]                                        # (n, L)
    bus = bus_ref[:]                                      # (m, L)
    bls = bls_ref[:]
    eps = eps_ref[:]                                      # (1, L)
    tst = tst_ref[:]                                      # (1, L)
    iota_m3 = lax.broadcasted_iota(jnp.int32, (1, m, 1),
                                   1).astype(f32)

    def pass_body(c):
        p, failed, _anyrun = c
        run = ((lr_o[:] > 0) & (failed == 0.0)).astype(f32)  # (1, L)
        x = x_o[:]                                        # (n, L)
        t = fz - eps * x
        R = R_s[:]                                        # (n, n, L)
        v = jnp.sum(R * t[:, None, :], axis=0)            # v = Rinv' t
        Mv = jnp.sum(M_s[:] * v[None, :, :], axis=1)      # (m, L)
        du_t = bus + Mv
        dl_t = bls + Mv
        # dsl refresh + per-solve control reset (only running lanes)
        sid = sid_o[:]
        slo = slo_o[:]
        used = us_o[:]
        oh = (sid[:, None, :] == iota_m3).astype(f32)
        du_sel = jnp.sum(oh * du_t[None, :, :], axis=1)
        dl_sel = jnp.sum(oh * dl_t[None, :, :], axis=1)
        dsl_o[:] = (slo * dl_sel + (1.0 - slo) * du_sel) * used
        stt_o[:] = jnp.where(run > 0, EXIT_RUNNING,
                             stt_o[:]).astype(jnp.int32)
        it_o[:] = jnp.zeros_like(it_o[:])
        cy_o[:] = jnp.zeros_like(cy_o[:])
        rp_o[:] = jnp.zeros_like(rp_o[:])
        bf_o[:] = jnp.zeros_like(bf_o[:]) - 1.0
        pd_o[:] = pd_o[:] * (1.0 - run)
        _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                         du_t, dl_t, sc, im, simm, fb,
                         au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                         ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                         E_s, W_s, M_s, chunk=4)
        cycled = ((stt_o[:] == EXIT_CYCLE)
                  | (stt_o[:] == EXIT_REFACTOR)) & (run > 0)

        @pl.when(jnp.any(cycled))
        def cold_retry():
            cyc = cycled.astype(f32)
            keepl = 1.0 - cyc
            us_o[:] = us_o[:] * keepl
            au_o[:] = au_o[:] * keepl
            al_o[:] = al_o[:] * keepl
            dsl_o[:] = dsl_o[:] * keepl
            slo_o[:] = slo_o[:] * keepl
            sid_o[:] = sid_o[:] * keepl - cyc
            lam_o[:] = lam_o[:] * keepl
            ls_o[:] = ls_o[:] * keepl
            pd_o[:] = pd_o[:] * keepl
            u_o[:] = u_o[:] * keepl
            fv_o[:] = fv_o[:] * keepl
            bf_o[:] = jnp.where(cycled, -1.0, bf_o[:])
            cy_o[:] = cy_o[:] * keepl
            E_s[:] = E_s[:] * keepl[None]
            W_s[:] = W_s[:] * keepl[None]
            stt_o[:] = jnp.where(cycled, EXIT_RUNNING,
                                 stt_o[:]).astype(jnp.int32)
            _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                             du_t, dl_t, sc, im, simm, fb,
                             au_o, al_o, dsl_o, us_o, sid_o, slo_o,
                             lam_o, ls_o, pd_o, pr_o, plm_o, plo_o,
                             pid_o, pdd_o, u_o, fv_o, bf_o, cy_o, rp_o,
                             it_o, stt_o, E_s, W_s, M_s, chunk=8)

        stt = stt_o[:]
        bad_now = (((stt == EXIT_RUNNING) | (stt == EXIT_CYCLE)
                    | (stt == EXIT_REFACTOR)) & (run > 0)).astype(f32)
        failed = jnp.maximum(failed, bad_now)
        run2 = run * (1.0 - bad_now)

        # outer prox update (daqp_prox.c:114-154 semantics, batched)
        it = it_o[:]
        inner_ok = (stt > 0) & (run2 > 0)
        w = u_o[:] - v
        x_new = jnp.sum(R * w[None, :, :], axis=1)        # x = Rinv w
        max_diff = jnp.max(jnp.abs(x_new - x), axis=0,
                           keepdims=True)                 # (1, L)
        pd_lane = eps == 0.0
        converged = pd_lane | (max_diff < tst)
        improved = max_diff < 0.9 * bd_o[:]
        bd_o[:] = jnp.minimum(max_diff, bd_o[:])
        stall = jnp.where(improved | (run2 == 0), 0.0, stl_o[:] + 1.0)
        stl_o[:] = stall
        converged = converged | (stall >= 8.0)
        froze = (it <= 1.0) & ~converged & inner_ok
        x_next = jnp.where(run2 > 0,
                           jnp.where(froze, x + 1.5 * (x_new - x),
                                     x_new), x)
        x_o[:] = x_next
        done = (run2 > 0) & (converged | ~(stt > 0))
        lf_o[:] = jnp.where(done,
                            jnp.where(stt > 0, EXIT_OPTIMAL, stt),
                            lf_o[:]).astype(jnp.int32)
        # frozen (failed) lanes KEEP lane_run = 1: the driver's repair
        # fallback resumes them; they are excluded here via ``failed``
        lr_new = jnp.where(done, 0.0, lr_o[:])
        lr_o[:] = lr_new
        tt_o[:] = tt_o[:] + jnp.where(run > 0, it, 0.0)
        anyrun = jnp.any((lr_new > 0) & (failed == 0.0))
        return p + 1, failed, anyrun

    def pass_cond(c):
        p, failed, anyrun = c
        return (p < P) & anyrun

    _, failed, _ = lax.while_loop(pass_cond, pass_body,
                                  (jnp.zeros((), jnp.int32),
                                   jnp.zeros((1, LANES), f32),
                                   jnp.any(lr_o[:] > 0)))
    fail_o[:] = failed

    def store_big(sems):
        copies = [pltpu.make_async_copy(E_s, E_o.at[lane_idx3],
                                        sems.at[0]),
                  pltpu.make_async_copy(W_s, W_o.at[lane_idx3],
                                        sems.at[1])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(store_big, pltpu.SemaphoreType.DMA((2,)))


def run_prox_segment(s: SlotState, x_b, lane_run, stall, best_diff,
                     lflag, tot, Rinv_l, fz_l, bus_l, bls_l, eps_l,
                     tst_l, st: Settings, n_true: int, P: int = 8,
                     steps: int = 64, interpret: bool = False):
    """Run up to P proximal outer passes in ONE kernel launch.

    Lanes-last operands: ``x_b`` (n_pad, B) outer iterate, ``lane_run``
    /``stall``/``best_diff``/``tot`` (1, B) f32, ``lflag`` (1, B) int32,
    ``Rinv_l`` (n_pad, n_pad, B) per-lane inverse Cholesky factor,
    ``fz_l`` (n_pad, B), ``bus_l``/``bls_l`` (m_pad, B) scaled user
    bounds with +/-DAQP_INF pad rows, ``eps_l``/``tst_l`` (1, B).
    Returns the updated ``(s, x, lane_run, stall, best_diff, lflag,
    tot, failed)``; ``failed > 0`` lanes froze mid-segment and continue
    through the driver's XLA repair path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    K = s.E.shape[0]
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    const = [s.M, s.scaling, s.immut, s.simm, s.fbound, Rinv_l, fz_l,
             bus_l, bls_l, eps_l, tst_l]
    in_state = [s.act_up, s.act_lo, s.W, s.E, s.dsl, s.used, s.sid,
                s.slo, s.lam, s.lam_star, s.pend, s.prow, s.plam, s.plo,
                s.pid, s.pdd, s.u, s.fval, s.best_fval, s.cycle,
                s.repaired, s.iterations, s.status,
                x_b, lane_run, stall, best_diff, lflag, tot]
    big = {2, 3}                      # W, E indices within in_state
    in_specs = [any_spec, spec(s.scaling.shape), spec(s.immut.shape),
                spec(s.simm.shape), spec(s.fbound.shape), any_spec,
                spec(fz_l.shape), spec(bus_l.shape), spec(bls_l.shape),
                spec(eps_l.shape), spec(tst_l.shape)] \
        + [any_spec for _ in in_state]
    state_out_specs = [any_spec if i in big else spec(a.shape)
                       for i, a in enumerate(in_state)]
    state_out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in in_state]
    f32 = jnp.float32
    seq_out_specs = [spec((1, B))]
    seq_out_shape = [jax.ShapeDtypeStruct((1, B), f32)]
    scratch_shapes = [pltpu.VMEM((K, K, LANES), jnp.float32),
                      pltpu.VMEM((K, n, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32),
                      pltpu.VMEM((n, n, LANES), jnp.float32)]
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_prox_kernel_body, st, m, n, K, n_true,
                               steps, int(P))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(state_out_specs + seq_out_specs),
        out_shape=tuple(state_out_shape + seq_out_shape),
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024 * max(1, LANES // 128)),
    )(*const, *in_state)
    s2 = s._replace(
        act_up=outs[0], act_lo=outs[1], W=outs[2], E=outs[3], dsl=outs[4],
        used=outs[5], sid=outs[6], slo=outs[7], lam=outs[8],
        lam_star=outs[9], pend=outs[10], prow=outs[11], plam=outs[12],
        plo=outs[13], pid=outs[14], pdd=outs[15], u=outs[16],
        fval=outs[17], best_fval=outs[18], cycle=outs[19],
        repaired=outs[20], iterations=outs[21], status=outs[22])
    x2, lr2, stl2, bd2, lf2, tt2, failed = outs[23:]
    return s2, x2, lr2, stl2, bd2, lf2, tt2, failed[0]


def _lp_kernel_body(st: Settings, m: int, n: int, K: int, n_true: int,
                    steps: int, P: int, eta: float,
                    M_ref, sc_ref, im_ref, si_ref, fb_ref,
                    fz_ref, bus_ref, bls_ref, bur_ref, blr_ref,
                    au_ref, al_ref, W_ref, E_ref, dsl_ref, us_ref,
                    sidr, slor, lam_ref, ls_ref, pd_ref, pr_ref,
                    plm_ref, plo_ref, pid_ref, pdd_ref, u_ref, fv_ref,
                    bf_ref, cy_ref, rp_ref, it_ref, stt_ref,
                    x_ref, ep_ref, stl_ref, bd_ref, lr_ref, lf_ref,
                    tt_ref, ps_ref,
                    au_o, al_o, W_o, E_o, dsl_o, us_o, sid_o, slo_o,
                    lam_o, ls_o, pd_o, pr_o, plm_o, plo_o, pid_o,
                    pdd_o, u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                    x_o, ep_o, stl_o, bd_o, lr_o, lf_o, tt_o, ps_o,
                    fail_o,
                    E_s, W_s, M_s):
    """P adaptive-eps LP outer passes for one 128-lane tile, fully
    VMEM-resident (daqp_prox.c:21-271 LP regime; the LP analogue of
    ``_prox_kernel_body`` — LP mode has Rinv = I so v = f*eps - x needs
    no factor buffers).  Includes the IN-KERNEL gradient step
    (daqp_prox.c:201-271): min-ratio ray search over the original rows
    + a bordered addition of the blocking row into the slot table (the
    same update as the driver-level ``slot_add_row``).  Inner failures
    freeze via ``fail_o`` (the driver's Bland cold retry handles them);
    eps adaptation, stagnation acceptance and the UNBOUNDED exit run
    in-kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    BIG = f32(DAQP_INF)
    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [au_ref, al_ref, dsl_ref, us_ref, sidr, slor, lam_ref,
               ls_ref, pd_ref, pr_ref, plm_ref, plo_ref, pid_ref,
               pdd_ref, u_ref, fv_ref, bf_ref, cy_ref, rp_ref, it_ref,
               stt_ref, x_ref, ep_ref, stl_ref, bd_ref, lr_ref, lf_ref,
               tt_ref, ps_ref]
    out_refs = [au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o,
                pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o, bf_o,
                cy_o, rp_o, it_o, stt_o, x_o, ep_o, stl_o, bd_o, lr_o,
                lf_o, tt_o, ps_o]

    def load_small(sems):
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

    def load_big(sems):
        copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                        sems.at[0]),
                  pltpu.make_async_copy(W_ref.at[lane_idx3], W_s,
                                        sems.at[1]),
                  pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                        sems.at[2])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((3,)))

    sc = sc_ref[:]
    im = im_ref[:]
    simm = si_ref[:]
    fb = fb_ref[:]
    fz = fz_ref[:]
    bus = bus_ref[:]
    bls = bls_ref[:]
    bur = bur_ref[:]
    blr = blr_ref[:]
    iota_m3 = lax.broadcasted_iota(jnp.int32, (1, m, 1),
                                   1).astype(f32)
    iota_m2 = lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(f32)
    iota_K2i = lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    etav = f32(eta)

    def pass_body(c):
        p, failed, anyrun = c
        run = ((lr_o[:] > 0) & (failed == 0.0)).astype(f32)
        x = x_o[:]
        eps = ep_o[:]
        v = fz * eps - x                                  # (n, L)
        Mv = jnp.sum(M_s[:] * v[None, :, :], axis=1)
        du_t = bus + Mv
        dl_t = bls + Mv
        sid = sid_o[:]
        slo = slo_o[:]
        used = us_o[:]
        oh = (sid[:, None, :] == iota_m3).astype(f32)
        du_sel = jnp.sum(oh * du_t[None, :, :], axis=1)
        dl_sel = jnp.sum(oh * dl_t[None, :, :], axis=1)
        dsl_o[:] = (slo * dl_sel + (1.0 - slo) * du_sel) * used
        stt_o[:] = jnp.where(run > 0, EXIT_RUNNING,
                             stt_o[:]).astype(jnp.int32)
        it_o[:] = jnp.zeros_like(it_o[:])
        cy_o[:] = jnp.zeros_like(cy_o[:])
        rp_o[:] = jnp.zeros_like(rp_o[:])
        bf_o[:] = jnp.zeros_like(bf_o[:]) - 1.0
        pd_o[:] = pd_o[:] * (1.0 - run)
        _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                         du_t, dl_t, sc, im, simm, fb,
                         au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                         ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                         E_s, W_s, M_s, chunk=4)
        cycled = ((stt_o[:] == EXIT_CYCLE)
                  | (stt_o[:] == EXIT_REFACTOR)) & (run > 0)

        @pl.when(jnp.any(cycled))
        def cold_retry():
            cyc = cycled.astype(f32)
            keepl = 1.0 - cyc
            us_o[:] = us_o[:] * keepl
            au_o[:] = au_o[:] * keepl
            al_o[:] = al_o[:] * keepl
            dsl_o[:] = dsl_o[:] * keepl
            slo_o[:] = slo_o[:] * keepl
            sid_o[:] = sid_o[:] * keepl - cyc
            lam_o[:] = lam_o[:] * keepl
            ls_o[:] = ls_o[:] * keepl
            pd_o[:] = pd_o[:] * keepl
            u_o[:] = u_o[:] * keepl
            fv_o[:] = fv_o[:] * keepl
            bf_o[:] = jnp.where(cycled, -1.0, bf_o[:])
            cy_o[:] = cy_o[:] * keepl
            E_s[:] = E_s[:] * keepl[None]
            W_s[:] = W_s[:] * keepl[None]
            stt_o[:] = jnp.where(cycled, EXIT_RUNNING,
                                 stt_o[:]).astype(jnp.int32)
            _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                             du_t, dl_t, sc, im, simm, fb,
                             au_o, al_o, dsl_o, us_o, sid_o, slo_o,
                             lam_o, ls_o, pd_o, pr_o, plm_o, plo_o,
                             pid_o, pdd_o, u_o, fv_o, bf_o, cy_o, rp_o,
                             it_o, stt_o, E_s, W_s, M_s, chunk=8)

        stt = stt_o[:]
        bad_now = (((stt == EXIT_RUNNING) | (stt == EXIT_CYCLE)
                    | (stt == EXIT_REFACTOR)) & (run > 0)).astype(f32)
        failed = jnp.maximum(failed, bad_now)
        run2 = run * (1.0 - bad_now)
        it = it_o[:]
        inner_ok = (stt > 0) & (run2 > 0)

        x_new = u_o[:] - v
        it1 = it <= 1.0
        nact = jnp.sum(us_o[:], axis=0, keepdims=True)
        at_vx = nact >= f32(n_true)
        diff = jnp.max(jnp.abs(x_new - x), axis=0, keepdims=True)
        converged = diff < etav * eps
        ndiff = diff / eps
        improved = ndiff < 0.9 * bd_o[:]
        bd_o[:] = jnp.minimum(ndiff, bd_o[:])
        stall = jnp.where(improved | ~it1 | ~at_vx | (run2 == 0), 0.0,
                          stl_o[:] + 1.0)
        stl_o[:] = stall
        converged = converged | (inner_ok & (stall >= 3.0))
        need_grad = it1 & ~at_vx & ~converged & (run2 > 0) & inner_ok

        # gradient step (daqp_prox.c:201-271): ray x_new + alpha*delta
        # to the first blocking ORIGINAL-row bound, which is activated
        delta = x_new - x
        M = M_s[:]
        ax = jnp.sum(M * x_new[None, :, :], axis=1) / sc
        ds = jnp.sum(M * delta[None, :, :], axis=1) / sc
        act = au_o[:] + al_o[:]
        skip = (act > 0) | (im > 0)
        up_ok = ~skip & (ds > 0) & (bur < BIG)
        lo_ok = ~skip & (ds < 0) & (blr > -BIG)
        a_up = jnp.where(up_ok, (bur - ax)
                         / jnp.where(up_ok, ds, 1.0), BIG)
        a_lo = jnp.where(lo_ok, (blr - ax)
                         / jnp.where(lo_ok, ds, 1.0), BIG)
        cand = jnp.minimum(a_up, a_lo)
        alpha = jnp.min(cand, axis=0, keepdims=True)
        jidx = jnp.argmin(cand, axis=0, keepdims=True).astype(jnp.int32)
        oh_j = (iota_m2 == jidx.astype(f32)).astype(f32)   # (m, L)
        found = alpha < BIG
        apply = (need_grad & found).astype(f32)            # (1, L)
        x2 = jnp.where(apply > 0, x_new + alpha * delta, x_new)
        a_lo_j = jnp.sum(oh_j * a_lo, axis=0, keepdims=True)
        a_up_j = jnp.sum(oh_j * a_up, axis=0, keepdims=True)
        is_lo = (a_lo_j < a_up_j).astype(f32)
        dval = is_lo * jnp.sum(oh_j * dl_t, axis=0, keepdims=True) \
            + (1.0 - is_lo) * jnp.sum(oh_j * du_t, axis=0,
                                      keepdims=True)
        # bordered addition of the blocking row (slot_add_row math)
        mj = jnp.sum(M * oh_j[:, None, :], axis=0)         # (n, L)
        used1 = us_o[:]
        gk = jnp.sum(W_s[:] * mj[None, :, :], axis=1) * used1
        a_v = jnp.sum(E_s[:] * gk[None, :, :], axis=1)
        dii = jnp.sum(mj * mj, axis=0, keepdims=True)
        sval = dii - jnp.sum(gk * a_v, axis=0, keepdims=True)
        gate = jnp.maximum(f32(st.sing_tol), 1e-4 * dii)
        kcnt = jnp.sum(used1, axis=0, keepdims=True)
        okadd = apply * (sval >= gate).astype(f32) \
            * (kcnt < f32(n_true)).astype(f32)
        # first free slot via argmin (Mosaic has no cumsum)
        cand_free = iota_K2i.astype(f32) + used1 * BIG
        fidx = jnp.argmin(cand_free, axis=0,
                          keepdims=True).astype(jnp.int32)
        oh_free = (iota_K2i == fidx).astype(f32)
        wv = a_v * used1 - oh_free
        cadd = okadd / jnp.where(sval != 0, sval, 1.0)
        E_s[:] = E_s[:] + cadd[None, :, :] * wv[:, None, :] \
            * wv[None, :, :]
        W_s[:] = W_s[:] + (okadd * oh_free)[:, None, :] \
            * mj[None, :, :]
        rid = jnp.sum(oh_j * iota_m2, axis=0, keepdims=True)
        us_o[:] = jnp.minimum(used1 + okadd * oh_free, 1.0)
        sid_o[:] = sid_o[:] + okadd * oh_free * (rid + 1.0)
        slo_o[:] = slo_o[:] + okadd * oh_free * is_lo
        dsl_o[:] = dsl_o[:] + okadd * oh_free * dval
        lam_o[:] = lam_o[:] + okadd * oh_free * (1.0 - 2.0 * is_lo)
        au_o[:] = jnp.minimum(au_o[:] + okadd * oh_j * (1.0 - is_lo),
                              1.0)
        al_o[:] = jnp.minimum(al_o[:] + okadd * oh_j * is_lo, 1.0)

        unbounded = need_grad & ~found
        # adaptive eps after the first pass (daqp_prox.c:55-63)
        grow = it1 & ~at_vx
        eps2 = jnp.where((ps_o[:] > 0) & (run2 > 0),
                         jnp.minimum(eps * jnp.where(grow, 10.0, 0.9),
                                     1e3), eps)
        ep_o[:] = eps2
        done = (run2 > 0) & (converged | ~(stt > 0) | unbounded)
        lf_o[:] = jnp.where(
            done,
            jnp.where(unbounded, EXIT_UNBOUNDED,
                      jnp.where(stt > 0, EXIT_OPTIMAL, stt)),
            lf_o[:]).astype(jnp.int32)
        # a lane exiting on an inner failure keeps its last good x
        bad_exit = done & ~(stt > 0)
        x_o[:] = jnp.where((run2 > 0) & ~bad_exit, x2, x)
        lr_new = jnp.where(done, 0.0, lr_o[:])
        lr_o[:] = lr_new
        tt_o[:] = tt_o[:] + jnp.where(run > 0, it, 0.0)
        ps_o[:] = ps_o[:] + run
        anyrun = jnp.any((lr_new > 0) & (failed == 0.0))
        return p + 1, failed, anyrun

    def pass_cond(c):
        p, failed, anyrun = c
        return (p < P) & anyrun

    _, failed, _ = lax.while_loop(pass_cond, pass_body,
                                  (jnp.zeros((), jnp.int32),
                                   jnp.zeros((1, LANES), f32),
                                   jnp.any(lr_o[:] > 0)))
    fail_o[:] = failed

    def store_big(sems):
        copies = [pltpu.make_async_copy(E_s, E_o.at[lane_idx3],
                                        sems.at[0]),
                  pltpu.make_async_copy(W_s, W_o.at[lane_idx3],
                                        sems.at[1])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(store_big, pltpu.SemaphoreType.DMA((2,)))


def run_lp_segment(s: SlotState, lp_vars, data, st: Settings,
                   n_true: int, eta: float, P: int = 8,
                   steps: int = 64, interpret: bool = False):
    """Run up to P adaptive-eps LP outer passes in ONE kernel launch
    (see ``_lp_kernel_body``).

    ``lp_vars`` = (x (n_pad, B); eps, stall, best, lane_run, tot,
    passes (1, B) f32; lflag (1, B) int32).  ``data`` = (fz (n_pad, B),
    bus, bls (m_pad, B) SCALED bounds with +/-INF pad rows, bur, blr
    (m_pad, B) RAW bounds with +/-INF pad rows).  Returns the updated
    state + ``failed`` (B,) f32 (frozen lanes for the driver's Bland
    cold retry)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    K = s.E.shape[0]
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)
    (x_b, ep, stl, bd, lr, lf, tt, psn) = lp_vars
    (fz_l, bus_l, bls_l, bur_l, blr_l) = data

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    const = [s.M, s.scaling, s.immut, s.simm, s.fbound, fz_l, bus_l,
             bls_l, bur_l, blr_l]
    in_state = [s.act_up, s.act_lo, s.W, s.E, s.dsl, s.used, s.sid,
                s.slo, s.lam, s.lam_star, s.pend, s.prow, s.plam, s.plo,
                s.pid, s.pdd, s.u, s.fval, s.best_fval, s.cycle,
                s.repaired, s.iterations, s.status,
                x_b, ep, stl, bd, lr, lf, tt, psn]
    big = {2, 3}
    in_specs = [any_spec] + [spec(a.shape) for a in const[1:]] \
        + [any_spec for _ in in_state]
    state_out_specs = [any_spec if i in big else spec(a.shape)
                       for i, a in enumerate(in_state)]
    state_out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in in_state]
    f32 = jnp.float32
    seq_out_specs = [spec((1, B))]
    seq_out_shape = [jax.ShapeDtypeStruct((1, B), f32)]
    scratch_shapes = [pltpu.VMEM((K, K, LANES), jnp.float32),
                      pltpu.VMEM((K, n, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32)]
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_lp_kernel_body, st, m, n, K, n_true,
                               steps, int(P), float(eta))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(state_out_specs + seq_out_specs),
        out_shape=tuple(state_out_shape + seq_out_shape),
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024 * max(1, LANES // 128)),
    )(*const, *in_state)
    s2 = s._replace(
        act_up=outs[0], act_lo=outs[1], W=outs[2], E=outs[3], dsl=outs[4],
        used=outs[5], sid=outs[6], slo=outs[7], lam=outs[8],
        lam_star=outs[9], pend=outs[10], prow=outs[11], plam=outs[12],
        plo=outs[13], pid=outs[14], pdd=outs[15], u=outs[16],
        fval=outs[17], best_fval=outs[18], cycle=outs[19],
        repaired=outs[20], iterations=outs[21], status=outs[22])
    (x2, ep2, stl2, bd2, lr2, lf2, tt2, ps2, failed) = outs[23:]
    return (s2, (x2, ep2, stl2, bd2, lr2, lf2, tt2, ps2), failed[0])


def _avi_kernel_body(st: Settings, m: int, n: int, K: int, n_true: int,
                     steps: int, P: int,
                     M_ref, sc_ref, im_ref, si_ref, fb_ref, Rinv_ref,
                     G1_ref, G2_ref, G3_ref, Hri_ref,
                     fz_ref, bus_ref, bls_ref,
                     au_ref, al_ref, W_ref, E_ref, dsl_ref, us_ref,
                     sidr, slor, lam_ref, ls_ref, pd_ref, pr_ref,
                     plm_ref, plo_ref, pid_ref, pdd_ref, u_ref, fv_ref,
                     bf_ref, cy_ref, rp_ref, it_ref, stt_ref,
                     x_ref, y_ref, xo_ref, mr_ref, ct_ref, tl_ref,
                     lr_ref, lf_ref, tt_ref,
                     au_o, al_o, W_o, E_o, dsl_o, us_o, sid_o, slo_o,
                     lam_o, ls_o, pd_o, pr_o, plm_o, plo_o, pid_o,
                     pdd_o, u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                     x_o, y_o, xo_o, mr_o, ct_o, tl_o, lr_o, lf_o,
                     tt_o,
                     fail_o, kkt_o,
                     E_s, W_s, M_s, R_s, G1_s, G2_s, G3_s, Hri_s):
    """P Douglas-Rachford outer passes of the batched AVI solve for one
    128-lane tile, fully VMEM-resident (the AVI analogue of
    ``_prox_kernel_body``; reference semantics avi.c:6-101).

    Per pass: v = Rinv'(G1 x + f) with G1 = H - Hsym - rho*I, warm
    inner projection solve (with the in-kernel cold retry), y = Rinv
    (u - v), the Newton-step progress bookkeeping (avi.c:44-61), then
    the DR update x = (H + rho I)^-1 (G2 y + G3 x) with G2 = Hsym/2 +
    rho*I, G3 = H - Hsym/2 (all per-lane (n, n, L) VMEM buffers).

    The exact-KKT acceleration (avi.c:103-184) is NOT in-kernel: a lane
    whose inner active set has been stable for ``tlim`` passes raises
    ``kkt_o`` and FREEZES (its DR update skipped, exactly as the
    driver's ``do_kkt`` path skips it); the driver runs the batched
    Schur solve and resumes.  Inner-solve failures freeze via
    ``fail_o`` for the XLA repair fallback."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    g = pl.program_id(0)
    lane_idx2 = (slice(None), pl.ds(pl.multiple_of(g * LANES, LANES),
                                    LANES))
    lane_idx3 = (slice(None), slice(None),
                 pl.ds(pl.multiple_of(g * LANES, LANES), LANES))
    in_refs = [au_ref, al_ref, dsl_ref, us_ref, sidr, slor, lam_ref,
               ls_ref, pd_ref, pr_ref, plm_ref, plo_ref, pid_ref,
               pdd_ref, u_ref, fv_ref, bf_ref, cy_ref, rp_ref, it_ref,
               stt_ref, x_ref, y_ref, xo_ref, mr_ref, ct_ref, tl_ref,
               lr_ref, lf_ref, tt_ref]
    out_refs = [au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o, ls_o,
                pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o, u_o, fv_o, bf_o,
                cy_o, rp_o, it_o, stt_o, x_o, y_o, xo_o, mr_o, ct_o,
                tl_o, lr_o, lf_o, tt_o]

    def load_small(sems):
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

    def load_big(sems):
        copies = [pltpu.make_async_copy(E_ref.at[lane_idx3], E_s,
                                        sems.at[0]),
                  pltpu.make_async_copy(W_ref.at[lane_idx3], W_s,
                                        sems.at[1]),
                  pltpu.make_async_copy(M_ref.at[lane_idx3], M_s,
                                        sems.at[2]),
                  pltpu.make_async_copy(Rinv_ref.at[lane_idx3], R_s,
                                        sems.at[3]),
                  pltpu.make_async_copy(G1_ref.at[lane_idx3], G1_s,
                                        sems.at[4]),
                  pltpu.make_async_copy(G2_ref.at[lane_idx3], G2_s,
                                        sems.at[5]),
                  pltpu.make_async_copy(G3_ref.at[lane_idx3], G3_s,
                                        sems.at[6]),
                  pltpu.make_async_copy(Hri_ref.at[lane_idx3], Hri_s,
                                        sems.at[7])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(load_big, pltpu.SemaphoreType.DMA((8,)))

    sc = sc_ref[:]
    im = im_ref[:]
    simm = si_ref[:]
    fb = fb_ref[:]
    fz = fz_ref[:]
    bus = bus_ref[:]
    bls = bls_ref[:]
    iota_m3 = lax.broadcasted_iota(jnp.int32, (1, m, 1),
                                   1).astype(f32)

    def mv(Gs, w):
        # out_i = sum_j G[i, j, l] w[j, l]
        return jnp.sum(Gs[:] * w[None, :, :], axis=1)

    def mvT(Gs, w):
        # out_i = sum_j G[j, i, l] w[j, l]
        return jnp.sum(Gs[:] * w[:, None, :], axis=0)

    def pass_body(c):
        p, failed, kktq, anyrun = c
        run = ((lr_o[:] > 0) & (failed == 0.0)
               & (kktq == 0.0)).astype(f32)                 # (1, L)
        x = x_o[:]
        xtemp = mv(G1_s, x) + fz
        v = mvT(R_s, xtemp)                                 # Rinv' t
        Mv = jnp.sum(M_s[:] * v[None, :, :], axis=1)
        du_t = bus + Mv
        dl_t = bls + Mv
        sid = sid_o[:]
        slo = slo_o[:]
        used = us_o[:]
        oh = (sid[:, None, :] == iota_m3).astype(f32)
        du_sel = jnp.sum(oh * du_t[None, :, :], axis=1)
        dl_sel = jnp.sum(oh * dl_t[None, :, :], axis=1)
        dsl_o[:] = (slo * dl_sel + (1.0 - slo) * du_sel) * used
        stt_o[:] = jnp.where(run > 0, EXIT_RUNNING,
                             stt_o[:]).astype(jnp.int32)
        it_o[:] = jnp.zeros_like(it_o[:])
        cy_o[:] = jnp.zeros_like(cy_o[:])
        rp_o[:] = jnp.zeros_like(rp_o[:])
        bf_o[:] = jnp.zeros_like(bf_o[:]) - 1.0
        pd_o[:] = pd_o[:] * (1.0 - run)
        _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                         du_t, dl_t, sc, im, simm, fb,
                         au_o, al_o, dsl_o, us_o, sid_o, slo_o, lam_o,
                         ls_o, pd_o, pr_o, plm_o, plo_o, pid_o, pdd_o,
                         u_o, fv_o, bf_o, cy_o, rp_o, it_o, stt_o,
                         E_s, W_s, M_s, chunk=4)
        cycled = ((stt_o[:] == EXIT_CYCLE)
                  | (stt_o[:] == EXIT_REFACTOR)) & (run > 0)

        @pl.when(jnp.any(cycled))
        def cold_retry():
            cyc = cycled.astype(f32)
            keepl = 1.0 - cyc
            us_o[:] = us_o[:] * keepl
            au_o[:] = au_o[:] * keepl
            al_o[:] = al_o[:] * keepl
            dsl_o[:] = dsl_o[:] * keepl
            slo_o[:] = slo_o[:] * keepl
            sid_o[:] = sid_o[:] * keepl - cyc
            lam_o[:] = lam_o[:] * keepl
            ls_o[:] = ls_o[:] * keepl
            pd_o[:] = pd_o[:] * keepl
            u_o[:] = u_o[:] * keepl
            fv_o[:] = fv_o[:] * keepl
            bf_o[:] = jnp.where(cycled, -1.0, bf_o[:])
            cy_o[:] = cy_o[:] * keepl
            E_s[:] = E_s[:] * keepl[None]
            W_s[:] = W_s[:] * keepl[None]
            stt_o[:] = jnp.where(cycled, EXIT_RUNNING,
                                 stt_o[:]).astype(jnp.int32)
            _solve_tile_live(st, m, n, K, n_true, steps, frozenset(), 1,
                             du_t, dl_t, sc, im, simm, fb,
                             au_o, al_o, dsl_o, us_o, sid_o, slo_o,
                             lam_o, ls_o, pd_o, pr_o, plm_o, plo_o,
                             pid_o, pdd_o, u_o, fv_o, bf_o, cy_o, rp_o,
                             it_o, stt_o, E_s, W_s, M_s, chunk=8)

        stt = stt_o[:]
        bad_now = (((stt == EXIT_RUNNING) | (stt == EXIT_CYCLE)
                    | (stt == EXIT_REFACTOR)) & (run > 0)).astype(f32)
        failed = jnp.maximum(failed, bad_now)
        run2 = run * (1.0 - bad_now)
        it = it_o[:]
        inner_ok = (stt > 0) & (run2 > 0)

        y_inner = mv(R_s, u_o[:] - v)                       # Rinv (u-v)
        # Newton-step progress bookkeeping (avi.c:44-61)
        ctr = ct_o[:]
        tlim = tl_o[:]
        at_limit = (ctr == tlim) & (run2 > 0)
        res2 = jnp.sum((x - y_inner) ** 2, axis=0,
                       keepdims=True)                       # (1, L)
        worse = at_limit & (res2 > mr_o[:])
        x = jnp.where(worse, xo_o[:], x)
        tl_o[:] = jnp.where(worse, jnp.minimum(tlim + 5.0, 30.0), tlim)
        mr_o[:] = jnp.where(at_limit & ~worse, res2, mr_o[:])
        y_new = jnp.where(worse, y_o[:], y_inner)
        y_o[:] = jnp.where(run2 > 0, y_new, y_o[:])

        stable = (it <= 1.0) & (run2 > 0)
        ctr = jnp.where(stable, ctr + 1.0,
                        jnp.where(run2 > 0, 0.0, ctr))
        ct_o[:] = ctr
        do_kkt = stable & (ctr == tl_o[:]) & inner_ok
        kktq = jnp.maximum(kktq, do_kkt.astype(f32))

        # DR update for running, non-KKT lanes (avi.c:84-96)
        move = (run2 > 0) & ~do_kkt & inner_ok
        x_dr = mv(Hri_s, mv(G2_s, y_o[:]) + mv(G3_s, x))
        x_o[:] = jnp.where(move, x_dr, x)

        lf_o[:] = jnp.where((run2 > 0) & ~(stt > 0), stt,
                            lf_o[:]).astype(jnp.int32)
        done = (run2 > 0) & ~(stt > 0)
        lr_new = jnp.where(done, 0.0, lr_o[:])
        lr_o[:] = lr_new
        tt_o[:] = tt_o[:] + jnp.where(run > 0, it, 0.0)
        anyrun = jnp.any((lr_new > 0) & (failed == 0.0)
                         & (kktq == 0.0))
        return p + 1, failed, kktq, anyrun

    def pass_cond(c):
        p, failed, kktq, anyrun = c
        return (p < P) & anyrun

    _, failed, kktq, _ = lax.while_loop(
        pass_cond, pass_body,
        (jnp.zeros((), jnp.int32), jnp.zeros((1, LANES), f32),
         jnp.zeros((1, LANES), f32), jnp.any(lr_o[:] > 0)))
    fail_o[:] = failed
    kkt_o[:] = kktq

    def store_big(sems):
        copies = [pltpu.make_async_copy(E_s, E_o.at[lane_idx3],
                                        sems.at[0]),
                  pltpu.make_async_copy(W_s, W_o.at[lane_idx3],
                                        sems.at[1])]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    pl.run_scoped(store_big, pltpu.SemaphoreType.DMA((2,)))


def run_avi_segment(s: SlotState, avi_vars, mats, st: Settings,
                    n_true: int, P: int = 8, steps: int = 64,
                    interpret: bool = False):
    """Run up to P DR outer passes of the batched AVI solve in ONE
    kernel launch (see ``_avi_kernel_body``).

    ``avi_vars`` = (x, y, xold (n_pad, B); minres, ctr, tlim, lane_run,
    tot (1, B) f32; lflag (1, B) int32).  ``mats`` = (Rinv, G1, G2, G3,
    Hrho_inv) per-lane (n_pad, n_pad, B) + (fz (n_pad, B), bus, bls
    (m_pad, B) with +/-INF pad rows).  Returns updated state +
    ``(failed, kkt_req)`` (B,) f32 freeze channels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    K = s.E.shape[0]
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)
    (x_b, y_b, xo_b, mr, ct, tl, lr, lf, tt) = avi_vars
    (Rinv_l, G1_l, G2_l, G3_l, Hri_l, fz_l, bus_l, bls_l) = mats

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    const = [s.M, s.scaling, s.immut, s.simm, s.fbound, Rinv_l, G1_l,
             G2_l, G3_l, Hri_l, fz_l, bus_l, bls_l]
    in_state = [s.act_up, s.act_lo, s.W, s.E, s.dsl, s.used, s.sid,
                s.slo, s.lam, s.lam_star, s.pend, s.prow, s.plam, s.plo,
                s.pid, s.pdd, s.u, s.fval, s.best_fval, s.cycle,
                s.repaired, s.iterations, s.status,
                x_b, y_b, xo_b, mr, ct, tl, lr, lf, tt]
    big = {2, 3}
    in_specs = [any_spec, spec(s.scaling.shape), spec(s.immut.shape),
                spec(s.simm.shape), spec(s.fbound.shape),
                any_spec, any_spec, any_spec, any_spec, any_spec,
                spec(fz_l.shape), spec(bus_l.shape), spec(bls_l.shape)] \
        + [any_spec for _ in in_state]
    state_out_specs = [any_spec if i in big else spec(a.shape)
                       for i, a in enumerate(in_state)]
    state_out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in in_state]
    f32 = jnp.float32
    seq_out_specs = [spec((1, B)), spec((1, B))]
    seq_out_shape = [jax.ShapeDtypeStruct((1, B), f32),
                     jax.ShapeDtypeStruct((1, B), f32)]
    scratch_shapes = [pltpu.VMEM((K, K, LANES), jnp.float32),
                      pltpu.VMEM((K, n, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32)] \
        + [pltpu.VMEM((n, n, LANES), jnp.float32)] * 5
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_avi_kernel_body, st, m, n, K, n_true,
                               steps, int(P))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(state_out_specs + seq_out_specs),
        out_shape=tuple(state_out_shape + seq_out_shape),
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024 * max(1, LANES // 128)),
    )(*const, *in_state)
    s2 = s._replace(
        act_up=outs[0], act_lo=outs[1], W=outs[2], E=outs[3], dsl=outs[4],
        used=outs[5], sid=outs[6], slo=outs[7], lam=outs[8],
        lam_star=outs[9], pend=outs[10], prow=outs[11], plam=outs[12],
        plo=outs[13], pid=outs[14], pdd=outs[15], u=outs[16],
        fval=outs[17], best_fval=outs[18], cycle=outs[19],
        repaired=outs[20], iterations=outs[21], status=outs[22])
    (x2, y2, xo2, mr2, ct2, tl2, lr2, lf2, tt2, failed,
     kktq) = outs[23:]
    return (s2, (x2, y2, xo2, mr2, ct2, tl2, lr2, lf2, tt2),
            failed[0], kktq[0])


def run_mpc_segment(s: SlotState, duq, dlq, st: Settings, n_true: int,
                    steps: int = 64, interpret: bool = False):
    """Run P consecutive warm MPC steps in ONE kernel launch.

    ``duq``/``dlq``: (P, m, B) lanes-last per-step bounds (already in
    LDP space).  Returns ``(s', useq (P, n, B), fvseq (P, B),
    itseq (P, B), stseq (P, B) int32, failed (B,) f32)``; a lane with
    ``failed > 0`` froze mid-segment and the WHOLE segment must be
    redone through the per-step repair path for that batch (the driver
    wrapper ``mpc.solve_mpc_scan_pallas_fused`` does this under a
    ``lax.cond`` so the fallback costs nothing when no lane fails)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = s.M.shape
    K = s.E.shape[0]
    P = duq.shape[0]
    assert B % LANES == 0, (B, LANES)
    grid = (B // LANES,)

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        idx = (lambda g: (0,) * (nd - 1) + (g,))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    const = [s.M, s.scaling, s.immut, s.simm, s.fbound, duq, dlq]
    in_state = [s.act_up, s.act_lo, s.W, s.E, s.dsl, s.used, s.sid,
                s.slo, s.lam, s.lam_star, s.pend, s.prow, s.plam, s.plo,
                s.pid, s.pdd, s.u, s.fval, s.best_fval, s.cycle,
                s.repaired, s.iterations, s.status]
    big = {2, 3}                      # W, E indices within in_state
    in_specs = [any_spec] + [spec(a.shape) for a in const[1:]] \
        + [any_spec for _ in in_state]
    state_out_specs = [any_spec if i in big else spec(a.shape)
                       for i, a in enumerate(in_state)]
    state_out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in in_state]
    f32 = jnp.float32
    seq_out_specs = [spec((P, n, B)), spec((P, 1, B)), spec((P, 1, B)),
                     spec((P, 1, B)), spec((1, B))]
    seq_out_shape = [jax.ShapeDtypeStruct((P, n, B), f32),
                     jax.ShapeDtypeStruct((P, 1, B), f32),
                     jax.ShapeDtypeStruct((P, 1, B), f32),
                     jax.ShapeDtypeStruct((P, 1, B), jnp.int32),
                     jax.ShapeDtypeStruct((1, B), f32)]
    scratch_shapes = [pltpu.VMEM((K, K, LANES), jnp.float32),
                      pltpu.VMEM((K, n, LANES), jnp.float32),
                      pltpu.VMEM((m, n, LANES), jnp.float32)]
    n_const = len(const)
    aliases = {n_const + i: i for i in range(len(in_state))}

    kernel = functools.partial(_mpc_kernel_body, st, m, n, K, n_true,
                               steps, int(P))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(state_out_specs + seq_out_specs),
        out_shape=tuple(state_out_shape + seq_out_shape),
        input_output_aliases={} if interpret else aliases,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024 * max(1, LANES // 128)),
    )(*const, *in_state)
    s2 = s._replace(
        act_up=outs[0], act_lo=outs[1], W=outs[2], E=outs[3], dsl=outs[4],
        used=outs[5], sid=outs[6], slo=outs[7], lam=outs[8],
        lam_star=outs[9], pend=outs[10], prow=outs[11], plam=outs[12],
        plo=outs[13], pid=outs[14], pdd=outs[15], u=outs[16],
        fval=outs[17], best_fval=outs[18], cycle=outs[19],
        repaired=outs[20], iterations=outs[21], status=outs[22],
        dupper=duq[-1], dlower=dlq[-1])
    useq, fvseq, itseq, stseq, failed = outs[23:]
    return (s2, useq, fvseq[:, 0, :], itseq[:, 0, :], stseq[:, 0, :],
            failed[0])


# ---------------------------------------------------------------------------
# JAX driver: init, bulk activation, between-round repair, outer loop
# ---------------------------------------------------------------------------
_HI = lax.Precision.HIGHEST


def slot_precompute(M_b, sc_b):
    """Transpose/pad the WAVE-INVARIANT slot-state parts once for
    callers that rebuild the state in a loop (the MIQP node waves call
    ``slot_init`` per wave; M is the big transpose and never changes).
    Returns ``(M_l (m_pad, n_pad, B) f32, sc_l (m_pad, B) f32)``."""
    B, m, n = M_b.shape
    mp = (-m) % 8
    np_ = (-n) % 8
    if mp or np_:
        M_b = jnp.pad(M_b, ((0, 0), (0, mp), (0, np_)))
        sc_b = jnp.pad(sc_b, ((0, 0), (0, mp)), constant_values=1.0)
    T = lambda x: jnp.moveaxis(x, 0, -1)
    return T(M_b).astype(jnp.float32), T(sc_b).astype(jnp.float32)


def slot_init_from(M_l, sc_l, du_b, dl_b, immut_b, n_true: int,
                   fbound_b=None) -> SlotState:
    """``slot_init`` with the big invariants precomputed by
    ``slot_precompute`` — only the per-wave (B, m) bounds/immut are
    padded and transposed here."""
    m, n, B = M_l.shape
    f32 = jnp.float32
    m_raw = du_b.shape[1]
    mp = m - m_raw
    if mp:
        big = jnp.asarray(DAQP_INF, du_b.dtype)
        du_b = jnp.pad(du_b, ((0, 0), (0, mp)), constant_values=big)
        dl_b = jnp.pad(dl_b, ((0, 0), (0, mp)), constant_values=-big)
        immut_b = jnp.pad(immut_b, ((0, 0), (0, mp)),
                          constant_values=1.0)
    K = n_true + 1 + ((-(n_true + 1)) % 8)
    if fbound_b is None:
        fbound_b = jnp.full((B,), DAQP_INF, f32)
    T = lambda x: jnp.moveaxis(x, 0, -1)
    z_m = jnp.zeros((m, B), f32)
    z_K = jnp.zeros((K, B), f32)
    z1 = jnp.zeros((1, B), f32)
    return SlotState(
        M=M_l, dupper=T(du_b).astype(f32), dlower=T(dl_b).astype(f32),
        scaling=sc_l, immut=T(immut_b).astype(f32),
        fbound=fbound_b.astype(f32).reshape(1, B),
        act_up=z_m, act_lo=z_m,
        W=jnp.zeros((K, n, B), f32), E=jnp.zeros((K, K, B), f32),
        dsl=z_K, used=z_K, sid=z_K - 1.0, slo=z_K, simm=z_K,
        lam=z_K, lam_star=z_K,
        pend=z1, prow=jnp.zeros((n, B), f32), plam=z1, plo=z1,
        pid=z1 - 1.0, pdd=z1,
        u=jnp.zeros((n, B), f32), fval=z1, best_fval=z1 - 1.0,
        cycle=z1, repaired=z1, iterations=z1,
        status=jnp.full((1, B), EXIT_RUNNING, jnp.int32))


def slot_init(M_b, du_b, dl_b, sc_b, immut_b, n_true: int,
              fbound_b=None) -> SlotState:
    """Build lanes-last slot state from batch-leading LDP data
    ((B, m, n), (B, m), ...).  K = n_true + 1 slots, padded to a multiple
    of 8; m and n are zero-padded to multiples of 8 (TPU DMA tiling)."""
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
        m, n = m + mp, n + np_
    K = n_true + 1 + ((-(n_true + 1)) % 8)
    if fbound_b is None:
        fbound_b = jnp.full((B,), DAQP_INF, f32)
    T = lambda x: jnp.moveaxis(x, 0, -1)
    z_m = jnp.zeros((m, B), f32)
    z_K = jnp.zeros((K, B), f32)
    z1 = jnp.zeros((1, B), f32)
    return SlotState(
        M=T(M_b).astype(f32), dupper=T(du_b).astype(f32),
        dlower=T(dl_b).astype(f32), scaling=T(sc_b).astype(f32),
        immut=T(immut_b).astype(f32),
        fbound=fbound_b.astype(f32).reshape(1, B),
        act_up=z_m, act_lo=z_m,
        W=jnp.zeros((K, n, B), f32), E=jnp.zeros((K, K, B), f32),
        dsl=z_K, used=z_K, sid=z_K - 1.0, slo=z_K, simm=z_K,
        lam=z_K, lam_star=z_K,
        pend=z1, prow=jnp.zeros((n, B), f32), plam=z1, plo=z1,
        pid=z1 - 1.0, pdd=z1,
        u=jnp.zeros((n, B), f32), fval=z1, best_fval=z1 - 1.0,
        cycle=z1, repaired=z1, iterations=z1,
        status=jnp.full((1, B), EXIT_RUNNING, jnp.int32))


def _slot_gram(s: SlotState, reg: float = 0.0):
    """G = W W' on used slots, identity on free slots; (B, K, K)."""
    G = jnp.einsum('kjb,ljb->klb', s.W, s.W, precision=_HI)
    um = s.used
    G = G * (um[:, None, :] * um[None, :, :])
    K = s.E.shape[0]
    eye = jnp.eye(K, dtype=G.dtype)[:, :, None]
    return jnp.moveaxis(G + eye * (1.0 - um)[None, :, :], -1, 0)


def slot_activate(s: SlotState, up_mask, lo_mask, st: Settings,
                  lam0_m=None) -> SlotState:
    """Bulk-activate a prescribed starting set (equalities and warm
    starts; ``daqp_activate_constraints``, auxiliary.c:398-478): pack the
    flagged rows into the first slots and build the inverse Gram with ONE
    batched (B, K, K) Cholesky — ~(m/K)^2 cheaper than the dense-mask
    activation.  A lane whose set is numerically dependent is parked
    EXIT_REFACTOR for the driver's exact repair / caller fallback.

    ``up_mask``/``lo_mask`` are (m, B) lanes-last 0/1; ``lam0_m`` is an
    optional (m, B) initial dual (defaults to +/-1 by side)."""
    dtype = s.E.dtype
    m, _, B = s.M.shape
    K = s.E.shape[0]
    up = up_mask.astype(dtype)
    lo = lo_mask.astype(dtype)
    act = jnp.minimum(up + lo, 1.0)
    # slot index of row i = exclusive running count of active rows; the
    # one-hot S[i, k] = act_i * (rank_i == k) packs actives into slots
    rank = jnp.cumsum(act, axis=0) - act                  # (m, B)
    iota_K = jnp.arange(K, dtype=dtype)
    S = act[:, None, :] * (rank[:, None, :]
                           == iota_K[None, :, None]).astype(dtype)
    # overflow guard: rows ranked beyond K-1 are dropped from the table
    nact = jnp.sum(act, axis=0)                           # (B,)
    W = jnp.einsum('mkb,mjb->kjb', S, s.M, precision=_HI)
    d_m = up * s.dupper + lo * s.dlower
    dsl = jnp.einsum('mkb,mb->kb', S, d_m, precision=_HI)
    iota_m = jnp.arange(m, dtype=dtype)
    sid = jnp.einsum('mkb,mb->kb', S, iota_m[:, None]
                     * jnp.ones((1, B), dtype), precision=_HI)
    used = (iota_K[:, None] < jnp.minimum(nact, K)[None, :]).astype(dtype)
    sid = sid * used - (1.0 - used)
    # rows ranked beyond the slot capacity are dropped from the TABLE;
    # they must also leave the m-space act masks, or pricing would treat
    # them as active forever and the lane could exit with an unchecked
    # violation (the flat tier's full-table backstop re-prices the same
    # way)
    placed = jnp.sum(S, axis=1)                           # (m, B)
    up = up * placed
    lo = lo * placed
    slo = jnp.einsum('mkb,mb->kb', S, lo, precision=_HI)
    simm = jnp.einsum('mkb,mb->kb', S, s.immut, precision=_HI)
    lam0_src = (up - lo) if lam0_m is None else lam0_m
    lam0 = jnp.einsum('mkb,mb->kb', S, lam0_src, precision=_HI)
    s2 = s._replace(W=W, used=used, sid=sid, slo=slo, simm=simm,
                    dsl=dsl, act_up=up, act_lo=lo, lam=lam0)
    G = _slot_gram(s2)
    from .pallas_batch import _batched_gram_inverse
    E, ok_lane = _batched_gram_inverse(G, st)
    ok_lane = ok_lane & (nact <= K)
    E = jnp.moveaxis(E, 0, -1) * (used[:, None, :] * used[None, :, :])
    status = jnp.where(ok_lane[None, :], s.status, EXIT_REFACTOR)
    return s2._replace(E=E, status=status.astype(jnp.int32))


def exact_repair(s: SlotState, st: Settings) -> SlotState:
    """Exact refactorization of E for parked / cycling lanes — the
    escape hatch for the kernel's deletion-pivot guard and the one-shot
    cycle repair (daqp.c:66-85), a (B, K, K) Cholesky in slot space."""
    from .pallas_batch import _batched_gram_inverse
    um = s.used
    G = _slot_gram(s)
    parked = s.status[0] == EXIT_REFACTOR
    cyc = (s.status[0] == EXIT_CYCLE) & (s.repaired[0] == 0)
    need = parked | cyc
    E_exact, exact_ok = _batched_gram_inverse(G, st)
    fix = need & exact_ok
    Eb = jnp.where(fix[:, None, None], E_exact,
                   jnp.moveaxis(s.E, -1, 0))
    E2 = jnp.moveaxis(Eb, 0, -1) * (um[:, None, :] * um[None, :, :])
    status = jnp.where(fix[None, :], EXIT_RUNNING, s.status)
    status = jnp.where((parked & ~exact_ok)[None, :], EXIT_CYCLE, status)
    # a cycling lane's pending constraint is dropped and re-priced
    drop = (cyc & exact_ok)[None, :].astype(s.pend.dtype)
    return s._replace(
        E=E2, status=status.astype(jnp.int32),
        pend=s.pend * (1 - drop),
        repaired=jnp.minimum(s.repaired + (cyc & exact_ok)[None, :], 1.0),
        cycle=s.cycle * (1 - fix[None, :]),
        best_fval=jnp.where(fix[None, :], -1.0, s.best_fval))


def repair_needed(s: SlotState):
    return (s.status[0] == EXIT_REFACTOR) \
        | ((s.status[0] == EXIT_CYCLE) & (s.repaired[0] == 0))


def newton_refresh(s: SlotState) -> SlotState:
    """One Newton step E <- E(2I - G E) of the inverse Gram against the
    exactly-rebuilt slot Gram (two batched (B, K, K) GEMMs on the MXU) —
    the scheduled drift repair of ``ldp_flat.flat_refresh`` (the role of
    the reference's refactorization, daqp.c:32-46).  Guarded by the
    contraction condition ||G E - I|| < 1/2; lanes outside the basin are
    left for the exact repair.  Without this, ~20 f32 rank-one updates on
    an ill-conditioned working set leave E with O(1e-3) relative drift
    and the refinement in ``polish`` corrects through a wrong inverse
    (observed: a semidefinite-prox lane converging to a point 5e-2 from
    the optimum with a CLEAN exit flag)."""
    um = s.used
    G = jnp.moveaxis(_slot_gram(s), 0, -1)                # (K, K, B)
    K = s.E.shape[0]
    eye = jnp.eye(K, dtype=s.E.dtype)[:, :, None]
    Iu = eye * um[None, :, :]
    P = jnp.einsum('ikb,kjb->ijb', G, s.E, precision=_HI)
    resid = jnp.max(jnp.abs(P - Iu), axis=(0, 1))          # (B,)
    E_new = jnp.einsum('ikb,kjb->ijb', s.E, 2.0 * Iu - P,
                       precision=_HI)
    E_new = E_new * (um[:, None, :] * um[None, :, :])
    okf = (resid < 0.5).astype(s.E.dtype)[None, None, :]
    return s._replace(E=okf * E_new + (1.0 - okf) * s.E)


def polish(s: SlotState, st: Settings) -> SlotState:
    """One iterative-refinement step of (lam*, u) for optimal lanes plus
    a re-price that re-opens a lane if a violation survives
    (auxiliary.c:497-588 + daqp.c:47-63), in slot space.  E is
    Newton-polished against the exact Gram first so the refinement
    corrects through a tight inverse."""
    s = newton_refresh(s)
    is_opt = s.status[0] == EXIT_OPTIMAL
    r = (jnp.sum(s.W * s.u[None, :, :], axis=1) - s.dsl) * s.used
    dlam = jnp.sum(s.E * r[None, :, :], axis=1)
    okl = is_opt & jnp.all(jnp.isfinite(dlam), axis=0)
    step = jnp.where(okl[None, :], dlam * s.used, 0)
    lam_star = s.lam_star + step
    u2 = s.u - jnp.sum(s.W * step[:, None, :], axis=0)
    u2 = jnp.where(okl[None, :], u2, s.u)
    fv2 = jnp.sum(u2 * u2, axis=0, keepdims=True)
    mu = jnp.sum(s.M * u2[None, :, :], axis=1)
    act = s.act_up + s.act_lo
    blocked = (act > 0) | (s.immut > 0)
    viol = (((s.dupper - mu) < -st.primal_tol * s.scaling)
            | ((mu - s.dlower) < -st.primal_tol * s.scaling)) & ~blocked
    # dual re-check: the refinement corrects lam* through the
    # Newton-polished (near-exact) inverse, so it can REVEAL a
    # dual-infeasible working set the drifted in-kernel E had accepted
    # (observed: a lane exiting optimal with a lower-active dual at
    # +0.06).  Such a lane must re-open so the next round's blocking
    # search removes the offending slot — the dual analogue of the
    # primal re-price.
    up_bad = (lam_star < -st.dual_tol).astype(s.slo.dtype)
    lo_bad = (lam_star > st.dual_tol).astype(s.slo.dtype)
    dual_bad = jnp.any(
        ((s.slo * lo_bad + (1.0 - s.slo) * up_bad)
         * s.used * (1.0 - s.simm)) > 0, axis=0)
    reopen = okl & (jnp.any(viol, axis=0) | dual_bad)
    return s._replace(
        lam_star=jnp.where(okl[None, :], lam_star, s.lam_star),
        u=u2,
        fval=jnp.where(okl[None, :], fv2, s.fval),
        status=jnp.where(reopen[None, :], EXIT_RUNNING,
                         s.status).astype(jnp.int32))


def slot_solve(s: SlotState, st: Settings, n_true: int = None,
               steps: int = 192, max_rounds: int = 16,
               interpret: bool = False, deadline=None,
               multi_add: int = 1) -> SlotState:
    """Kernel rounds until every lane is terminal; exact repair runs only
    when some lane needs it; refinement polish after convergence with up
    to two bounded re-open cycles (same round structure as
    ``pallas_batch.dense_solve``).

    ``deadline`` (absolute perf_counter seconds, traced f64 scalar)
    enables a wall-clock check between kernel ROUNDS (the batch analogue
    of the reference's every-32-iterations check, daqp.c:95-103): lanes
    still running past it exit EXIT_TIMELIMIT.  None (static) compiles
    the host callback out entirely."""
    iter_limit = jnp.minimum(
        jnp.asarray(st.iter_limit, jnp.float32),
        jnp.asarray(steps * max_rounds, jnp.float32))
    nt = (s.W.shape[1] if n_true is None else n_true)
    s = lax.cond(jnp.any(repair_needed(s)),
                 lambda s: exact_repair(s, st), lambda s: s, s)

    def check_deadline(s):
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
            s = run_slot_round(s, st, nt, steps=steps,
                               interpret=interpret, multi_add=multi_add)
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


def slot_add_row(s: SlotState, oh_m, lo, dval, mask, st: Settings,
                 n_true: int) -> SlotState:
    """Bordered addition of ONE constraint per lane into the slot table
    OUTSIDE the kernel (batched XLA einsums on the MXU): the batched
    analogue of ``daqp_add_constraint`` for driver-level activations —
    used by the LP tier's gradient step (daqp_prox.c:264-268).

    ``oh_m`` (m, B) one-hot row selector, ``lo`` (1, B) side,
    ``dval`` (1, B) active-side bound in LDP units, ``mask`` (1, B) 0/1.
    A numerically singular addition (relative pivot gate, same as the
    kernel's) or a full table skips the add — the caller's next outer
    pass re-prices the row."""
    dtype = s.E.dtype
    K = s.E.shape[0]
    m = s.M.shape[0]
    mj = jnp.einsum('mb,mnb->nb', oh_m, s.M, precision=_HI)   # (n, B)
    g = jnp.einsum('knb,nb->kb', s.W, mj, precision=_HI) * s.used
    a = jnp.einsum('kjb,jb->kb', s.E, g, precision=_HI)
    dii = jnp.sum(mj * mj, axis=0, keepdims=True)
    sval = dii - jnp.sum(g * a, axis=0, keepdims=True)
    gate = jnp.maximum(jnp.asarray(st.sing_tol, dtype), 1e-4 * dii)
    kcnt = jnp.sum(s.used, axis=0, keepdims=True)
    ok = mask * (sval >= gate).astype(dtype) \
        * (kcnt < n_true).astype(dtype)
    iota_K = jnp.arange(K, dtype=dtype)[:, None]
    free_rank = jnp.cumsum(1.0 - s.used, axis=0) * (1.0 - s.used)
    oh_free = (free_rank == 1.0).astype(dtype)
    w = a * s.used - oh_free
    c = ok / jnp.where(sval != 0, sval, 1.0)
    E = s.E + c[None, :, :] * w[:, None, :] * w[None, :, :]
    W = s.W + (ok * oh_free)[:, None, :] * mj[None, :, :]
    iota_m = jnp.arange(m, dtype=dtype)[:, None]
    rid = jnp.sum(oh_m * iota_m, axis=0, keepdims=True)
    return s._replace(
        E=E, W=W,
        used=jnp.minimum(s.used + ok * oh_free, 1.0),
        sid=s.sid + ok * oh_free * (rid + 1.0),
        slo=s.slo + ok * oh_free * lo,
        dsl=s.dsl + ok * oh_free * dval,
        lam=s.lam + ok * oh_free * (1.0 - 2.0 * lo),
        act_up=jnp.minimum(s.act_up + ok * oh_m * (1.0 - lo), 1.0),
        act_lo=jnp.minimum(s.act_lo + ok * oh_m * lo, 1.0))


def slot_refresh_bounds(s: SlotState, dupper, dlower) -> SlotState:
    """Replace the bounds (lanes-last (m, B)) and re-derive the slot
    table's active-side bound values ``dsl`` from ``sid``/``slo`` — the
    slot analogue of the reference's UPDATE_d re-update (utils.c:410-455):
    working set, rows and factorization persist, only d changes (warm
    MPC/proximal outer loops)."""
    dtype = s.E.dtype
    m = s.M.shape[0]
    iota_m = jnp.arange(m, dtype=dtype)
    oh = (s.sid[:, None, :] == iota_m[None, :, None]).astype(dtype)
    du_sel = jnp.einsum('kmb,mb->kb', oh, dupper, precision=_HI)
    dl_sel = jnp.einsum('kmb,mb->kb', oh, dlower, precision=_HI)
    dsl = (s.slo * dl_sel + (1.0 - s.slo) * du_sel) * s.used
    return s._replace(dupper=dupper, dlower=dlower, dsl=dsl)


def slot_duals_dense(s: SlotState, m_out: int = None) -> jnp.ndarray:
    """Scatter slot duals to an (m, B) lanes-last dense dual vector,
    rescaled by the row normalization (daqp.c:135-138 + api.c:449-453)."""
    m = s.M.shape[0] if m_out is None else m_out
    dtype = s.E.dtype
    iota_m = jnp.arange(m, dtype=dtype)
    oh = (s.sid[:, None, :] == iota_m[None, :, None]).astype(dtype)
    lam_m = jnp.einsum('kmb,kb->mb', oh, s.lam_star * s.used,
                       precision=_HI)
    return lam_m * s.scaling[:m]
