"""Branch-free slot-based dual active-set LDP solver — the batched hot path.

Same mathematics as ``ldp.py`` (reference ``src/daqp.c`` / ``auxiliary.c`` /
``factorization.c``), restructured for lockstep batched execution on TPU:

  * **No ordered working set.**  The reference appends/compacts an ordered
    ``WS`` and keeps an ordered LDL' factorization; order only matters to a
    sequential factorization.  Here active constraints live in K fixed
    *slots* with a ``used`` bitmap, and the explicit inverse Gram
    E = (M_W M_W' [+ rho_soft I_soft])^{-1} is maintained on the slot grid:
    deletion ``E -= e e'/e_rr`` zeroes exactly the freed slot's row/column,
    and the bordered addition ``E += w w'/s`` works into ANY free slot.
    No compaction gathers, no permutation bookkeeping.

  * **One masked update per iteration, zero ``lax.cond``.**  Under ``vmap``
    a cond lowers to a select that executes BOTH branches on every lane;
    the previous batched path paid for the repair/refactor ladder every
    iteration.  Here every iteration does: CSP GEMV -> blocking-removal
    min-ratio -> (masked) deletion -> (masked) addition from either the
    pending singular constraint or the pricing winner.  All selects are on
    (K,)/(K,K) values, never on whole-state branches.

  * **Singular handling via a pending constraint.**  The reference parks a
    singular addition as a flagged last WS entry (factorization.c:92-97)
    and line-searches its null direction (daqp.c:88-94).  Here the
    constraint is held OUT of the slot table as ``pend_*`` state; its null
    direction is recomputed from E each iteration (one extra GEMV), its
    multiplier accumulates through the singular line searches, and the add
    is retried after each blocking removal — identical iterates, no
    ordering requirement.

  * **Numerics: f32 storage + HIGHEST-precision contractions + periodic
    Newton refresh.**  TPU default matmul precision is bf16 — fatal for an
    inverse maintained over hundreds of rank-one updates.  Every
    contraction here requests ``Precision.HIGHEST``, and every
    ``REFRESH_EVERY`` iterations (between inner while_loop rounds, so
    converged lanes never pay) E is polished with one Newton step
    E <- E(2I - G E) — two batched K^3 GEMMs that ride the MXU — with G
    rebuilt from the slot rows.  This plays the role of the reference's
    refactorization repair (daqp.c:32-46) as a *scheduled* batched pass.

Reference file:line anchors for each primitive are on the functions below.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .types import (ACTIVE, IMMUTABLE, LOWER, SOFT, SLACK_FIXED,
                    Settings, SoftWeights, DAQP_INF,
                    EXIT_CYCLE, EXIT_INFEASIBLE, EXIT_ITERLIMIT,
                    EXIT_OPTIMAL, EXIT_RUNNING, EXIT_SOFT_OPTIMAL)

_HI = lax.Precision.HIGHEST

# Internal running-family status: the lane needs an exact refactorization
# of E before it can continue (a removal hit an unstable pivot).  The
# reference instead guards its LDL ordering with daqp_pivot_last and
# refactorizes on ill-conditioning (daqp.c:32-46, auxiliary.c:378-395);
# here the lane simply parks until the next scheduled refresh rebuilds E
# by Cholesky.
EXIT_REFACTOR = 90


def _mv(A, x):
    return jnp.matmul(A, x, precision=_HI)


class FlatState(NamedTuple):
    """Slot-table workspace (the vmap axis is added by the caller)."""
    # problem data
    M: jnp.ndarray        # (m, n) unit-normalized rows
    dupper: jnp.ndarray   # (m,)
    dlower: jnp.ndarray   # (m,)
    scaling: jnp.ndarray  # (m,)
    sense: jnp.ndarray    # (m,) int32
    # slot table
    used: jnp.ndarray     # (K,) bool
    sid: jnp.ndarray      # (K,) int32 constraint id per slot
    lam: jnp.ndarray      # (K,) dual iterate per slot
    Mw: jnp.ndarray       # (K, n) constraint rows per slot
    E: jnp.ndarray        # (K, K) inverse Gram on used slots
    lam_star: jnp.ndarray  # (K,) last CSP solution
    # pending singular addition
    pend: jnp.ndarray       # () bool
    pend_id: jnp.ndarray    # () int32
    pend_lam: jnp.ndarray   # ()
    pend_row: jnp.ndarray   # (n,)
    pend_lower: jnp.ndarray  # () bool
    # iterates
    u: jnp.ndarray        # (n,)
    fval: jnp.ndarray     # ()
    soft_slack: jnp.ndarray  # ()
    # control
    iterations: jnp.ndarray   # () int32
    cycle: jnp.ndarray        # () int32
    best_fval: jnp.ndarray    # ()
    repaired: jnp.ndarray     # () int32 exact-repair count (0: none; 1: repaired, Dantzig; >=2: repaired, Bland escalation)
    status: jnp.ndarray       # () int32
    # Optional SOFT_WEIGHTS slack data (reference optional build,
    # types.h:168-180): scaling-NORMALIZED per-row slack bounds and
    # per-side weights.  When present the SLACK_FIXED sense bit tracks
    # slacks pinned at their bound and the SOFT_WEIGHTS variants of the
    # add / CSP / blocking-removal / refinement primitives run
    # (auxiliary.c:199-274) — static branches, the hard path compiles
    # unchanged when None.
    sw: SoftWeights = None


def flat_init(M, dupper, dlower, sense, scaling=None, K=None,
              sw: SoftWeights = None) -> FlatState:
    """Fresh workspace, capacity K = n + ns + 1 (reference api.c:288-305)."""
    M = jnp.asarray(M)
    m, n = M.shape
    dtype = M.dtype
    if K is None:
        K = n + 1
    if scaling is None:
        scaling = jnp.ones((m,), dtype)
    if sense is None:
        sense = jnp.zeros((m,), jnp.int32)
    z = jnp.zeros((), dtype)
    return FlatState(
        M=M, dupper=jnp.asarray(dupper, dtype),
        dlower=jnp.asarray(dlower, dtype),
        scaling=jnp.asarray(scaling, dtype),
        sense=jnp.asarray(sense, jnp.int32),
        used=jnp.zeros((K,), bool), sid=jnp.zeros((K,), jnp.int32),
        lam=jnp.zeros((K,), dtype), Mw=jnp.zeros((K, n), dtype),
        E=jnp.zeros((K, K), dtype), lam_star=jnp.zeros((K,), dtype),
        pend=jnp.zeros((), bool), pend_id=jnp.zeros((), jnp.int32),
        pend_lam=z, pend_row=jnp.zeros((n,), dtype),
        pend_lower=jnp.zeros((), bool),
        u=jnp.zeros((n,), dtype), fval=z, soft_slack=z,
        iterations=jnp.zeros((), jnp.int32),
        cycle=jnp.zeros((), jnp.int32), best_fval=z - 1.0,
        repaired=jnp.zeros((), jnp.int32),
        status=jnp.full((), EXIT_RUNNING, jnp.int32),
        sw=sw)


def _try_add(s: FlatState, st: Settings, do_add, add_id, add_lam, add_row,
             add_lower, sw_free=None):
    """Masked bordered addition into the first free slot
    (``daqp_update_LDL_add``, factorization.c:7-98: the Schur complement
    ``sval`` equals the new LDL pivot; singular adds become pending).

    ``sw_free`` (SOFT_WEIGHTS only): ``(override, value)`` traced bools —
    when ``override`` the slack FREE/FIXED state is forced to ``value``
    instead of derived from lam (the blocking re-add passes the flipped
    previous state; see ldp.add_constraint)."""
    K = s.E.shape[0]
    n = s.M.shape[1]
    dtype = s.E.dtype
    is_soft = (s.sense[add_id] & SOFT) > 0
    if s.sw is not None:
        # SOFT_WEIGHTS slack state machine (auxiliary.c:30-36): a slack
        # at its bound is FIXED (the row behaves hard); past it the slack
        # is FREE and its per-side rho lands on the Gram diagonal
        # (factorization.c:31-40)
        lam_v = jnp.asarray(add_lam, dtype)
        slack_free = jnp.where(add_lower, lam_v <= -s.sw.d_ls[add_id],
                               lam_v >= s.sw.d_us[add_id])
        if sw_free is not None:
            slack_free = jnp.where(sw_free[0], sw_free[1], slack_free)
        rho_side = jnp.where(add_lower, s.sw.rho_ls[add_id],
                             s.sw.rho_us[add_id])
        contributes = is_soft & slack_free
        dii = _mv(add_row, add_row) + jnp.where(contributes, rho_side, 0)
        fix_bits = jnp.where(slack_free,
                             s.sense[add_id] & ~SLACK_FIXED,
                             s.sense[add_id] | SLACK_FIXED)
    else:
        contributes = is_soft
        dii = _mv(add_row, add_row) + jnp.where(
            is_soft, jnp.asarray(st.rho_soft, dtype), 0)
        fix_bits = s.sense[add_id]
    g = jnp.where(s.used, _mv(s.Mw, add_row), 0)
    a = _mv(s.E, g)
    sval = dii - _mv(g, a)
    k = jnp.sum(s.used).astype(jnp.int32)
    softmask = s.used & ((s.sense[s.sid] & SOFT) > 0)
    if s.sw is not None:
        softmask = softmask & ((s.sense[s.sid] & SLACK_FIXED) == 0)
    ns_act = jnp.sum(softmask).astype(jnp.int32) \
        + contributes.astype(jnp.int32)
    # (k >= K): full slot table.  With >= 2 active soft constraints the
    # rank cap n + ns_act can exceed the allocated capacity K (the
    # reference allocates K = n + ns + 1, api.c:288-305; callers that
    # cannot know ns statically may under-allocate), and an unguarded add
    # would overwrite slot argmin(used) = 0.  A full table is treated as a
    # singular add (pending -> repair ladder), never a silent overwrite.
    singular = (sval < st.sing_tol) | (k >= n + ns_act) | (k >= K)

    slot = jnp.argmin(s.used).astype(jnp.int32)   # first free slot
    oh_slot = (jnp.arange(K) == slot).astype(dtype)
    w = jnp.where(s.used, a, 0) * (1.0 - oh_slot) - oh_slot

    ok = do_add & ~singular
    make_pend = do_add & singular

    sense_bits = jnp.where(add_lower, fix_bits | LOWER,
                           fix_bits & ~LOWER) | ACTIVE
    sense = s.sense.at[jnp.where(do_add, add_id, s.M.shape[0])].set(
        sense_bits.astype(jnp.int32), mode='drop')

    # f32 mask algebra / one-hot updates, NOT bool scatters or
    # scalar-bool selects over (K, K): v5e mis-lowers small-bool dynamic
    # scatters (writes silently dropped) and bool broadcast ops in fused
    # loop bodies at batch >= 1024 — minimal repro + characterization in
    # scripts/repro_v5e_bool_scatter.py
    sval_safe = jnp.where(sval != 0, sval, jnp.asarray(1.0, dtype))
    return s._replace(
        E=s.E + (ok.astype(dtype) / sval_safe) * jnp.outer(w, w),
        used=s.used | ((jnp.arange(K) == slot) & ok),
        sid=jnp.where(ok, s.sid.at[slot].set(add_id), s.sid),
        lam=jnp.where(ok, s.lam.at[slot].set(add_lam), s.lam),
        Mw=jnp.where(ok, s.Mw.at[slot].set(add_row), s.Mw),
        sense=sense,
        pend=jnp.where(do_add, make_pend, s.pend),
        pend_id=jnp.where(make_pend, add_id, s.pend_id),
        pend_lam=jnp.where(make_pend, add_lam, s.pend_lam),
        pend_row=jnp.where(make_pend, add_row, s.pend_row),
        pend_lower=jnp.where(make_pend, add_lower, s.pend_lower))


def flat_step(s: FlatState, st: Settings) -> FlatState:
    """One branch-free iteration of the dual active-set loop
    (``daqp_ldp`` body, daqp.c:12-104)."""
    K = s.E.shape[0]
    m, n = s.M.shape
    dtype = s.E.dtype
    BIG = jnp.asarray(DAQP_INF, dtype)
    running = s.status == EXIT_RUNNING

    used = s.used
    sw = s.sense[s.sid]
    is_lower = (sw & LOWER) > 0
    immut = (sw & IMMUTABLE) > 0

    # --- CSP: lam* = -E d_W  (daqp_compute_CSP, auxiliary.c:313-353) ---
    d_W = jnp.where(is_lower, s.dlower[s.sid], s.dupper[s.sid])
    if s.sw is not None:
        # free soft slacks shift the CSP right-hand side by their bound
        # contribution (auxiliary.c:313-332, SOFT_WEIGHTS branch)
        free_soft_w = ((sw & SOFT) > 0) & ((sw & SLACK_FIXED) == 0)
        corr = jnp.where(is_lower,
                         s.sw.rho_ls[s.sid] * s.sw.d_ls[s.sid],
                         -s.sw.rho_us[s.sid] * s.sw.d_us[s.sid])
        d_W = d_W + jnp.where(free_soft_w, corr, 0)
    d_W = jnp.where(used, d_W, 0)
    lam_star = -_mv(s.E, d_W)

    # --- singular null direction (auxiliary.c:356-375) ---
    gp = jnp.where(used, _mv(s.Mw, s.pend_row), 0)
    ap = _mv(s.E, gp)
    pend_sign = jnp.where(s.pend_lower, jnp.asarray(-1.0, dtype),
                          jnp.asarray(1.0, dtype))
    sdir = -ap * pend_sign

    # --- blocking min-ratio line search (auxiliary.c:276-311; the
    # SOFT_WEIGHTS variant auxiliary.c:199-274 line-searches the SLACK
    # dual lam + d per side and blocks at the slack-bound transition) ---
    delta = jnp.where(s.pend, sdir, lam_star - s.lam)
    signv = jnp.where(s.pend, sdir, lam_star)
    if s.sw is None:
        infeas = jnp.where(is_lower, signv > st.dual_tol,
                           signv < -st.dual_tol)
        elig = used & ~immut & infeas
        ratio = -s.lam / delta
        # eligible slots always participate; nonfinite/negative ratios
        # clamp to a zero-step removal — the reference's exit gate is
        # "no dual-infeasible lam* entry" (auxiliary.c:283-287), and
        # dropping them let a dual-infeasible point exit as optimal
        ratio = jnp.where(jnp.isfinite(ratio),
                          jnp.maximum(ratio, 0.0), 0.0)
        cand = jnp.where(elig, ratio, BIG)
    else:
        d_ls_w = s.sw.d_ls[s.sid]
        d_us_w = s.sw.d_us[s.sid]
        free_w = (sw & SLACK_FIXED) == 0
        p = delta
        ls_star = signv
        skip_lo_free = (p < st.dual_tol) \
            | (ls_star <= -d_ls_w + st.dual_tol)
        skip_lo_fix = ((ls_star <= st.dual_tol)
                       & (ls_star + st.dual_tol >= -d_ls_w) & ~s.pend)
        skip_up_free = (p > -st.dual_tol) | (ls_star >= d_us_w)
        skip_up_fix = ((ls_star >= -st.dual_tol)
                       & (ls_star <= st.dual_tol + d_us_w) & ~s.pend)
        # kink guard: a soft dual sitting exactly at its slack-bound
        # transition, in the crossing direction, is at its coordinate
        # optimum — excluding it breaks the zero-step remove/re-add
        # oscillation (see ldp.remove_blocking)
        eps_k = jnp.asarray(64 * jnp.finfo(s.lam.dtype).eps, s.lam.dtype)
        ktol_us = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(d_us_w)))
        ktol_ls = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(d_ls_w)))
        at_us = jnp.abs(s.lam - d_us_w) <= ktol_us
        at_ls = jnp.abs(s.lam + d_ls_w) <= ktol_ls
        is_soft_w = (sw & SOFT) > 0
        kink = is_soft_w & jnp.where(
            is_lower,
            at_ls & jnp.where(free_w, True, p < 0),
            at_us & jnp.where(free_w, True, p > 0))
        skip = jnp.where(is_lower,
                         jnp.where(free_w, skip_lo_free, skip_lo_fix),
                         jnp.where(free_w, skip_up_free, skip_up_fix)) \
            | kink
        lam_slack = s.lam + jnp.where(
            is_lower,
            jnp.where(free_w, d_ls_w, jnp.where(p < 0, d_ls_w, 0.0)),
            -jnp.where(free_w, d_us_w, jnp.where(p > 0, d_us_w, 0.0)))
        elig = used & ~immut & ~skip
        ratio = jnp.maximum(-lam_slack / p, 0.0)
        ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
        cand = jnp.where(elig, ratio, BIG)
        # --- pend-transition candidate (SOFT_WEIGHTS + singular pend).
        # The reference's parked singular entry sits IN the working set
        # (factorization.c:92-97), so the SW line search
        # (auxiliary.c:199-274) naturally blocks at the parked entry's OWN
        # slack-bound transition — crossing it flips FIXED -> FREE, the
        # re-add gains its per-side rho on the Gram diagonal and the add
        # is no longer singular.  The flat pend is held OUT of the slot
        # table, so search it explicitly as a virtual K-th candidate.
        # Its dual moves at rate pend_sign and its direction value is
        # pend_sign (ldp.add_constraint: sing_dir[k] = +-1), so the same
        # per-side skip/kink/lam_slack formulas apply; the fixed-side
        # skips carry ~pend and so never fire for the pend itself.
        pid = jnp.clip(s.pend_id, 0, m - 1)
        psw = s.sense[pid]
        p_free = (psw & SLACK_FIXED) == 0
        p_was_fixed = ~p_free
        p_dls = s.sw.d_ls[pid]
        p_dus = s.sw.d_us[pid]
        pp = pend_sign
        pskip = jnp.where(
            s.pend_lower,
            p_free & ((pp < st.dual_tol) | (pp <= -p_dls + st.dual_tol)),
            p_free & ((pp > -st.dual_tol) | (pp >= p_dus)))
        pktol_us = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(p_dus)))
        pktol_ls = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(p_dls)))
        p_at_us = jnp.abs(s.pend_lam - p_dus) <= pktol_us
        p_at_ls = jnp.abs(s.pend_lam + p_dls) <= pktol_ls
        p_soft = (psw & SOFT) > 0
        pkink = p_soft & jnp.where(
            s.pend_lower,
            p_at_ls & jnp.where(p_free, True, pp < 0),
            p_at_us & jnp.where(p_free, True, pp > 0))
        p_lam_slack = s.pend_lam + jnp.where(
            s.pend_lower,
            jnp.where(p_free, p_dls, jnp.where(pp < 0, p_dls, 0.0)),
            -jnp.where(p_free, p_dus, jnp.where(pp > 0, p_dus, 0.0)))
        p_immut = (psw & IMMUTABLE) > 0
        p_elig = s.pend & ~p_immut & ~(pskip | pkink)
        p_cand = jnp.maximum(-p_lam_slack / pp, 0.0)
        p_cand = jnp.where(jnp.isfinite(p_cand), p_cand, 0.0)
        pend_cand = jnp.where(p_elig, p_cand, BIG)
        cand = jnp.concatenate([cand, pend_cand[None]])
    # a hard pend never transitions: without sw, cand stays length K and
    # rmx == K is unreachable, so pend_block is identically False
    rmx = jnp.argmin(cand).astype(jnp.int32)
    pend_block = running & (rmx == K) & (cand[rmx] < BIG)
    rm_slot = jnp.where(rmx == K, 0, rmx).astype(jnp.int32)
    do_remove = running & ~pend_block & (cand[rmx] < BIG)

    # Deletion-pivot stability guard: the downdate E -= e e'/e_rr amplifies
    # accumulated f32 error by ||e||^2/e_rr; a small pivot means E must be
    # rebuilt exactly before removing (observed: one drift-flipped removal
    # at an unstable pivot cascades into mass removals and a corrupted E).
    e_guard = s.E[:, rm_slot]
    bad_pivot = do_remove & (e_guard[rm_slot]
                             < st.pivot_tol * jnp.max(jnp.abs(e_guard)))
    do_remove = do_remove & ~bad_pivot

    # --- masked deletion (daqp_update_LDL_remove, factorization.c:99-138:
    #     the rank-one E -= e e'/e_rr zeroes the freed row/col exactly) ---
    alpha = jnp.where(do_remove | pend_block, cand[rmx], 0)
    if s.sw is not None:
        # step just past the slack-bound transition so the blocker
        # re-enters with the flipped FIXED/FREE state (auxiliary.c:254)
        alpha = alpha * 1.001
    lam1 = jnp.where(used, s.lam + alpha * delta, s.lam)
    pend_lam1 = s.pend_lam + jnp.where(s.pend, alpha * pend_sign, 0)
    # captured for the SOFT_WEIGHTS re-add (auxiliary.c:264-273)
    ls_rm = lam1[rm_slot]
    rm_was_soft = (sw[rm_slot] & SOFT) > 0
    rm_was_lower = is_lower[rm_slot]
    rm_was_fixed = (sw[rm_slot] & SLACK_FIXED) > 0
    e = s.E[:, rm_slot]
    err = e[rm_slot]
    # f32 mask algebra, NOT i1 outer masks / scalar-bool selects over
    # (K, K): v5e mis-lowers small-bool broadcast ops inside fused loop
    # bodies at batch >= 1024 — E rows silently zeroed, measured as
    # ||G E - I|| drifting to O(1) within 48 iterations while the same
    # state chunked at 512 stays at 3e-6 (scripts/repro_v5e_bool_scatter.py
    # documents the op family)
    rm_f = do_remove.astype(dtype)
    zr_f = (jnp.arange(K) != rm_slot).astype(dtype)
    E_down = jnp.outer(e, e) / jnp.where(err != 0, err, 1.0)
    keep_f = 1.0 - (1.0 - zr_f[:, None] * zr_f[None, :]) * rm_f
    E1 = (s.E - rm_f * E_down) * keep_f
    # one-hot, not .at[rm_slot].set: bool scatters miscompile at B >= 1024
    # on v5e (scripts/repro_v5e_bool_scatter.py)
    used1 = s.used & ~((jnp.arange(K) == rm_slot) & do_remove)
    lam1 = lam1.at[rm_slot].set(jnp.where(do_remove, 0, lam1[rm_slot]))
    rm_id = s.sid[rm_slot]
    sense1 = s.sense.at[jnp.where(do_remove, rm_id, m)].set(
        (s.sense[jnp.clip(rm_id, 0, m - 1)] & ~ACTIVE).astype(jnp.int32),
        mode='drop')
    s = s._replace(E=E1, used=used1, lam=lam1, pend_lam=pend_lam1,
                   sense=sense1)

    status_park = jnp.where(bad_pivot, EXIT_REFACTOR,
                            s.status).astype(jnp.int32)
    s = s._replace(status=status_park)
    running = running & ~bad_pivot

    # --- pending with no blocker -> infeasible (daqp.c:88-94).  In f32 a
    # spuriously-singular add can reach this state with a drifted E, so the
    # first occurrence requests an exact repair (EXIT_CYCLE -> flat_refresh
    # refactorizes, drops the pending constraint and re-opens); only a
    # repaired lane declares infeasibility — the one-shot repair ladder of
    # daqp.c:66-85 applied to the singular exit. ---
    stuck = running & s.pend & ~do_remove & ~pend_block
    status = jnp.where(stuck,
                       jnp.where(s.repaired >= 1, EXIT_INFEASIBLE, EXIT_CYCLE),
                       s.status).astype(jnp.int32)

    # --- primal + pricing on the non-removal, non-pending path ---
    price_path = running & ~do_remove & ~s.pend
    lamm = jnp.where(s.used, lam_star, 0)
    u = -_mv(s.Mw.T, lamm)
    softm = s.used & ((s.sense[s.sid] & SOFT) > 0)
    if s.sw is not None:
        # per-side weights (auxiliary.c:46-87, SOFT_WEIGHTS branch)
        rho_w = jnp.where((s.sense[s.sid] & LOWER) > 0,
                          s.sw.rho_ls[s.sid], s.sw.rho_us[s.sid])
        soft_slack = jnp.sum(jnp.where(softm, rho_w * lam_star ** 2, 0))
    else:
        soft_slack = st.rho_soft * jnp.sum(
            jnp.where(softm, lam_star ** 2, 0))
    fval = soft_slack + _mv(u, u)
    # dual-objective bound cut (daqp.c:20-23)
    status = jnp.where(price_path & (fval > 2.0 * st.fval_bound),
                       EXIT_INFEASIBLE, status).astype(jnp.int32)

    mu = _mv(s.M, u)
    bound = -st.primal_tol * s.scaling
    viol_up = s.dupper - mu
    viol_lo = mu - s.dlower
    blocked = (s.sense & (ACTIVE | IMMUTABLE)) > 0
    up_ok = (viol_up < bound) & ~blocked
    lo_ok = (viol_lo < bound) & ~blocked & ~up_ok
    candv = jnp.where(up_ok, viol_up, jnp.where(lo_ok, viol_lo, BIG))
    # Dantzig (most violated) or Bland (lowest violated index) pricing
    viol_any = up_ok | lo_ok
    bland_key = jnp.where(viol_any,
                          jnp.arange(m, dtype=candv.dtype), BIG)
    # anti-cycling escalation: a lane that needed the one-shot cycle
    # repair switches to Bland's rule for the rest of the solve (the
    # classic anti-cycling pivot rule; breaks the degenerate orbits the
    # reference can only exit with EXIT_CYCLE — observed a period-5
    # remove/re-add orbit on a SOFT_WEIGHTS instance in f64)
    use_bland = (jnp.asarray(st.pricing) == 1) | (s.repaired >= 2)
    pkey = jnp.where(use_bland, bland_key, candv)
    j = jnp.argmin(pkey).astype(jnp.int32)
    found_viol = viol_any[j]

    # optimal: nothing violated on the priced path (repair/refinement is a
    # scheduled batched pass in flat_solve, not an in-loop branch)
    opt_flag = jnp.where(soft_slack > st.primal_tol, EXIT_SOFT_OPTIMAL,
                         EXIT_OPTIMAL)
    status = jnp.where(price_path & ~found_viol & (status == EXIT_RUNNING),
                       opt_flag, status).astype(jnp.int32)

    # cycle guard (daqp.c:66-85; repair deferred to the scheduled pass)
    no_prog = fval - s.best_fval < st.progress_tol * (1.0 + jnp.abs(fval))
    cyc = jnp.where(price_path, jnp.where(no_prog, s.cycle + 1, 0), s.cycle)
    best = jnp.where(price_path & ~no_prog, fval, s.best_fval)
    status = jnp.where(price_path & no_prog & (cyc > st.cycle_tol)
                       & (status == EXIT_RUNNING),
                       EXIT_CYCLE, status).astype(jnp.int32)

    s = s._replace(u=jnp.where(price_path, u, s.u),
                   fval=jnp.where(price_path, fval, s.fval),
                   soft_slack=jnp.where(price_path, soft_slack,
                                        s.soft_slack),
                   lam_star=jnp.where(running, lam_star, s.lam_star),
                   cycle=cyc.astype(jnp.int32), best_fval=best)

    # --- one masked addition: retry pending after a removal, add the
    #     pricing winner (daqp_add_infeasible, auxiliary.c:88-166), or —
    #     SOFT_WEIGHTS only — immediately re-add a removed soft blocker
    #     whose slack dual has not crossed zero, with the flipped
    #     FIXED/FREE state (auxiliary.c:264-273; skipped when a pending
    #     retry claims the slot, matching the early return on sing) ---
    retry_pend = s.pend & do_remove
    price_add = price_path & found_viol & (status == EXIT_RUNNING)
    one = jnp.asarray(1.0, dtype)
    if s.sw is not None:
        crossed = jnp.where(rm_was_lower, ls_rm > 0, ls_rm < 0)
        sw_readd = do_remove & ~s.pend & rm_was_soft & ~crossed
        rm_id_c = jnp.clip(rm_id, 0, m - 1)
        # pend blocked at its OWN slack transition: re-enter with the
        # FLIPPED FIXED/FREE state (ldp.remove_blocking's do_remove_sw on
        # the parked entry; auxiliary.c:264-273 after factorization.c:92-97)
        # — a FIXED pend re-adds FREE, gaining rho on the Gram diagonal,
        # so the add is no longer singular.  A pend whose stepped dual
        # crossed zero deactivated instead and is dropped.
        pend_crossed = jnp.where(s.pend_lower, s.pend_lam > 0,
                                 s.pend_lam < 0)
        pend_readd = pend_block & ~pend_crossed
        pend_drop = pend_block & pend_crossed
        pend_take = retry_pend | pend_readd
        # Double add (reference parity): when a pend retry coincides with
        # a soft blocking re-add, the reference performs BOTH in one
        # iteration — remove_constraint re-adds the flipped soft blocker
        # (auxiliary.c:264-273) and THEN the parked entry re-enters
        # (factorization.c:92-97).  The FIXED -> FREE flip gains the
        # blocker's rho on the Gram diagonal and raises the rank cap, so
        # without it the pend retry parks singular again and the pair
        # orbits (observed period-5 EXIT_CYCLE on an adversarial f64 SW
        # batch where the single-instance path solves in 15 iterations).
        # Only the FIXED -> FREE direction is performed eagerly: it is
        # structurally nonsingular (rho > sing_tol), so it cannot clobber
        # the parked pend state; the FREE -> FIXED coincidence keeps the
        # pend-retry-first order and lets pricing re-select the blocker.
        both = retry_pend & rm_was_soft & ~crossed & rm_was_fixed
        s = _try_add(s, st, both, rm_id_c, ls_rm, s.M[rm_id_c],
                     rm_was_lower, sw_free=(both, rm_was_fixed))
        use_sw_readd = sw_readd & ~pend_take & ~both
        do_add = pend_take | use_sw_readd | price_add
        add_id = jnp.where(pend_take, s.pend_id,
                           jnp.where(use_sw_readd, rm_id_c, j))
        add_row = jnp.where(pend_take, s.pend_row,
                            jnp.where(use_sw_readd, s.M[rm_id_c], s.M[j]))
        add_lower = jnp.where(pend_take, s.pend_lower,
                              jnp.where(use_sw_readd, rm_was_lower,
                                        lo_ok[j]))
        add_lam = jnp.where(
            pend_take, s.pend_lam,
            jnp.where(use_sw_readd, ls_rm,
                      jnp.where(lo_ok[j], -one, one)))
        sense_pd = s.sense.at[jnp.where(pend_drop, pid, m)].set(
            (s.sense[pid] & ~ACTIVE).astype(jnp.int32), mode='drop')
        s = s._replace(sense=sense_pd,
                       pend=s.pend & ~pend_drop)
    else:
        do_add = retry_pend | price_add
        add_id = jnp.where(retry_pend, s.pend_id, j)
        add_row = jnp.where(retry_pend, s.pend_row, s.M[j])
        add_lower = jnp.where(retry_pend, s.pend_lower, lo_ok[j])
        add_lam = jnp.where(retry_pend, s.pend_lam,
                            jnp.where(lo_ok[j], -one, one))
    # On the new-lam path the reference promotes lam <- lam* before adding
    # (auxiliary.c:158-159)
    lam2 = jnp.where(price_add, jnp.where(s.used, lam_star, 0), s.lam)
    s = s._replace(lam=lam2, pend=s.pend & ~retry_pend & ~pend_block)
    s = _try_add(s, st, do_add, add_id, add_lam, add_row, add_lower,
                 sw_free=None if s.sw is None
                 else (use_sw_readd | pend_readd,
                       jnp.where(pend_readd, p_was_fixed, rm_was_fixed)))
    # Residual divergence (SOFT_WEIGHTS + singular pend): when a pending
    # retry and a soft blocking re-add coincide, the reference performs
    # BOTH adds in one iteration (the parked entry re-enters inside
    # remove_constraint, auxiliary.c:264-273 after factorization.c:92-97);
    # the flat mux performs the pend retry first and lets pricing
    # re-select the soft blocker on a later iteration — a different but
    # valid active-set trajectory.  The parked entry's own slack-bound
    # transitions ARE searched (the virtual pend candidate above closes
    # the former EXIT_CYCLE limitation); a measured attempt to emulate
    # the double add instead re-introduced a zero-step flip-flop on kink
    # instances and was reverted — see ROUND3.md.

    return s._replace(
        status=status,
        iterations=s.iterations + running.astype(jnp.int32))


def flat_gram(s: FlatState, st: Settings):
    """Rebuild the (masked) Gram matrix from the slot rows:
    G = M_W M_W' + rho_soft I_soft, identity on free slots."""
    dtype = s.E.dtype
    G = jnp.matmul(s.Mw, s.Mw.T, precision=_HI)
    softm = s.used & ((s.sense[s.sid] & SOFT) > 0)
    if s.sw is not None:
        # only FREE soft slacks sit on the Gram diagonal, with per-side
        # weights (factorization.c:31-40, SOFT_WEIGHTS branch)
        sw_bits = s.sense[s.sid]
        softm = softm & ((sw_bits & SLACK_FIXED) == 0)
        rho_w = jnp.where((sw_bits & LOWER) > 0,
                          s.sw.rho_ls[s.sid], s.sw.rho_us[s.sid])
        G = G + jnp.diag(jnp.where(softm, rho_w, 0))
    else:
        G = G + jnp.diag(jnp.where(softm,
                                   jnp.asarray(st.rho_soft, dtype), 0))
    um = s.used
    G = jnp.where(um[:, None] & um[None, :], G, 0)
    return G + jnp.diag(jnp.where(um, 0.0, 1.0).astype(dtype))


def flat_refresh(s: FlatState, st: Settings) -> FlatState:
    """Scheduled numerical maintenance between solve rounds:

    * one Newton polish E <- E(2I - G E) of the inverse Gram (two batched
      K^3 GEMMs on the MXU) — the role of the reference's refactorization
      repair (daqp.c:32-46) as a lockstep pass;
    * cycle-flagged lanes get an EXACT refactorization (batched solve
      against the rebuilt Gram) and re-open (daqp.c:66-85);
    * optimal lanes get one iterative-refinement step (auxiliary.c:497-588
      semantics via the polished inverse) — re-priced by the next round's
      first iteration since their status stays terminal unless re-opened.
    """
    K = s.E.shape[0]
    dtype = s.E.dtype
    G = flat_gram(s, st)
    I = jnp.eye(K, dtype=dtype)
    um = s.used
    Iu = jnp.diag(um.astype(dtype))
    # Newton polish, guarded by the contraction condition ||GE - I|| < 1/2:
    # outside it the iteration DIVERGES quadratically (observed as NaN
    # states when unguarded).  OPTIMAL lanes are polished too: their E is
    # only consumed by the refinement step that follows, and refining
    # through the un-polished f32 E left a soft-heavy lane 5e-3 off with
    # a clean SOFT_OPTIMAL flag (caught by the dense-kernel SW
    # differential, tests/test_pallas_sw.py — the kernel lane was 2.6e-7).
    is_opt = (s.status == EXIT_OPTIMAL) | (s.status == EXIT_SOFT_OPTIMAL)
    P = jnp.matmul(G, s.E, precision=_HI)
    resid = jnp.max(jnp.abs(P - Iu))
    E_new = jnp.matmul(s.E, 2 * Iu - P, precision=_HI)
    E_new = jnp.where(um[:, None] & um[None, :], E_new, 0)
    newton_ok = ((s.status == EXIT_RUNNING) | is_opt) & (resid < 0.5)
    E1 = jnp.where(newton_ok, E_new, s.E)

    # one-shot exact refactorization for cycle-flagged lanes (also the
    # escape hatch for a drifted E outside the Newton basin).  Cholesky,
    # not LU: G is SPD by construction (identity on free slots) and TPU's
    # LU expander is orders of magnitude slower than the native Cholesky.
    cyc = (s.status == EXIT_CYCLE) & (s.repaired < 2)
    parked = s.status == EXIT_REFACTOR   # unstable deletion pivot
    need_exact = cyc | parked
    cF = jnp.linalg.cholesky(G)
    cF = jnp.where(jnp.isfinite(cF), cF, I)
    E_exact = jax.scipy.linalg.cho_solve((cF, True), I)
    E_exact = jnp.where(um[:, None] & um[None, :], E_exact, 0)
    exact_ok = jnp.all(jnp.isfinite(E_exact))
    E2 = jnp.where(need_exact & exact_ok, E_exact, E1)
    status = jnp.where(need_exact & exact_ok, EXIT_RUNNING,
                       s.status).astype(jnp.int32)
    # a parked lane whose Gram is itself numerically singular gives up
    status = jnp.where(parked & ~exact_ok, EXIT_CYCLE,
                       status).astype(jnp.int32)
    cyc = cyc & exact_ok
    # a pending constraint of a repaired lane is dropped and re-priced
    drop_pend = cyc & s.pend
    m = s.M.shape[0]
    sense = s.sense.at[jnp.where(drop_pend, s.pend_id, m)].set(
        (s.sense[jnp.clip(s.pend_id, 0, m - 1)] & ~ACTIVE).astype(
            jnp.int32), mode='drop')
    return s._replace(
        E=E2, status=status, sense=sense,
        pend=s.pend & ~drop_pend,
        repaired=s.repaired + cyc.astype(jnp.int32),
        cycle=jnp.where(cyc, 0, s.cycle).astype(jnp.int32),
        best_fval=jnp.where(cyc, jnp.asarray(-1.0, dtype), s.best_fval))


def flat_polish(s: FlatState, st: Settings,
                refine_steps: int = 2) -> FlatState:
    """Post-convergence refinement for optimal lanes: ``refine_steps``
    chained residual corrections of (lam*, u) through E, then a re-price
    that re-opens the lane if a violation survives (the lockstep analogue
    of daqp_refine_active + the optimal-path re-check, daqp.c:47-63).

    Two chained steps (each contracts the error by ~||I - EG||): one step
    through the f32 E left a soft-heavy lane 4e-4 off with a clean
    SOFT_OPTIMAL flag (caught by the dense-kernel SW differential,
    tests/test_pallas_sw.py); two bring it to the ~1e-7 the other tiers
    reach.  In f64 the second step is a no-op at working precision."""
    dtype = s.E.dtype
    is_opt = (s.status == EXIT_OPTIMAL) | (s.status == EXIT_SOFT_OPTIMAL)
    used = s.used
    sw = s.sense[s.sid]
    d_W = jnp.where((sw & LOWER) > 0, s.dlower[s.sid], s.dupper[s.sid])
    d_W = jnp.where(used, d_W, 0)
    softm = used & ((sw & SOFT) > 0)
    if s.sw is not None:
        free_soft = softm & ((sw & SLACK_FIXED) == 0)
        rho_w = jnp.where((sw & LOWER) > 0,
                          s.sw.rho_ls[s.sid], s.sw.rho_us[s.sid])
        d_slack = jnp.where((sw & LOWER) > 0, s.sw.d_ls[s.sid],
                            -s.sw.d_us[s.sid])

    def residual(lam_star, u):
        r = _mv(s.Mw, u) - d_W
        if s.sw is not None:
            # free soft slacks: per-side weight + slack-bound term in the
            # refinement residual (auxiliary.c:522-533)
            r = r - jnp.where(free_soft, rho_w * (lam_star + d_slack), 0)
        else:
            r = r - jnp.where(softm, st.rho_soft * lam_star, 0)
        return jnp.where(used, r, 0)

    lam_star, u, ok = s.lam_star, s.u, is_opt
    for _ in range(refine_steps):
        dlam = _mv(s.E, residual(lam_star, u))
        ok = ok & jnp.all(jnp.isfinite(dlam))
        dlam = jnp.where(ok & used, dlam, 0)
        lam_star = lam_star + dlam
        u = u - _mv(s.Mw.T, dlam)
    lam_star = jnp.where(ok, lam_star, s.lam_star)
    u2 = jnp.where(ok, u, s.u)
    if s.sw is not None:
        rho_w2 = jnp.where((sw & LOWER) > 0,
                           s.sw.rho_ls[s.sid], s.sw.rho_us[s.sid])
        soft_slack = jnp.sum(jnp.where(softm, rho_w2 * lam_star ** 2, 0))
    else:
        soft_slack = st.rho_soft * jnp.sum(
            jnp.where(softm, lam_star ** 2, 0))
    fval = soft_slack + _mv(u2, u2)

    # re-price: any remaining violation re-opens the lane
    mu = _mv(s.M, u2)
    blocked = (s.sense & (ACTIVE | IMMUTABLE)) > 0
    viol = (((s.dupper - mu) < -st.primal_tol * s.scaling)
            | ((mu - s.dlower) < -st.primal_tol * s.scaling)) & ~blocked
    # dual re-check (see pallas_slot.polish): the refined lam* can reveal
    # a dual-infeasible working set the drifted E had accepted — re-open.
    # SOFT_WEIGHTS rows follow the slack-bound rules instead; plain-soft
    # rows keep the hard sign convention.
    is_lo_w = (sw & LOWER) > 0
    immut_w = (sw & IMMUTABLE) > 0
    dual_bad_slots = used & ~immut_w & jnp.where(
        is_lo_w, lam_star > st.dual_tol, lam_star < -st.dual_tol)
    if s.sw is not None:
        dual_bad_slots = dual_bad_slots & ((sw & SOFT) == 0)
    reopen = ok & (jnp.any(viol) | jnp.any(dual_bad_slots))
    status = jnp.where(reopen, EXIT_RUNNING, s.status).astype(jnp.int32)
    return s._replace(
        lam_star=lam_star, u=u2, status=status,
        soft_slack=jnp.where(ok, soft_slack, s.soft_slack),
        fval=jnp.where(ok, fval, s.fval))


def flat_activate(s: FlatState, st: Settings) -> FlatState:
    """Activate sense-ACTIVE constraints (warm/equality start,
    ``daqp_activate_constraints``, auxiliary.c:398-478).

    A linearly dependent activation is dropped — with its ACTIVE bit
    CLEARED so pricing can re-enforce it later (the reference's
    DAQP_SET_INACTIVE, auxiliary.c:446-469) — unless the row is
    IMMUTABLE (a redundant equality), in which case its right-hand side
    is checked for consistency against the active set through the null
    vector of the row Gramian: an inconsistent redundant equality makes
    the problem infeasible and exits EXIT_OVERDETERMINED_INITIAL
    (auxiliary.c:423-459)."""
    from .types import EXIT_OVERDETERMINED_INITIAL
    m = s.M.shape[0]

    def body(i, s):
        want = ((s.sense[i] & ACTIVE) > 0) & (s.status == EXIT_RUNNING)
        in_slots = jnp.any(s.used & (s.sid == i))
        want = want & ~in_slots
        is_lower = (s.sense[i] & LOWER) > 0
        one = jnp.asarray(1.0, s.E.dtype)
        s = _try_add(s, st, want, jnp.asarray(i, jnp.int32),
                     jnp.where(is_lower, -one, one), s.M[i], is_lower)
        dep = s.pend    # _try_add parked the add: linearly dependent row
        # null-vector coefficients: M_i = sum_j ap_j Mw_j on used slots,
        # so consistency requires d_i = sum_j ap_j d_Wj
        gp = jnp.where(s.used, _mv(s.Mw, s.M[i]), 0)
        ap = _mv(s.E, gp)
        d_W = jnp.where((s.sense[s.sid] & LOWER) > 0,
                        s.dlower[s.sid], s.dupper[s.sid])
        d_W = jnp.where(s.used, d_W, 0)
        d_i = jnp.where(is_lower, s.dlower[i], s.dupper[i])
        term = ap * d_W
        resid = d_i - jnp.sum(term)
        scale = 1.0 + jnp.abs(d_i) + jnp.sum(jnp.abs(term))
        is_imm = (s.sense[i] & IMMUTABLE) > 0
        incons = dep & is_imm & (jnp.abs(resid) > st.primal_tol * scale)
        status = jnp.where(incons, EXIT_OVERDETERMINED_INITIAL,
                           s.status).astype(jnp.int32)
        # the dropped constraint re-enters pricing (ACTIVE cleared)
        sense = s.sense.at[jnp.where(dep, i, m)].set(
            (s.sense[jnp.clip(i, 0, m - 1)] & ~ACTIVE).astype(jnp.int32),
            mode='drop')
        return s._replace(pend=jnp.zeros((), bool), sense=sense,
                          status=status)

    return lax.fori_loop(0, m, body, s)


def flat_solve(s: FlatState, st: Settings, inner_iters: int = 32,
               do_refresh: bool = True, do_polish: bool = True) -> FlatState:
    """Round-structured solve: lockstep iterations in chunks of
    ``inner_iters`` with scheduled Newton refresh / exact repair / polish
    between chunks.  Designed to be vmapped: the outer while exits only
    when every lane is terminal, and converged lanes skip all per-round
    work except the (cheap, GEMM-shaped) refresh they ride along with."""
    iter_limit = jnp.asarray(st.iter_limit, jnp.int32)
    # Hard cap on repair/polish rounds: a marginal lane that keeps being
    # re-opened by the polish re-price must not drag the whole chunk
    # through hundreds of (Cholesky-bearing) refresh rounds.
    max_rounds = jnp.asarray(64, jnp.int32)

    def outer_cond(c):
        r, s = c
        return (s.status == EXIT_RUNNING) & (s.iterations < iter_limit) \
            & (r < max_rounds)

    def outer_body(c):
        r, s = c

        def cond(c):
            lim, s = c
            return (s.status == EXIT_RUNNING) & (lim > 0) \
                & (s.iterations < iter_limit)

        def body(c):
            lim, s = c
            return lim - 1, flat_step(s, st)

        _, s = lax.while_loop(cond, body,
                              (jnp.asarray(inner_iters, jnp.int32), s))
        if do_refresh:
            s = flat_refresh(s, st)
        if do_polish:
            s = flat_polish(s, st)
        return r + 1, s

    _, s = lax.while_loop(outer_cond, outer_body,
                          (jnp.zeros((), jnp.int32), s))
    return s._replace(status=jnp.where(
        (s.status == EXIT_RUNNING) & (s.iterations >= iter_limit),
        EXIT_ITERLIMIT,
        jnp.where(s.status == EXIT_RUNNING, EXIT_CYCLE,
                  s.status)).astype(jnp.int32))


def flat_extract_duals(s: FlatState) -> jnp.ndarray:
    """Scatter slot duals to a dense (m,) vector, rescaled to the original
    rows (daqp.c:135-138 + api.c:449-453)."""
    m = s.M.shape[0]
    idx = jnp.where(s.used, s.sid, m)
    vals = s.lam_star * s.scaling[jnp.clip(s.sid, 0, m - 1)]
    return jnp.zeros((m,), s.lam.dtype).at[idx].set(
        jnp.where(s.used, vals, 0), mode='drop')
