"""Hierarchical (lexicographic least-squares) QP solver.

Reference: ``src/hierarchical.c`` (daqp_hiqp, :5-108).  Priority levels are
defined by ``break_points``: constraints before ``break_points[0]`` are hard
from the start; level i (i >= 1) covers rows [break_points[i-1],
break_points[i]).  Walking down the hierarchy:

  1. the level's constraints are SOFTened (their Gram diagonal picks up
     rho_soft, so conflicting constraints stay factorizable) and any
     warm-active ones are added (hierarchical.c:26-35);
  2. the LDP is solved with pricing restricted to rows < level end
     (the reference truncates ``work->m``; here rows beyond the level are
     temporarily flagged IMMUTABLE, which blocks them from pricing);
  3. the optimal soft violations w = lam* . rho_soft are frozen by
     perturbing d (hierarchical.c:51-65) and reported as the output duals;
  4. the level is made hard and the working set is rebuilt, dropping
     entries that became linearly dependent (hierarchical.c:68-95), with
     the degrees-of-freedom counter stopping the walk when none remain
     (hierarchical.c:97, exit flag 3 = no DOF after a failed level).

``break_points`` is a static tuple, so the level walk is a plain unrolled
Python loop around the jitted LDP ``while_loop``; one compilation covers all
instances with the same (shapes, break_points).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import (ACTIVE, IMMUTABLE, LOWER, SOFT, Settings,
                    EXIT_ITERLIMIT, EXIT_OPTIMAL, EXIT_RUNNING)

EXIT_NO_DOF = 3  # hierarchical-only exit flag (hierarchical.c:104)


def _freeze_level_slacks(state, lam_out, st: Settings):
    """Perturb d with the optimal soft violations and record them as output
    duals (hierarchical.c:51-65)."""
    K = state.E.shape[0]
    m = state.M.shape[0]
    mask = jnp.arange(K) < state.n_active
    ws = state.WS
    ws_sense = state.sense[ws]
    is_soft = mask & ((ws_sense & SOFT) > 0)
    w = state.lam_star * jnp.asarray(st.rho_soft, state.lam_star.dtype)
    idx = jnp.where(is_soft, ws, m)
    dlo_add = jnp.where(is_soft & (w < -st.primal_tol), w, 0)
    dup_add = jnp.where(is_soft & (w > st.primal_tol), w, 0)
    dlower = state.dlower.at[idx].add(dlo_add, mode='drop')
    dupper = state.dupper.at[idx].add(dup_add, mode='drop')
    # Weakly-active nudge so a zero slack still signals the active side
    lam_val = w + jnp.where((ws_sense & LOWER) > 0, -1e-14, 1e-14)
    lam_out = lam_out.at[idx].set(
        jnp.where(is_soft, lam_val.astype(lam_out.dtype), 0), mode='drop')
    return state._replace(dlower=dlower, dupper=dupper), lam_out


def _reactivate(state, st: Settings, start: int, n: int):
    """Rebuild the working set after hardening a level, dropping entries
    that became linearly dependent (hierarchical.c:72-95).

    The reference keeps its LDL prefix and re-adds from the first entry of
    the current level; an explicit inverse has no valid sub-prefix, so the
    whole set is rebuilt — identical math, the dependent-entry drops only
    apply from that first level entry on.  Returns (state, n_immutable_readds)
    for the caller's degrees-of-freedom accounting.
    """
    K = state.E.shape[0]
    m = state.M.shape[0]
    pos = jnp.arange(K)
    k = state.n_active
    n_active_old = jnp.minimum(k, n)

    # Drop overdetermined tail entries entirely (hierarchical.c:77-80)
    over = (pos >= n_active_old) & (pos < k)
    idx_over = jnp.where(over, state.WS, m)
    ws_sense = state.sense[jnp.clip(state.WS, 0, m - 1)]
    sense = state.sense.at[idx_over].set(
        (ws_sense & ~(ACTIVE | IMMUTABLE)).astype(jnp.int32), mode='drop')

    in_level = (state.WS >= start) & (pos < n_active_old)
    j0 = jnp.where(jnp.any(in_level),
                   jnp.argmax(in_level).astype(jnp.int32),
                   n_active_old.astype(jnp.int32))

    ws_save = state.WS
    lam_save = state.lam_star
    s0 = state._replace(sense=sense,
                        n_active=jnp.zeros((), jnp.int32),
                        ns_active=jnp.zeros((), jnp.int32),
                        E=jnp.zeros_like(state.E),
                        sing=jnp.zeros((), bool))

    def body(i, carry):
        s, n_imm = carry

        def add(carry):
            s, n_imm = carry
            cid = ws_save[i]
            s = ldp_mod.add_constraint(s, cid, lam_save[i], st)

            def drop(s):
                # Dependent entry: remove it and make it mutable again
                last = s.n_active - 1
                soft_i = ((s.sense[cid] & SOFT) > 0).astype(jnp.int32)
                return s._replace(
                    n_active=last, ns_active=s.ns_active - soft_i,
                    sense=s.sense.at[cid].set(
                        s.sense[cid] & ~(ACTIVE | IMMUTABLE)),
                    sing=jnp.zeros((), bool))

            dropped = s.sing & (i >= j0)
            s = lax.cond(dropped, drop, lambda s: s, s)
            is_imm = (~dropped) & (i >= j0) \
                & ((s.sense[cid] & IMMUTABLE) > 0)
            return s, n_imm + is_imm.astype(jnp.int32)

        return lax.cond(i < n_active_old, add, lambda c: c, (s, n_imm))

    state, n_imm = lax.fori_loop(0, K, body, (s0, jnp.zeros((), jnp.int32)))
    return state, n_imm


def hiqp_core(H, f, A, bupper, blower, sense, ms: int, break_points: tuple,
              st: Settings, deadline=None):
    """Lexicographic least-squares solve (``daqp_hiqp``, hierarchical.c).

    ``break_points`` is a static, strictly increasing tuple ending at m.
    With ``H=None`` the metric is the identity (pure least-squares on the
    constraint rows, the common hierarchical-control use), matching the
    reference's empty-H setup path.
    """
    A = jnp.atleast_2d(A)
    n = A.shape[1] if A.size else (H.shape[0] if H is not None else ms)
    m = ms + A.shape[0]
    bp = tuple(int(b) for b in break_points)
    assert len(bp) >= 2 and bp[-1] == m, (bp, m)
    max_level = max(b - a for a, b in zip(bp[:-1], bp[1:]))
    K = n + max_level + 1

    if H is None:
        H_id = jnp.eye(n, dtype=A.dtype if A.size else jnp.float64)
        ldpd = transform.build_ldp(H_id, f, A, bupper, blower, sense, ms, st)
    else:
        ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st)

    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    dtype = ldpd.M.dtype
    arange_m = jnp.arange(m)

    # Pre-hierarchy hard constraints: activate warm/equality rows < bp[0]
    act_flag, state = ldp_mod.activate_constraints(state, st, m_limit=bp[0])

    lam_out = jnp.zeros((m,), dtype)
    done = (act_flag < 0) | (ldpd.error < 0)
    status = jnp.where(ldpd.error < 0, ldpd.error,
                       jnp.where(act_flag < 0, act_flag,
                                 EXIT_RUNNING)).astype(jnp.int32)
    total_iter = jnp.zeros((), jnp.int32)
    u_best = state.u
    nfree = jnp.asarray(n, jnp.int32)

    nh = len(bp)
    for i in range(1, nh):
        start, end = bp[i - 1], bp[i]
        is_last = i == nh - 1

        def level(args, start=start, end=end, is_last=is_last):
            state, lam_out, status, total_iter, u_best, nfree = args
            beyond = arange_m >= end
            imm_snapshot = state.sense & IMMUTABLE
            lvl = (arange_m >= start) & ~beyond
            sense_l = jnp.where(lvl, state.sense | SOFT, state.sense)
            sense_l = jnp.where(beyond, sense_l | IMMUTABLE, sense_l)
            state = state._replace(sense=sense_l.astype(jnp.int32))

            # Activate warm-started rows of this level (hierarchical.c:28-35)
            act_flag, state = ldp_mod.activate_constraints(
                state, st, m_limit=end, m_start=start)

            u_prev = state.u
            s = state._replace(
                status=jnp.asarray(EXIT_RUNNING, jnp.int32),
                iterations=jnp.zeros((), jnp.int32),
                tried_repair=jnp.zeros((), jnp.int32),
                cycle_counter=jnp.zeros((), jnp.int32),
                best_fval=jnp.asarray(-1.0, dtype))
            s = ldp_mod.ldp_solve(s, st, reset=False, deadline=deadline)
            total_iter = total_iter + s.iterations

            failed = (s.status < 0) | (act_flag < 0)
            iterlimited = (~failed) & (total_iter >= st.iter_limit)

            s, lam_out = _freeze_level_slacks(s, lam_out, st)
            # Make the level hard (hierarchical.c:68)
            sense_h = jnp.where(lvl, s.sense & ~SOFT, s.sense)
            s = s._replace(sense=sense_h.astype(jnp.int32))

            if not is_last:
                s, n_imm = _reactivate(s, st, start, n)
                nfree = nfree - n_imm
            # Restore pricing eligibility of rows beyond this level
            sense_r = jnp.where(
                beyond, (s.sense & ~IMMUTABLE) | imm_snapshot, s.sense)
            s = s._replace(sense=sense_r.astype(jnp.int32))

            status_new = jnp.where(
                failed, EXIT_NO_DOF,
                jnp.where(iterlimited, EXIT_ITERLIMIT,
                          s.status)).astype(jnp.int32)
            done_new = failed | iterlimited | (nfree <= 0)
            u_best_new = jnp.where(failed, u_prev, s.u)
            return s, lam_out, status_new, total_iter, u_best_new, \
                done_new, nfree

        def skip(args):
            state, lam_out, status, total_iter, u_best, nfree = args
            return state, lam_out, status, total_iter, u_best, \
                jnp.ones((), bool), nfree

        (state, lam_out, status, total_iter, u_best, done, nfree) = lax.cond(
            done, skip, level,
            (state, lam_out, status, total_iter, u_best, nfree))

    x = transform.ldp_to_qp_solution(ldpd, u_best)
    if H is None and f is not None:
        fval = jnp.asarray(f, dtype) @ x
    else:
        fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
    status = jnp.where(status == EXIT_RUNNING, EXIT_OPTIMAL, status)
    return solve_mod.SolveOut(
        x=x, lam=lam_out, fval=fval, exitflag=status.astype(jnp.int32),
        iterations=jnp.maximum(total_iter, 1),
        soft_slack=state.soft_slack, state=state)
