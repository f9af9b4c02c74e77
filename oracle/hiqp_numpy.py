"""Pure-NumPy executable specification of the hierarchical QP solver.

Loop-based oracle for :mod:`daqp_tpu.hierarchical` (reference
``src/hierarchical.c``, daqp_hiqp :5-108): lexicographic least squares
over priority levels defined by ``break_points`` —

  1. soften the level's rows (SOFT: the working-set Gram picks up
     rho_soft so conflicting constraints stay factorizable) and restrict
     pricing to rows before the level end (the reference truncates
     work->m; the oracle flags the tail IMMUTABLE), hierarchical.c:26-35;
  2. solve the LDP;
  3. freeze the level's optimal soft violations w = lam* * rho_soft into
     the d bounds and report them as the level's slack duals
     (hierarchical.c:51-65);
  4. make the level hard; its active rows become IMMUTABLE and consume
     degrees of freedom — the walk stops when none remain
     (hierarchical.c:68-97, exit flag 3 after a failed level).

The inner solver is :mod:`oracle.daqp_numpy`'s workspace, so this is a
fully loop-based independent implementation for differential testing.
"""
from __future__ import annotations

import numpy as np

from .daqp_numpy import (Workspace, daqp_ldp, qp_to_ldp, ACTIVE, LOWER,
                         IMMUTABLE, SOFT, EXIT_OPTIMAL)

EXIT_NO_DOF = 3


def hiqp(H, f, A, bupper, blower, sense=None, ms=0, break_points=(),
         settings=None):
    settings = dict(settings or {})
    bp = tuple(int(b) for b in break_points)
    n = (np.asarray(H).shape[0] if H is not None
         else (np.asarray(A).shape[-1] if np.size(A) else ms))
    if H is None:
        H = np.eye(n)
    A = np.asarray(A, dtype=float).reshape(-1, n)
    m = ms + A.shape[0]
    assert len(bp) >= 2 and bp[-1] == m, (bp, m)
    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    rho_soft = settings.get('rho_soft', 1e-6)
    primal_tol = settings.get('primal_tol', 1e-6)

    M, dupper, dlower, scaling, Rinv, v, sense2 = qp_to_ldp(
        H, f, A, bu, bl, sense, ms, settings)
    # Size the slot table for the LARGEST softened level (the reference
    # allocates n + ns + 1; hiqp needs room for a whole level's soft
    # rows): construct with a sense that marks the biggest level SOFT,
    # then restore the real initial sense.
    wi, wj = max(zip(bp[:-1], bp[1:]), key=lambda ab: ab[1] - ab[0])
    sense_sizing = sense2.copy()
    sense_sizing[wi:wj] |= SOFT
    work = Workspace(M, dupper, dlower, sense_sizing, scaling, settings)
    work.sense = sense2.copy()

    # pre-hierarchy hard constraints: activate warm/equality rows < bp[0]
    arange_m = np.arange(m)
    tail = arange_m >= bp[0]
    imm_snap = work.sense[tail] & IMMUTABLE
    work.sense[tail] |= IMMUTABLE          # block tail from activation
    flag = work.activate_constraints()
    work.sense[tail] = (work.sense[tail] & ~IMMUTABLE) | imm_snap
    lam_out = np.zeros(m)
    status = EXIT_NO_DOF if flag < 0 else EXIT_OPTIMAL
    total_iter = 0
    u_best = work.u.copy()
    nfree = n

    if flag >= 0:
        for i in range(1, len(bp)):
            start, end = bp[i - 1], bp[i]
            beyond = arange_m >= end
            imm_snap = work.sense[beyond] & IMMUTABLE
            lvl = (arange_m >= start) & ~beyond
            work.sense[lvl] |= SOFT
            work.sense[beyond] |= IMMUTABLE

            u_prev = work.u.copy()
            flag = work.activate_constraints()
            if flag >= 0:
                flag = daqp_ldp(work)
            total_iter += work.iterations
            if flag < 0:
                status = EXIT_NO_DOF
                u_best = u_prev
                break

            # freeze slacks (hierarchical.c:51-65)
            for j in range(work.n_active):
                cid = work.WS[j]
                if not (work.sense[cid] & SOFT):
                    continue
                w = work.lam_star[j] * rho_soft
                if w > primal_tol:
                    work.dupper[cid] += w
                elif w < -primal_tol:
                    work.dlower[cid] += w
                lam_out[cid] = w + (-1e-14 if (work.sense[cid] & LOWER)
                                    else 1e-14)
            # harden; rebuild the working set dropping entries that became
            # linearly dependent, and count the level's IMMUTABLE re-adds
            # as consumed degrees of freedom (hierarchical.c:68-97)
            work.sense[lvl] &= ~SOFT
            if i < len(bp) - 1:
                n_active_old = min(work.n_active, n)
                for j in range(n_active_old, work.n_active):
                    work.sense[work.WS[j]] &= ~(ACTIVE | IMMUTABLE)
                ws_save = work.WS[:n_active_old].copy()
                lam_save = work.lam_star[:n_active_old].copy()
                j0 = next((j for j in range(n_active_old)
                           if ws_save[j] >= start), n_active_old)
                work.n_active = 0
                work.E[:] = 0.0
                work.sing = False
                n_imm = 0
                for j in range(n_active_old):
                    cid = int(ws_save[j])
                    work.add_constraint(cid, lam_save[j])
                    if work.sing and j >= j0:
                        work.n_active -= 1        # dependent: drop
                        work.sense[cid] &= ~(ACTIVE | IMMUTABLE)
                        work.sing = False
                    elif j >= j0 and (work.sense[cid] & IMMUTABLE):
                        n_imm += 1
                nfree -= n_imm
            work.sense[beyond] = (work.sense[beyond] & ~IMMUTABLE) \
                | imm_snap
            u_best = work.u.copy()
            if nfree <= 0:
                break

    x = Rinv @ (u_best - v)
    f_ = np.zeros(n) if f is None else np.asarray(f, dtype=float)
    fval = 0.5 * x @ (np.asarray(H, dtype=float) @ x) + f_ @ x
    return dict(x=x, lam=lam_out, fval=fval, exitflag=status,
                iterations=max(total_iter, 1))
