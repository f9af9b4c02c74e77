"""Pure-NumPy executable specification of the MIQP branch-and-bound.

Loop-based oracle for :mod:`daqp_tpu.bnb` (reference ``src/bnb.c``):
depth-first search over BINARY constraint rows with

  * branch selection: the FIRST unfixed binary (in binary-id order) whose
    constraint value is off both endpoints by more than the scaled primal
    tolerance (bnb.c:130-156, daqp_get_branch_id) — a zero-dual binary
    sitting at an endpoint is already integer feasible;
  * nearest-endpoint-first exploration: the child fixing the row at the
    endpoint closest to its relaxation value is processed first
    (bnb.c:151-152);
  * dominance bound: the incumbent objective is pushed into the
    relaxation's dual objective cut ``fval_bound`` so dominated subtrees
    exit EXIT_INFEASIBLE mid-solve (bnb.c:29-31, daqp.c:20-23);
  * each relaxation is a full :func:`oracle.daqp_numpy.quadprog` solve
    with the fixed rows entered as ACTIVE|IMMUTABLE equalities (the
    reference warm-starts instead — an efficiency difference only).
"""
from __future__ import annotations

import numpy as np

from .daqp_numpy import (quadprog, ACTIVE, LOWER, IMMUTABLE, BINARY,
                         EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL, EXIT_INFEASIBLE)

INF = 1e30


def solve_miqp(H, f, A, bupper, blower, sense, ms=0, settings=None):
    settings = dict(settings or {})
    H = np.asarray(H, dtype=float)
    n = H.shape[0]
    A = np.asarray(A, dtype=float).reshape(-1, n)
    m = ms + A.shape[0]
    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    sense = np.asarray(sense, dtype=int)
    primal_tol = settings.get('primal_tol', 1e-6)
    bin_ids = [i for i in range(m) if sense[i] & BINARY]

    Aall = np.vstack([np.eye(n)[:ms], A]) if ms > 0 else A
    # The relaxation's in-solve cut compares the LDP-space dual objective
    # work.fval = 2*F_qp + v'v against 2*fval_bound, so the bound must be
    # F* + v'v/2 (v = R^{-T} f is node-independent; the reference stores
    # exactly 0.5*work->fval of the incumbent, bnb.c:68)
    f_arr = np.zeros(n) if f is None else np.asarray(f, dtype=float)
    vv_half = 0.5 * float(f_arr @ np.linalg.solve(H, f_arr))

    best = None
    best_fval = INF
    nodes = 0
    # DFS stack of fixation lists [(row, is_lower), ...]
    stack = [[]]
    exitflag = EXIT_INFEASIBLE
    while stack:
        fixations = stack.pop()
        nodes += 1
        s_node = sense.copy()
        for row, is_lower in fixations:
            s_node[row] |= ACTIVE | IMMUTABLE
            if is_lower:
                s_node[row] |= LOWER
            else:
                s_node[row] &= ~LOWER
        st_node = dict(settings)
        if best_fval < INF:
            # dominance cut in the relaxation's dual-objective space:
            # daqp_numpy prunes when work.fval > 2*fval_bound and the QP
            # fval is 0.5*(work.fval - v'v) with v shared across nodes
            st_node['fval_bound'] = best_fval + vv_half
        out = quadprog(H, f, A, bu, bl, sense=s_node, ms=ms,
                       settings=st_node)
        if out['exitflag'] == EXIT_INFEASIBLE:
            continue                         # infeasible or dominated
        if out['exitflag'] not in (EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL):
            exitflag = out['exitflag']       # inner failure aborts
            break
        if out['fval'] >= best_fval - 1e-12:
            continue                         # dominance (post-solve)
        x = out['x']
        vals = Aall @ x

        branch_row, branch_lower_first = None, False
        fixed_rows = {row for row, _ in fixations}
        for bid in bin_ids:
            if bid in fixed_rows:
                continue
            mid_diff = 0.5 * (bu[bid] + bl[bid]) - vals[bid]
            dist = 0.5 * (bu[bid] - bl[bid]) - abs(mid_diff)
            if dist <= primal_tol:
                continue                     # already at an endpoint
            branch_row = bid
            branch_lower_first = mid_diff > 0   # value below midpoint
            break

        if branch_row is None:
            best = out                       # integer feasible incumbent
            best_fval = out['fval']
            exitflag = EXIT_OPTIMAL
            continue
        # LIFO: push the far endpoint first so the near one pops first
        stack.append(fixations + [(branch_row, not branch_lower_first)])
        stack.append(fixations + [(branch_row, branch_lower_first)])

    if best is None:
        return dict(x=np.full(n, np.nan), lam=np.zeros(m), fval=np.nan,
                    exitflag=exitflag if exitflag < 0 else EXIT_INFEASIBLE,
                    nodes=nodes)
    return dict(x=best['x'], lam=best['lam'], fval=best['fval'],
                exitflag=EXIT_OPTIMAL, nodes=nodes)
