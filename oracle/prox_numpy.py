"""Pure-NumPy executable specification of the proximal-point LP solver.

Loop-based oracle for :func:`daqp_tpu.linprog` (reference
``src/daqp_prox.c``, LP regime eps > 0 with H absent): the proximal-point
iteration

    x_{k+1} = argmin_z  f'z + 1/(2 eps) ||z - x_k||^2   s.t.  z in P
            = proj_P(x_k - eps f)

whose inner projection is the :mod:`oracle.daqp_numpy` LDP workspace
(H = I so the LDP transform is the identity).  For polyhedral P the
proximal-point iteration converges FINITELY to an LP optimum (the fixed
point x = proj_P(x - eps f) is exactly the LP optimality condition), so
the oracle terminates on an exact fixed point rather than a tolerance
ladder.  Unboundedness is declared when the iterate norm diverges
(reference: gradient_step detecting an unblocked descent ray,
daqp_prox.c:120-129).
"""
from __future__ import annotations

import numpy as np

from .daqp_numpy import Workspace, daqp_ldp, qp_to_ldp, EXIT_ITERLIMIT, INF

EXIT_UNBOUNDED = -3


def linprog(f, A, bupper, blower, sense=None, ms=0, settings=None):
    settings = settings or {}
    f = np.asarray(f, dtype=float)
    n = f.shape[0]
    A = np.asarray(A, dtype=float).reshape(-1, n)
    m = ms + A.shape[0]
    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    iter_limit = settings.get('iter_limit', 10000)
    eps = settings.get('eps_prox', 1.0)

    # H = I: the LDP transform is trivial (R = Rinv = I, M = normalized A)
    M, _, _, scaling, _, _, sense2 = qp_to_ldp(
        np.eye(n), np.zeros(n), A, bu, bl, sense, ms, settings)
    work = Workspace(M, bu * scaling, bl * scaling, sense2, scaling,
                     settings)
    flag = work.activate_constraints()
    if flag < 0:
        return dict(x=np.full(n, np.nan), lam=np.zeros(m), fval=np.nan,
                    exitflag=flag, iterations=0)

    Aall = np.vstack([np.eye(n)[:ms], A]) if ms > 0 else A
    x = np.zeros(n)
    tot_iter = 0
    exitflag = EXIT_ITERLIMIT
    jumped = False
    for _k in range(iter_limit):
        v = eps * f - x                       # v = R^{-T}(eps f) - u0
        Mv = M @ v
        work.dupper = bu * scaling + Mv
        work.dlower = bl * scaling + Mv
        inner_flag = daqp_ldp(work)
        work.compute_primal_and_fval()
        tot_iter += work.iterations
        if inner_flag < 0:
            exitflag = inner_flag
            break
        x_new = work.u - v
        step = np.max(np.abs(x_new - x))
        converged = step <= 1e-12 * (1.0 + np.max(np.abs(x)))
        if converged and not jumped:
            x = x_new
            exitflag = 1
            break
        jumped = False
        if work.iterations == 1 and not converged:
            # gradient_step (daqp_prox.c:120-129): the active set froze,
            # so x moves along a fixed descent ray inside the current
            # face; jump straight to the nearest blocking constraint
            # (finite termination on long/near-degenerate edges), and if
            # NO constraint blocks the ray the LP is unbounded.
            d = x_new - x
            vals = Aall @ x_new
            Ad = Aall @ d
            dtol = 1e-12 * (1.0 + np.max(np.abs(d)))
            t_min = np.inf
            for i in range(m):
                if Ad[i] > dtol and bu[i] < INF:
                    t_min = min(t_min, (bu[i] - vals[i]) / Ad[i])
                elif Ad[i] < -dtol and bl[i] > -INF:
                    t_min = min(t_min, (bl[i] - vals[i]) / Ad[i])
            if not np.isfinite(t_min):
                exitflag = EXIT_UNBOUNDED
                break
            if t_min > 0:
                x = x_new + t_min * d
                jumped = True
                continue
        x = x_new

    # LP duals: the inner projection's stationarity is
    # (z - x + eps f) + A' mu = 0, so at the fixed point lam = mu / eps
    lam = np.zeros(m)
    for i in range(work.n_active):
        lam[work.WS[i]] = work.lam_star[i] * scaling[work.WS[i]] / eps
    return dict(x=x, lam=lam, fval=float(f @ x), exitflag=exitflag,
                iterations=tot_iter)
