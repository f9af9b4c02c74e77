"""Pure-NumPy executable specification of the AVI solver.

Plays the role of the reference's pure-Julia AVI spec
(``interfaces/daqp-julia/src/avi_julia.jl:107-204``, mirroring
``src/avi.c``): a readable, loop-based Douglas-Rachford splitting whose
inner projection is the :mod:`oracle.daqp_numpy` LDP workspace, used as a
differential-testing oracle for :mod:`daqp_tpu.avi_solver`.

Problem: find x in P = {x : blower <= [x[:ms]; A x] <= bupper} with
(H x + f)'(y - x) >= 0 for all y in P, H possibly asymmetric.

Algorithm (avi.c:6-101):
  * inner projection-like QP in the metric Hs_rho = sym(H) + rho*I,
    warm-started from the previous working set;
  * outer x <- (H + rho I)^{-1} (rho y + H x + 0.5 sym(H)(y - x));
  * rho = sqrt(min_diag(sym H) * max_row_sum(sym H)), else ||H||_F / 2
    (utils.c:624-627);
  * stable active set for ``terminate_limit`` consecutive inner solves ->
    exact KKT solve on the ORIGINAL asymmetric H + verification
    (avi.c:103-221); a Newton step that worsens the natural residual is
    reverted and the limit extended by 5 (cap 30) (avi_julia.jl:117-135).
"""
from __future__ import annotations

import numpy as np

from .daqp_numpy import (Workspace, daqp_ldp, qp_to_ldp, ACTIVE, LOWER,
                         IMMUTABLE, SOFT, EXIT_OPTIMAL, EXIT_ITERLIMIT)


def solve_avi(H, f, A, bupper, blower, sense=None, ms=0, settings=None):
    settings = settings or {}
    H = np.asarray(H, dtype=float)
    n = H.shape[0]
    A = np.asarray(A, dtype=float).reshape(-1, n)
    m = ms + A.shape[0]
    f = np.asarray(f, dtype=float)
    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    iter_limit = settings.get('iter_limit', 1000)
    primal_tol = settings.get('primal_tol', 1e-6)
    dual_tol = settings.get('dual_tol', 1e-12)
    rho_soft = settings.get('rho_soft', 1e-6)

    # Regularization heuristic (utils.c:607-631)
    Hsym = 0.5 * (H + H.T)
    diag = np.diagonal(Hsym)
    min_diag = diag.min()
    max_row_sum = np.abs(Hsym).sum(axis=1).max()
    if min_diag > 0 and max_row_sum > 0:
        rho = float(np.sqrt(min_diag * max_row_sum))
    else:
        rho = float(np.linalg.norm(H)) / 2
    I = np.eye(n)
    Hs_rho = Hsym + rho * I
    H_rho = H + rho * I
    Aall = np.vstack([I[:ms, :], A]) if ms > 0 else A

    # Inner projection LDP in the Hs_rho metric, built once; only the
    # linear term (hence d bounds) changes between outer iterations.
    M, _, _, scaling, Rinv, _, sense2 = qp_to_ldp(
        Hs_rho, np.zeros(n), A, bu, bl, sense, ms, settings)
    R_T = np.linalg.inv(Rinv).T                       # R' with Hs_rho = R'R
    work = Workspace(M, bu * scaling, bl * scaling, sense2, scaling,
                     settings)
    flag = work.activate_constraints()
    if flag < 0:
        return _failed(n, m, flag)

    x = np.zeros(n)
    y = np.zeros(n)
    yold = np.zeros(n)
    xt = np.zeros(n)
    res = np.inf
    counter, terminate_limit = 0, settings.get('min_terminate_counter', 5)
    tot_iter = 0
    lam_out = np.zeros(m)
    exitflag = EXIT_ITERLIMIT
    for _k in range(iter_limit):
        Hx = H @ x
        xtemp = f + Hx - Hs_rho @ x
        v = np.linalg.solve(R_T, xtemp)               # v = R^{-T} xtemp
        Mv = M @ v
        work.dupper = bu * scaling + Mv
        work.dlower = bl * scaling + Mv
        inner_flag = daqp_ldp(work)
        work.compute_primal_and_fval()
        y_inner = Rinv @ (work.u - v)
        tot_iter += work.iterations
        if inner_flag < 0:
            exitflag = inner_flag
            break

        # Newton-step progress bookkeeping (avi_julia.jl:117-135)
        if counter == terminate_limit:
            res_cand = float(np.linalg.norm(y_inner - x))
            if res_cand > res:
                y_inner = yold.copy()
                x = xt.copy()
                terminate_limit = min(terminate_limit + 5, 30)
            else:
                res = res_cand
        y = y_inner

        # Stable active set -> exact KKT on the asymmetric H (avi.c:65-80)
        if work.iterations == 1:
            counter += 1
            if counter == terminate_limit:
                lam_c = np.zeros(m)
                for i in range(work.n_active):
                    lam_c[work.WS[i]] = (work.lam_star[i]
                                         * scaling[work.WS[i]])
                ASu = [i for i in range(m) if lam_c[i] > dual_tol]
                ASl = [i for i in range(m) if lam_c[i] < -dual_tol]
                x_kkt, lam_kkt, AS = _solve_kkt(
                    H, f, Aall, bu, bl, sense2, scaling, rho_soft, ASu,
                    ASl)
                if _is_optimal(x_kkt, lam_kkt, AS, ASu, Aall, bu, bl,
                               sense2, primal_tol, dual_tol):
                    x = x_kkt
                    lam_out = np.zeros(m)
                    lam_out[AS] = lam_kkt
                    exitflag = EXIT_OPTIMAL
                    break
                xt = x.copy()
                x = x_kkt
                yold = y.copy()
                continue
        else:
            counter = 0

        # DR update (avi.c:84-96)
        xtemp2 = rho * y + Hx + 0.5 * (Hsym @ (y - x))
        x = np.linalg.solve(H_rho, xtemp2)

    return dict(x=x, lam=lam_out, fval=float(f @ x), exitflag=exitflag,
                iterations=tot_iter)


def _solve_kkt(H, f, Aall, bu, bl, sense, scaling, rho_soft, ASu, ASl):
    """KKT system on the original H (avi_julia.jl:185-204 / avi.c:103-184):
    [H  A_W'; A_W  -S] [x; lam] = [-f; b_W], S the soft regularization."""
    n = H.shape[0]
    AS = list(ASu) + list(ASl)
    na = len(AS)
    K = np.zeros((n + na, n + na))
    K[:n, :n] = H
    if na:
        Aw = Aall[AS]
        K[n:, :n] = Aw
        K[:n, n:] = Aw.T
        for i, cid in enumerate(AS):
            if sense[cid] & SOFT:
                K[n + i, n + i] = -1.0 / (scaling[cid] ** 2 * rho_soft)
    rhs = np.concatenate([-f, bu[ASu], bl[ASl]])
    try:
        z = np.linalg.solve(K, rhs)
    except np.linalg.LinAlgError:
        return np.full(n, np.nan), np.zeros(na), AS
    return z[:n], z[n:], AS


def _is_optimal(x, lam, AS, ASu, Aall, bu, bl, sense, primal_tol,
                dual_tol):
    """KKT verification (avi.c:187-221 / avi_julia.jl:85-105)."""
    if not np.all(np.isfinite(x)):
        return False
    upper = set(ASu)
    for i, cid in enumerate(AS):
        if sense[cid] & IMMUTABLE:
            continue
        if cid in upper:
            if lam[i] < -dual_tol:
                return False
        elif lam[i] > dual_tol:
            return False
    r = Aall @ x
    inactive = np.ones(Aall.shape[0], bool)
    inactive[AS] = False
    if np.any(r[inactive] > bu[inactive] + primal_tol):
        return False
    if np.any(r[inactive] < bl[inactive] - primal_tol):
        return False
    return True


def _failed(n, m, flag):
    return dict(x=np.full(n, np.nan), lam=np.zeros(m), fval=np.nan,
                exitflag=flag, iterations=0)
