"""Affine variational inequality (AVI) solver.

Reference: ``src/avi.c`` (daqp_solve_avi :6-101, daqp_solve_avi_kkt
:103-184, daqp_check_optimal_avi :187-221) and the setup in
``src/utils.c:600-638`` (daqp_update_avi).

Problem: find x in P = {x : blower <= [x[:ms]; A x] <= bupper} with
(H x + f)'(y - x) >= 0 for all y in P, where H may be ASYMMETRIC (the
symmetric part sets the metric).  Algorithm: Douglas-Rachford-style
splitting —

  * inner projection-like QP in the metric Hs_rho = sym(H) + rho*I,
    solved warm by the active-set LDP solver (one Cholesky at setup);
  * outer update x <- (H + rho*I)^{-1} (rho*y + H x + 0.5*sym(H)(y - x));
  * rho = sqrt(min_diag(sym H) * max_row_sum(sym H)) or ||H||_F / 2
    (utils.c:624-627);
  * when the inner active set is stable for ``terminate_limit``
    consecutive iterations, the exact KKT/Schur system
    A_W H^{-1} A_W' lam = -(b_W + A_W H^{-1} f) on the ORIGINAL
    (asymmetric) H is solved and verified; a Newton step that increases
    the natural residual is reverted and the limit extended (avi.c:44-61).

TPU-first notes: the reference's hand-rolled dense LU (utils.c:640-696) is
replaced by an LU factorization of H computed once with
``jax.scipy.linalg.lu_factor`` and reused inside the loop; the per-K KKT
Schur solve runs on a fixed (K, K) masked buffer so the whole outer loop is
one ``lax.while_loop``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import (ACTIVE, IMMUTABLE, LOWER, SOFT, Settings, DAQP_INF,
                    EXIT_ITERLIMIT, EXIT_OPTIMAL, EXIT_RUNNING)


class _AVICarry(NamedTuple):
    state: ldp_mod.LDPState
    x: jnp.ndarray            # (n,) outer AVI iterate
    y: jnp.ndarray            # (n,) relaxed iterate
    xold: jnp.ndarray         # (n,) snapshot for Newton reverts
    lam: jnp.ndarray          # (K,) KKT duals (original constraint space)
    min_newton_res: jnp.ndarray  # ()
    counter: jnp.ndarray      # () int32 consecutive stable-AS solves
    terminate_limit: jnp.ndarray  # () int32
    tot_iter: jnp.ndarray     # () int32
    outer_k: jnp.ndarray      # () int32
    status: jnp.ndarray       # () int32


def _kkt_solve(state, Aall, H_lu, f, bupper, blower, st: Settings):
    """Exact KKT/Schur solve on the original asymmetric H for the current
    working set (``daqp_solve_avi_kkt``, avi.c:103-184).

    Returns (x, lam) with lam padded over the (K,) working-set buffer.
    """
    K = state.E.shape[0]
    m = Aall.shape[0]
    mask = jnp.arange(K) < state.n_active
    ws = jnp.clip(state.WS, 0, m - 1)
    Aw = jnp.where(mask[:, None], Aall[ws], 0)            # (K, n)
    ws_sense = state.sense[ws]

    T = jax.scipy.linalg.lu_solve(H_lu, Aw.T)             # H^{-1} A_W'
    S = Aw @ T                                            # (K, K)
    soft_reg = jnp.where(
        mask & ((ws_sense & SOFT) > 0),
        st.rho_soft / jnp.maximum(state.scaling[ws] ** 2, 1e-30), 0)
    S = S + jnp.diag(soft_reg)
    # Pad the inactive block with the identity to keep the solve well-posed
    S = jnp.where(mask[:, None] & mask[None, :], S, 0)
    S = S + jnp.diag(jnp.where(mask, 0.0, 1.0))

    Hinv_f = jax.scipy.linalg.lu_solve(H_lu, f)
    b_w = jnp.where((ws_sense & LOWER) > 0, blower[ws], bupper[ws])
    rhs = jnp.where(mask, -(b_w + Aw @ Hinv_f), 0)
    lam = jnp.linalg.solve(S, rhs)
    lam = jnp.where(mask, lam, 0)

    x = jax.scipy.linalg.lu_solve(H_lu, -f - Aw.T @ lam)
    return x, lam


def _check_optimal(state, x, lam, Aall, bupper, blower, st: Settings):
    """KKT verification (``daqp_check_optimal_avi``, avi.c:187-221)."""
    K = state.E.shape[0]
    m = Aall.shape[0]
    mask = jnp.arange(K) < state.n_active
    ws = jnp.clip(state.WS, 0, m - 1)
    ws_sense = state.sense[ws]
    immut = (ws_sense & IMMUTABLE) > 0
    is_lower = (ws_sense & LOWER) > 0
    dual_ok = jnp.all(jnp.where(
        mask & ~immut,
        jnp.where(is_lower, lam <= st.dual_tol, lam >= -st.dual_tol),
        True))
    r = Aall @ x
    inactive = (state.sense & ACTIVE) == 0
    primal_ok = jnp.all(jnp.where(
        inactive,
        (r <= bupper + st.primal_tol) & (r >= blower - st.primal_tol),
        True))
    return dual_ok & primal_ok


def avi_core(H, f, A, bupper, blower, sense, ms: int, st: Settings, K=None,
             x0=None, deadline=None):
    """Solve the AVI (``daqp_solve_avi``, avi.c:6-101)."""
    A = jnp.atleast_2d(A)
    n = H.shape[0]
    m = ms + A.shape[0]
    dtype = H.dtype
    if K is None:
        K = n + 1
    f = jnp.asarray(f, dtype)
    bupper = jnp.asarray(bupper, dtype)
    blower = jnp.asarray(blower, dtype)

    # Regularization heuristic (utils.c:607-631)
    Hsym = 0.5 * (H + H.T)
    diag = jnp.diagonal(Hsym)
    min_diag = jnp.min(diag)
    max_row_sum = jnp.max(jnp.sum(jnp.abs(Hsym), axis=1))
    fro = jnp.sqrt(jnp.sum(H * H))
    rho = jnp.where((min_diag > 0) & (max_row_sum > 0),
                    jnp.sqrt(jnp.maximum(min_diag * max_row_sum, 1e-30)),
                    fro / 2)
    I = jnp.eye(n, dtype=dtype)
    Hs_rho = Hsym + rho * I
    H_rho = H + rho * I
    H_lu = jax.scipy.linalg.lu_factor(H)
    H_rho_lu = jax.scipy.linalg.lu_factor(H_rho)

    # Original constraint rows (simple bounds as identity rows)
    Aall = jnp.concatenate([I[:ms, :], A], axis=0) if ms > 0 else A

    # Inner projection QP in the Hs_rho metric
    ldpd = transform.build_ldp(Hs_rho, None, A, bupper, blower, sense, ms,
                               st)
    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    act_flag, state = ldp_mod.activate_constraints(state, st)

    # AVI unconstrained shortcut (utils.c:54-55, :547-551)
    x_unc = jax.scipy.linalg.lu_solve(H_lu, -f)
    r_unc = Aall @ x_unc
    unc_ok = jnp.all((r_unc <= bupper + st.primal_tol)
                     & (r_unc >= blower - st.primal_tol)) \
        & jnp.all((state.sense & (ACTIVE | IMMUTABLE)) == 0)

    def body(c: _AVICarry):
        Hx = H @ c.x
        xtemp = Hx + f - Hs_rho @ c.x
        v = ldpd.Rinv.T @ xtemp
        Mv = ldpd.M @ v
        s = c.state._replace(
            dupper=bupper * ldpd.scaling + Mv,
            dlower=blower * ldpd.scaling + Mv,
            status=jnp.asarray(EXIT_RUNNING, jnp.int32),
            iterations=jnp.zeros((), jnp.int32),
            tried_repair=jnp.zeros((), jnp.int32),
            cycle_counter=jnp.zeros((), jnp.int32),
            best_fval=jnp.asarray(-1.0, dtype))
        s = ldp_mod.ldp_solve(s, st, reset=False, deadline=deadline)
        y_inner = ldpd.Rinv @ (s.u - v)
        tot = c.tot_iter + s.iterations
        inner_failed = s.status < 0

        # Newton-step progress bookkeeping (avi.c:44-61)
        at_limit = c.counter == c.terminate_limit

        def check_newton(c):
            res2 = jnp.sum((c.x - y_inner) ** 2)
            worse = res2 > c.min_newton_res
            return c._replace(
                x=jnp.where(worse, c.xold, c.x),
                terminate_limit=jnp.where(
                    worse, jnp.minimum(c.terminate_limit + 5, 30),
                    c.terminate_limit),
                min_newton_res=jnp.where(worse, c.min_newton_res, res2),
                y=jnp.where(worse, c.y, y_inner))

        c = lax.cond(at_limit, check_newton,
                     lambda c: c._replace(y=y_inner), c)

        # Stable active set -> try the exact KKT point (avi.c:65-80)
        stable = s.iterations == 1
        counter = jnp.where(stable, c.counter + 1, 0)
        do_kkt = stable & (counter == c.terminate_limit)

        def kkt(c):
            x_kkt, lam = _kkt_solve(s, Aall, H_lu, f, bupper, blower, st)
            opt = _check_optimal(s, x_kkt, lam, Aall, bupper, blower, st)
            return c._replace(
                xold=c.x, x=x_kkt, lam=lam,
                status=jnp.where(opt, EXIT_OPTIMAL,
                                 c.status).astype(jnp.int32))

        def dr_update(c):
            # x <- (H+rho I)^{-1}(rho y + H x + 0.5 Hsym (y - x))  avi.c:84-96
            xtemp2 = rho * c.y + Hx + 0.5 * (Hsym @ (c.y - c.x))
            return c._replace(x=jax.scipy.linalg.lu_solve(H_rho_lu, xtemp2))

        c = lax.cond(do_kkt, kkt, dr_update, c._replace(counter=counter))

        k = c.outer_k + 1
        status = jnp.where(
            inner_failed, s.status,
            jnp.where((c.status == EXIT_RUNNING) & (k >= st.iter_limit),
                      EXIT_ITERLIMIT, c.status))
        if deadline is not None:
            # Outer-loop wall-clock bound: in the stable phase the inner
            # solver does 1 iteration per outer pass and never reaches its
            # own every-32-iterations check, so a stuck DR loop must be
            # cut here (reference checks time in daqp_ldp only because its
            # AVI outer loop shares the same iteration counter).
            from .utils.timers import now_callback
            from .types import EXIT_TIMELIMIT
            t = now_callback()
            status = jnp.where((status == EXIT_RUNNING) & (t > deadline),
                               EXIT_TIMELIMIT, status)
        return c._replace(state=s, tot_iter=tot, outer_k=k,
                          status=status.astype(jnp.int32))

    init_status = jnp.where(
        ldpd.error < 0, ldpd.error,
        jnp.where(act_flag < 0, act_flag,
                  jnp.where(unc_ok, EXIT_OPTIMAL,
                            EXIT_RUNNING))).astype(jnp.int32)
    xinit = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    c0 = _AVICarry(
        state=state, x=xinit, y=xinit,
        xold=jnp.zeros((n,), dtype), lam=jnp.zeros((K,), dtype),
        min_newton_res=jnp.asarray(DAQP_INF, dtype),
        counter=jnp.zeros((), jnp.int32),
        terminate_limit=jnp.full((), 5, jnp.int32),
        tot_iter=jnp.zeros((), jnp.int32),
        outer_k=jnp.zeros((), jnp.int32),
        status=init_status)
    c = lax.while_loop(lambda c: c.status == EXIT_RUNNING, body, c0)

    x = jnp.where(unc_ok, x_unc, c.x)
    # KKT duals are already in the original constraint space; scatter to (m,)
    Kb = c.state.E.shape[0]
    mask = jnp.arange(Kb) < c.state.n_active
    idx = jnp.where(mask, c.state.WS, m)
    lam = jnp.zeros((m,), dtype).at[idx].set(
        jnp.where(mask, c.lam, 0), mode='drop')
    fval = f @ x
    return solve_mod.SolveOut(
        x=x, lam=lam, fval=fval, exitflag=c.status,
        iterations=jnp.maximum(c.tot_iter, 1),
        soft_slack=c.state.soft_slack, state=c.state)
