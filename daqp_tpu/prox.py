"""Proximal-point outer loop: semidefinite-H QPs and LPs.

Reference: ``src/daqp_prox.c``.  Three regimes (daqp_prox.c:21-189):
  (a) positive-definite H: the inner LDP equals the original QP, one solve;
  (b) singular H: semi-proximal (diagonal H — perturb only singular
      directions via ``prox_mask``) or full shift (dense H), iterated to a
      fixed point ||x - x_old||_inf < eta/eps with x1.5 over-relaxation when
      the active set froze;
  (c) LP (no H): adaptive-eps smoothing (x10 on stall, x0.9 otherwise, cap
      1e3), fixed-point tolerance eta*eps, a gradient ray-search step to the
      first blocking constraint when the iterate is not at a vertex
      (gradient_step, daqp_prox.c:201-271), dual rescale lam/eps at exit.

The inner workspace (working set + inverse Gram) is carried warm across
outer iterations, exactly as the reference carries L/D and the working set.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import (ACTIVE, IMMUTABLE, LOWER, Settings, DAQP_INF,
                    EXIT_ITERLIMIT, EXIT_OPTIMAL, EXIT_RUNNING,
                    EXIT_UNBOUNDED)

_DEFAULT_DUAL_TOL = 1e-12
_AUTO_ETA_CAP = 1e-6


def _auto_eta(st: Settings):
    """eta < 0 selects an automatic tolerance (daqp_prox.c:43-48)."""
    eta = jnp.asarray(st.eta_prox)
    auto = jnp.minimum(jnp.asarray(_AUTO_ETA_CAP),
                       jnp.where(st.dual_tol != _DEFAULT_DUAL_TOL,
                                 0.1 * st.dual_tol, _AUTO_ETA_CAP))
    return jnp.where(eta < 0, auto, eta)


def _auto_eta_static(st: Settings) -> float:
    """Python-float twin of ``_auto_eta`` for compile-time consumers
    (settings are static under jit; the fused LP kernel bakes eta in)."""
    if float(st.eta_prox) >= 0:
        return float(st.eta_prox)
    if float(st.dual_tol) != _DEFAULT_DUAL_TOL:
        return float(min(_AUTO_ETA_CAP, 0.1 * float(st.dual_tol)))
    return float(_AUTO_ETA_CAP)


class _Carry(NamedTuple):
    state: ldp_mod.LDPState
    v: jnp.ndarray
    x: jnp.ndarray
    xold: jnp.ndarray
    eps: jnp.ndarray
    center_relaxed: jnp.ndarray
    total_iter: jnp.ndarray
    status: jnp.ndarray     # outer status; EXIT_RUNNING while iterating
    best_diff: jnp.ndarray  # () smallest ||x - xold||_inf seen so far
    stall_ct: jnp.ndarray   # () int32 consecutive non-improving outers


def _outer_deadline(status, deadline):
    """Wall-clock bound for the proximal OUTER loop: a 1-iteration inner
    solve per outer pass never reaches the inner solver's
    every-32-iterations check, so the outer loop checks once per pass
    (compiled out when no time limit is set)."""
    if deadline is None:
        return status
    from .utils.timers import now_callback
    from .types import EXIT_TIMELIMIT
    t = now_callback()
    return jnp.where((status == EXIT_RUNNING) & (t > deadline),
                     EXIT_TIMELIMIT, status)


def _reset_for_resolve(state, dupper, dlower):
    return state._replace(
        dupper=dupper, dlower=dlower,
        status=jnp.asarray(EXIT_RUNNING, jnp.int32),
        iterations=jnp.zeros((), jnp.int32),
        tried_repair=jnp.zeros((), jnp.int32),
        cycle_counter=jnp.zeros((), jnp.int32),
        best_fval=jnp.asarray(-1.0, state.fval.dtype))


def solve_convex_or_prox(H, f, A, bupper, blower, sense, ms: int,
                         st: Settings, K=None, x0=None, deadline=None,
                         Rinv=None, soft_weights=None):
    """QP dispatch: single LDP solve for PD H, proximal outer loop otherwise
    (``daqp_solve`` n_prox dispatch, api.c:16-31 + daqp_prox.c)."""
    n = A.shape[1] if A.size else H.shape[0]
    if K is None:
        K = n + 1
    dtype = H.dtype
    from .types import SoftWeights, SOFT
    sw_struct = soft_weights if isinstance(soft_weights, SoftWeights) \
        else None
    ldpd = transform.build_ldp(
        H, f, A, bupper, blower, sense, ms, st, Rinv=Rinv,
        soft_weights=None if sw_struct is not None else soft_weights)
    bu = jnp.asarray(bupper, dtype)
    bl = jnp.asarray(blower, dtype)
    f_ = jnp.zeros((n,), dtype) if f is None else jnp.asarray(f, dtype)

    all_pd = ldpd.n_prox == 0
    eps = jnp.where(all_pd, 0.0, ldpd.eps_used).astype(dtype)
    eta = _auto_eta(st).astype(dtype)
    mask = ldpd.prox_mask

    sw_n = None
    if sw_struct is not None:
        # normalize the slack data into the row-scaled dual formulation
        # (utils.c:99-110) and zero it on hard rows
        soft_m = (ldpd.sense & SOFT) > 0
        sc = ldpd.scaling
        z = jnp.zeros_like(sc)
        sw_n = SoftWeights(
            d_ls=jnp.where(soft_m, jnp.asarray(sw_struct.d_ls, dtype) / sc,
                           z),
            d_us=jnp.where(soft_m, jnp.asarray(sw_struct.d_us, dtype) / sc,
                           z),
            rho_ls=jnp.where(soft_m,
                             jnp.asarray(sw_struct.rho_ls, dtype) * sc * sc,
                             z),
            rho_us=jnp.where(soft_m,
                             jnp.asarray(sw_struct.rho_us, dtype) * sc * sc,
                             z))

    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K, sw=sw_n)
    act_flag, state = ldp_mod.activate_constraints(state, st)

    # Unconstrained shortcut only for plain PD QPs (utils.c:533).
    unc_ok, x_unc = transform.check_unconstrained(
        ldpd._replace(sense=state.sense), st)
    unc_ok = unc_ok & all_pd

    def outer_body(c: _Carry):
        v = ldpd.Rinv.T @ (f_ - eps * jnp.where(mask, c.x, 0))
        Mv = ldpd.M @ v
        du = bu * ldpd.scaling + Mv
        dl = bl * ldpd.scaling + Mv
        s = _reset_for_resolve(c.state, du, dl)
        s = ldp_mod.ldp_solve(s, st, deadline=deadline)
        x = ldpd.Rinv @ (s.u - v)
        total = c.total_iter + s.iterations

        inner_failed = s.status < 0
        tol_stat = eta / jnp.maximum(eps, 1e-30)
        max_diff = jnp.max(jnp.abs(x - c.x))
        converged = max_diff < tol_stat

        # Arithmetic-floor stagnation: in low precision (f32 on TPU, where
        # the retry-doubling shift makes eps large and tol_stat = eta/eps
        # unreachably small) the outer iteration contracts geometrically to
        # the rounding floor of the inner solver and then oscillates there.
        # Exact-arithmetic proximal-point iterates contract monotonically,
        # so several consecutive optimal inner solves with no improvement
        # in ||x - xold||_inf certify the fixed point to within arithmetic
        # accuracy; doubtful lanes are caught by the f64 KKT backstop.
        improved = max_diff < 0.9 * c.best_diff
        best_next = jnp.minimum(max_diff, c.best_diff)
        stall_next = jnp.where(improved, 0, c.stall_ct + 1)
        stagnated = (~inner_failed) & (stall_next >= 8)
        converged = converged | stagnated

        # Over-relaxation when the active set froze (daqp_prox.c:146-154)
        relax = (~all_pd) & (s.iterations == 1) & (~converged)
        x_next = jnp.where(relax, c.x + 1.5 * (x - c.x), x)
        center_next = relax

        conv_confirmed = converged & (~c.center_relaxed)
        status = jnp.where(
            inner_failed, s.status,
            jnp.where(all_pd | (eps == 0), s.status,
                      jnp.where(conv_confirmed, EXIT_OPTIMAL, EXIT_RUNNING)))
        status = jnp.where((status == EXIT_RUNNING)
                           & (total >= st.iter_limit),
                           EXIT_ITERLIMIT, status)
        status = _outer_deadline(status, deadline)
        return _Carry(state=s, v=v, x=x_next, xold=c.x, eps=eps,
                      center_relaxed=center_next, total_iter=total,
                      status=status.astype(jnp.int32),
                      best_diff=best_next.astype(c.best_diff.dtype),
                      stall_ct=stall_next.astype(jnp.int32))

    def outer_cond(c: _Carry):
        return c.status == EXIT_RUNNING

    z = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    init_status = jnp.where(
        ldpd.error < 0, ldpd.error,
        jnp.where(act_flag < 0, act_flag,
                  jnp.where(unc_ok, EXIT_OPTIMAL, EXIT_RUNNING)))
    c0 = _Carry(state=state, v=ldpd.v, x=z, xold=z,
                eps=eps, center_relaxed=jnp.zeros((), bool),
                total_iter=jnp.zeros((), jnp.int32),
                status=init_status.astype(jnp.int32),
                best_diff=jnp.asarray(jnp.inf, dtype),
                stall_ct=jnp.zeros((), jnp.int32))
    c = lax.while_loop(outer_cond, outer_body, c0)

    x = jnp.where(unc_ok, x_unc, c.x)
    lam = solve_mod.extract_duals(c.state)
    # Reference fval convention: 0.5*(||u||^2 + soft_slack - ||v||^2)
    # (api.c:457-461 shifts work->fval, which includes the soft penalty,
    # auxiliary.c:79-86) == true objective + 0.5*soft_slack.
    fval = 0.5 * x @ (H @ x) + f_ @ x + 0.5 * c.state.soft_slack
    return solve_mod.SolveOut(
        x=x, lam=lam, fval=fval, exitflag=c.status,
        iterations=jnp.maximum(c.total_iter, 1).astype(jnp.int32),
        soft_slack=c.state.soft_slack, state=c.state)


# ---------------------------------------------------------------------------
# LP path
# ---------------------------------------------------------------------------
def _gradient_step(state, x, xold, bu, bl, st: Settings):
    """Ray search x + alpha (x - xold) to the first blocking constraint,
    which is activated (gradient_step, daqp_prox.c:201-271).

    Returns (found, state, x): found=False signals unboundedness.
    """
    M, scaling = state.M, state.scaling
    delta = x - xold
    ax = (M @ x) / scaling          # original-row values A_j x (LP: R = I)
    ds = (M @ delta) / scaling
    skip = (state.sense & (ACTIVE | IMMUTABLE)) > 0
    up_ok = (~skip) & (ds > 0) & (bu < DAQP_INF)
    lo_ok = (~skip) & (ds < 0) & (bl > -DAQP_INF)
    alpha_up = jnp.where(up_ok, (bu - ax) / jnp.where(up_ok, ds, 1.0),
                         DAQP_INF)
    alpha_lo = jnp.where(lo_ok, (bl - ax) / jnp.where(lo_ok, ds, 1.0),
                         DAQP_INF)
    cand = jnp.minimum(alpha_up, alpha_lo)
    j = jnp.argmin(cand).astype(jnp.int32)
    found = cand[j] < DAQP_INF
    is_lower = alpha_lo[j] < alpha_up[j]

    def do(args):
        s, x = args
        alpha = cand[j]
        x = x + alpha * delta
        sj = jnp.where(is_lower, s.sense[j] | LOWER, s.sense[j] & ~LOWER)
        s = s._replace(sense=s.sense.at[j].set(sj))
        s = ldp_mod.add_constraint(s, j, jnp.where(is_lower, -1.0, 1.0), st)
        return s, x

    state, x = lax.cond(found, do, lambda a: a, (state, x))
    return found, state, x


def linprog_core(f, A, bupper, blower, sense, ms: int, st: Settings, K=None,
                 x0=None, deadline=None):
    """LP via adaptive proximal smoothing (daqp_prox.c LP regime; LP mode is
    selected in the reference by n_prox = n at api.c:175-177)."""
    A = jnp.atleast_2d(A)
    n = A.shape[1]
    dtype = A.dtype
    if K is None:
        K = n + 1
    ldpd = transform.build_ldp(None, None, A, bupper, blower, sense, ms, st)
    bu = jnp.asarray(bupper, dtype)
    bl = jnp.asarray(blower, dtype)
    f_ = jnp.asarray(f, dtype)
    eta = _auto_eta(st).astype(dtype)

    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    act_flag, state = ldp_mod.activate_constraints(state, st)

    def outer_body(c: _Carry):
        # Adaptive eps (daqp_prox.c:55-63): first iteration keeps eps = 1.
        # The x10 growth exists to escape slow INTERIOR progress; a
        # stalled solve AT a vertex (n_active == n) can only fail the
        # eta*eps gate through the f32 arithmetic floor (exact arithmetic
        # gives diff = 0 there), and since that floor scales linearly
        # with eps, growing eps at a stalled vertex just amplifies it
        # until the inner solver exits spuriously infeasible (observed on
        # a v5e at eps ~ 8e2).  Shrink instead and let the stagnation
        # acceptance below certify the fixed point.
        stalled = c.state.iterations == 1
        at_vertex_prev = c.state.n_active == n
        grow = stalled & ~at_vertex_prev
        eps = jnp.where(c.total_iter > 0,
                        jnp.minimum(c.eps * jnp.where(grow, 10.0, 0.9),
                                    1e3),
                        c.eps)
        v = f_ * eps - c.x
        Mv = ldpd.M @ v
        du = bu * ldpd.scaling + Mv
        dl = bl * ldpd.scaling + Mv
        s = _reset_for_resolve(c.state, du, dl)
        s = ldp_mod.ldp_solve(s, st, deadline=deadline)
        x = s.u - v                      # R = I for LPs (daqp.c:115-119)
        total = c.total_iter + s.iterations

        inner_failed = s.status < 0
        tol_stat = eta * eps
        max_diff = jnp.max(jnp.abs(x - c.x))
        converged = max_diff < tol_stat

        # Arithmetic-floor stagnation (LP analogue of the QP acceptance
        # above): in f32 — on TPU in particular — the inner solve's
        # fixed-point residual floors at ~kappa * eps_f32 * ||d||, which
        # scales LINEARLY with eps, while the stall rule multiplies eps
        # by 10 (daqp_prox.c:55-63).  Exact arithmetic would give diff = 0
        # at a stalled vertex; in f32 the eta*eps gate is never met, eps
        # climbs to its cap, the absolute errors grow with it, and the
        # inner solver eventually exits spuriously infeasible (observed on
        # the reference benchmark grid on a v5e: err 25 after eps reached
        # 8.1e2).  The eps-NORMALIZED residual diff/eps is eps-invariant
        # at the floor, so consecutive stalled vertex solves with no
        # improvement in it certify the fixed point to arithmetic
        # accuracy; the three-stage vertex cleanup below then recovers the
        # exact vertex (measured 4e-8), and doubtful lanes are caught by
        # the f64 KKT backstop.
        ndiff = max_diff / eps
        improved = ndiff < 0.9 * c.best_diff
        best_next = jnp.minimum(ndiff, c.best_diff)
        at_vertex_stall = (s.iterations == 1) & (s.n_active == n)
        stall_next = jnp.where(improved | ~at_vertex_stall,
                               0, c.stall_ct + 1)
        stagnated = (~inner_failed) & (stall_next >= 3)
        converged = converged | stagnated

        # Not at a vertex after a 1-iteration solve: take a gradient step
        need_grad = (s.iterations == 1) & (s.n_active != n) & (~converged)

        def grad(args):
            s, x = args
            found, s, x = _gradient_step(s, x, c.x, bu, bl, st)
            return s, x, jnp.where(found, EXIT_RUNNING,
                                   EXIT_UNBOUNDED).astype(jnp.int32)

        def no_grad(args):
            s, x = args
            return s, x, jnp.asarray(EXIT_RUNNING, jnp.int32)

        s, x, grad_status = lax.cond(need_grad, grad, no_grad, (s, x))

        status = jnp.where(
            inner_failed, s.status,
            jnp.where(converged, EXIT_OPTIMAL, grad_status))
        status = jnp.where((status == EXIT_RUNNING)
                           & (total >= st.iter_limit),
                           EXIT_ITERLIMIT, status)
        status = _outer_deadline(status, deadline)
        return _Carry(state=s, v=v, x=x, xold=c.x, eps=eps,
                      center_relaxed=jnp.zeros((), bool), total_iter=total,
                      status=status.astype(jnp.int32),
                      best_diff=best_next.astype(c.best_diff.dtype),
                      stall_ct=stall_next.astype(jnp.int32))

    z = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    init_status = jnp.where(ldpd.error < 0, ldpd.error,
                            jnp.where(act_flag < 0, act_flag, EXIT_RUNNING))
    c0 = _Carry(state=state, v=ldpd.v, x=z, xold=z,
                eps=jnp.ones((), dtype),
                center_relaxed=jnp.zeros((), bool),
                total_iter=jnp.zeros((), jnp.int32),
                status=init_status.astype(jnp.int32),
                best_diff=jnp.asarray(jnp.inf, dtype),
                stall_ct=jnp.zeros((), jnp.int32))
    c = lax.while_loop(lambda c: c.status == EXIT_RUNNING, outer_body, c0)

    # Vertex polish: the LP optimum is a vertex of the active system
    # M_W x = b_W * scaling; the proximal loop stops within eta*eps of it
    # (observed 5e-3 at n=500), so solve the active system exactly through
    # the inverse Gram, with one refinement pass for drift.
    # LP accuracy cleanup (three stages, each a no-op off the happy path).
    # The adaptive loop may accept its fixed point while eps (hence the
    # tolerance eta*eps) is large, and near-dual-degenerate faces leave
    # the iterate off-vertex with a tiny objective gap (observed 8e-3
    # primal error at n=200 against the 1e-4 reference gate):
    #  1) one warm re-solve at small eps — the prox map x <- proj(x-eps f)
    #     restores a consistent workspace and a feasible near-optimal x;
    #  2) crossover to a vertex: projected steepest descent within the
    #     active face to the nearest blocking constraint (activated),
    #     until n constraints are active — this pins the tiny-dual
    #     constraints degeneracy leaves inactive (measured: 6 steps take
    #     the degenerate case from 7.8e-3 to 4e-8);
    #  3) exact solve of the vertex system through the inverse Gram.
    fscale = (1.0 + jnp.linalg.norm(c.x)) / (1.0 + jnp.linalg.norm(f_))

    def tighten(eps_f, carry):
        s, x = carry
        v2 = f_ * eps_f - x
        Mv2 = ldpd.M @ v2
        s2 = _reset_for_resolve(s, bu * ldpd.scaling + Mv2,
                                bl * ldpd.scaling + Mv2)
        s2 = ldp_mod.ldp_solve(s2, st)
        x2 = s2.u - v2
        ok = s2.status > 0
        return (lax.cond(ok, lambda _: s2, lambda _: s, None),
                jnp.where(ok, x2, x))

    s, x_c = lax.cond(c.status == EXIT_OPTIMAL,
                      lambda cc: tighten(1e-3 * fscale, cc),
                      lambda cc: cc, (c.state, c.x))

    dtol_x = 1e-9 * (1.0 + jnp.linalg.norm(f_))

    def crossover(carry):
        # one simplex-like move: off-vertex -> projected steepest descent
        # to the nearest blocker (activated); at a vertex -> dual-sign
        # check, dropping the most wrong-signed constraint (the greedy
        # descent path can land on a suboptimal vertex adjacent to the
        # optimum; the exchange resumes the descent)
        i, _, s, x = carry
        Kb = s.E.shape[0]
        mask = jnp.arange(Kb) < s.n_active
        nu = -(s.E @ jnp.where(mask, s.Mw @ f_, 0))
        ws_i = jnp.clip(s.WS, 0, s.M.shape[0] - 1)
        sw_i = s.sense[ws_i]
        is_lo = (sw_i & LOWER) > 0
        immut_i = (sw_i & IMMUTABLE) > 0
        sgn_tol = 1e-8 * (1.0 + jnp.max(jnp.abs(
            jnp.where(mask, nu, 0))))
        wrong = mask & ~immut_i & jnp.where(is_lo, nu > sgn_tol,
                                            nu < -sgn_tol)
        at_vertex = s.n_active >= n
        coef = jnp.where(mask, nu, 0)
        d = -(f_ + s.Mw.T @ coef)       # projected -f within the face
        go_desc = (~at_vertex) & (jnp.linalg.norm(d) > dtol_x)
        go_exch = at_vertex & jnp.any(wrong)

        def descend(carry):
            s, x = carry
            found, s2, x2 = _gradient_step(s, x + d, x, bu, bl, st)
            return lax.cond(found, lambda _: (s2, x2),
                            lambda _: (s, x), None)

        def exchange(carry):
            s, x = carry
            score = jnp.where(wrong, jnp.abs(nu), -1.0)
            rm = jnp.argmax(score).astype(jnp.int32)
            return ldp_mod.remove_constraint(s, rm, st), x

        s, x = lax.cond(
            go_exch, exchange,
            lambda cc: lax.cond(go_desc, descend, lambda q: q, cc), (s, x))
        # early exit: a trivial LP hits a vertex with clean dual signs in
        # 0-2 moves — the 3n bound is only the degenerate worst case, and
        # paying it unconditionally costs 1,500 E-GEMV iterations per
        # solve at n=500
        return i + 1, ~(go_desc | go_exch), s, x

    _, _, s, x_c = lax.while_loop(
        lambda cc: (cc[0] < 3 * n) & ~cc[1], crossover,
        (jnp.zeros((), jnp.int32), c.status != EXIT_OPTIMAL, s, x_c))

    # exact vertex solve via E, one refinement pass against drift
    Kb = s.E.shape[0]
    mask = jnp.arange(Kb) < s.n_active
    ws = jnp.clip(s.WS, 0, s.M.shape[0] - 1)
    sw = s.sense[ws]
    bW = jnp.where((sw & LOWER) > 0, bl[ws], bu[ws]) * ldpd.scaling[ws]
    bW = jnp.where(mask, bW, 0)
    x_v = x_c
    for _ in range(2):
        r = jnp.where(mask, s.Mw @ x_v - bW, 0)
        x_v = x_v - s.Mw.T @ (s.E @ r)
    at_vertex = s.n_active == n
    x_fin = jnp.where((c.status == EXIT_OPTIMAL) & at_vertex, x_v,
                      jnp.where(c.status == EXIT_OPTIMAL, x_c, c.x))
    c = c._replace(x=x_fin, state=s)

    # LP duals from the FINAL working set: the crossover / vertex stages
    # change the active set without recomputing lam_star (whose values are
    # also eps-scaled inner-projection duals), so stale extraction gave
    # duals violating stationarity — caught by the LP differential oracle.
    # At the optimum f + Mw' nu = 0 on the active block defines
    # nu = -E (Mw f) directly; scatter with the row scaling exactly like
    # extract_duals.  Non-optimal exits keep the eps-rescaled inner duals
    # (daqp_prox.c:171-173).
    mC = c.state.M.shape[0]
    KC = c.state.E.shape[0]
    maskC = jnp.arange(KC) < c.state.n_active
    nu = -(c.state.E @ jnp.where(maskC, c.state.Mw @ f_, 0))
    wsC = jnp.clip(c.state.WS, 0, mC - 1)
    valsC = jnp.where(maskC, nu, 0) * c.state.scaling[wsC]
    idxC = jnp.where(maskC, c.state.WS, mC)
    lam_vertex = jnp.zeros((mC,), dtype).at[idxC].set(valsC, mode='drop')
    lam_prox = solve_mod.extract_duals(c.state) / jnp.maximum(c.eps, 1e-30)
    lam = jnp.where(c.status == EXIT_OPTIMAL, lam_vertex, lam_prox)
    fval = f_ @ c.x
    return solve_mod.SolveOut(
        x=c.x, lam=lam, fval=fval, exitflag=c.status,
        iterations=jnp.maximum(c.total_iter, 1).astype(jnp.int32),
        soft_slack=c.state.soft_slack, state=c.state)
