"""QP -> LDP transform: Cholesky with proximal regularization, constraint
matrix construction, normalization, bounds checks, unconstrained shortcut.

Reference semantics: ``src/utils.c:14-598``.  TPU-native differences:

  * the factorization uses XLA's batched ``jnp.linalg.cholesky`` (MXU) rather
    than a hand-rolled packed loop; ``M = A R^{-1}`` is a triangular solve +
    GEMM.
  * simple-bound rows — implicit rows of R^{-1} in the reference
    (``auxiliary.c:56-62``) — are *materialized* into a full (m, n)
    constraint matrix, making the pricing sweep a single GEMV and keeping
    every working-set shape fixed.  The memory cost is ms*n floats; the
    irregular indexing it removes is what would keep the inner loop off the
    MXU.
  * the diagonal-H fast path (``utils.c:179-207``) and the dense-H
    regularization-with-retry path (``utils.c:253-283``) are both traced;
    the choice is a runtime ``lax.cond`` on the off-diagonal mass, so one
    compiled solver covers both.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .types import (ACTIVE, IMMUTABLE, SOFT, Settings, DAQP_INF,
                    EXIT_INFEASIBLE, EXIT_NONCONVEX)

# TPU's default matmul precision is bf16; the transform feeds an active-set
# solver whose tolerances assume true f32, so every contraction here pins
# Precision.HIGHEST explicitly (observed 6e-3 errors in M = A R^{-1} and
# 3e-2 in d at default precision on v5e).
_HI = lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class LDPData(NamedTuple):
    """Everything produced by the QP->LDP transform."""
    M: jnp.ndarray         # (m, n) normalized constraint rows (u-space)
    dupper: jnp.ndarray    # (m,)
    dlower: jnp.ndarray    # (m,)
    scaling: jnp.ndarray   # (m,)
    sense: jnp.ndarray     # (m,) int32 (equalities auto-marked)
    Rinv: jnp.ndarray      # (n, n) upper-triangular inverse Cholesky factor
    v: jnp.ndarray         # (n,)  v = R^{-T} f
    prox_mask: jnp.ndarray  # (n,) bool — directions needing proximal shift
    n_prox: jnp.ndarray    # () int32
    eps_used: jnp.ndarray  # () effective proximal regularization
    error: jnp.ndarray     # () int32: 0 ok, else EXIT_* code


def factorize_hessian(H: jnp.ndarray, st: Settings):
    """Compute Rinv (upper) with semi-proximal regularization.

    Mirrors ``daqp_update_Rinv`` (utils.c:137-297):
      * diagonal H: perturb only (near-)singular directions by eps
        (semi-proximal), recorded in ``prox_mask``.
      * dense H: plain Cholesky; on failure or a bad pivot ratio, restart
        with H + eps*I, doubling eps up to 16 times (full proximal shift).

    Returns (Rinv, prox_mask, n_prox, eps_used, error).
    """
    n = H.shape[0]
    dtype = H.dtype
    zero_tol = jnp.asarray(st.zero_tol, dtype)
    diag = jnp.diagonal(H)
    hessian_scale = jnp.max(jnp.abs(diag))
    factor_tol = jnp.sqrt(zero_tol) * hessian_scale
    # eps floor scales with the Hessian (utils.c:6-12)
    eps0 = jnp.maximum(jnp.asarray(st.eps_prox, dtype),
                       jnp.sqrt(zero_tol) * hessian_scale)
    eps0 = jnp.where(st.eps_prox > 0, eps0, jnp.asarray(st.eps_prox, dtype))

    offdiag = H - jnp.diag(diag)
    is_diag = jnp.max(jnp.abs(offdiag)) <= zero_tol

    def diag_path(_):
        mask = diag <= factor_tol
        d_reg = jnp.where(mask, diag + eps0, diag)
        nonconvex = jnp.any(d_reg <= zero_tol)
        rinv_d = 1.0 / jnp.sqrt(jnp.maximum(d_reg, zero_tol))
        Rinv = jnp.diag(rinv_d)
        err = jnp.where(nonconvex, EXIT_NONCONVEX, 0).astype(jnp.int32)
        return (Rinv, mask, jnp.sum(mask).astype(jnp.int32),
                jnp.where(jnp.any(mask), eps0, jnp.asarray(0, dtype)), err)

    def dense_path(_):
        Hs = 0.5 * (H + H.T)

        def attempt(eps):
            L = jnp.linalg.cholesky(Hs + eps * jnp.eye(n, dtype=dtype))
            piv = jnp.diagonal(L) ** 2
            ok = (~jnp.any(jnp.isnan(L))) & (
                jnp.min(piv) > jnp.sqrt(zero_tol) * jnp.max(piv))
            return L, ok

        L0, ok0 = attempt(jnp.asarray(0, dtype))

        def regularized(_):
            def cond(carry):
                eps, tries, _, ok = carry
                return (~ok) & (tries < 16)

            def body(carry):
                eps, tries, _, _ = carry
                L, ok = attempt(eps)
                return eps * 2.0, tries + 1, L, ok

            Lr, okr = attempt(eps0)
            eps_f, _, Lf, okf = lax.while_loop(
                cond, body, (eps0 * 2.0, jnp.ones((), jnp.int32), Lr, okr))
            eps_used = jnp.where(okr, eps0, eps_f / 2.0)
            return Lf, okf, eps_used

        def plain(_):
            # eps0 * 0 (not a literal 0): under shard_map both cond
            # branches must agree on varying-manual-axes typing
            return L0, ok0, eps0 * 0.0

        reg_needed = ~ok0
        L, ok, eps_used = lax.cond(reg_needed, regularized, plain, None)
        err = jnp.where(ok, 0, EXIT_NONCONVEX).astype(jnp.int32)
        # R = L.T (upper); Rinv = R^{-1} via triangular solve against I.
        L_safe = jnp.where(jnp.isnan(L) | (jnp.abs(L) == 0),
                           jnp.eye(n, dtype=dtype), L)
        Rinv = jax.scipy.linalg.solve_triangular(
            L_safe.T, jnp.eye(n, dtype=dtype), lower=False)
        mask = jnp.broadcast_to(reg_needed, (n,))
        n_prox = jnp.where(reg_needed, n, 0).astype(jnp.int32)
        return Rinv, mask, n_prox, eps_used, err

    return lax.cond(is_diag, diag_path, dense_path, None)


def build_ldp(H: Optional[jnp.ndarray], f: Optional[jnp.ndarray],
              A: jnp.ndarray, bupper: jnp.ndarray, blower: jnp.ndarray,
              sense: Optional[jnp.ndarray], ms: int, st: Settings,
              Rinv: Optional[jnp.ndarray] = None,
              soft_weights=None) -> LDPData:
    """Full masked-update pipeline for a fresh setup
    (``daqp_update_ldp`` with all masks, utils.c:14-135).

    ``H is None`` selects LP mode (R = I; the proximal driver supplies v).
    ``Rinv`` may be passed directly for the pre-factored path
    (problem_type==2, utils.c:167-176).
    """
    A = jnp.atleast_2d(A)
    n = A.shape[1] if A.size else (H.shape[0] if H is not None else ms)
    mg = A.shape[0]
    m = ms + mg
    dtype = A.dtype if A.size else (H.dtype if H is not None else
                                    jnp.asarray(bupper).dtype)
    sense = (jnp.zeros((m,), jnp.int32) if sense is None
             else jnp.asarray(sense, jnp.int32))
    err = jnp.zeros((), jnp.int32)

    if H is None and Rinv is None:
        Rinv_ = jnp.eye(n, dtype=dtype)
        prox_mask = jnp.ones((n,), bool)
        n_prox = jnp.asarray(n, jnp.int32)
        eps_used = jnp.asarray(0, dtype)
    elif Rinv is not None:
        Rinv_ = jnp.asarray(Rinv, dtype)
        prox_mask = jnp.zeros((n,), bool)
        n_prox = jnp.zeros((), jnp.int32)
        eps_used = jnp.asarray(0, dtype)
    else:
        Rinv_, prox_mask, n_prox, eps_used, err = factorize_hessian(
            jnp.asarray(H, dtype), st)

    # v = R^{-T} f = Rinv' f
    if f is None:
        v = jnp.zeros((n,), dtype)
    else:
        v = _mm(Rinv_.T, jnp.asarray(f, dtype))

    # Materialized full constraint matrix: simple-bound rows are rows of Rinv
    if ms > 0:
        M = jnp.concatenate([Rinv_[:ms, :], _mm(A, Rinv_)], axis=0)
    else:
        M = _mm(A, Rinv_)

    # Bounds checks (daqp_check_bounds, utils.c:457-478)
    bu = jnp.asarray(bupper, dtype)
    bl = jnp.asarray(blower, dtype)
    mutable = (sense & IMMUTABLE) == 0
    diff = bu - bl
    trivially_infeasible = jnp.any(mutable & (diff < -st.primal_tol))
    is_eq = mutable & (diff < st.zero_tol) & ((sense & SOFT) == 0)
    sense = jnp.where(is_eq, sense | (ACTIVE | IMMUTABLE), sense)

    # Row normalization (utils.c:480-524); zero rows ignored or infeasible
    norms_sq = jnp.sum(M * M, axis=1)
    zero_row = norms_sq < st.zero_tol
    scaling = jnp.where(zero_row, 1.0,
                        1.0 / jnp.sqrt(jnp.maximum(norms_sq, st.zero_tol)))
    M = M * jnp.where(zero_row, 0.0, scaling)[:, None]
    zero_row_infeasible = jnp.any(
        zero_row & ((bu < -st.zero_tol) | (bl > st.zero_tol))
        & ((sense & IMMUTABLE) == 0) & ((sense & SOFT) == 0))
    sense = jnp.where(zero_row, (sense | IMMUTABLE) & ~ACTIVE, sense)

    if soft_weights is not None:
        # Per-constraint soft penalties (the reference SOFT_WEIGHTS
        # rho_ls/rho_us arrays, types.h:168-180) via an exact reduction:
        # a soft constraint (M_i, d_i) under penalty rho_i is equivalent
        # to the row scaled by c_i = sqrt(rho_soft / rho_i) under the
        # uniform rho_soft the solver applies — the existing scaling
        # bookkeeping rescales duals and tolerances, so nothing else in
        # the solver changes.  (Slack bounds d_ls/d_us not supported.)
        w = jnp.asarray(soft_weights, dtype)
        c = jnp.sqrt(jnp.asarray(st.rho_soft, dtype)
                     / jnp.maximum(w, 1e-30))
        c = jnp.where((sense & SOFT) > 0, c, 1.0)
        M = M * c[:, None]
        scaling = scaling * c

    # d = b * scaling + M v   (daqp_update_d, utils.c:410-455)
    Mv = _mm(M, v)
    dupper = bu * scaling + Mv
    dlower = bl * scaling + Mv

    err = jnp.where(err != 0, err,
                    jnp.where(trivially_infeasible | zero_row_infeasible,
                              EXIT_INFEASIBLE, 0)).astype(jnp.int32)
    return LDPData(M=M, dupper=dupper, dlower=dlower, scaling=scaling,
                   sense=sense, Rinv=Rinv_, v=v, prox_mask=prox_mask,
                   n_prox=n_prox, eps_used=eps_used, error=err)


def update_vd(ldp: LDPData, f: jnp.ndarray, bupper: jnp.ndarray,
              blower: jnp.ndarray) -> LDPData:
    """Cheap re-solve update: recompute v and d only, keeping M/Rinv/scaling
    (the MPC contract: mask DAQP_UPDATE_v | DAQP_UPDATE_d,
    ``docs/docs/c.md:60-73``)."""
    v = _mm(ldp.Rinv.T, f) if f is not None else jnp.zeros_like(ldp.v)
    Mv = _mm(ldp.M, v)
    dupper = bupper * ldp.scaling + Mv
    dlower = blower * ldp.scaling + Mv
    return ldp._replace(v=v, dupper=dupper, dlower=dlower)


def update_sense(ldp: LDPData, sense, bupper, blower,
                 st: Settings) -> LDPData:
    """Sense-only update (mask DAQP_UPDATE_sense, utils.c:31-39): the new
    user sense replaces the old one with the transform's derived bits
    re-applied — auto-equality (bu == bl, utils.c:457-478) and zero-row
    IMMUTABLE (recovered from the normalized M rows: every nonzero row
    has unit norm, a zero row stayed zero) — with NO refactorization and
    no M/v/d recomputation.  The caller resets the working set (the
    reference's reset + daqp_activate_constraints, utils.c:119-133)."""
    dtype = ldp.M.dtype
    sense = jnp.asarray(sense, jnp.int32)
    bu = jnp.asarray(bupper, dtype)
    bl = jnp.asarray(blower, dtype)
    mutable = (sense & IMMUTABLE) == 0
    diff = bu - bl
    trivially_infeasible = jnp.any(mutable & (diff < -st.primal_tol))
    is_eq = mutable & (diff < st.zero_tol) & ((sense & SOFT) == 0)
    sense = jnp.where(is_eq, sense | (ACTIVE | IMMUTABLE), sense)
    zero_row = jnp.sum(ldp.M * ldp.M, axis=1) < 0.5
    zero_row_infeasible = jnp.any(
        zero_row & ((bu < -st.zero_tol) | (bl > st.zero_tol))
        & ((sense & IMMUTABLE) == 0) & ((sense & SOFT) == 0))
    sense = jnp.where(zero_row, (sense | IMMUTABLE) & ~ACTIVE, sense)
    # re-derive the bound-infeasibility error under the NEW sense (a
    # previously hard violated row may now be SOFT/IMMUTABLE); only a
    # factorization error is sticky (sense cannot fix a nonconvex H)
    err = jnp.where(ldp.error == EXIT_NONCONVEX, ldp.error,
                    jnp.where(trivially_infeasible | zero_row_infeasible,
                              EXIT_INFEASIBLE, 0)).astype(jnp.int32)
    return ldp._replace(sense=sense.astype(jnp.int32), error=err)


def update_d_from_v(ldp: LDPData, v: jnp.ndarray, bupper, blower) -> LDPData:
    """Set a caller-provided v (proximal outer loops) and refresh d."""
    Mv = _mm(ldp.M, v)
    return ldp._replace(v=v, dupper=bupper * ldp.scaling + Mv,
                        dlower=blower * ldp.scaling + Mv)


def get_proximal_regularization(ldp: LDPData, H=None, st: Settings = None):
    """Effective proximal regularization of a set-up workspace — the
    analogue of ``daqp_get_proximal_regularization`` (utils.c:299-343).

    The pipeline tracks the applied shift exactly (``ldp.eps_used``), so
    the fast path just returns it (0 for a PD Hessian).  When ``H`` is
    given, the shift is instead RECOVERED from the factor the way the
    reference does for dense singular Hessians (utils.c:323-343):
    pre-normalization ``Rinv[0,0] = 1/sqrt(H[0,0] + eps)``, the
    simple-bound normalization retains the row scale in ``scaling[0]``,
    and the retry level is the base*2^k value nearest the recovered
    pivot — useful for factor-only workspaces (AOT export / codegen)
    where the tracked value did not persist.
    """
    if H is None:
        return ldp.eps_used
    H = jnp.asarray(H)
    rinv00 = ldp.Rinv[0, 0]
    # undo the simple-bound row normalization if row 0 is a bound row
    # (utils.c:330-331); general rows leave Rinv unnormalized
    recovered = 1.0 / (rinv00 * rinv00) - H[0, 0]
    zero_tol = jnp.asarray(st.zero_tol if st is not None else 1e-11,
                           H.dtype)
    scale = jnp.max(jnp.abs(jnp.diagonal(H)))
    eps0 = jnp.maximum(jnp.asarray(st.eps_prox if st is not None
                                   else 1e-6, H.dtype),
                       jnp.sqrt(zero_tol) * scale)

    def body(eps):
        return eps * 2.0

    eps = lax.while_loop(lambda e: 1.5 * e < recovered, body, eps0)
    return jnp.where(recovered < 0.5 * eps0, jnp.zeros((), H.dtype), eps)


def check_unconstrained(ldp: LDPData, st: Settings):
    """Feasibility of the unconstrained optimum x = -Rinv v
    (``daqp_check_unconstrained``, utils.c:529-598).

    Returns (feasible, x_unc).  Callers must also gate on the absence of
    active/immutable constraints and special modes.
    """
    x = -_mm(ldp.Rinv, ldp.v)
    # The unconstrained LDP optimum is u = 0 (so x = -Rinv v = -H^{-1} f);
    # feasibility reduces to dlower <= 0 <= dupper on normalized rows.
    up_ok = ldp.dupper >= -st.primal_tol * ldp.scaling
    lo_ok = ldp.dlower <= st.primal_tol * ldp.scaling
    ignored = (ldp.sense & IMMUTABLE) > 0
    feasible = jnp.all(up_ok | ignored) & jnp.all(lo_ok | ignored)
    no_active = jnp.all((ldp.sense & (ACTIVE | IMMUTABLE)) == 0)
    return feasible & no_active, x


def ldp_to_qp_solution(ldp: LDPData, u: jnp.ndarray):
    """x = Rinv (u - v)  (``ldp2qp_solution``, daqp.c:111-139)."""
    return _mm(ldp.Rinv, u - ldp.v)
