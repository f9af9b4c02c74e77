"""Core dual active-set LDP solver as a single fixed-shape ``lax.while_loop``.

Solves   min ||u||^2  s.t.  dlower <= M u <= dupper   (the least-distance
problem every QP is reduced to, reference ``src/daqp.c:6-108``) by the dual
active-set method of Arnstrom/Bemporad/Axehill (IEEE TAC 2022).

TPU-first redesign
------------------
The reference maintains a packed LDL' factorization of the working-set Gram
matrix G = M_W M_W' with rank-one updates (``src/factorization.c``) and
sequential triangular substitutions (``src/auxiliary.c:313-353``).  Those are
scalar recurrences — hostile to vmap and to the MXU.  This implementation
instead maintains the *explicit inverse* E = G^{-1} on a fixed (K, K) buffer:

  * constrained stationary point: lam* = -E @ d_W          (one masked GEMV)
  * constraint add (bordered inverse): with g = M_W m_i, a = E g and Schur
    s = m_i'm_i + rho_soft - g'a  (s equals the LDL pivot the reference
    computes), the update is a single rank-one outer product
    E += w w'/s with w = [a; -1].
  * constraint remove at position r: E -= e e'/E_rr with e = E[:, r]
    (which zeroes row/col r exactly), then compaction.
  * pricing sweep: mu = M @ u                              (the hot GEMV)

Every iteration primitive is a matvec or outer product over fixed-shape
buffers, so a ``vmap`` over thousands of QP instances turns them into batched
GEMMs that ride the MXU; there is no per-iteration retracing and no
data-dependent shape anywhere.

Because an explicit inverse is permutation-covariant, the reference's
LDL-ordering machinery (``daqp_pivot_last``, ``reuse_ind`` forward-
substitution caching) has no analogue here and is intentionally absent; its
job is done by (a) the division-safety of the deletion update — E_rr >=
1/G_rr ~ 1 for unit-norm rows — and (b) the same repair/refinement ladder the
reference uses (refactorization on ill-conditioning or cycling, one step of
iterative refinement before declaring optimality, ``src/daqp.c:28-85``,
``src/auxiliary.c:497-588``).

Singularity semantics follow the reference exactly: an add whose Schur
complement falls below ``sing_tol`` (or that would exceed n + n_soft active
constraints) enters the working set *flagged singular* as the last entry
(``factorization.c:92-97``); the null-space direction [-E g; 1] (sign-flipped
for lower bounds, ``auxiliary.c:356-375``) drives min-ratio removals until
the blocking constraint leaves, or infeasibility is declared
(``daqp.c:88-94``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .types import (ACTIVE, IMMUTABLE, LOWER, SOFT, SLACK_FIXED,
                    Settings, SoftWeights, DAQP_INF,
                    EXIT_CYCLE, EXIT_INFEASIBLE, EXIT_ITERLIMIT,
                    EXIT_OPTIMAL, EXIT_RUNNING, EXIT_SOFT_OPTIMAL)

_BIG = jnp.asarray(DAQP_INF)


class LDPState(NamedTuple):
    """Fixed-shape solver state: the JAX analogue of ``DAQPWorkspace``
    (reference include/types.h:121-196), carried functionally through
    ``lax.while_loop`` and batchable with ``vmap``."""
    # --- LDP problem data (rows of M are unit-normalized; scaling retained) ---
    M: jnp.ndarray         # (m, n)  all constraint rows in u-space
    dupper: jnp.ndarray    # (m,)
    dlower: jnp.ndarray    # (m,)
    scaling: jnp.ndarray   # (m,)
    sense: jnp.ndarray     # (m,) int32 bit flags
    # --- working set ---
    WS: jnp.ndarray        # (K,) int32 constraint ids (ordered)
    lam: jnp.ndarray       # (K,)  dual iterate
    lam_star: jnp.ndarray  # (K,)  constrained stationary point
    Mw: jnp.ndarray        # (K, n) rows of M for the working set
    E: jnp.ndarray         # (K, K) inverse Gram (zero outside active block)
    n_active: jnp.ndarray  # () int32
    ns_active: jnp.ndarray  # () int32  number of active soft constraints
    sing: jnp.ndarray      # () bool   last WS entry is singular
    sing_dir: jnp.ndarray  # (K,)  null-space direction when singular
    # --- iterates ---
    u: jnp.ndarray         # (n,)
    fval: jnp.ndarray      # ()  dual objective (2x the QP objective shift)
    soft_slack: jnp.ndarray  # ()
    # --- control ---
    iterations: jnp.ndarray    # () int32
    cycle_counter: jnp.ndarray  # () int32
    tried_repair: jnp.ndarray  # () int32 repair count (0: none; 1: repaired, Dantzig; >=2: repaired, Bland escalation)
    best_fval: jnp.ndarray     # ()
    status: jnp.ndarray        # () int32 (EXIT_RUNNING while iterating)
    in_bnb: jnp.ndarray        # () bool  cycling exits instead of repairing
    # Optional per-constraint soft-slack data (reference SOFT_WEIGHTS
    # build, types.h:168-180); None (static) compiles the plain-soft
    # variants, exactly like the reference's compile-time flag.  When
    # set, the SLACK_FIXED sense bit tracks slacks pinned at their
    # bounds and the SOFT_WEIGHTS variants of add / CSP / blocking-
    # removal / refinement are traced instead.
    sw: SoftWeights = None     # arrays are scaling-NORMALIZED (utils.c:99)


def init_state(M, dupper, dlower, sense, scaling=None, K=None,
               dtype=None, sw: SoftWeights = None) -> LDPState:
    """Fresh workspace for an LDP with capacity K = n + ns + 1
    (reference allocation ``src/api.c:288-305``)."""
    M = jnp.asarray(M, dtype=dtype)
    m, n = M.shape
    dtype = M.dtype
    if K is None:
        ns = int(jnp.sum((jnp.asarray(sense) & SOFT) > 0)) if sense is not None else 0
        K = n + ns + 1
    if scaling is None:
        scaling = jnp.ones((m,), dtype)
    if sense is None:
        sense = jnp.zeros((m,), jnp.int32)
    z = jnp.zeros((), dtype)
    return LDPState(
        M=M,
        dupper=jnp.asarray(dupper, dtype), dlower=jnp.asarray(dlower, dtype),
        scaling=jnp.asarray(scaling, dtype),
        sense=jnp.asarray(sense, jnp.int32),
        WS=jnp.zeros((K,), jnp.int32), lam=jnp.zeros((K,), dtype),
        lam_star=jnp.zeros((K,), dtype), Mw=jnp.zeros((K, n), dtype),
        E=jnp.zeros((K, K), dtype),
        n_active=jnp.zeros((), jnp.int32), ns_active=jnp.zeros((), jnp.int32),
        sing=jnp.zeros((), bool), sing_dir=jnp.zeros((K,), dtype),
        u=jnp.zeros((n,), dtype), fval=z, soft_slack=z,
        iterations=jnp.zeros((), jnp.int32),
        cycle_counter=jnp.zeros((), jnp.int32),
        tried_repair=jnp.zeros((), jnp.int32), best_fval=z - 1.0,
        status=jnp.full((), EXIT_RUNNING, jnp.int32),
        in_bnb=jnp.zeros((), bool),
        sw=sw,
    )


# ---------------------------------------------------------------------------
# small utilities
# ---------------------------------------------------------------------------
def _mask1(K, k):
    return jnp.arange(K) < k


def _mask2(K, k):
    r = jnp.arange(K)
    return (r[:, None] < k) & (r[None, :] < k)


def _delete_at(arr, pos, axis=0):
    """Shift entries after ``pos`` down by one along ``axis`` (compaction)."""
    K = arr.shape[axis]
    idx = jnp.arange(K)
    src = jnp.where(idx >= pos, jnp.minimum(idx + 1, K - 1), idx)
    return jnp.take(arr, src, axis=axis)


# ---------------------------------------------------------------------------
# working-set / inverse-Gram maintenance
# ---------------------------------------------------------------------------
def add_constraint(state: LDPState, idx, lam_val, st: Settings,
                   sw_free=None) -> LDPState:
    """Bordered-inverse constraint addition.

    Mirrors ``daqp_add_constraint`` + ``daqp_update_LDL_add``
    (auxiliary.c:27-44, factorization.c:7-98); the Schur complement computed
    here equals the new LDL pivot D[k] for the current ordering.

    ``sw_free`` (SOFT_WEIGHTS only): traced bool overriding the derived
    slack FREE/FIXED state.  The blocking re-add passes the FLIPPED
    previous state: deriving it from lam alone (the reference's test,
    auxiliary.c:30-36 with the 0.1%% overshoot) is degenerate when the
    blocking step is exactly zero — the dual sits AT the transition, the
    multiplicative overshoot is 0, the same state is re-derived and the
    remove/re-add pair loops forever (observed on a random instance).
    For every nonzero-step re-add the flip equals the derived state.
    """
    K = state.E.shape[0]
    n = state.M.shape[1]
    k = state.n_active
    mask = _mask1(K, k)
    mi = state.M[idx]
    is_soft = (state.sense[idx] & SOFT) > 0
    if state.sw is not None:
        # SOFT_WEIGHTS slack state machine (auxiliary.c:30-36): a slack
        # at its bound is FIXED (the row behaves hard); past its bound it
        # is FREE and contributes its per-side rho to the Gram diagonal
        # (factorization.c:31-40).
        is_lo = (state.sense[idx] & LOWER) > 0
        lam_v = jnp.asarray(lam_val, mi.dtype)
        slack_free = jnp.where(is_lo, lam_v <= -state.sw.d_ls[idx],
                               lam_v >= state.sw.d_us[idx])
        if sw_free is not None:
            slack_free = jnp.asarray(sw_free, bool)
        rho_side = jnp.where(is_lo, state.sw.rho_ls[idx],
                             state.sw.rho_us[idx])
        contributes = is_soft & slack_free
        dii = mi @ mi + jnp.where(contributes, rho_side, 0)
        sense_idx = jnp.where(slack_free,
                              state.sense[idx] & ~SLACK_FIXED,
                              state.sense[idx] | SLACK_FIXED)
    else:
        contributes = is_soft
        dii = mi @ mi + jnp.where(is_soft,
                                  jnp.asarray(st.rho_soft, mi.dtype), 0)
        sense_idx = state.sense[idx]
    g = jnp.where(mask, state.Mw @ mi, 0)
    alpha = state.E @ g
    s_val = dii - g @ alpha
    ns_new = state.ns_active + contributes.astype(jnp.int32)
    singular = (s_val < st.sing_tol) | (k >= n + ns_new)
    # Backstop for an under-allocated workspace (K must be n + ns + 1,
    # api.c:288-305; callers that cannot see ns statically may pass a
    # smaller K): a full table makes the add a no-op — the constraint
    # stays inactive and pricing re-selects it until the cycle guard
    # exits — rather than silently overwriting the last slot.
    full = k >= state.E.shape[0]

    sense = state.sense.at[idx].set(sense_idx | ACTIVE)
    base = state._replace(
        WS=state.WS.at[k].set(idx.astype(jnp.int32)),
        lam=state.lam.at[k].set(jnp.asarray(lam_val, state.lam.dtype)),
        Mw=state.Mw.at[k].set(mi),
        sense=sense, n_active=k + 1, ns_active=ns_new)

    def sing_branch(s):
        sdir = jnp.where(mask, -alpha, 0).at[k].set(1.0)
        is_lower = (sense[idx] & LOWER) > 0  # flip for descent direction
        sdir = jnp.where(is_lower, -sdir, sdir)
        return s._replace(sing=jnp.ones((), bool), sing_dir=sdir)

    def ok_branch(s):
        w = jnp.where(mask, alpha, 0).at[k].set(-1.0)
        return s._replace(E=s.E + jnp.outer(w, w) / s_val,
                          sing=jnp.zeros((), bool))

    return lax.cond(full, lambda s: state,
                    lambda s: lax.cond(singular, sing_branch, ok_branch, s),
                    base)


def remove_constraint(state: LDPState, rm_pos, st: Settings) -> LDPState:
    """Deletion-inverse constraint removal + compaction.

    Mirrors ``daqp_remove_constraint`` + ``daqp_update_LDL_remove``
    (auxiliary.c:3-26, factorization.c:99-138).  If a position *before* a
    singular last entry is removed, that entry's border is re-added — its
    Schur complement may have become positive (the Gill C1 downdate performs
    the equivalent pivot refresh in the reference).
    """
    K = state.E.shape[0]
    k = state.n_active
    idx = state.WS[rm_pos]
    was_sing = state.sing
    rm_soft_b = (state.sense[idx] & SOFT) > 0
    if state.sw is not None:
        # only FREE soft slacks contributed to the Gram diagonal / count
        rm_soft_b = rm_soft_b & ((state.sense[idx] & SLACK_FIXED) == 0)
    rm_soft = rm_soft_b.astype(jnp.int32)
    sense = state.sense.at[idx].set(state.sense[idx] & ~ACTIVE)

    k_ns = k - was_sing.astype(jnp.int32)  # entries covered by E

    def del_E(E):
        e = E[:, rm_pos]
        # Division is safe: E_rr >= 1/G_rr and G_rr ~ 1 for unit-norm rows.
        E = E - jnp.outer(e, e) / e[rm_pos]
        return _delete_at(_delete_at(E, rm_pos, axis=0), rm_pos, axis=1)

    E = lax.cond(rm_pos < k_ns, del_E, lambda E: E, state.E)

    k2 = k - 1
    readd = was_sing & (rm_pos < k2)
    E = E * _mask2(K, k2 - readd.astype(jnp.int32))

    state2 = state._replace(
        E=E, sense=sense,
        WS=_delete_at(state.WS, rm_pos), lam=_delete_at(state.lam, rm_pos),
        Mw=_delete_at(state.Mw, rm_pos, axis=0),
        n_active=k2, ns_active=state.ns_active - rm_soft,
        sing=jnp.zeros((), bool))

    def do_readd(s):
        pos = s.n_active - 1
        idx2 = s.WS[pos]
        lam2 = s.lam[pos]
        soft2_b = (s.sense[idx2] & SOFT) > 0
        if s.sw is not None:
            soft2_b = soft2_b & ((s.sense[idx2] & SLACK_FIXED) == 0)
        s = s._replace(n_active=pos,
                       ns_active=s.ns_active - soft2_b.astype(jnp.int32))
        return add_constraint(s, idx2, lam2, st)

    return lax.cond(readd, do_readd, lambda s: s, state2)


def refactor(state: LDPState, st: Settings) -> LDPState:
    """Rebuild E from scratch for the current working set (repair path:
    fresh factorization, ``src/daqp.c:32-46`` / ``:66-85``)."""
    K = state.E.shape[0]
    ws, lam, k = state.WS, state.lam, state.n_active
    s0 = state._replace(n_active=jnp.zeros((), jnp.int32),
                        ns_active=jnp.zeros((), jnp.int32),
                        E=jnp.zeros_like(state.E),
                        sing=jnp.zeros((), bool))

    def body(i, s):
        return lax.cond((i < k) & ~s.sing,
                        lambda s: add_constraint(s, ws[i], lam[i], st),
                        lambda s: s, s)

    return lax.fori_loop(0, K, body, s0)


# ---------------------------------------------------------------------------
# iteration primitives
# ---------------------------------------------------------------------------
def compute_csp(state: LDPState) -> LDPState:
    """lam* = -E d_W: the constrained stationary point as one masked GEMV
    (replaces the substitution solve ``daqp_compute_CSP``,
    auxiliary.c:313-353)."""
    K = state.E.shape[0]
    mask = _mask1(K, state.n_active)
    sw = state.sense[state.WS]
    d = jnp.where((sw & LOWER) > 0, state.dlower[state.WS],
                  state.dupper[state.WS])
    if state.sw is not None:
        # free soft slacks shift the CSP right-hand side by their bound
        # contribution (auxiliary.c:313-332, SOFT_WEIGHTS branch)
        ws = state.WS
        free_soft = ((sw & SOFT) > 0) & ((sw & SLACK_FIXED) == 0)
        corr = jnp.where((sw & LOWER) > 0,
                         state.sw.rho_ls[ws] * state.sw.d_ls[ws],
                         -state.sw.rho_us[ws] * state.sw.d_us[ws])
        d = d + jnp.where(free_soft, corr, 0)
    d = jnp.where(mask, d, 0)
    return state._replace(lam_star=-(state.E @ d))


def remove_blocking(state: LDPState, st: Settings
                    ) -> Tuple[jnp.ndarray, LDPState]:
    """Exact min-ratio line search over dual-infeasible active constraints;
    removes the blocker (``daqp_remove_blocking``, auxiliary.c:276-311;
    SOFT_WEIGHTS variant auxiliary.c:199-274 when slack data is present)."""
    K = state.E.shape[0]
    mask = _mask1(K, state.n_active)
    sw = state.sense[state.WS]
    immut = (sw & IMMUTABLE) > 0
    is_lower = (sw & LOWER) > 0
    direction = jnp.where(state.sing, state.sing_dir, state.lam_star)
    delta = jnp.where(state.sing, state.sing_dir, state.lam_star - state.lam)

    if state.sw is None:
        infeas = jnp.where(is_lower, direction > st.dual_tol,
                           direction < -st.dual_tol)
        elig = mask & ~immut & infeas
        cand = -state.lam / delta
        # eligible entries always participate; nonfinite/negative ratios
        # clamp to a zero-step removal — the reference's exit gate is
        # "no dual-infeasible lam* entry" (auxiliary.c:283-287), and
        # dropping them can declare a dual-infeasible point optimal
        cand = jnp.where(jnp.isfinite(cand), jnp.maximum(cand, 0.0), 0.0)
        cand = jnp.where(elig, cand, _BIG)
        rm_pos = jnp.argmin(cand).astype(jnp.int32)
        found = cand[rm_pos] < _BIG

        def do_remove(s):
            alpha = cand[rm_pos]
            lam_new = jnp.where(mask, s.lam + alpha * delta, s.lam)
            return remove_constraint(s._replace(lam=lam_new), rm_pos, st)

        return found, lax.cond(found, do_remove, lambda s: s, state)

    # --- SOFT_WEIGHTS variant (auxiliary.c:199-274): the line-search
    # variable is the SLACK dual lam + d (per side), the blocking point is
    # the slack-bound transition, the step overshoots by 0.1% so the
    # constraint re-enters with the flipped FIXED/FREE state, and a soft
    # blocker whose dual has not fully deactivated is immediately
    # re-added (the SLACK_FIXED <-> FREE transition). ---
    ws = state.WS
    d_ls_w = state.sw.d_ls[ws]
    d_us_w = state.sw.d_us[ws]
    free = (sw & SLACK_FIXED) == 0
    p = delta
    ls_star = direction
    skip_lo_free = (p < st.dual_tol) | (ls_star <= -d_ls_w + st.dual_tol)
    skip_lo_fix = ((ls_star <= st.dual_tol)
                   & (ls_star + st.dual_tol >= -d_ls_w) & ~state.sing)
    skip_up_free = (p > -st.dual_tol) | (ls_star >= d_us_w)
    skip_up_fix = ((ls_star >= -st.dual_tol)
                   & (ls_star <= st.dual_tol + d_us_w) & ~state.sing)
    # Kink guard: when the two slack regimes DISAGREE at the transition
    # (FIXED-CSP pushes the dual past the bound while FREE-CSP pulls it
    # back), the 1-D optimum is exactly lam = bound; the reference's
    # remove/re-add with multiplicative overshoot (auxiliary.c:254) then
    # oscillates with geometrically decaying amplitude to a ZERO step and
    # freezes the whole dual vector (reproduced; the reference build has
    # the same latent loop).  A soft row whose dual sits at its
    # transition, in the crossing direction, is at its coordinate optimum
    # — exclude it from the search (genuine deactivations cross at 0, not
    # at the bound, and stay eligible).
    eps_k = jnp.asarray(64 * jnp.finfo(state.lam.dtype).eps,
                        state.lam.dtype)
    ktol_us = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(d_us_w)))
    ktol_ls = jnp.maximum(st.dual_tol, eps_k * (1 + jnp.abs(d_ls_w)))
    at_us = jnp.abs(state.lam - d_us_w) <= ktol_us
    at_ls = jnp.abs(state.lam + d_ls_w) <= ktol_ls
    is_soft_w = (sw & SOFT) > 0
    kink = is_soft_w & jnp.where(
        is_lower,
        at_ls & jnp.where(free, True, p < 0),
        at_us & jnp.where(free, True, p > 0))
    skip = jnp.where(is_lower,
                     jnp.where(free, skip_lo_free, skip_lo_fix),
                     jnp.where(free, skip_up_free, skip_up_fix)) | kink
    lam_slack = state.lam + jnp.where(
        is_lower,
        jnp.where(free, d_ls_w, jnp.where(p < 0, d_ls_w, 0.0)),
        -jnp.where(free, d_us_w, jnp.where(p > 0, d_us_w, 0.0)))
    elig = mask & ~immut & ~skip
    cand = jnp.maximum(-lam_slack / p, 0.0)
    cand = jnp.where(jnp.isfinite(cand), cand, 0.0)
    cand = jnp.where(elig, cand, _BIG)
    rm_pos = jnp.argmin(cand).astype(jnp.int32)
    found = cand[rm_pos] < _BIG

    def do_remove_sw(s):
        # step just past the slack-bound transition (auxiliary.c:254)
        alpha = cand[rm_pos] * 1.001
        lam_new = jnp.where(mask, s.lam + alpha * delta, s.lam)
        rm_id = s.WS[rm_pos]
        ls_rm = lam_new[rm_pos]
        was_lower = (s.sense[rm_id] & LOWER) > 0
        was_soft = (s.sense[rm_id] & SOFT) > 0
        was_fixed = (s.sense[rm_id] & SLACK_FIXED) > 0
        s = remove_constraint(s._replace(lam=lam_new), rm_pos, st)
        crossed_out = jnp.where(was_lower, ls_rm > 0, ls_rm < 0)
        readd = was_soft & ~s.sing & ~crossed_out
        # re-enter with the FLIPPED FIXED/FREE state (robust when the
        # blocking step is zero — see add_constraint docstring)
        return lax.cond(readd,
                        lambda s: add_constraint(s, rm_id, ls_rm, st,
                                                 sw_free=was_fixed),
                        lambda s: s, s)

    return found, lax.cond(found, do_remove_sw, lambda s: s, state)


def compute_primal_and_fval(state: LDPState, st: Settings) -> LDPState:
    """u = -M_W' lam*; fval = ||u||^2 + rho_soft * sum(lam*_soft^2)
    (``daqp_compute_primal_and_fval``, auxiliary.c:46-87)."""
    K = state.E.shape[0]
    mask = _mask1(K, state.n_active)
    ls = jnp.where(mask, state.lam_star, 0)
    u = -(state.Mw.T @ ls)
    sw_bits = state.sense[state.WS]
    soft = mask & ((sw_bits & SOFT) > 0)
    if state.sw is not None:
        rho_w = jnp.where((sw_bits & LOWER) > 0,
                          state.sw.rho_ls[state.WS],
                          state.sw.rho_us[state.WS])
        soft_slack = jnp.sum(
            jnp.where(soft, rho_w * state.lam_star ** 2, 0))
    else:
        soft_slack = st.rho_soft * jnp.sum(
            jnp.where(soft, state.lam_star ** 2, 0))
    fval = soft_slack + u @ u
    return state._replace(u=u, fval=fval, soft_slack=soft_slack)


def add_infeasible(state: LDPState, st: Settings
                   ) -> Tuple[jnp.ndarray, LDPState]:
    """Dantzig pricing: one GEMV ``mu = M u`` over all constraints, then add
    the most violated (``daqp_add_infeasible`` + ``daqp_compute_Mu``,
    auxiliary.c:88-197)."""
    mu = state.M @ state.u
    bound = -st.primal_tol * state.scaling
    viol_up = state.dupper - mu
    viol_lo = mu - state.dlower
    blocked = (state.sense & (ACTIVE | IMMUTABLE)) > 0
    up_ok = (viol_up < bound) & ~blocked
    lo_ok = (viol_lo < bound) & ~blocked & ~up_ok
    cand = jnp.where(up_ok, viol_up, jnp.where(lo_ok, viol_lo, _BIG))
    # Bland's rule (lowest violated index, the anti-cycling option of the
    # reference's executable spec) keys the argmin by index instead of by
    # violation magnitude; a traced select, so no recompile on switch
    viol_any = up_ok | lo_ok
    bland_key = jnp.where(viol_any,
                          jnp.arange(cand.shape[0], dtype=cand.dtype),
                          _BIG)
    # anti-cycling escalation (as in ldp_flat.flat_step): a solve that
    # needed the one-shot cycle repair switches to Bland's rule for the
    # rest of the run — breaks f32 degenerate orbits the reference can
    # only exit with EXIT_CYCLE
    use_bland = (jnp.asarray(st.pricing) == 1) | (state.tried_repair >= 2)
    key = jnp.where(use_bland, bland_key, cand)
    j = jnp.argmin(key).astype(jnp.int32)
    found = viol_any[j]
    isupper = up_ok[j]

    def do_add(s):
        K = s.E.shape[0]
        mask = _mask1(K, s.n_active)
        sj = jnp.where(isupper, s.sense[j] & ~LOWER, s.sense[j] | LOWER)
        s = s._replace(sense=s.sense.at[j].set(sj),
                       lam=jnp.where(mask, s.lam_star, s.lam))
        return add_constraint(s, j, jnp.where(isupper, 1.0, -1.0), st)

    return found, lax.cond(found, do_add, lambda s: s, state)


def newton_refresh_E(state: LDPState, st: Settings) -> LDPState:
    """One Newton polish E <- E(2I - G E) against the exactly rebuilt
    working-set Gram, guarded by the contraction condition ||GE - I|| < 1/2.

    The flat/slot tiers' hard-won rule (ROUND3.md): refinement through a
    DRIFTED inverse silently accepts wrong answers — ``refine_active``'s
    correction dlam = E r and the optimal-path re-price are only as good
    as E.  On a v5e at K = 501 (reference grid n = 500, ~2900 rank-one
    updates) the unrefreshed single-instance path exited "optimal" at a
    working set 2 rows short of the true active set (x error 5.6e-4,
    where CPU f32 reaches 5e-6); with the refresh the re-price sees the
    true weakly-violated rows.  Two K^2(k) GEMMs, only on
    optimal-candidate iterations."""
    K = state.E.shape[0]
    dtype = state.E.dtype
    mask = _mask1(K, state.n_active)
    Mw_m = jnp.where(mask[:, None], state.Mw, 0)
    G = Mw_m @ Mw_m.T
    sw = state.sense[state.WS]
    soft = mask & ((sw & SOFT) > 0)
    if state.sw is not None:
        soft = soft & ((sw & SLACK_FIXED) == 0)
        rho_w = jnp.where((sw & LOWER) > 0, state.sw.rho_ls[state.WS],
                          state.sw.rho_us[state.WS])
        G = G + jnp.diag(jnp.where(soft, rho_w, 0))
    else:
        G = G + jnp.diag(jnp.where(soft,
                                   jnp.asarray(st.rho_soft, dtype), 0))
    G = jnp.where(mask[:, None] & mask[None, :], G, 0)
    G = G + jnp.diag(jnp.where(mask, 0.0, 1.0).astype(dtype))
    Iu = jnp.diag(mask.astype(dtype))
    P = G @ state.E
    resid = jnp.max(jnp.abs(P - Iu))
    E_new = state.E @ (2 * Iu - P)
    E_new = jnp.where(mask[:, None] & mask[None, :], E_new, 0)
    ok = (resid < 0.5) & jnp.all(jnp.isfinite(E_new)) & ~state.sing
    return state._replace(E=jnp.where(ok, E_new, state.E))


def refine_active(state: LDPState, st: Settings) -> LDPState:
    """One step of iterative refinement of (lam*, u) using E
    (``daqp_refine_active``, auxiliary.c:497-588)."""
    K = state.E.shape[0]
    mask = _mask1(K, state.n_active)
    sw = state.sense[state.WS]
    d = jnp.where((sw & LOWER) > 0, state.dlower[state.WS],
                  state.dupper[state.WS])
    r = state.Mw @ state.u - d
    soft = (sw & SOFT) > 0
    if state.sw is not None:
        # free soft slacks: diagonal reciprocal-weight + slack-bound term
        # in the refinement residual (auxiliary.c:522-533)
        ws = state.WS
        free_soft = soft & ((sw & SLACK_FIXED) == 0)
        rho_w = jnp.where((sw & LOWER) > 0, state.sw.rho_ls[ws],
                          state.sw.rho_us[ws])
        d_slack = jnp.where((sw & LOWER) > 0, state.sw.d_ls[ws],
                            -state.sw.d_us[ws])
        r = r - jnp.where(free_soft,
                          rho_w * (state.lam_star + d_slack), 0)
    else:
        r = r - jnp.where(soft, st.rho_soft * state.lam_star, 0)
    r = jnp.where(mask, r, 0)
    dlam = state.E @ r
    lam_star = state.lam_star + jnp.where(mask, dlam, 0)
    u = state.u - state.Mw.T @ jnp.where(mask, dlam, 0)
    return state._replace(lam_star=lam_star, u=u,
                          fval=state.soft_slack + u @ u)


# ---------------------------------------------------------------------------
# main loop
# ---------------------------------------------------------------------------
def _max_diag_E(state):
    K = state.E.shape[0]
    mask = _mask1(K, state.n_active)
    return jnp.max(jnp.where(mask, jnp.diagonal(state.E), 0))


def _declare_optimal(state, st):
    flag = jnp.where(state.soft_slack > st.primal_tol,
                     EXIT_SOFT_OPTIMAL, EXIT_OPTIMAL)
    return state._replace(status=flag.astype(jnp.int32))


def _optimal_path(state, st, batch_mode=False):
    """No infeasible constraint remains: repair / refine / declare optimal
    (``src/daqp.c:28-63``).

    With ``batch_mode=True`` (the vmapped path) the repair/refinement ladder
    is deferred to ``batch_post_pass``: under ``vmap`` a ``lax.cond`` lowers
    to ``select`` with *both* branches executed for every lane, so keeping
    the O(K^2 n) refactorization inside the hot loop would tax every
    iteration of every lane.  The post-pass applies the identical numerics
    once per solve round instead.
    """
    if batch_mode:
        return _declare_optimal(state, st)
    k = state.n_active
    max_diag = _max_diag_E(state)
    do_repair = ((k > 2) & (state.tried_repair == 0)
                 & (max_diag * st.refactor_tol > 1.0))

    def repair(s):
        # Correct LOWER/UPPER from the sign of lam (daqp.c:37-42), refactor.
        K = s.E.shape[0]
        m = s.M.shape[0]
        mask = _mask1(K, s.n_active)
        sw = s.sense[s.WS]
        sw_new = jnp.where(s.lam >= 0, sw & ~LOWER, sw | LOWER)
        # Masked (stale) WS entries scatter out-of-bounds and are dropped,
        # so they cannot clobber live sense updates.
        idx = jnp.where(mask, s.WS, m)
        sense = s.sense.at[idx].set(sw_new.astype(jnp.int32), mode='drop')
        s = refactor(s._replace(sense=sense), st)
        return s._replace(tried_repair=jnp.maximum(s.tried_repair, 1))

    def no_repair(s):
        # The reference refines only under detected ill-conditioning
        # (min_D < pivot_tol, daqp.c:52); that gate assumes f64, where
        # E-drift is negligible at benign conditioning.  In f32 the
        # drift after thousands of rank-one updates misprices weakly
        # active rows even at kappa = 1e2 (measured on a v5e at n = 500:
        # "optimal" exit 2 rows short of the true active set, x error
        # 5.6e-4 vs 5e-6 with the refresh) — so every optimal candidate
        # refreshes + refines in f32.  Static on dtype: compiled out of
        # f64 solves entirely.
        always = state.E.dtype == jnp.float32
        do_refine = (k > 0) & (always | (max_diag * st.pivot_tol > 1.0))

        def refine_then(s):
            # refresh E against the rebuilt Gram FIRST: refining (and
            # re-pricing) through a drifted inverse accepts wrong answers
            s = newton_refresh_E(s, st)
            s = compute_csp(s)
            s = compute_primal_and_fval(s, st)
            s = refine_active(s, st)
            added, s = add_infeasible(s, st)
            # dual re-check (flat_polish rule): a refined lam* that is
            # dual-infeasible on a non-immutable row means the working
            # set is wrong — stay RUNNING so the next iteration's
            # blocking search removes the offender instead of exiting
            # "optimal" at it (auxiliary.c:283-287 exit gate).
            K_ = s.E.shape[0]
            mask_ = _mask1(K_, s.n_active)
            sw_ = s.sense[s.WS]
            bad = mask_ & ((sw_ & IMMUTABLE) == 0) & jnp.where(
                (sw_ & LOWER) > 0, s.lam_star > st.dual_tol,
                s.lam_star < -st.dual_tol)
            if s.sw is not None:
                # SOFT_WEIGHTS rows follow slack-bound rules instead
                bad = bad & ((sw_ & SOFT) == 0)
            return lax.cond(added | jnp.any(bad), lambda q: q,
                            lambda q: _declare_optimal(q, st), s)

        return lax.cond(do_refine, refine_then,
                        lambda q: _declare_optimal(q, st), s)

    return lax.cond(do_repair, repair, no_repair, state)


def _cycle_guard(state, st, batch_mode=False):
    """Progress tracking with one-shot refactorization repair
    (``src/daqp.c:66-85``).  In batch mode the repair is deferred to
    ``batch_post_pass`` (see ``_optimal_path``): a tripped guard exits with
    EXIT_CYCLE and the post-pass refactors and resumes the lane."""
    no_progress = state.fval - state.best_fval \
        < st.progress_tol * (1.0 + jnp.abs(state.fval))
    cc = jnp.where(no_progress, state.cycle_counter + 1, 0)
    best = jnp.where(no_progress, state.best_fval, state.fval)
    trip = no_progress & (cc > st.cycle_tol)
    give_up = trip & (batch_mode | (state.tried_repair >= 2) | state.in_bnb)

    def cycle_exit(s):
        return s._replace(status=jnp.full((), EXIT_CYCLE, jnp.int32))

    def repair(s):
        s = refactor(s, st)
        return s._replace(tried_repair=s.tried_repair + 1,
                          cycle_counter=jnp.zeros((), jnp.int32),
                          best_fval=jnp.asarray(-1.0, s.fval.dtype))

    def keep(s):
        return s._replace(cycle_counter=cc.astype(jnp.int32), best_fval=best)

    return lax.cond(give_up, cycle_exit,
                    lambda s: lax.cond(trip, repair, keep, s), state)


def _nonsingular_step(state, st, batch_mode=False):
    state = compute_csp(state)
    removed, state = remove_blocking(state, st)

    def after_blocking(s):
        s = compute_primal_and_fval(s, st)
        infeas = s.fval > 2.0 * st.fval_bound  # dual objective bound cut

        def feasible(s):
            added, s = add_infeasible(s, st)
            return lax.cond(added,
                            lambda q: _cycle_guard(q, st, batch_mode),
                            lambda q: _optimal_path(q, st, batch_mode), s)

        return lax.cond(
            infeas,
            lambda q: q._replace(
                status=jnp.full((), EXIT_INFEASIBLE, jnp.int32)),
            feasible, s)

    return lax.cond(removed, lambda s: s, after_blocking, state)


def _singular_step(state, st):
    removed, state = remove_blocking(state, st)

    def stuck(s):
        # Singular direction with no blocker = infeasible (daqp.c:88-94).
        # In f32 a SPURIOUSLY singular add (drifted E) can reach this
        # state on a feasible problem (observed on a v5e: the reference
        # LP grid's n=50 inner LDPs exited -1 at iteration ~280), so the
        # first occurrence drops the parked entry, refactorizes exactly
        # and re-opens — the ldp_flat ladder (flat_step "stuck" path).
        # Only a repaired state declares infeasibility.
        def repair(q):
            q = remove_constraint(q, q.n_active - 1, st)
            q = refactor(q, st)
            return q._replace(
                tried_repair=jnp.maximum(q.tried_repair, 1),
                cycle_counter=jnp.zeros((), jnp.int32),
                best_fval=jnp.asarray(-1.0, q.fval.dtype))

        def infeas(q):
            return q._replace(
                status=jnp.full((), EXIT_INFEASIBLE, jnp.int32))

        return lax.cond(s.tried_repair >= 1, infeas, repair, s)

    return lax.cond(removed, lambda s: s, stuck, state)


def ldp_solve(state: LDPState, st: Settings, batch_mode: bool = False,
              reset: bool = True, deadline=None) -> LDPState:
    """Run the active-set loop to termination (``daqp_ldp``, daqp.c:6-108).

    ``batch_mode`` defers repair/refinement to ``batch_post_pass`` (see
    ``_optimal_path``).  ``reset=False`` resumes with accumulated iteration
    counts and a previously assigned status (used by the batched post-pass
    rounds and by warm restarts).  ``deadline`` (absolute perf_counter
    seconds, traced scalar) enables the reference's every-32-iterations
    wall-clock check (daqp.c:95-103) via a host callback; None (static)
    compiles it out entirely."""
    iter_limit = jnp.asarray(st.iter_limit, jnp.int32)

    def cond(s):
        return (s.status == EXIT_RUNNING) & (s.iterations < iter_limit)

    def body(s):
        s = lax.cond(s.sing, lambda q: _singular_step(q, st),
                     lambda q: _nonsingular_step(q, st, batch_mode), s)
        # NOTE a mid-loop periodic Newton refresh of E was tried here
        # (every 64 f32 iterations) and REGRESSED the reference grid's
        # n=500 QPs from all-optimal (err <= 1.7e-4) to all-EXIT_CYCLE:
        # at k ~ 400 active rows the incrementally maintained inverse
        # tracks the true inverse better than a Newton snap toward the
        # inverse of the f32-COMPUTED Gram, and the snap's interaction
        # with the optimal-path dual re-check churned the working set.
        # Drift is instead handled at optimal candidates
        # (newton_refresh_E in _optimal_path) and by the repair ladders.
        if deadline is not None:
            from .utils.timers import now_callback
            from .types import EXIT_TIMELIMIT

            def check_time(q):
                t = now_callback()
                return q._replace(status=jnp.where(
                    (t > deadline) & (q.status == EXIT_RUNNING),
                    EXIT_TIMELIMIT, q.status).astype(jnp.int32))

            s = lax.cond(s.iterations % 32 == 31, check_time,
                         lambda q: q, s)
        return s._replace(iterations=s.iterations + 1)

    if reset:
        state = state._replace(status=jnp.full((), EXIT_RUNNING, jnp.int32),
                               iterations=jnp.zeros((), jnp.int32))
    state = lax.while_loop(cond, body, state)
    state = state._replace(status=jnp.where(
        (state.status == EXIT_RUNNING) & (state.iterations >= iter_limit),
        EXIT_ITERLIMIT, state.status))
    return state


def batch_post_pass(state: LDPState, st: Settings) -> LDPState:
    """Per-lane repair round for the batched solver.

    Applies — once, outside the hot loop — the same numerics the scalar
    solver applies inline (``src/daqp.c:28-85``):
      * optimal lanes with an active set get one iterative-refinement step
        and are re-priced; a surviving violation re-opens the lane;
      * cycle-flagged lanes that have not yet been repaired are
        refactorized and re-opened.
    Designed to be vmapped and followed by ``ldp_solve(..., reset=False)``.
    """
    is_opt = ((state.status == EXIT_OPTIMAL)
              | (state.status == EXIT_SOFT_OPTIMAL)) & (state.n_active > 0)

    def fix_opt(s):
        # refresh E before refining (see _optimal_path.refine_then)
        s = newton_refresh_E(s, st)
        s = compute_csp(s)
        s = compute_primal_and_fval(s, st)
        s = refine_active(s, st)
        added, s = add_infeasible(s, st)
        return s._replace(status=jnp.where(
            added, EXIT_RUNNING, s.status).astype(jnp.int32))

    state = lax.cond(is_opt, fix_opt, lambda s: s, state)

    from .types import EXIT_CYCLE as _CYC
    do_cyc = (state.status == _CYC) & (state.tried_repair < 2) & ~state.in_bnb

    def fix_cycle(s):
        s = refactor(s, st)
        return s._replace(status=jnp.full((), EXIT_RUNNING, jnp.int32),
                          tried_repair=s.tried_repair + 1,
                          cycle_counter=jnp.zeros((), jnp.int32),
                          best_fval=jnp.asarray(-1.0, s.fval.dtype))

    return lax.cond(do_cyc, fix_cycle, lambda s: s, state)


def ldp_solve_batched_lane(state: LDPState, st: Settings,
                           rounds: int = 2) -> LDPState:
    """Single-lane view of the batched solve: fast loop + repair rounds.
    vmap this over a batch of LDPStates."""
    state = ldp_solve(state, st, batch_mode=True, reset=False)
    for _ in range(rounds):
        state = batch_post_pass(state, st)
        state = ldp_solve(state, st, batch_mode=True, reset=False)
    return state


def activate_constraints(state: LDPState, st: Settings, m_limit=None,
                         m_start=0) -> Tuple[jnp.ndarray, LDPState]:
    """Activate every sense-ACTIVE constraint in [m_start, m_limit)
    (warm/equality start), handling singular activations
    (``daqp_activate_constraints``, auxiliary.c:398-478; the range form
    covers the per-level activation in ``daqp_hiqp``, hierarchical.c:26-35).

    Returns (flag, state): flag < 0 signals EXIT_OVERDETERMINED_INITIAL.
    Mirrors the reference's redundant-equality consistency check: a linearly
    dependent equality whose right-hand side is consistent is dropped and
    ignored; an inconsistent one is an error.
    """
    from .types import EXIT_OVERDETERMINED_INITIAL
    m = state.M.shape[0]
    if m_limit is None:
        m_limit = m

    def body(i, carry):
        flag, s = carry

        def try_add(carry):
            flag, s = carry
            is_lower = (s.sense[i] & LOWER) > 0
            if s.sw is not None:
                # initial multiplier consistent with the pre-set slack
                # state (auxiliary.c:403-416): free -> past the slack
                # bound, fixed -> strictly inside it
                free0 = (s.sense[i] & SLACK_FIXED) == 0
                lam0 = jnp.where(
                    is_lower,
                    jnp.where(free0, -(s.sw.d_ls[i] + 1.0),
                              -0.9 * s.sw.d_ls[i]),
                    jnp.where(free0, s.sw.d_us[i] + 1.0,
                              0.9 * s.sw.d_us[i]))
            else:
                lam0 = jnp.where(is_lower, -1.0, 1.0)
            s = add_constraint(s, jnp.asarray(i, jnp.int32), lam0, st)

            def on_sing(carry):
                flag, s = carry
                last_pos = s.n_active - 1
                last = s.WS[last_pos]
                immut = (s.sense[last] & IMMUTABLE) > 0
                # Consistency residual of the dependent constraint set
                K = s.E.shape[0]
                mask = _mask1(K, s.n_active)
                sw = s.sense[s.WS]
                bnd = jnp.where((sw & LOWER) > 0, s.dlower[s.WS],
                                s.dupper[s.WS])
                terms = jnp.where(mask, s.sing_dir * bnd, 0)
                resid = jnp.sum(terms)
                scale = 1.0 + jnp.sum(jnp.abs(terms))
                consistent = jnp.abs(resid) <= st.primal_tol * scale
                # Drop the dependent constraint
                soft_last = ((s.sense[last] & SOFT) > 0).astype(jnp.int32)
                s = s._replace(
                    sense=s.sense.at[last].set(s.sense[last] & ~ACTIVE),
                    n_active=last_pos, ns_active=s.ns_active - soft_last,
                    sing=jnp.zeros((), bool))
                new_flag = jnp.where(immut & ~consistent,
                                     EXIT_OVERDETERMINED_INITIAL, flag)
                return new_flag, s

            return lax.cond(s.sing, on_sing, lambda c: c, (flag, s))

        want = ((s.sense[i] & ACTIVE) > 0) & (i < m_limit) & (i >= m_start)
        return lax.cond(want & (flag >= 0), try_add, lambda c: c, (flag, s))

    flag0 = jnp.ones((), jnp.int32)
    flag, state = lax.fori_loop(0, m, body, (flag0, state))
    return flag, state
