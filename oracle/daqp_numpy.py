"""Pure-NumPy executable specification of the TPU-DAQP solver algorithm.

This plays the role the pure-Julia solver (``daqp_julia.jl``) plays in the
reference darnstrom/daqp repository: a readable, loop-based implementation of
the same mathematical algorithm that the compiled solver implements, used as a
differential-testing oracle (reference ``test/core_tests.jl:107-128``).

The algorithm solves the least-distance problem (LDP)

    min ||u||^2  s.t.  dlower <= M u <= dupper

via a dual active-set method (Arnstrom, Bemporad, Axehill, IEEE TAC 2022).
Where the reference C solver (``src/daqp.c``, ``src/factorization.c``)
maintains a packed LDL' factorization of the working-set Gram matrix with
rank-one updates and triangular substitutions, this implementation — like the
TPU solver it specifies — maintains the *explicit inverse* E = G^{-1} of

    G = M_W M_W' + rho_soft * diag(soft flags)

updated by bordered (block-inverse) rank-one formulas on constraint
add/remove.  This removes every sequential recurrence from the iteration:
the constrained stationary point solve, the pricing sweep, and the factor
updates are all matvec/outer-product operations, which is what makes the
JAX/TPU port batch onto the MXU.

Semantics preserved from the reference:
  * working set ordering and Dantzig pricing (src/auxiliary.c:88-166)
  * exact min-ratio line search on dual iterates (src/auxiliary.c:276-311)
  * singularity handling with singular-direction steps (src/daqp.c:88-94,
    src/auxiliary.c:356-375): when adding a constraint whose Schur
    complement s = m'm - g'Eg <= sing_tol, the constraint enters the working
    set flagged singular; the null-space direction is p = [-E g; 1].
  * dual objective bound cut (fval > 2*fval_bound => infeasible,
    src/daqp.c:20-23)
  * cycle guard with one refactorization repair (src/daqp.c:66-85)
  * soft constraints via diagonal rho_soft augmentation
  * immutable (equality) constraints never leave the working set
"""
from __future__ import annotations

import numpy as np

# Sense bit flags (reference include/constants.h:57-89)
ACTIVE, LOWER, IMMUTABLE, SOFT, BINARY = 1, 2, 4, 8, 16

EXIT_OPTIMAL = 1
EXIT_SOFT_OPTIMAL = 2
EXIT_INFEASIBLE = -1
EXIT_CYCLE = -2
EXIT_ITERLIMIT = -4
EXIT_OVERDETERMINED = -6

INF = 1e30


class Workspace:
    """LDP workspace: fixed-capacity working set + explicit Gram inverse."""

    def __init__(self, M, dupper, dlower, sense, scaling=None, settings=None):
        self.M = np.asarray(M, dtype=float)            # (m, n) normalized rows
        self.m, self.n = self.M.shape
        self.dupper = np.asarray(dupper, dtype=float).copy()
        self.dlower = np.asarray(dlower, dtype=float).copy()
        self.sense = np.asarray(sense, dtype=int).copy()
        self.scaling = (np.ones(self.m) if scaling is None
                        else np.asarray(scaling, dtype=float))
        self.settings = settings or {}
        K = self.n + int(np.sum(self.sense & SOFT > 0)) + 1
        self.Kmax = K
        self.WS = np.zeros(K, dtype=int)
        self.lam = np.zeros(K)
        self.lam_star = np.zeros(K)
        self.E = np.zeros((K, K))                      # inverse Gram
        self.n_active = 0
        self.sing = False                              # last WS entry singular
        self.sing_dir = np.zeros(K)
        self.u = np.zeros(self.n)
        self.fval = 0.0
        self.soft_slack = 0.0
        self.iterations = 0

    # -- settings with reference defaults (constants.h:15-29) --
    def s(self, key, default):
        return self.settings.get(key, default)

    @property
    def primal_tol(self): return self.s('primal_tol', 1e-6)
    @property
    def dual_tol(self): return self.s('dual_tol', 1e-12)
    @property
    def sing_tol(self): return self.s('sing_tol', 3.7e-11)
    @property
    def progress_tol(self): return self.s('progress_tol', 1e-14)
    @property
    def cycle_tol(self): return self.s('cycle_tol', 10)
    @property
    def iter_limit(self): return self.s('iter_limit', 10000)
    @property
    def rho_soft(self): return self.s('rho_soft', 1e-6)
    @property
    def fval_bound(self): return self.s('fval_bound', INF)
    @property
    def refactor_tol(self): return self.s('refactor_tol', 1e-9)

    # ------------------------------------------------------------------
    # Working-set / inverse-Gram maintenance
    # ------------------------------------------------------------------
    def gram_row(self, idx):
        """g = M_W m_idx + rho_soft cross terms (none: soft only on diagonal)."""
        k = self.n_active
        return self.M[self.WS[:k]] @ self.M[idx]

    def add_constraint(self, idx, lam_val):
        """Bordered-inverse add. Flags singularity when Schur <= sing_tol.

        Mirrors daqp_update_LDL_add (factorization.c:7-98): the Schur
        complement s here equals the new LDL' pivot D[k] for this ordering.
        """
        self.sense[idx] |= ACTIVE
        k = self.n_active
        mi = self.M[idx]
        dii = mi @ mi
        if self.sense[idx] & SOFT:
            dii += self.rho_soft
        ns_active = int(np.sum(self.sense[self.WS[:k]] & SOFT > 0))
        ns_active += 1 if (self.sense[idx] & SOFT) else 0
        if k == 0:
            s = dii
            alpha = np.zeros(0)
        else:
            g = self.gram_row(idx)
            alpha = self.E[:k, :k] @ g
            s = dii - g @ alpha
        self.WS[k] = idx
        self.lam[k] = lam_val
        self.n_active = k + 1
        if s < self.sing_tol or k >= self.n + ns_active:
            # Singular: do not update E; store null direction [-alpha; 1].
            self.sing = True
            self.sing_dir[:k] = -alpha
            self.sing_dir[k] = 1.0
            if self.sense[idx] & LOWER:   # flip for descent (auxiliary.c:372)
                self.sing_dir[:k + 1] = -self.sing_dir[:k + 1]
            return
        # Bordered inverse update:
        # [G  g; g' dii]^{-1} = [E + a a'/s, -a/s; -a'/s, 1/s], a = E g
        if k > 0:
            self.E[:k, :k] += np.outer(alpha, alpha) / s
            self.E[:k, k] = -alpha / s
            self.E[k, :k] = -alpha / s
        self.E[k, k] = 1.0 / s
        self.sing = False

    def remove_constraint(self, rm_pos):
        """Remove working-set position rm_pos; deletion-inverse update.

        Mirrors daqp_remove_constraint + daqp_update_LDL_remove
        (auxiliary.c:3-26, factorization.c:99-138).  If the removed position
        precedes a singular last entry, re-add that entry's border to E
        (its Schur complement may have become positive).
        """
        k = self.n_active
        idx = self.WS[rm_pos]
        self.sense[idx] &= ~ACTIVE
        was_sing = self.sing
        k_ns = k - 1 if was_sing else k   # entries covered by E

        if rm_pos < k_ns:
            # Delete row/col rm_pos from the inverse:
            # inv(G with row/col j deleted) = E'' - E''_{:,j}E''_{j,:}/E''_{jj}
            # restricted to the complement of j.
            keep = [i for i in range(k_ns) if i != rm_pos]
            Ejj = self.E[rm_pos, rm_pos]
            Enew = (self.E[np.ix_(keep, keep)]
                    - np.outer(self.E[keep, rm_pos], self.E[rm_pos, keep]) / Ejj)
            kn = k_ns - 1
            self.E[:kn, :kn] = Enew
        # Shift WS / lam down
        for arr in (self.WS, self.lam):
            arr[rm_pos:k - 1] = arr[rm_pos + 1:k]
        self.n_active = k - 1
        self.sing = False
        if was_sing and rm_pos < k:
            if rm_pos == k - 1:
                pass  # removed the singular entry itself; E already valid
            else:
                # Re-add the (previously singular) last entry to E.
                last_idx = self.WS[self.n_active - 1]
                self.n_active -= 1
                self.sense[last_idx] |= ACTIVE  # keep flag (re-add sets it)
                lam_last = self.lam[self.n_active]
                self.add_constraint(last_idx, lam_last)

    def refactor(self):
        """Recompute E from scratch for the current working set (repair path).

        Mirrors the reset + daqp_activate_constraints repair in daqp.c:32-46
        and daqp.c:66-85 (fresh LDL factorization).
        """
        ws = [(self.WS[i], self.lam[i]) for i in range(self.n_active)]
        for idx, _ in ws:
            self.sense[idx] &= ~ACTIVE
        self.n_active = 0
        self.sing = False
        for idx, lam_val in ws:
            self.add_constraint(idx, lam_val)
            if self.sing:
                break

    # ------------------------------------------------------------------
    # Iteration primitives
    # ------------------------------------------------------------------
    def compute_csp(self):
        """lam_star = -G^{-1} d_W  (daqp_compute_CSP, auxiliary.c:313-353)."""
        k = self.n_active
        ws = self.WS[:k]
        d = np.where(self.sense[ws] & LOWER, self.dlower[ws], self.dupper[ws])
        self.lam_star[:k] = -(self.E[:k, :k] @ d) if k else 0.0

    def remove_blocking(self):
        """Exact min-ratio line search; removes blocking constraint.

        Returns True if a constraint was removed (daqp_remove_blocking,
        auxiliary.c:276-311).
        """
        k = self.n_active
        direction = self.sing_dir[:k] if self.sing else self.lam_star[:k]
        rm_pos, alpha = -1, INF
        for i in range(k):
            idx = self.WS[i]
            if self.sense[idx] & IMMUTABLE:
                continue
            lsi = direction[i] if self.sing else self.lam_star[i]
            if self.sense[idx] & LOWER:
                if lsi < self.dual_tol:
                    continue  # dual feasible for lower bound
            else:
                if lsi > -self.dual_tol:
                    continue  # dual feasible for upper bound
            if self.sing:
                cand = -self.lam[i] / direction[i]
            else:
                cand = -self.lam[i] / (self.lam_star[i] - self.lam[i])
            if cand < alpha:
                alpha, rm_pos = cand, i
        if rm_pos < 0:
            return False
        if self.sing:
            self.lam[:k] += alpha * direction
        else:
            self.lam[:k] += alpha * (self.lam_star[:k] - self.lam[:k])
        self.remove_constraint(rm_pos)
        return True

    def compute_primal_and_fval(self):
        """u = -M_W' lam_star; fval = ||u||^2 + rho_soft*sum(lam_soft^2)."""
        k = self.n_active
        ws = self.WS[:k]
        self.u = -(self.M[ws].T @ self.lam_star[:k]) if k else np.zeros(self.n)
        soft = (self.sense[ws] & SOFT) > 0
        self.soft_slack = self.rho_soft * float(
            np.sum(self.lam_star[:k][soft] ** 2))
        self.fval = self.soft_slack + float(self.u @ self.u)

    def add_infeasible(self):
        """Pricing: add a violated inactive constraint — Dantzig (most
        violated, the C core's rule, daqp_add_infeasible,
        auxiliary.c:88-166) or Bland (lowest violated index, the
        anti-cycling option of the reference's executable spec,
        daqp_julia.jl).  Returns True if added."""
        mu = self.M @ self.u
        ep = -self.primal_tol * self.scaling
        viol_up = self.dupper - mu           # < 0 => upper violated
        viol_lo = mu - self.dlower           # < 0 => lower violated
        blocked = (self.sense & (ACTIVE | IMMUTABLE)) > 0
        bland = self.s('pricing', 0) == 1
        best, add_idx, isupper = 0.0, -1, False
        for j in range(self.m):
            if blocked[j]:
                continue
            if viol_up[j] < best and viol_up[j] < ep[j]:
                best, add_idx, isupper = viol_up[j], j, True
            elif viol_lo[j] < best and viol_lo[j] < ep[j]:
                best, add_idx, isupper = viol_lo[j], j, False
            if bland and add_idx == j:
                break                        # first violated index wins
        if add_idx < 0:
            return False
        if isupper:
            self.sense[add_idx] &= ~LOWER
        else:
            self.sense[add_idx] |= LOWER
        k = self.n_active
        self.lam[:k] = self.lam_star[:k]     # pointer swap in reference
        self.add_constraint(add_idx, 1.0 if isupper else -1.0)
        return True

    def activate_constraints(self):
        """Activate all sense-ACTIVE constraints (warm/equality start).

        daqp_activate_constraints (auxiliary.c:398-478) incl. the
        redundant-equality consistency check via the singular direction.
        """
        order = np.arange(self.m)
        for i in order:
            if not (self.sense[i] & ACTIVE):
                continue
            if any(self.WS[j] == i for j in range(self.n_active)):
                continue
            self.add_constraint(i, -1.0 if (self.sense[i] & LOWER) else 1.0)
            if self.sing:
                last = self.WS[self.n_active - 1]
                if self.sense[last] & IMMUTABLE:
                    # Consistency check for redundant equality
                    k = self.n_active
                    resid, scale = 0.0, 1.0
                    for j in range(k):
                        idx = self.WS[j]
                        bnd = (self.dlower[idx] if self.sense[idx] & LOWER
                               else self.dupper[idx])
                        term = self.sing_dir[j] * bnd
                        resid += term
                        scale += abs(term)
                    self.sense[last] &= ~ACTIVE
                    self.n_active -= 1
                    self.sing = False
                    if abs(resid) <= self.primal_tol * scale:
                        continue  # consistent redundant equality
                    return EXIT_OVERDETERMINED
                # Mutable singular activation: drop it and everything after
                exitflag = 1
                for j in range(i, self.m):
                    if self.sense[j] & ACTIVE and not any(
                            self.WS[t] == j for t in range(self.n_active - 1)):
                        if self.sense[j] & IMMUTABLE:
                            exitflag = EXIT_OVERDETERMINED
                        else:
                            self.sense[j] &= ~ACTIVE
                self.n_active -= 1
                self.sing = False
                return exitflag
        return 1

    def refine_active(self):
        """One step of iterative refinement (daqp_refine_active,
        auxiliary.c:497-588)."""
        k = self.n_active
        if k == 0:
            return
        ws = self.WS[:k]
        Mw = self.M[ws]
        d = np.where(self.sense[ws] & LOWER, self.dlower[ws], self.dupper[ws])
        r = Mw @ self.u - d
        soft = (self.sense[ws] & SOFT) > 0
        r = r - np.where(soft, self.rho_soft * self.lam_star[:k], 0.0)
        dlam = self.E[:k, :k] @ r
        self.lam_star[:k] += dlam
        self.u -= Mw.T @ dlam
        self.fval = self.soft_slack + float(self.u @ self.u)


def daqp_ldp(work: Workspace):
    """Core LDP active-set loop (daqp_ldp, src/daqp.c:6-108)."""
    exitflag = EXIT_ITERLIMIT
    tried_repair = False
    cycle_counter = 0
    best_fval = -1.0
    fval_bound = 2.0 * work.fval_bound
    it = 0
    for it in range(1, work.iter_limit):
        if not work.sing:
            work.compute_csp()
            if not work.remove_blocking():
                work.compute_primal_and_fval()
                if work.fval > fval_bound:
                    exitflag = EXIT_INFEASIBLE
                    break
                if not work.add_infeasible():
                    # Conditioning proxy: max diag of E ~ 1/min pivot.
                    k = work.n_active
                    max_diag = float(np.max(np.diag(work.E)[:k])) if k else 0.0
                    if (k > 2 and not tried_repair
                            and max_diag > 1.0 / work.refactor_tol):
                        tried_repair = True
                        # Correct LOWER/UPPER from lam sign (daqp.c:37-42)
                        for i in range(k):
                            if work.lam[i] >= 0:
                                work.sense[work.WS[i]] &= ~LOWER
                            else:
                                work.sense[work.WS[i]] |= LOWER
                        work.refactor()
                        continue
                    if k > 0 and max_diag > 1.0 / work.s('pivot_tol', 1e-6):
                        work.refine_active()
                        if work.add_infeasible():
                            continue
                    if work.soft_slack > work.primal_tol:
                        exitflag = EXIT_SOFT_OPTIMAL
                    else:
                        exitflag = EXIT_OPTIMAL
                    break
                # Cycle guard (daqp.c:66-85)
                if work.fval - best_fval < work.progress_tol:
                    cycle_counter += 1
                    if cycle_counter > work.cycle_tol:
                        if tried_repair:
                            exitflag = EXIT_CYCLE
                            break
                        tried_repair = True
                        work.refactor()
                        cycle_counter = 0
                        best_fval = -1.0
                else:
                    best_fval = work.fval
                    cycle_counter = 0
        else:
            if not work.remove_blocking():
                exitflag = EXIT_INFEASIBLE
                break
    work.iterations = it
    return exitflag


# ---------------------------------------------------------------------------
# QP -> LDP transform (src/utils.c:14-135) and full QP solve
# ---------------------------------------------------------------------------
def qp_to_ldp(H, f, A, bupper, blower, sense=None, ms=0, settings=None):
    """Build the normalized LDP: M, d, scaling, Rinv, v.

    H = R'R (upper Cholesky); M rows are [R^{-1}[:ms, :]; A R^{-1}]
    normalized to unit norm with scaling retained (utils.c:137-524).
    """
    H = np.asarray(H, dtype=float)
    n = H.shape[0]
    A = np.asarray(A, dtype=float).reshape(-1, n)
    m = ms + A.shape[0]
    f = np.zeros(n) if f is None else np.asarray(f, dtype=float)
    sense = np.zeros(m, dtype=int) if sense is None else np.asarray(
        sense, dtype=int).copy()

    R = np.linalg.cholesky(H).T            # upper triangular, H = R'R
    Rinv = np.linalg.solve(R, np.eye(n))   # upper triangular inverse
    v = np.linalg.solve(R.T, f)            # v = R^{-T} f
    M = np.vstack([Rinv[:ms, :], A @ Rinv]) if ms > 0 else A @ Rinv

    norms = np.linalg.norm(M, axis=1)
    zero_tol = (settings or {}).get('zero_tol', 1e-11)
    scaling = np.where(norms ** 2 < zero_tol, 1.0, 1.0 / np.maximum(norms, 1e-300))
    for i in range(m):
        if norms[i] ** 2 < zero_tol:
            sense[i] |= IMMUTABLE
        else:
            M[i] *= scaling[i]

    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    dupper = bu * scaling + M @ v
    dlower = bl * scaling + M @ v
    return M, dupper, dlower, scaling, Rinv, v, sense


def quadprog(H, f, A, bupper, blower, sense=None, ms=0, settings=None):
    """One-shot dense convex QP solve (daqp_quadprog, api.c:56-71)."""
    settings = settings or {}
    n = np.asarray(H).shape[0]
    m = ms + np.asarray(A).reshape(-1, n).shape[0]
    M, dupper, dlower, scaling, Rinv, v, sense2 = qp_to_ldp(
        H, f, A, bupper, blower, sense, ms, settings)

    # Auto-detect equalities (daqp_check_bounds, utils.c:457-478)
    bu = np.asarray(bupper, dtype=float)
    bl = np.asarray(blower, dtype=float)
    primal_tol = settings.get('primal_tol', 1e-6)
    zero_tol = settings.get('zero_tol', 1e-11)
    for i in range(m):
        if sense2[i] & IMMUTABLE:
            continue
        diff = bu[i] - bl[i]
        if diff < -primal_tol:
            return _failed_result(n, m, EXIT_INFEASIBLE)
        if diff < zero_tol and not (sense2[i] & SOFT):
            sense2[i] |= ACTIVE | IMMUTABLE

    work = Workspace(M, dupper, dlower, sense2, scaling, settings)
    flag = work.activate_constraints()
    if flag < 0:
        return _failed_result(n, m, flag)
    exitflag = daqp_ldp(work)
    work.compute_primal_and_fval() if work.n_active == 0 else None

    x = Rinv @ (work.u - v)
    lam = np.zeros(m)
    for i in range(work.n_active):
        lam[work.WS[i]] = work.lam_star[i] * scaling[work.WS[i]]
    fval = 0.5 * (work.fval - float(v @ v))
    return dict(x=x, lam=lam, fval=fval, exitflag=exitflag,
                iterations=work.iterations, workspace=work)


def _failed_result(n, m, flag):
    return dict(x=np.full(n, np.nan), lam=np.zeros(m), fval=np.nan,
                exitflag=flag, iterations=0, workspace=None)
