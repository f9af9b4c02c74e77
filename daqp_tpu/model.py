"""Reusable ``Model``: setup once, solve repeatedly with masked updates.

Mirrors the reference binding surface (Python ``daqp.Model``,
interfaces/daqp-python/daqp.pyx:220-631; Julia ``DAQPBase.Model``,
interfaces/daqp-julia/src/api.jl:198-415) and the C update-mask contract
(``daqp_update_ldp``, src/utils.c:14-135):

  * ``update`` with only f / bupper / blower recomputes v and d ONLY,
    keeping Rinv, M, the working set and the inverse Gram — the warm
    MPC re-solve path (docs/docs/c.md:60-73), typically 0-2 active-set
    changes per solve;
  * updating H, A, or sense rebuilds the LDP (masks UPDATE_Rinv/M/sense)
    and cold-starts the next solve.

The solver state (``LDPState``) is carried across ``solve`` calls, so a
re-solve at the optimum terminates in one iteration, matching the
reference's warm-start tests (core_tests.jl:449-496).
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import core as core_mod
from . import ldp as ldp_mod
from . import transform
from . import warmstart
from .types import (BINARY, Settings, Result, EXIT_RUNNING)


@functools.partial(jax.jit, static_argnames=("K",))
def _cold_solve_from_ldp(ldpd, st: Settings, K=None):
    """Plain-QP cold solve from a prebuilt LDP (state returned for warm
    restarts).  ``K`` is the working-set capacity n + ns + 1
    (api.c:288-305); the Model caller computes it from concrete sense."""
    with jax.default_matmul_precision('highest'):
        n = ldpd.M.shape[1]
        state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower,
                                   ldpd.sense, ldpd.scaling,
                                   K=n + 1 if K is None else K)
        act_flag, state = ldp_mod.activate_constraints(state, st)
        unc_ok, _ = transform.check_unconstrained(
            ldpd._replace(sense=state.sense), st)
        from .types import EXIT_OPTIMAL
        pre = jnp.where(
            ldpd.error < 0, ldpd.error,
            jnp.where(act_flag < 0, act_flag,
                      jnp.where(unc_ok, EXIT_OPTIMAL, EXIT_RUNNING)))
        state = state._replace(status=pre.astype(jnp.int32))
        state = ldp_mod.ldp_solve(state, st)
        return _extract(ldpd, state)


@jax.jit
def _warm_resolve(ldpd, state, st: Settings):
    """Warm re-solve after a v/d-only update: the working set, inverse Gram
    and sense persist; only the bounds change (utils.c:410-455 semantics —
    ``reuse_ind`` invalidation maps to recomputing the CSP)."""
    with jax.default_matmul_precision('highest'):
        state = state._replace(
            dupper=ldpd.dupper, dlower=ldpd.dlower,
            status=jnp.asarray(EXIT_RUNNING, jnp.int32),
            iterations=jnp.zeros((), jnp.int32),
            tried_repair=jnp.zeros((), jnp.int32),
            cycle_counter=jnp.zeros((), jnp.int32),
            best_fval=jnp.asarray(-1.0, state.fval.dtype))
        state = ldp_mod.ldp_solve(state, st, reset=False)
        return _extract(ldpd, state)


def _extract(ldpd, state):
    x = transform.ldp_to_qp_solution(ldpd, state.u)
    lam = core_mod.extract_duals(state)
    fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
    return core_mod.SolveOut(
        x=x, lam=lam, fval=fval, exitflag=state.status,
        iterations=jnp.maximum(state.iterations, 1),
        soft_slack=state.soft_slack, state=state)


class Model:
    """Reusable solver object with persistent warm-start state."""

    def __init__(self, settings=None):
        self._settings = settings
        self._ldpd = None
        self._state = None
        self._special = False   # bnb / hierarchy / avi / LP path
        self._args = None

    # -- setup ------------------------------------------------------------
    def setup(self, H, f, A, bupper, blower=None, sense=None, ms=None,
              break_points=None, is_avi=False, primal_start=None,
              dual_start=None, dtype=None):
        H = None if (H is None or np.size(H) == 0) else np.asarray(H)
        f = None if (f is None or np.size(f) == 0) else np.asarray(f)
        bupper = np.atleast_1d(np.asarray(bupper, float))
        blower = (np.full_like(bupper, -1e30) if blower is None
                  else np.atleast_1d(np.asarray(blower, float)))
        A = np.zeros((0, H.shape[0] if H is not None else len(bupper))) \
            if A is None or np.size(A) == 0 else np.atleast_2d(np.asarray(A))
        m = len(bupper)
        if ms is None:
            ms = m - A.shape[0]
        sense = (np.zeros(m, np.int32) if sense is None
                 else np.array(sense, np.int32))
        if primal_start is not None:
            sense = np.asarray(warmstart.primal_init_active(
                primal_start, A, bupper, blower, sense, int(ms)))
        if dual_start is not None:
            sense = np.asarray(warmstart.dual_init_active(dual_start, sense))
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 \
                else jnp.float32
        from .api import _as_settings
        st = _as_settings(self._settings, dtype)
        self._st = st
        self._dtype = dtype
        self._ms = int(ms)
        self._H, self._f, self._A = H, f, A
        self._bupper, self._blower, self._sense = bupper, blower, sense
        self._break_points = (tuple(int(b) for b in break_points)
                              if break_points is not None else None)
        self._is_avi = bool(is_avi)
        self._x0 = (np.asarray(primal_start, float)
                    if primal_start is not None else None)
        self._bin_ids = tuple(int(i) for i in np.where(sense & BINARY)[0])
        self._special = (self._is_avi or bool(self._bin_ids)
                         or (self._break_points is not None
                             and len(self._break_points) > 1)
                         or H is None)
        if not self._special:
            self._ldpd = transform.build_ldp(
                jnp.asarray(H, dtype),
                None if f is None else jnp.asarray(f, dtype),
                jnp.asarray(A, dtype), jnp.asarray(bupper, dtype),
                jnp.asarray(blower, dtype), jnp.asarray(sense), self._ms,
                st)
            self._special = int(self._ldpd.n_prox) > 0  # semidefinite H
        self._state = None
        return self

    def proximal_regularization(self) -> float:
        """Effective proximal regularization of the set-up workspace
        (``daqp_get_proximal_regularization``, utils.c:299-343): 0 for a
        PD Hessian, the applied eps*2^k shift for a dense singular one,
        recoverable purely from the factor (see
        ``transform.get_proximal_regularization``)."""
        if not hasattr(self, '_st'):
            raise RuntimeError("proximal_regularization() before setup()")
        if getattr(self, '_ldpd', None) is None:
            return 0.0
        return float(transform.get_proximal_regularization(self._ldpd))

    # -- solve ------------------------------------------------------------
    def solve(self) -> Result:
        if not hasattr(self, '_st'):
            raise RuntimeError("Model.solve() before Model.setup()")
        t0 = time.perf_counter()
        if self._special:
            from .api import solve as api_solve
            res = api_solve(H=self._H, f=self._f, A=self._A,
                            bupper=self._bupper, blower=self._blower,
                            sense=self._sense, ms=self._ms,
                            break_points=self._break_points,
                            settings=self._st, is_avi=self._is_avi,
                            primal_start=self._x0)
            return res
        if self._state is None:
            from .types import SOFT
            n = self._A.shape[1] if self._A.size else len(self._bupper)
            K = int(n + np.sum((self._sense & SOFT) > 0) + 1)
            out = _cold_solve_from_ldp(self._ldpd, self._st, K=K)
        else:
            out = _warm_resolve(self._ldpd, self._state, self._st)
        out = jax.block_until_ready(out)
        self._state = out.state
        t1 = time.perf_counter()
        return Result(x=out.x, lam=out.lam, fval=out.fval,
                      exitflag=out.exitflag, iterations=out.iterations,
                      soft_slack=out.soft_slack,
                      nodes=jnp.ones((), jnp.int32),
                      solve_time=t1 - t0, setup_time=0.0)

    # -- update -----------------------------------------------------------
    def update(self, H=None, f=None, A=None, bupper=None, blower=None,
               sense=None, break_points=None):
        """Masked update (``daqp_update_ldp``, utils.c:14-135): pass only
        what changed.  Each mask reuses everything upstream of it:

          * f / bupper / blower — recompute v and d only; factorization,
            M, and the warm working set persist (UPDATE_v | UPDATE_d);
          * sense — swap the sense bits (with auto-equality / zero-row
            bits re-derived) and reset the working set for re-activation;
            NO refactorization, no M/v/d rebuild (UPDATE_sense,
            utils.c:31-39);
          * A — rebuild M/d reusing the existing Rinv factorization
            (UPDATE_M, utils.c:72-76: daqp_update_M with the cached
            R^{-1});
          * break_points — swap the hierarchy levels in place
            (UPDATE_hierarchy, utils.c:115-118);
          * H — full re-setup (UPDATE_Rinv refactors, and everything
            downstream is derived from it)."""
        h_changed = H is not None and np.size(H) > 0
        a_changed = A is not None and np.size(A) > 0
        if f is not None:
            self._f = np.asarray(f)
        if bupper is not None:
            self._bupper = np.atleast_1d(np.asarray(bupper, float))
        if blower is not None:
            self._blower = np.atleast_1d(np.asarray(blower, float))
        if h_changed:
            self._H = np.asarray(H)
        if a_changed:
            self._A = np.atleast_2d(np.asarray(A))
        was_binary = bool(self._bin_ids)
        if sense is not None:
            self._sense = np.array(sense, np.int32)
            self._bin_ids = tuple(
                int(i) for i in np.where(self._sense & BINARY)[0])
        if break_points is not None:
            new_bp = tuple(int(b) for b in break_points)
            bp_mode_change = (len(new_bp) > 1) != (
                self._break_points is not None
                and len(self._break_points) > 1)
            self._break_points = new_bp
        else:
            bp_mode_change = False

        if (h_changed or self._special or bp_mode_change
                or (sense is not None
                    and (bool(self._bin_ids) or was_binary))):
            return self.setup(self._H, self._f, self._A, self._bupper,
                              self._blower, self._sense, ms=self._ms,
                              break_points=self._break_points,
                              is_avi=self._is_avi, dtype=self._dtype)

        dt = self._dtype
        if a_changed:
            # UPDATE_M: rebuild M and d against the CACHED factorization
            # (build_ldp's prefactored path skips the Cholesky)
            self._ldpd = transform.build_ldp(
                jnp.asarray(self._H, dt),
                None if self._f is None else jnp.asarray(self._f, dt),
                jnp.asarray(self._A, dt), jnp.asarray(self._bupper, dt),
                jnp.asarray(self._blower, dt), jnp.asarray(self._sense),
                self._ms, self._st, Rinv=self._ldpd.Rinv)
            self._state = None              # geometry changed: cold start
            return self
        if sense is not None:
            # UPDATE_sense: swap bits, reset the working set (the
            # reference's reset + re-activate, utils.c:119-133); the next
            # solve() cold-starts from the kept M/Rinv/v/d
            self._ldpd = transform.update_sense(
                self._ldpd, jnp.asarray(self._sense),
                jnp.asarray(self._bupper, dt),
                jnp.asarray(self._blower, dt), self._st)
            self._state = None
            if f is None and bupper is None and blower is None:
                return self
        # v/d-only refresh (mask UPDATE_v | UPDATE_d)
        self._ldpd = transform.update_vd(
            self._ldpd,
            None if self._f is None else jnp.asarray(self._f, dt),
            jnp.asarray(self._bupper, dt), jnp.asarray(self._blower, dt))
        return self

    # -- codegen ----------------------------------------------------------
    def codegen(self, name="daqp_embedded", dir="."):
        """Render the model's problem into standalone embedded C
        (reference ``DAQPBase.codegen``, api.jl:393-404 ->
        codegen/codegen.c).  Returns the generated .c path."""
        from . import codegen as cg
        return cg.render_c(self._H, self._f, self._A, self._bupper,
                           self._blower, name=name, dir=dir,
                           sense=self._sense, ms=self._ms,
                           settings=self._settings)

    # -- settings ---------------------------------------------------------
    def settings(self, updates: Optional[dict] = None) -> dict:
        from .api import _as_settings
        st = _as_settings(self._settings, getattr(self, '_dtype',
                                                  jnp.float64))
        if updates:
            st = st._replace(**updates)
            self._settings = st
            if hasattr(self, '_st'):
                self._st = st
        return st._asdict()
