"""Jit-compiled end-to-end QP solve: transform -> activate -> LDP -> extract.

This is the functional core under the public API (``daqp_tpu.api``); it is a
pure function of arrays so it composes with ``jit``/``vmap``/``shard_map``.
Reference call stack: ``daqp_quadprog`` (src/api.c:56-71) ->
``setup_daqp_ldp``/``daqp_update_ldp`` -> ``daqp_solve`` -> extract.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from .types import (ACTIVE, IMMUTABLE, Settings, EXIT_OPTIMAL, EXIT_RUNNING,
                    EXIT_SOFT_OPTIMAL)


class SolveOut(NamedTuple):
    x: jnp.ndarray          # (n,)
    lam: jnp.ndarray        # (m,) duals in original QP space
    fval: jnp.ndarray       # ()
    exitflag: jnp.ndarray   # () int32
    iterations: jnp.ndarray  # () int32
    soft_slack: jnp.ndarray  # ()
    state: ldp_mod.LDPState  # final workspace (for warm restarts/inspection)


def extract_duals(state: ldp_mod.LDPState) -> jnp.ndarray:
    """Scatter working-set duals back to a dense (m,) vector, rescaled to the
    original constraint rows (``ldp2qp_solution`` scaling fix-up,
    daqp.c:135-138, + ``daqp_extract_result``, api.c:449-453)."""
    m = state.M.shape[0]
    K = state.E.shape[0]
    mask = jnp.arange(K) < state.n_active
    idx = jnp.where(mask, state.WS, m)
    vals = state.lam_star * state.scaling[jnp.clip(state.WS, 0, m - 1)]
    lam = jnp.zeros((m,), state.lam.dtype)
    return lam.at[idx].set(jnp.where(mask, vals, 0), mode='drop')


def quadprog_core(H, f, A, bupper, blower, sense, ms: int, st: Settings,
                  K: Optional[int] = None, Rinv=None, check_unc: bool = True):
    """Dense convex QP one-shot solve (jit-friendly; static: ms, K, shapes).

    The unconstrained-optimum shortcut (``daqp_check_unconstrained``,
    utils.c:529-598) short-circuits the active-set loop by pre-setting a
    terminal status, so the ``while_loop`` exits after zero iterations.
    """
    n = A.shape[1] if A.size else H.shape[0]
    m = ms + (A.shape[0] if A.ndim == 2 else 0)
    if K is None:
        K = n + 1
    ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st,
                               Rinv=Rinv)

    act_flag, state = _solve_from_ldp(ldpd, st, K, check_unc=check_unc)

    x = transform.ldp_to_qp_solution(ldpd, state.u)
    lam = extract_duals(state)
    fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
    exitflag = jnp.where(ldpd.error < 0, ldpd.error, state.status)
    return SolveOut(x=x, lam=lam, fval=fval,
                    exitflag=exitflag.astype(jnp.int32),
                    iterations=state.iterations,
                    soft_slack=state.soft_slack, state=state)


def _solve_from_ldp(ldpd, st, K, check_unc=True, in_bnb=False):
    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    if in_bnb:
        state = state._replace(in_bnb=jnp.ones((), bool))
    act_flag, state = ldp_mod.activate_constraints(state, st)

    if check_unc:
        unc_feasible, _ = transform.check_unconstrained(
            ldpd._replace(sense=state.sense), st)
        # u = 0 is already the init; status OPTIMAL skips the loop entirely.
        pre_status = jnp.where(
            unc_feasible, EXIT_OPTIMAL,
            jnp.where(act_flag < 0, act_flag, EXIT_RUNNING))
    else:
        pre_status = jnp.where(act_flag < 0, act_flag, EXIT_RUNNING)
    # Transform-level errors also short-circuit.
    pre_status = jnp.where(ldpd.error < 0, ldpd.error, pre_status)
    state = state._replace(status=pre_status.astype(jnp.int32))
    state = ldp_mod.ldp_solve(state, st)
    return act_flag, state
