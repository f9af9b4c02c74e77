"""Batched QP solving: vmap over thousands of independent instances.

This is the scaling axis of the framework (reference DAQP is one QP per call
on one CPU core; see SURVEY.md §2.3): the entire transform + active-set
solve is vmapped over a struct-of-arrays batch, so the per-iteration masked
GEMVs become (B, K, K) x (B, K) batched GEMMs on the MXU, and the whole
batch runs in lockstep until every lane converges.

The rare repair/refinement numerics run as batched post-pass rounds between
lockstep sweeps (see ``ldp.batch_post_pass``) so they never tax the hot
loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import Settings, EXIT_OPTIMAL, EXIT_RUNNING


class BatchResult(NamedTuple):
    x: jnp.ndarray          # (B, n)
    lam: jnp.ndarray        # (B, m)
    fval: jnp.ndarray       # (B,)
    exitflag: jnp.ndarray   # (B,) int32
    iterations: jnp.ndarray  # (B,) int32
    soft_slack: jnp.ndarray  # (B,)


def _solve_one(H, f, A, bupper, blower, sense, ms: int, st: Settings,
               K: int, repair_rounds: int):
    """Single-lane body for vmap: transform + warm activate + batched-mode
    LDP with deferred repair rounds + extraction."""
    ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st)
    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    act_flag, state = ldp_mod.activate_constraints(state, st)
    unc_ok, _ = transform.check_unconstrained(
        ldpd._replace(sense=state.sense), st)
    pre = jnp.where(ldpd.error < 0, ldpd.error,
                    jnp.where(act_flag < 0, act_flag,
                              jnp.where(unc_ok, EXIT_OPTIMAL, EXIT_RUNNING)))
    state = state._replace(status=pre.astype(jnp.int32))
    state = ldp_mod.ldp_solve_batched_lane(state, st, rounds=repair_rounds)

    x = transform.ldp_to_qp_solution(ldpd, state.u)
    lam = solve_mod.extract_duals(state)
    fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
    return BatchResult(x=x, lam=lam, fval=fval,
                       exitflag=state.status, iterations=state.iterations,
                       soft_slack=state.soft_slack)


@functools.partial(jax.jit,
                   static_argnames=("ms", "K", "repair_rounds"))
def solve_batch_jit(H, f, A, bupper, blower, sense, st: Settings,
                    ms: int = 0, K: Optional[int] = None,
                    repair_rounds: int = 2) -> BatchResult:
    """Jitted batched strictly-convex QP solve.

    All arrays carry a leading batch dimension B; (n, m, ms) are shared
    across the batch (pad instances to common dimensions as needed).
    Semidefinite H is NOT handled here (use ``api.solve`` per instance or
    the batched prox driver); the Hessians must be PD like the reference's
    plain ``daqp_ldp`` dispatch path (api.c:16-32 with n_prox == 0).
    """
    n = A.shape[-1]
    if K is None:
        K = n + 1
    fn = functools.partial(_solve_one, ms=ms, st=st, K=K,
                           repair_rounds=repair_rounds)
    return jax.vmap(fn)(H, f, A, bupper, blower, sense)


def solve_batch(H, f, A, bupper, blower, sense=None, ms: int = 0,
                settings: Optional[Settings] = None,
                repair_rounds: int = 2) -> BatchResult:
    """Convenience wrapper: batched dense strictly-convex QP solve."""
    H = jnp.asarray(H)
    B = H.shape[0]
    m = jnp.asarray(bupper).shape[-1]
    dtype = H.dtype
    if sense is None:
        sense = jnp.zeros((B, m), jnp.int32)
    if settings is None:
        from .api import _as_settings
        settings = _as_settings(None, dtype)
    return solve_batch_jit(H, jnp.asarray(f), jnp.asarray(A),
                           jnp.asarray(bupper), jnp.asarray(blower),
                           jnp.asarray(sense), settings, ms=ms,
                           repair_rounds=repair_rounds)
