"""Minimal representation of a polyhedron {x : x[:ms] <= b[:ms], A x <= b[ms:]}.

Reference: ``daqp_minrep`` (src/api.c:507-534) + ``daqp_minrep_work``
(src/utils.c:699-726): constraint i is redundant iff forcing it active
(equality) makes the feasibility LDP infeasible.  The reference runs the m
feasibility solves sequentially with an early-out bookkeeping; here the m
solves are independent and run as one ``vmap`` batch — the embarrassing
parallelism called out in SURVEY.md §2.3 — which leaves the result
unchanged (a row active at any feasible optimum is itself non-redundant and
would test feasible on its own).

Rows are used unnormalized, exactly like the reference (which aliases the
raw A/b into the workspace M/dupper).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ldp as ldp_mod
from .types import (ACTIVE, IMMUTABLE, Settings, DAQP_INF, EXIT_INFEASIBLE)


@functools.partial(jax.jit, static_argnames=("ms",))
def minrep_core(A, b, ms: int, st: Settings):
    A = jnp.atleast_2d(A)
    m = b.shape[0]
    n = A.shape[1]
    dtype = A.dtype
    if ms > 0:
        M = jnp.concatenate([jnp.eye(n, dtype=dtype)[:ms], A], axis=0)
    else:
        M = A
    dlower = jnp.full((m,), -DAQP_INF, dtype)

    def one(i):
        sense = jnp.where(jnp.arange(m) == i, ACTIVE | IMMUTABLE,
                          0).astype(jnp.int32)
        state = ldp_mod.init_state(M, b, dlower, sense, K=n + 1)
        flag, state = ldp_mod.activate_constraints(state, st)
        state = ldp_mod.ldp_solve(state, st)
        return state.status == EXIT_INFEASIBLE

    return jax.vmap(one)(jnp.arange(m)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ms",))
def feasibility_core(A, bupper, blower, sense, ms: int, st: Settings):
    """Raw LDP feasibility solve: min ||u|| s.t. dl <= [u[:ms]; A u] <= du.

    The reference exposes this as the raw C workspace interface used for
    explicit-MPC region queries (Julia ``init_c_workspace_ldp`` /
    ``isfeasible``, api.jl:417-466).  Returns (feasible, farkas_err,
    state): on infeasibility the working set holds a Farkas certificate
    lam >= 0 with A_W' lam = 0 and b_W' lam < 0 whose residual
    ``|b_W' lam| + ||A_W' lam||`` is returned for validation
    (api.jl:450-462).
    """
    from .types import EXIT_INFEASIBLE
    A = jnp.atleast_2d(A)
    m = bupper.shape[0]
    n = A.shape[1]
    dtype = A.dtype
    if ms > 0:
        M = jnp.concatenate([jnp.eye(n, dtype=dtype)[:ms], A], axis=0)
    else:
        M = A
    state = ldp_mod.init_state(M, bupper, blower, sense, K=n + 1)
    flag, state = ldp_mod.activate_constraints(state, st)
    state = ldp_mod.ldp_solve(state, st)
    feasible = state.status > 0

    K = state.E.shape[0]
    mask = jnp.arange(K) < state.n_active
    lam = jnp.where(mask, state.lam_star, 0)
    sw = state.sense[state.WS]
    b_W = jnp.where((sw & 2) > 0, blower[jnp.clip(state.WS, 0, m - 1)],
                    bupper[jnp.clip(state.WS, 0, m - 1)])
    b_W = jnp.where(mask, b_W, 0)
    ray = jnp.matmul(state.Mw.T, lam)
    farkas_err = jnp.abs(b_W @ lam) * 0 + (b_W @ lam) \
        + jnp.linalg.norm(ray)
    farkas_err = jnp.where(state.status == EXIT_INFEASIBLE, farkas_err,
                           jnp.zeros((), dtype))
    return feasible, farkas_err, state


def isfeasible(A, bupper, blower, ms=None, sense=None, settings=None,
               validate=False):
    """True iff the polyhedron {u : bl <= [u[:ms]; A u] <= bu} is nonempty
    (reference ``isfeasible``, api.jl:444-466).  With ``validate=True`` an
    infeasibility verdict is checked against its Farkas certificate."""
    import numpy as np
    A = np.atleast_2d(np.asarray(A, float))
    bupper = np.atleast_1d(np.asarray(bupper, float))
    blower = np.atleast_1d(np.asarray(blower, float))
    if ms is None:
        ms = len(bupper) - A.shape[0]
    if sense is None:
        sense = np.zeros(len(bupper), np.int32)
    from .api import _as_settings
    st = _as_settings(settings, jnp.asarray(bupper).dtype) \
        if settings is None or isinstance(settings, dict) else settings
    ok, err, _ = feasibility_core(jnp.asarray(A), jnp.asarray(bupper),
                                  jnp.asarray(blower),
                                  jnp.asarray(sense, jnp.int32),
                                  int(ms), st)
    if validate and not bool(ok):
        # certificate: b_W'lam + ||A_W'lam|| should be <= 0 (up to tol)
        assert float(err) <= 1e-6, \
            f"Farkas certificate validation failed (err={float(err)})"
    return bool(ok)


def minrep(A, b, ms=None, settings=None):
    """Return an (m,) int array: 1 = redundant, 0 = necessary (mirrors the
    Python binding ``daqp.minrep``, interfaces/daqp-python/daqp.pyx:635-651).
    """
    import numpy as np
    A = np.atleast_2d(np.asarray(A, float))
    b = np.atleast_1d(np.asarray(b, float))
    if ms is None:
        ms = len(b) - A.shape[0]
    from .api import _as_settings
    st = _as_settings(settings, jnp.asarray(b).dtype) \
        if settings is None or isinstance(settings, dict) else settings
    return np.asarray(minrep_core(jnp.asarray(A), jnp.asarray(b), int(ms),
                                  st))
