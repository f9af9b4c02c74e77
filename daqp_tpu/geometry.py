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
