"""Public API: one-shot solves and the reusable ``Model`` interface.

Mirrors the reference Python binding surface (``interfaces/daqp-python/
daqp.pyx``: ``daqp.solve``, ``daqp.Model``) and the C API dispatch
(``daqp_solve``, src/api.c:8-53): proximal path for LPs/semidefinite H,
branch-and-bound when binary constraints are present, hierarchical QP when
break points are given, plain LDP otherwise.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import core as solve_mod
from .types import (BINARY, Settings, Result, default_settings_f32)


def _as_settings(settings, dtype) -> Settings:
    if settings is None:
        settings = (default_settings_f32() if dtype == jnp.float32
                    else Settings())
    elif isinstance(settings, dict):
        base = (default_settings_f32() if dtype == jnp.float32
                else Settings())
        settings = base._replace(**settings)
    return settings


@functools.partial(jax.jit, static_argnames=("ms", "is_lp", "bin_ids",
                                             "break_points", "is_avi",
                                             "K"))
def _solve_jit(H, f, A, bupper, blower, sense, st: Settings, ms: int,
               is_lp: bool, bin_ids: tuple, break_points,
               is_avi: bool = False, x0=None, deadline=None, K=None,
               Rinv=None, soft_weights=None):
    # Pin HIGHEST matmul precision for EVERY single-instance dispatch
    # path: TPU's default bf16 contractions silently corrupt f32 solver
    # math (observed 1e-1 primal errors) and the AVI/hierarchical/BnB/
    # prox cores run solver-critical GEMVs without per-call pinning.
    with jax.default_matmul_precision('highest'):
        if is_avi:
            from . import avi_solver as avi_mod
            return avi_mod.avi_core(H, f, A, bupper, blower, sense, ms, st,
                                    x0=x0, K=K, deadline=deadline)
        if bin_ids:
            from . import bnb
            return bnb.bnb_core(H, f, A, bupper, blower, sense, ms, st,
                                bin_ids=bin_ids, deadline=deadline, K=K)
        if break_points is not None and len(break_points) > 1:
            from . import hierarchical
            return hierarchical.hiqp_core(H, f, A, bupper, blower, sense,
                                          ms, break_points, st,
                                          deadline=deadline)
        if is_lp:
            from . import prox
            return prox.linprog_core(f, A, bupper, blower, sense, ms, st,
                                     x0=x0, deadline=deadline, K=K)
        from . import prox
        return prox.solve_convex_or_prox(H, f, A, bupper, blower, sense,
                                         ms, st, x0=x0, deadline=deadline,
                                         K=K, Rinv=Rinv,
                                         soft_weights=soft_weights)


def solve(H=None, f=None, A=None, bupper=None, blower=None, sense=None,
          ms: Optional[int] = None, break_points=None, settings=None,
          dtype=None, is_avi: bool = False, primal_start=None,
          dual_start=None, prefactored: bool = False, soft_weights=None):
    """One-shot solve; returns a ``Result``.

    Matches ``daqp.solve`` in the reference Python binding
    (interfaces/daqp-python/daqp.pyx:66-219): ``H=None`` solves an LP;
    binary sense bits trigger branch-and-bound; ``break_points`` triggers
    hierarchical least squares.  ``bupper``/``blower`` have length
    ms + A.shape[0]; the first ``ms`` entries bound x[:ms] directly.
    ``primal_start``/``dual_start`` warm-start the active set
    (``daqp_primal_init_active``/``daqp_dual_init_active``,
    api.c:555-609).
    """
    bupper = np.atleast_1d(np.asarray(bupper))
    blower = (np.full_like(bupper, -1e30) if blower is None
              else np.atleast_1d(np.asarray(blower)))
    if A is None or np.size(A) == 0:
        n = np.asarray(H).shape[0] if H is not None else len(bupper)
        A = np.zeros((0, n))
    A = np.atleast_2d(np.asarray(A))
    m = len(bupper)
    if ms is None:
        ms = m - A.shape[0]
    n = A.shape[1] if A.size else (np.asarray(H).shape[0] if H is not None
                                   else ms)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    st = _as_settings(settings, dtype)
    is_lp = H is None
    sense_arr = (np.zeros(m, np.int32) if sense is None
                 else np.asarray(sense, np.int32))
    if primal_start is not None:
        from . import warmstart
        sense_arr = np.asarray(warmstart.primal_init_active(
            np.asarray(primal_start, float), A, bupper, blower, sense_arr,
            int(ms)))
    if dual_start is not None:
        from . import warmstart
        sense_arr = np.asarray(warmstart.dual_init_active(
            np.asarray(dual_start, float), sense_arr))
    bin_ids = tuple(int(i) for i in np.where(sense_arr & BINARY)[0])
    bp = tuple(break_points) if break_points is not None else None

    Hj = None if is_lp else jnp.asarray(H, dtype)
    Rinv = None
    if prefactored and not is_lp:
        # H holds the upper Cholesky factor R (H = R'R): the reference's
        # problem_type == 2 path (utils.c:167-176, types.jl:38-44)
        import jax.scipy.linalg as jsl
        Rinv = jsl.solve_triangular(Hj, jnp.eye(n, dtype=dtype),
                                    lower=False)
        Hj = jnp.matmul(Hj.T, Hj, precision=jax.lax.Precision.HIGHEST)
    fj = jnp.zeros((n,), dtype) if f is None else jnp.asarray(f, dtype)
    x0 = (jnp.zeros((n,), dtype) if primal_start is None
          else jnp.asarray(primal_start, dtype))
    t0 = time.perf_counter()
    # A positive time limit compiles in the every-32-iterations wall-clock
    # check (daqp.c:95-103); deadline=None (static) compiles it out.
    deadline = (jnp.asarray(t0 + float(st.time_limit), jnp.float64)
                if float(st.time_limit) > 0 else None)
    # Working-set capacity n + ns + 1 (reference allocation api.c:288-305)
    ns = int(np.sum((sense_arr & 8) > 0))
    from .types import SoftWeights
    if soft_weights is None:
        sw = None
    elif isinstance(soft_weights, SoftWeights):
        sw = SoftWeights(*(jnp.asarray(v, dtype) for v in soft_weights))
    elif isinstance(soft_weights, dict):
        # SOFT_WEIGHTS slack data (types.h:168-180): omitted fields take
        # the reference defaults d = 0, rho = rho_soft (api.c:355-360)
        zm = np.zeros(m)
        rm_ = np.full(m, float(st.rho_soft))
        sw = SoftWeights(
            d_ls=jnp.asarray(soft_weights.get('d_ls', zm), dtype),
            d_us=jnp.asarray(soft_weights.get('d_us', zm), dtype),
            rho_ls=jnp.asarray(soft_weights.get('rho_ls', rm_), dtype),
            rho_us=jnp.asarray(soft_weights.get('rho_us', rm_), dtype))
    else:
        # plain per-constraint penalty weights (exact row-rescaling path)
        sw = jnp.asarray(soft_weights, dtype)
    out = _solve_jit(Hj, fj, jnp.asarray(A, dtype),
                     jnp.asarray(bupper, dtype), jnp.asarray(blower, dtype),
                     jnp.asarray(sense_arr), st, int(ms), is_lp, bin_ids,
                     bp, is_avi, x0, deadline, int(n) + ns + 1, Rinv, sw)
    out = jax.tree_util.tree_map(lambda x: x.block_until_ready()
                                 if hasattr(x, 'block_until_ready') else x,
                                 out)
    t1 = time.perf_counter()
    return Result(x=out.x, lam=out.lam, fval=out.fval, exitflag=out.exitflag,
                  iterations=out.iterations, soft_slack=out.soft_slack,
                  nodes=getattr(out, 'nodes', jnp.ones((), jnp.int32)),
                  solve_time=t1 - t0, setup_time=0.0)


def quadprog(H, f, A, bupper, blower, sense=None, ms=None, **kw):
    """Convex QP one-shot (reference ``daqp_quadprog``, api.c:56-71)."""
    return solve(H=H, f=f, A=A, bupper=bupper, blower=blower, sense=sense,
                 ms=ms, **kw)


def linprog(f, A, bupper, blower, sense=None, ms=None, **kw):
    """LP via adaptive proximal smoothing (reference ``quadprog`` with
    H=NULL -> daqp_prox, api.c:175-177)."""
    return solve(H=None, f=f, A=A, bupper=bupper, blower=blower, sense=sense,
                 ms=ms, **kw)


def avi(H, f, A, bupper, blower=None, sense=None, ms=None, **kw):
    """Affine variational inequality one-shot (reference ``daqp_avi``,
    api.c:73-77 / Julia ``DAQPBase.avi``)."""
    return solve(H=H, f=f, A=A, bupper=bupper, blower=blower, sense=sense,
                 ms=ms, is_avi=True, **kw)
