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
from .types import (BINARY, EXIT_TIMELIMIT, Settings, Result,
                    default_settings_f32)


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
          dual_start=None, prefactored: bool = False, soft_weights=None,
          f64_backstop: Optional[bool] = None):
    """One-shot solve; returns a ``Result``.

    Matches ``daqp.solve`` in the reference Python binding
    (interfaces/daqp-python/daqp.pyx:66-219): ``H=None`` solves an LP;
    binary sense bits trigger branch-and-bound; ``break_points`` triggers
    hierarchical least squares.  ``bupper``/``blower`` have length
    ms + A.shape[0]; the first ``ms`` entries bound x[:ms] directly.
    ``primal_start``/``dual_start`` warm-start the active set
    (``daqp_primal_init_active``/``daqp_dual_init_active``,
    api.c:555-609).

    ``f64_backstop``: when the f32 solve exits with a negative flag
    (other than the time limit), re-solve once in f64 — on TPU via
    XLA's emulated f64, exactly like ``batch.backstop_resolve`` for the
    batch tiers.  Default (None) enables it for LPs only: the adaptive
    proximal LP path drives the inner dual active-set through hundreds
    of near-degenerate projections where f32 legitimately runs out of
    precision (measured: half the reference LP grid's n=50 instances
    fail in f32 on CPU and TPU alike, and all pass in f64), while the
    QP paths are f32-robust.  Costs one host read of ``exitflag`` per
    call; pass False for pipelined latency-critical callers.
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
    # No forced device sync here: a per-leaf block_until_ready cost one
    # tunnel round trip PER RESULT FIELD on a remote TPU (measured ~850 ms
    # per 10-var solve through the axon tunnel, i.e. ~50x the compute),
    # and serialized pipelined callers.  Results are JAX arrays; touching
    # them (np.asarray) syncs naturally.  ``solve_time`` is therefore
    # enqueue time; for device-accurate stage timing use
    # scripts/profile_stages.py (the reference's PROFILING flag analogue).
    t1 = time.perf_counter()
    res = Result(x=out.x, lam=out.lam, fval=out.fval, exitflag=out.exitflag,
                 iterations=out.iterations, soft_slack=out.soft_slack,
                 nodes=getattr(out, 'nodes', jnp.ones((), jnp.int32)),
                 solve_time=t1 - t0, setup_time=0.0)
    if f64_backstop is None:
        f64_backstop = is_lp
    escalate = False
    if f64_backstop and dtype == jnp.float32:
        flag = int(res.exitflag)
        escalate = flag < 0 and flag != EXIT_TIMELIMIT
        if not escalate and flag > 0 and is_lp:
            # An f32 LP can exit CLEAN at a wrong vertex (observed
            # 5.6e-3 primal error with flag 1 on the reference grid's
            # n=50 LPs): verify every clean f32 LP exit with the f64
            # host KKT gate used by batch.backstop_resolve and escalate
            # dubious ones.
            from .batch import kkt_residuals
            Hz = np.zeros((1, n, n))
            stat, viol = kkt_residuals(
                Hz, np.asarray(f, float)[None] if f is not None
                else np.zeros((1, n)),
                A[None], np.asarray(bupper, float)[None],
                np.asarray(blower, float)[None], sense_arr[None],
                np.asarray(res.x, float)[None],
                np.asarray(res.lam, float)[None], ms=int(ms))
            # 1e-5, tighter than the batch backstop's 1e-4: at a nearly
            # degenerate LP vertex an f32 exit with stat ~3e-5 was a
            # KKT-certified NEIGHBOR vertex 5.6e-3 away in x — within
            # weak-duality tolerance but not the vertex the reference
            # (in f64) returns.  Honest f32 exits sit at stat ~1e-6.
            escalate = bool(max(stat[0], viol[0]) > 1e-5)
    if escalate:
        with jax.enable_x64(True):
            return solve(H=H, f=f, A=A, bupper=bupper, blower=blower,
                         sense=sense_arr, ms=ms, break_points=break_points,
                         settings=settings, dtype=jnp.float64,
                         is_avi=is_avi, prefactored=prefactored,
                         soft_weights=soft_weights, f64_backstop=False)
    return res


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
