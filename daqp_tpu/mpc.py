"""MPC-style repeated solves: solver state carried through ``lax.scan``.

The reference's defining embedded use case (docs/docs/c.md:60-73,
SURVEY.md §3.5) is the warm-started re-solve loop: every control period
only f and the bounds change (mask UPDATE_v | UPDATE_d), the
factorization and working set persist, and each solve typically changes
the active set by 0-2 constraints.

``Model.update``/``Model.solve`` expose that loop from the host; this
module runs the WHOLE horizon inside one jitted ``lax.scan`` — zero
host round-trips, one compilation, the LDP workspace (working set +
inverse Gram) carried warm from step to step.  ``vmap`` the scan for a
batch of scenario rollouts.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from .types import Settings, EXIT_RUNNING


class MPCStep(NamedTuple):
    x: jnp.ndarray           # (T, n)
    fval: jnp.ndarray        # (T,)
    exitflag: jnp.ndarray    # (T,) int32
    iterations: jnp.ndarray  # (T,) int32


@functools.partial(jax.jit, static_argnames=("ms",))
def solve_mpc_scan(H, A, f_seq, bupper_seq, blower_seq, st: Settings,
                   ms: int = 0) -> MPCStep:
    """Solve a whole horizon of QPs sharing (H, A): per step t, recompute
    only v and d (``daqp_update_ldp`` with UPDATE_v | UPDATE_d,
    utils.c:14-135) and warm re-solve from the previous step's working
    set.

    f_seq: (T, n); bupper_seq/blower_seq: (T, m).  Returns per-step
    primal solutions, objective values, exit flags and iteration counts
    (the iteration counts are the interesting output: at a slowly varying
    reference they should sit at 1-3).
    """
    n = A.shape[-1] if A.size else H.shape[0]
    st0 = st
    # HIGHEST matmul precision: solver-critical contractions in the scan
    # body must not run at TPU's bf16 default (see CLAUDE.md invariant).
    with jax.default_matmul_precision('highest'):
        ldpd0 = transform.build_ldp(H, f_seq[0], A, bupper_seq[0],
                                    blower_seq[0], None, ms, st0)
        state0 = ldp_mod.init_state(ldpd0.M, ldpd0.dupper, ldpd0.dlower,
                                    ldpd0.sense, ldpd0.scaling, K=n + 1)

        def step(state, inp):
            f_t, bu_t, bl_t = inp
            ldpd = transform.update_vd(ldpd0, f_t, bu_t, bl_t)
            state = state._replace(
                dupper=ldpd.dupper, dlower=ldpd.dlower,
                status=jnp.asarray(EXIT_RUNNING, jnp.int32),
                iterations=jnp.zeros((), jnp.int32),
                tried_repair=jnp.zeros((), bool),
                cycle_counter=jnp.zeros((), jnp.int32),
                best_fval=jnp.asarray(-1.0, state.fval.dtype))
            state = ldp_mod.ldp_solve(state, st0, reset=False)
            x = transform.ldp_to_qp_solution(ldpd, state.u)
            fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
            out = (x, fval, state.status,
                   jnp.maximum(state.iterations, 1))
            return state, out

        _, (xs, fvals, flags, iters) = lax.scan(
            step, state0, (f_seq, bupper_seq, blower_seq))
        return MPCStep(x=xs, fval=fvals, exitflag=flags, iterations=iters)
