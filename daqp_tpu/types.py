"""Core data model: settings, constraint-sense flags, exit flags, problem/result.

Reproduces the semantic surface of the reference DAQP data model
(``include/types.h``, ``include/constants.h`` in darnstrom/daqp) with a
JAX-native representation: plain ``NamedTuple`` pytrees of fixed-shape arrays
so every structure can flow through ``jit``/``vmap``/``lax.while_loop``
without retracing.

Reference parity notes (file:line refer to /root/reference):
  * sense bit flags            include/constants.h:57-89
  * exit flags                 include/constants.h:37-45
  * default settings           include/constants.h:15-29, src/api.c:481-503
  * update masks               include/constants.h:48-54
  * DAQPProblem                include/types.h:14-50
  * DAQPResult                 include/api.h:14-26
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constraint sense bit flags (constants.h:57-89)
# ---------------------------------------------------------------------------
ACTIVE = 1        # constraint is in the working set
LOWER = 2         # active at its *lower* bound (else upper)
IMMUTABLE = 4     # cannot be activated/deactivated (equalities, ignored rows)
SOFT = 8          # violation allowed but penalized by rho_soft
BINARY = 16       # must be active at either bound (MIQP)
SLACK_FIXED = 32  # soft slack at its bound (SOFT_WEIGHTS builds only)

# ---------------------------------------------------------------------------
# Exit flags (constants.h:37-45)
# ---------------------------------------------------------------------------
EXIT_SOFT_OPTIMAL = 2
EXIT_OPTIMAL = 1
EXIT_INFEASIBLE = -1
EXIT_CYCLE = -2
EXIT_UNBOUNDED = -3
EXIT_ITERLIMIT = -4
EXIT_NONCONVEX = -5
EXIT_OVERDETERMINED_INITIAL = -6
EXIT_TIMELIMIT = -7
# TPU extension (no reference analogue, constants.h:37-45 ends at -7):
# the lane was routed to a compiled kernel variant that does not support
# its sense bits (e.g. SOFT rows through the hard-only Pallas kernel).
# Returned instead of a silently wrong answer; re-solve on a supporting
# path (solve_batch_flat_jit or has_soft=True).
EXIT_UNSUPPORTED = -9
# Internal sentinel: still running (never returned to the user).
EXIT_RUNNING = 99

EMPTY_IND = -1
UNCONSTRAINED_OPTIMAL = -2
DAQP_INF = 1e30

FLAG_TO_STATUS = {
    EXIT_SOFT_OPTIMAL: "soft_optimal",
    EXIT_OPTIMAL: "optimal",
    3: "no_dof_remaining",
    EXIT_INFEASIBLE: "infeasible",
    EXIT_CYCLE: "cycle",
    EXIT_UNBOUNDED: "unbounded",
    EXIT_ITERLIMIT: "iteration_limit",
    EXIT_NONCONVEX: "nonconvex",
    EXIT_OVERDETERMINED_INITIAL: "overdetermined_initial_working_set",
    EXIT_TIMELIMIT: "time_limit",
    EXIT_UNSUPPORTED: "unsupported_sense_for_kernel",
}

# ---------------------------------------------------------------------------
# Update masks for the masked incremental LDP update pipeline
# (constants.h:48-54, used by utils.c:14-135)
# ---------------------------------------------------------------------------
UPDATE_Rinv = 1
UPDATE_M = 2
UPDATE_v = 4
UPDATE_d = 8
UPDATE_sense = 16
UPDATE_hierarchy = 32
UPDATE_unconstrained = 64
UPDATE_ALL = (UPDATE_Rinv | UPDATE_M | UPDATE_v | UPDATE_d | UPDATE_sense
              | UPDATE_unconstrained)


class Settings(NamedTuple):
    """Solver settings: scalar fields, defaults from constants.h:15-29.

    All fields are carried as traced scalars inside jitted solves, so a
    compiled solver is reusable across settings values (only shapes trigger
    recompilation).
    """
    primal_tol: float = 1e-6
    dual_tol: float = 1e-12
    zero_tol: float = 1e-11
    pivot_tol: float = 1e-6
    progress_tol: float = 1e-14
    cycle_tol: int = 10
    iter_limit: int = 10000
    fval_bound: float = DAQP_INF
    eps_prox: float = 1e-6
    eta_prox: float = -1.0
    rho_soft: float = 1e-6
    rel_subopt: float = 0.0
    abs_subopt: float = 0.0
    sing_tol: float = 3.7e-11
    refactor_tol: float = 1e-9
    time_limit: float = 0.0
    # pricing rule: PRICING_DANTZIG (most violated, the reference C core's
    # only rule) or PRICING_BLAND (lowest index — the anti-cycling option
    # the reference's executable spec offers, daqp_julia.jl).  Traced
    # scalar: switching rules does not recompile.
    pricing: int = 0


PRICING_DANTZIG = 0
PRICING_BLAND = 1


def default_settings_f32() -> Settings:
    """Settings adapted to float32 arithmetic on TPU.

    The reference defaults assume double precision (dual_tol 1e-12 and
    sing_tol 3.7e-11 are below f32 resolution); these are the f32-safe
    equivalents, analogous to the reference's ``DAQP_SINGLE_PRECISION``
    compile flag (types.h:8-12).
    """
    return Settings(
        # 3e-5, not 1e-4: the pricing violation v = d - Mu carries
        # ~n*eps_f32*||u|| of measurement noise (~1e-5 at n <= 500), so
        # 3e-5 is resolvable — and 1e-4 measurably LOSES weakly-active
        # constraints (reference benchmark grid, round 4: n=100 err
        # 2.4e-4 at 1e-4 vs 5.4e-6 at 3e-5; n=500 4.1e-5; the whole
        # grid meets the reference's 1e-4 gate in pure f32 with clean
        # flags, benchmark.jl:39)
        primal_tol=3e-5,
        dual_tol=1e-6,
        zero_tol=1e-6,
        pivot_tol=1e-4,
        progress_tol=1e-7,
        sing_tol=1e-6,
        refactor_tol=1e-5,
        # rho_soft must sit clearly above sing_tol: a conflicting soft
        # constraint's Schur pivot equals rho and must not read as
        # singular (f64 keeps 1e-6 against sing_tol 3.7e-11)
        rho_soft=1e-4,
    )


class SoftWeights(NamedTuple):
    """Per-constraint soft-slack data (the reference's SOFT_WEIGHTS build,
    types.h:168-180): the softened objective is

        min 0.5 x'Hx + f'x + 0.5 su'su + 0.5 sl'sl

    with constraints  blower - rho_ls*sl <= Ax <= bupper + rho_us*su  and
    slack bounds  sl >= d_ls, su >= d_us.  The given bounds are assumed to
    already include the d_ls/d_us contribution (slacks start active at
    their bounds).  All arrays are length m; hard rows ignore them."""
    d_ls: jnp.ndarray
    d_us: jnp.ndarray
    rho_ls: jnp.ndarray
    rho_us: jnp.ndarray


class Problem(NamedTuple):
    """A dense QP instance (types.h:14-50).

    minimize    0.5 x' H x + f' x
    subject to  blower[:ms]  <=   x[:ms] <= bupper[:ms]
                blower[ms:]  <=   A x    <= bupper[ms:]

    H is None for LPs. A has shape (m - ms, n). ``sense`` carries the
    per-constraint bit flags. ``break_points`` (static tuple) defines
    hierarchy levels for lexicographic least squares.
    """
    H: Optional[jnp.ndarray]
    f: Optional[jnp.ndarray]
    A: jnp.ndarray
    bupper: jnp.ndarray
    blower: jnp.ndarray
    sense: Optional[jnp.ndarray] = None
    ms: int = 0
    break_points: Optional[tuple] = None


class Result(NamedTuple):
    """Solve result (include/api.h:14-26)."""
    x: jnp.ndarray
    lam: jnp.ndarray
    fval: jnp.ndarray
    exitflag: jnp.ndarray
    iterations: jnp.ndarray
    soft_slack: jnp.ndarray
    nodes: jnp.ndarray
    solve_time: float = 0.0
    setup_time: float = 0.0

    @property
    def status(self):
        try:
            return FLAG_TO_STATUS.get(int(self.exitflag), "unknown")
        except TypeError:
            return "traced"
