"""daqp_tpu: a TPU-native dual active-set QP solver framework (JAX/XLA/Pallas).

Capabilities mirror darnstrom/daqp: dense convex QPs with box + general
two-sided linear constraints, LPs and semidefinite-Hessian QPs via
proximal-point outer iterations, hierarchical least squares, soft/equality/
binary constraints, warm starting, and MIQP branch-and-bound — redesigned
batch-first for TPU: fixed-shape masked workspaces under ``jit``/``vmap``,
batched GEMM inner ops on the MXU, and mesh-sharded batches via ``shard_map``.
"""
from .types import (Settings, Problem, Result, default_settings_f32,
                    ACTIVE, LOWER, IMMUTABLE, SOFT, BINARY,
                    EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL, EXIT_INFEASIBLE,
                    EXIT_CYCLE, EXIT_UNBOUNDED, EXIT_ITERLIMIT,
                    EXIT_NONCONVEX, EXIT_OVERDETERMINED_INITIAL,
                    EXIT_TIMELIMIT, FLAG_TO_STATUS,
                    PRICING_DANTZIG, PRICING_BLAND)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import daqp_tpu` light.  (Exposed names never
    # collide with submodule names — see the solve.py->core.py rename.)
    if name in ("solve", "quadprog", "linprog", "avi"):
        from . import api
        fn = getattr(api, name)
        globals()[name] = fn
        return fn
    if name == "Model":
        from .model import Model
        globals()[name] = Model
        return Model
    if name == "minrep":
        from .geometry import minrep
        globals()[name] = minrep
        return minrep
    if name == "solve_batch":
        from .batch import solve_batch
        globals()[name] = solve_batch
        return solve_batch
    if name == "isfeasible":
        from .geometry import isfeasible
        globals()[name] = isfeasible
        return isfeasible
    if name == "warmup":
        from .precompile import warmup
        globals()[name] = warmup
        return warmup
    raise AttributeError(name)
