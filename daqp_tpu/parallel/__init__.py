"""Multi-chip / multi-host scaling (sharded batches, tree-sharded MIQP,
process-group wiring).

Submodules load lazily so that ``parallel.distributed.initialize`` can be
imported and called BEFORE anything touches the XLA backend (a hard
requirement of ``jax.distributed.initialize``); importing ``sharding``
eagerly would pull in the solver stack and initialize the backend.
"""
import importlib

_LAZY = {
    "make_mesh": "sharding",
    "solve_batch_sharded": "sharding",
    "exchange_incumbent": "sharding",
    "solve_miqp_sharded": "sharding",
    "solve_batch_miqp_sharded": "sharding",
    "ShardedStats": "sharding",
    "initialize": "distributed",
    "global_mesh": "distributed",
    "distribute_batch": "distributed",
}


def __getattr__(name):
    if name in ("sharding", "distributed"):
        return importlib.import_module(f".{name}", __name__)
    if name in _LAZY:
        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
