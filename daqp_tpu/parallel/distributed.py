"""Multi-host wiring: process-group init + global-mesh construction.

The reference is single-process C (SURVEY.md §5: no communication backend
anywhere); multi-host is a new, TPU-native axis.  The model:

  * every host calls :func:`initialize` once (JAX's coordination service —
    on TPU pods the coordinator is discovered automatically, on CPU/GPU
    fleets pass ``coordinator_address``/``num_processes``/``process_id``);
  * :func:`global_mesh` builds the 1-D batch mesh over ALL devices of all
    processes — the same ``shard_map`` solver code from
    :mod:`daqp_tpu.parallel.sharding` then spans hosts, with batch shards
    host-local and only the statistics / incumbent-bound collectives
    crossing DCN;
  * :func:`distribute_batch` turns each host's local slice of the problem
    data into global sharded arrays (``jax.make_array_from_callback``).

Proven by ``tests/test_multihost.py``: two CPU processes, four devices,
``solve_batch_sharded`` and ``solve_miqp_sharded`` across the process
boundary.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the JAX process group (idempotent).

    On TPU pods call with no arguments; for CPU/GPU multi-process runs pass
    the coordinator's ``host:port``, the process count and this process's
    id, exactly as ``jax.distributed.initialize`` expects.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:          # already initialized: keep going
        if "already initialized" not in str(e):
            raise


def global_mesh(axis_name: str = "batch"):
    """1-D mesh over every device of every process (ICI within a slice,
    DCN across hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def distribute_batch(mesh, *arrays, axis_name: str = "batch"):
    """Lift per-host full copies of batch arrays into global arrays sharded
    on the leading (batch) axis.

    Every process passes the SAME full-batch numpy arrays (deterministic
    generation or a broadcast); each device materializes only its own
    shard.  Returns the global ``jax.Array``s in input order.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    out = []
    for arr in arrays:
        arr = np.asarray(arr)
        out.append(jax.make_array_from_callback(
            arr.shape, sharding, lambda idx, a=arr: a[idx]))
    return tuple(out)
