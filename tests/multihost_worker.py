"""Worker for the 2-process multi-host test (spawned by
tests/test_multihost.py): joins the process group, builds the global mesh,
and drives the sharded batch QP solver and the tree-sharded MIQP across
the process boundary.  Prints MULTIHOST_OK on success."""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=2")

import numpy as np


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # join the process group BEFORE anything touches the XLA backend
    # (importing daqp_tpu builds jnp constants)
    from daqp_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

    from daqp_tpu.parallel import sharding
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    def rep(x):
        """Host-local value of a fully-replicated global array."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == 2 * nproc, n_dev

    mesh = distributed.global_mesh()
    st = _as_settings(None, jnp.float64)

    # --- sharded batch QP over both processes -------------------------
    B, n, m, ms = 8, 6, 12, 0
    d = generate_test_qp_batch(B, n, m, ms, 4, 1e2, rng=5)
    garrs = distributed.distribute_batch(
        mesh, d['H'], d['f'], d['A'], d['bupper'], d['blower'], d['sense'])
    res, stats = sharding.solve_batch_sharded(*garrs, st, mesh, ms=ms,
                                              tier="flat")
    jax.block_until_ready(res)
    assert int(rep(stats.n_optimal)) == B, rep(stats.n_optimal)
    # every process checks ITS OWN shards against the constructed optima
    checked = 0
    for shard in res.x.addressable_shards:
        idx = shard.index[0]
        err = np.linalg.norm(np.asarray(shard.data) - d['x'][idx],
                             axis=1).max()
        assert err < 1e-5, (idx, err)
        checked += shard.data.shape[0]
    assert checked == B // nproc, checked

    # --- tree-sharded MIQP with cross-process incumbent exchange ------
    from daqp_tpu.types import BINARY
    rng = np.random.default_rng(23)
    nq, mq, nb = 8, 16, 4
    Mx = rng.standard_normal((nq, nq))
    H = Mx.T @ Mx + 0.5 * np.eye(nq)
    f = 10 * rng.standard_normal(nq)
    A = rng.standard_normal((mq, nq))
    bu = 15 * rng.random(mq)
    bl = -15 * rng.random(mq)
    A[:nb] = 0.0
    A[np.arange(nb), np.arange(nb)] = 1.0
    bu[:nb] = 1.0
    bl[:nb] = 0.0
    sense = np.zeros(mq, np.int32)
    sense[:nb] = BINARY
    xg, fg, status, nodes = sharding.solve_miqp_sharded(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), sense, 0, st, mesh)
    jax.block_until_ready(xg)
    assert int(rep(status).reshape(-1)[0]) == 1, rep(status)
    # replicate the single-process reference on this process's data (all
    # processes computed the same problem deterministically)
    import daqp_tpu
    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    x_local = rep(xg).reshape(-1)[:nq]
    # degenerate MIQPs can have multiple optimal integer points: assert
    # objective parity + integer & constraint feasibility of the winner
    assert abs(float(rep(fg).reshape(-1)[0]) - float(ref.fval)) < 1e-6
    ax = A @ x_local
    assert np.all((ax <= bu + 1e-6) & (ax >= bl - 1e-6))
    xb = ax[:nb]
    assert np.all((np.abs(xb - 1) < 1e-6) | (np.abs(xb) < 1e-6)), xb

    print(f"MULTIHOST_OK {pid} devices={n_dev} "
          f"nodes={int(rep(nodes).reshape(-1)[0])}", flush=True)


if __name__ == "__main__":
    main()
