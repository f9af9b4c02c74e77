"""Sharded-vs-direct throughput on the real chip (VERDICT r2 item 5b).

Measures ``solve_batch_sharded(tier="pallas")`` on a 1-chip mesh against
the direct ``solve_batch_pallas_jit`` at the BASELINE config-2 shape to
quantify shard_map overhead on the fast tier.  Multi-chip hardware is not
available in this environment; the 1-chip ratio bounds the per-chip cost
of the sharded composition (collectives are trivial at D=1 — the measured
delta is shard_map's dispatch/layout overhead).

Run manually on the chip:  python scripts/bench_sharded.py [B_total]
Prints one JSON line {"direct_sps", "sharded_sps", "ratio", ...}.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.parallel import make_mesh, solve_batch_sharded
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B_total = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    B = 256                                  # per-call batch (see bench.py)
    NB = max(1, B_total // B)
    n, m, ms, nact, kappa = 50, 100, 0, 40, 1e2
    d = generate_test_qp_batch(NB * B, n, m, ms, nact, kappa, rng=2027,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    keys = ('H', 'f', 'A', 'bupper', 'blower', 'sense')
    batches = [[jnp.asarray(d[k][i * B:(i + 1) * B]) for k in keys]
               for i in range(NB)]
    _ = [np.asarray(b[0][0, 0, 0]) for b in batches]
    mesh = make_mesh()                       # all local devices (1 chip)
    stack = jax.jit(lambda *fs: jnp.stack(fs))

    def run(solve):
        rs = [solve(b) for b in batches]     # warm/compile
        _ = np.asarray(stack(*[r.exitflag for r in rs]))
        best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            rs = [solve(b) for b in batches]
            flags = np.asarray(stack(*[r.exitflag for r in rs]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return (NB * B) / best, float(np.mean(flags.reshape(-1) == 1))

    def direct(b):
        return batch_mod.solve_batch_pallas_jit(*b, st=st, ms=ms,
                                                has_soft=False)

    def sharded(b):
        res, _stats = solve_batch_sharded(*b, st, mesh, ms=ms,
                                          tier="pallas", has_soft=False)
        return res

    sps_d, opt_d = run(direct)
    sps_s, opt_s = run(sharded)
    print(json.dumps({
        "metric": "sharded-vs-direct pallas tier (1-chip mesh)",
        "direct_sps": round(sps_d, 1),
        "sharded_sps": round(sps_s, 1),
        "ratio": round(sps_s / sps_d, 4),
        "optimal_direct": opt_d,
        "optimal_sharded": opt_s,
        "devices": len(jax.devices()),
        "batch_total": NB * B,
    }))


if __name__ == "__main__":
    main()
