"""Throughput benchmark: batched 50-var/100-constraint dense QPs on one chip.

Reproduces BASELINE.json config 2 ("Batched random dense QPs: 10k instances
of 50-var/100-constraint strictly convex QPs, vmapped active-set solve").
The north-star target is 100k QP solves/sec/chip at DAQP-equivalent
accuracy (BASELINE.json:5); ``vs_baseline`` reports value / 100000.

Measurement notes:
  * the Pallas mega-kernel path (``solve_batch_pallas_jit``) is used:
    the whole dual active-set loop runs VMEM-resident in 128-lane tiles;
  * throughput is SUSTAINED: several distinct batches are pipelined and
    synced via a host transfer of the exit flags (``block_until_ready``
    acks early through the axon TPU tunnel and is not a true sync here);
  * the accuracy gate mirrors the reference benchmark harness
    (benchmark.jl:39,62-64): per-instance ||x - xref|| <= 2e-3 for the
    f32 path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    # persistent compile cache: the unrolled Pallas kernels are slow to
    # compile (minutes); repeated driver runs hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, '.')
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    # Per-call batch 256 measured FASTER than 1024 on v5e (49.5k vs 41.1k
    # solves/s at 10240 total): smaller enqueued programs pipeline better
    # and the 2-tile rounds track their own convergence, while per-call
    # dispatch still amortizes.  Scan: 128→47.6k, 256→49.5k, 512→46.9k,
    # 1024→41.1k, 2048→32.5k.
    B = 256                          # per-call batch
    NB = max(1, B_total // B)
    n, m, ms, nact, kappa = 50, 100, 0, 40, 1e2

    d = generate_test_qp_batch(NB * B, n, m, ms, nact, kappa, rng=2026,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)

    keys = ('H', 'f', 'A', 'bupper', 'blower', 'sense')
    batches = [[jnp.asarray(d[k][i * B:(i + 1) * B]) for k in keys]
               for i in range(NB)]
    _ = [np.asarray(b[0][0, 0, 0]) for b in batches]   # inputs resident

    def solve(b):
        # has_soft=False explicitly: the auto-dispatch would inspect the
        # sense array (a small host transfer) on every pipelined call
        return batch_mod.solve_batch_pallas_jit(*b, st=st, ms=ms,
                                                has_soft=False)

    # compile + warm + accuracy check on the first batch
    res0 = solve(batches[0])
    x0 = np.asarray(res0.x)
    flags0 = np.asarray(res0.exitflag)
    err = np.linalg.norm(x0 - d['x'][:B], axis=1)
    ok = float(np.mean((flags0 == 1) & (err < 2e-3)))

    # One device-side stack + ONE host transfer as the true sync: the
    # stacked array depends on every batch, and the chip executes
    # enqueued programs in order, so fetching it proves all solves are
    # done.  Fetching each result separately would serialize ~32 ms of
    # tunnel round-trip PER BATCH into the wall (measured: a trivial
    # jitted call syncs at 32 ms when fetched, 3.9 ms when pipelined) —
    # that is transfer latency, not solver throughput.
    stack = jax.jit(lambda *fs: jnp.stack(fs))
    _ = np.asarray(stack(*[solve(b).exitflag for b in batches]))  # warm
    total = NB * B
    best = None
    for _rep in range(3):   # best-of-3: tunnel timing varies +-10%
        t0 = time.perf_counter()
        rs = [solve(b) for b in batches]
        flags = np.asarray(stack(*[r.exitflag for r in rs])).reshape(-1)
        t1 = time.perf_counter()
        best = min(best, t1 - t0) if best is not None else t1 - t0
    solves_per_sec = total / best

    print(json.dumps({
        "metric": "QP solves/sec/chip (50-var/100-constraint dense, "
                  f"{total} solves sustained)",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 100000.0, 4),
        "batches": NB,
        "batch_size": B,
        "accuracy_pass_rate": ok,
        "optimal_rate": float(np.mean(flags == 1)),
        "median_iters": int(np.median(np.asarray(res0.iterations))),
        "wall_s": round(best, 4),
    }))


if __name__ == "__main__":
    main()
