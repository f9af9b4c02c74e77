"""SOFT_WEIGHTS batch throughput on the real chip: dense-mask kernel
(``solve_batch_pallas_jit(sw=)``) vs the flat tier
(``solve_batch_flat_jit(sw=)``) on the same f32 batch — the measured
half of round-3 verdict item #6.

Methodology per CLAUDE.md: sustained throughput (4 DISTINCT pipelined
batches), ONE stacked device-side fetch as the sync, best-of-3.

Usage: python scripts/bench_sw.py [n m B n_soft]   (default 50 100 256 8)
NOTE: the SW kernel variant at a new (n, m) shape is a fresh Mosaic
compile (15+ min on this toolchain); the persistent cache under
/tmp/jax_cache makes reruns cheap.
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
    from daqp_tpu.api import _as_settings
    from tests.test_pallas_sw import _make_batch

    args = [int(a) for a in sys.argv[1:]]
    n, m, B, n_soft = (args + [50, 100, 256, 8][len(args):])[:4]
    soft_rows = list(range(0, 2 * n_soft, 2))[:n_soft]
    st = _as_settings({"iter_limit": 1000}, jnp.float32)

    batches = []
    for i in range(4):
        Hs, fs, As, bus, bls, sense, sw, _ = _make_batch(
            B, n, m, soft_rows, seed=100 + i)
        batches.append(tuple(map(jnp.asarray,
                                 (Hs, fs, As, bus, bls, sense))) + (sw,))

    def run_kernel(b):
        return batch_mod.solve_batch_pallas_jit(*b[:6], st, ms=0,
                                                sw=b[6])

    def run_flat(b):
        return batch_mod.solve_batch_flat_jit(
            *b[:6], st, ms=0, K=n + n_soft + 1, sw=b[6])

    stack = jax.jit(lambda *fs: jnp.stack(fs))
    out = {}
    accs = {}
    for name, run in (("flat", run_flat), ("kernel", run_kernel)):
        t0 = time.perf_counter()
        r0 = run(batches[0])
        np.asarray(r0.exitflag)
        print(f"{name}: first call (compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        accs[name] = r0
        best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            outs = [run(b) for b in batches]
            flags = np.asarray(stack(*[o.exitflag for o in outs]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = dict(
            solves_per_s=round(4 * B / best, 1),
            ok_rate=float(np.mean(flags > 0)),
            wall_s=round(best, 4))

    dx = np.abs(np.asarray(accs['flat'].x)
                - np.asarray(accs['kernel'].x)).max()
    print(json.dumps({
        "metric": f"SOFT_WEIGHTS batch n={n} m={m} B={B} ns={n_soft}",
        "flat": out["flat"], "kernel": out["kernel"],
        "speedup": round(out["kernel"]["solves_per_s"]
                         / max(out["flat"]["solves_per_s"], 1e-9), 2),
        "kernel_vs_flat_dx": float(dx),
    }), flush=True)


if __name__ == "__main__":
    main()
