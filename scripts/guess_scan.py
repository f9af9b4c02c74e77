"""A/B scan of the primal-init guess activation cap (VERDICT r5 item 2).

Measures, per guess_cap (0 = off): sustained solves/s at B_total=5120,
median/mean kernel iterations, accuracy, and the iteration histogram —
the evidence the verdict asks for ("A/B median iters and headline; keep
only if it wins end-to-end")."""
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
    from tests.gen import generate_test_qp_batch

    B_total = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    caps = [int(c) for c in sys.argv[2].split(',')] if len(sys.argv) > 2 \
        else [0, 10, 20, 30, 40]
    n, m, ms, nact, kappa = 50, 100, 0, 40, 1e2
    d = generate_test_qp_batch(B_total, n, m, ms, nact, kappa, rng=2026,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    full = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    _ = np.asarray(full[0][0, 0, 0])

    for cap in caps:
        def solve():
            return batch_mod.solve_batch_pallas_stream_jit(
                *full, st=st, ms=ms, chunk=256, has_soft=False,
                sort_stream=True, guess_cap=cap)
        warm = solve()
        it = np.asarray(warm.iterations)
        flags = np.asarray(warm.exitflag)
        err = np.linalg.norm(np.asarray(warm.x) - d['x'], axis=1)
        ok = float(np.mean((flags == 1) & (err < 1e-4)))
        best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            r = solve()
            _f = np.asarray(r.exitflag)
            t1 = time.perf_counter()
            best = min(best, t1 - t0) if best is not None else t1 - t0
        print(json.dumps({
            "cap": cap, "solves_per_s": round(B_total / best, 1),
            "ok": ok, "optimal": float(np.mean(flags == 1)),
            "iters_med": float(np.median(it)),
            "iters_mean": round(float(it.mean()), 1),
            "iters_p90": float(np.percentile(it, 90)),
            "iters_max": int(it.max()),
            "wall_s": round(best, 4)}), flush=True)


if __name__ == "__main__":
    main()
