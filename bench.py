"""Throughput benchmark: batched 50-var/100-constraint dense QPs on one chip.

Reproduces BASELINE.json config 2 ("Batched random dense QPs: 10k instances
of 50-var/100-constraint strictly convex QPs, vmapped active-set solve").
The north-star target is 100k QP solves/sec/chip at DAQP-equivalent
accuracy (BASELINE.json:5); ``vs_baseline`` reports value / 100000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, '.')
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n, m, ms, nact, kappa = 50, 100, 0, 40, 1e2
    dtype = np.float32

    d = generate_test_qp_batch(B, n, m, ms, nact, kappa, rng=2026,
                               dtype=dtype)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)

    H = jnp.asarray(d['H'])
    f = jnp.asarray(d['f'])
    A = jnp.asarray(d['A'])
    bu = jnp.asarray(d['bupper'])
    bl = jnp.asarray(d['blower'])
    sense = jnp.asarray(d['sense'])

    def run():
        res = batch_mod.solve_batch_flat_jit(H, f, A, bu, bl, sense, st,
                                              ms=ms)
        jax.block_until_ready(res)
        return res

    res = run()  # compile + first run
    # Accuracy gate (benchmark.jl:39,62-64): ||x - xref|| <= 1e-4 per
    # instance (f32 path: relax to 2e-3 consistent with single precision).
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    flags = np.asarray(res.exitflag)
    ok = float(np.mean((flags == 1) & (err < 2e-3)))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)
    solves_per_sec = B / t

    print(json.dumps({
        "metric": "QP solves/sec/chip (50-var/100-constraint dense, "
                  f"batch {B})",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 100000.0, 4),
        "batch": B,
        "accuracy_pass_rate": ok,
        "median_iters": int(np.median(np.asarray(res.iterations))),
        "wall_s": round(t, 4),
    }))


if __name__ == "__main__":
    main()
