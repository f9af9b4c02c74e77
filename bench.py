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
  * the accuracy gate is the REFERENCE's: per-instance
    ||x - xref|| <= 1e-4 (benchmark.jl:39,62-64), met in pure f32 since
    round 4 (primal_tol 3e-5 + relative add-pivot gates), checked on
    EVERY batch (not just the first);
  * the axon tunnel backend can fail to initialize transiently (this
    erased round 2's driver capture: BENCH_r02.json rc=1 on "Unable to
    initialize backend 'axon'").  The benchmark body therefore runs in a
    CHILD process; the parent retries up to 5 times with exponential
    backoff (~4 min budget) so one flake cannot erase the round, and
    emits a diagnostic JSON line if every attempt fails.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_ENV = "_DAQP_BENCH_CHILD"


def bench_body():
    import jax
    # persistent compile cache: the unrolled Pallas kernels are slow to
    # compile (minutes); repeated driver runs hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    mode = sys.argv[2] if len(sys.argv) > 2 else "stream"
    # Headline mode "stream" (round 5): ONE dispatch processes the whole
    # stream in 256-lane kernel waves via lax.map, globally sorted by
    # the difficulty proxy before chunking.  Round-4 measurements that
    # motivated this: 40 separate 256-lane calls paid ~45 ms of a 154 ms
    # wall in pure host/tunnel dispatch, and per-call difficulty sorting
    # reached only 73.1% tile occupancy vs 99.1% for a globally sorted
    # stream (scripts/occupancy.py).  Mode "calls" keeps the round-4
    # per-call pipeline for A/B.
    B = 256                          # kernel wave within the stream
    NB = max(1, B_total // B)
    n, m, ms, nact, kappa = 50, 100, 0, 40, 1e2

    d = generate_test_qp_batch(NB * B, n, m, ms, nact, kappa, rng=2026,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)

    keys = ('H', 'f', 'A', 'bupper', 'blower', 'sense')
    total = NB * B

    if mode == "stream":
        full = [jnp.asarray(d[k]) for k in keys]
        _ = np.asarray(full[0][0, 0, 0])               # inputs resident

        def solve():
            return batch_mod.solve_batch_pallas_stream_jit(
                *full, st=st, ms=ms, chunk=B, has_soft=False,
                sort_stream=True)

        warm = solve()
        xs = np.asarray(warm.x)
        flags_all = np.asarray(warm.exitflag)
        err = np.linalg.norm(xs - d['x'], axis=1)
        ok = float(np.mean((flags_all == 1) & (err < 1e-4)))
        med_iters = int(np.median(np.asarray(warm.iterations)))

        # SUSTAINED throughput: R back-to-back dispatches per timed
        # window with ONE final fetch — the chip executes enqueued
        # programs in order, so run R's flags prove runs 1..R-1 done.
        # A fetch per dispatch would bill the ~25-30 ms tunnel
        # round-trip latency (a fixed cost, not solver time) R times;
        # amortized over R = 3 full streams it is < 7% of the window.
        R = 3
        best = None
        for _rep in range(3):   # best-of-3: tunnel timing varies +-10%
            t0 = time.perf_counter()
            rs = [solve() for _ in range(R)]
            flags = np.asarray(rs[-1].exitflag)   # one fetch = the sync
            t1 = time.perf_counter()
            best = min(best, t1 - t0) if best is not None else t1 - t0
        total = total * R
    else:
        batches = [[jnp.asarray(d[k][i * B:(i + 1) * B]) for k in keys]
                   for i in range(NB)]
        _ = [np.asarray(b[0][0, 0, 0]) for b in batches]   # resident

        def solve_b(b):
            # has_soft=False explicitly: the auto-dispatch would inspect
            # the sense array (a host transfer) on every pipelined call
            return batch_mod.solve_batch_pallas_jit(*b, st=st, ms=ms,
                                                    has_soft=False)

        # compile + warm; accuracy gate over ALL batches (one device-side
        # stack per field, ONE host fetch each — per-batch fetches would
        # serialize ~32 ms of tunnel round-trip per batch)
        stack = jax.jit(lambda *fs: jnp.stack(fs))
        warm = [solve_b(b) for b in batches]
        xs = np.asarray(stack(*[r.x for r in warm])).reshape(total, n)
        flags_all = np.asarray(
            stack(*[r.exitflag for r in warm])).reshape(-1)
        err = np.linalg.norm(xs - d['x'], axis=1)
        ok = float(np.mean((flags_all == 1) & (err < 1e-4)))
        med_iters = int(np.median(np.asarray(warm[0].iterations)))

        # One device-side stack + ONE host transfer as the true sync: the
        # stacked array depends on every batch, and the chip executes
        # enqueued programs in order, so fetching it proves all solves
        # are done.
        best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            rs = [solve_b(b) for b in batches]
            flags = np.asarray(
                stack(*[r.exitflag for r in rs])).reshape(-1)
            t1 = time.perf_counter()
            best = min(best, t1 - t0) if best is not None else t1 - t0
    solves_per_sec = total / best

    print(json.dumps({
        "metric": "QP solves/sec/chip (50-var/100-constraint dense, "
                  f"{total} solves sustained)",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 100000.0, 4),
        "mode": mode,
        "batches": NB,
        "batch_size": B,
        "accuracy_pass_rate": ok,
        "optimal_rate": float(np.mean(flags == 1)),
        "median_iters": med_iters,
        "wall_s": round(best, 4),
    }))


def main():
    if os.environ.get(_CHILD_ENV):
        bench_body()
        return

    # Parent: retry the benchmark in fresh child processes.  A fresh
    # process per attempt re-imports jax cleanly, so a transient tunnel
    # backend-init failure in one attempt cannot poison the next.
    backoffs = [0, 5, 15, 40, 90]            # ~2.5 min of backoff total
    attempts, last_err = 0, ""
    for i, delay in enumerate(backoffs):
        if delay:
            time.sleep(delay)
        attempts = i + 1
        env = dict(os.environ, **{_CHILD_ENV: "1"})
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            last_err = "attempt timed out after 3600s"
            continue
        line = ""
        for cand in reversed(proc.stdout.strip().splitlines()):
            cand = cand.strip()
            if cand.startswith("{"):
                line = cand
                break
        if proc.returncode == 0 and line:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                last_err = f"unparseable output: {line[:200]}"
                continue
            if "value" in rec:
                if attempts > 1:
                    rec["attempts"] = attempts
                print(json.dumps(rec))
                return
            last_err = f"no value in output: {line[:200]}"
        else:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            last_err = " | ".join(tail[-3:])[:500] or f"rc={proc.returncode}"
    # Final failure: still print ONE JSON diagnostic line so the driver
    # records WHAT failed instead of an empty capture.
    print(json.dumps({
        "metric": "QP solves/sec/chip (50-var/100-constraint dense)",
        "value": 0.0,
        "unit": "solves/s",
        "vs_baseline": 0.0,
        "error": f"all {attempts} attempts failed: {last_err}",
    }))
    sys.exit(1)


if __name__ == "__main__":
    main()
