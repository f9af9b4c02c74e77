"""Benchmark suite: QP/LP grids with median-of-medians timing to CSV.

Port of the reference harness (``test/benchmark.jl``): pinned problem
sizes small/medium/large (benchmark.jl:32-36), correctness gate
||x - xref|| <= 1e-4 (benchmark.jl:39,62-64), median-of-medians setup/solve
timing written to CSV.  The batched TPU dimension is added as its own
suite (solves/sec at several batch sizes).

Usage:
    python benchmarks/suite.py [--suite small|medium|large|batch|all]
                               [--out results.csv] [--repeats 5]
"""
import argparse
import csv
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, '.')

# (n, m, ms, nAct) grids, kappa = 1e2 (benchmark.jl:32-36)
SUITES = {
    "small": [(10, 50, 5, 8)],
    "medium": [(50, 250, 25, 40), (100, 500, 50, 80)],
    "large": [(200, 1000, 100, 160), (500, 2500, 250, 400)],
}
KAPPA = 1e2
N_PROBLEMS = 10


def _tol():
    """Correctness gate: the REFERENCE's ||x - xref|| <= 1e-4
    (benchmark.jl:39,62-64), in f32 as well as f64.

    f32 accuracy story, chip-verified and reconciled in round 5
    (GRID_r05.json, scripts/grid_accuracy.py): every CLEAN-FLAG
    instance on the reference grid meets the 1e-4 gate in pure f32
    (max clean err 2.9e-6 at n=50 ... ~4e-5 at n=500), and at n=500
    roughly 1 instance in 10 exits LOUDLY (EXIT_CYCLE) rather than
    silently — round 4's "EXIT_CYCLE lane gone, all flags clean" claim
    was a stale generalization from one seed.  The production setting
    for accuracy-gated single-instance use is therefore
    ``f64_backstop=True`` (loud lanes re-solve in emulated f64), which
    is what the timed loop below uses; "DAQP-equivalent accuracy" holds
    through loud-failure escalation, never through silent answers.
    """
    return 1e-4


def _bench_qp(sizes, repeats, rows):
    import daqp_tpu
    from tests.gen import generate_test_qp
    tol = _tol()
    for (n, m, ms, nact) in sizes:
        rng = np.random.default_rng(1000 + n)
        probs = [generate_test_qp(n, m, ms, nact, KAPPA, rng)
                 for _ in range(N_PROBLEMS)]
        # compile once on the first problem
        x, H, f, A, bu, bl, sense = probs[0]
        daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms)
        med_times, errs, iters = [], [], []
        for (x, H, f, A, bu, bl, sense) in probs:
            # SUSTAINED timing: ``repeats`` solves pipelined, ONE host
            # fetch of the last result as the true sync (the chip
            # executes enqueued programs in order).  Per-call fetch
            # timing over the axon tunnel sits on a ~32 ms transfer
            # floor and measures latency, not solver time (see bench.py).
            # f64_backstop: the production setting for accuracy-gated
            # single-instance use — on the f32 chip path, 1 in 10 of the
            # n=500 grid instances exits loudly (EXIT_CYCLE) and is
            # re-solved in emulated f64; the timed loop then reflects
            # the real cost of always-correct answers.
            res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms,
                                    f64_backstop=True)  # warm
            np.asarray(res.x)
            t0 = time.perf_counter()
            for _ in range(repeats):
                res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms,
                                        f64_backstop=True)
            np.asarray(res.x)           # true sync
            per = (time.perf_counter() - t0) / repeats
            err = float(np.linalg.norm(np.asarray(res.x) - x))
            assert err < tol, (n, m, err)
            med_times.append(per)
            errs.append(err)
            iters.append(int(res.iterations))
        rows.append(dict(kind="qp", n=n, m=m, ms=ms, nAct=nact,
                         solve_ms=1e3 * statistics.median(med_times),
                         max_err=max(errs),
                         median_iters=int(statistics.median(iters))))
        print(rows[-1], flush=True)


def _bench_lp(sizes, repeats, rows):
    import daqp_tpu
    from tests.gen import generate_test_lp
    tol = _tol()
    for (n, m, ms, _) in sizes:
        rng = np.random.default_rng(2000 + n)
        probs = [generate_test_lp(n, m, ms, rng) for _ in range(N_PROBLEMS)]
        x, f, A, bu, bl, sense = probs[0]
        daqp_tpu.linprog(f, A, bu, bl, sense, ms=ms)
        med_times, errs = [], []
        for (x, f, A, bu, bl, sense) in probs:
            res = daqp_tpu.linprog(f, A, bu, bl, sense, ms=ms)   # warm
            np.asarray(res.x)
            t0 = time.perf_counter()
            for _ in range(repeats):
                res = daqp_tpu.linprog(f, A, bu, bl, sense, ms=ms)
            np.asarray(res.x)           # true sync (see _bench_qp note)
            per = (time.perf_counter() - t0) / repeats
            xs = np.asarray(res.x, float)
            err = float(np.linalg.norm(xs - x))
            if err >= tol:
                # A degenerate LP can have a non-unique optimal face;
                # a solver landing on a different point of that face is
                # optimal even though ||x - xref|| is large (observed:
                # obj match to 1e-6 with x 3.7e-2 away).  Accept iff the
                # objective matches AND the point is feasible to tol.
                I = np.zeros((ms, n)); I[np.arange(ms), np.arange(ms)] = 1
                Afull = np.vstack([I, np.asarray(A, float)])
                vals = Afull @ xs
                feas = max(float((vals - bu).max()),
                           float((bl - vals).max()))
                gap = abs(float(f @ xs) - float(f @ x)) \
                    / (1.0 + abs(float(f @ x)))
                assert gap < tol and feas < tol, (n, m, err, gap, feas)
            med_times.append(per)
            errs.append(err)
        rows.append(dict(kind="lp", n=n, m=m, ms=ms, nAct=0,
                         solve_ms=1e3 * statistics.median(med_times),
                         max_err=max(errs), median_iters=0))
        print(rows[-1], flush=True)


def _bench_batch(rows):
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    for B in (1024, 4096):
        d = generate_test_qp_batch(B, 50, 100, 0, 40, KAPPA, rng=7,
                                   dtype=np.float32)
        args = [jnp.asarray(d[k]) for k in
                ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
        res = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0)
        np.asarray(res.exitflag)        # compile + sync
        t0 = time.perf_counter()
        res = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0)
        flags = np.asarray(res.exitflag)
        dt = time.perf_counter() - t0
        err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
        rows.append(dict(kind="batch_qp", n=50, m=100, ms=0, nAct=40,
                         solve_ms=1e3 * dt / B,
                         max_err=float(np.median(err)),
                         median_iters=int(B / dt)))
        print(f"batch B={B}: {B/dt:.0f} solves/s, "
              f"optimal {(flags==1).sum()}/{B}", flush=True)

    # batched LP tier (round-4: the scaling axis applied to the LP
    # regime; previously LPs were benched one linprog call at a time)
    from tests.gen import generate_test_lp
    for B in (256, 1024):
        n, m, ms = 10, 50, 0
        rng = np.random.default_rng(17)
        probs = [generate_test_lp(n, m, ms, rng) for _ in range(B)]
        xs = np.stack([p[0] for p in probs])
        fs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
        As = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
        bus = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
        bls = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
        se = jnp.zeros((B, m), jnp.int32)
        stl = _as_settings({"iter_limit": 3000}, jnp.float32)
        res = batch_mod.solve_batch_lp_pallas_jit(fs, As, bus, bls, se,
                                                  stl, ms=ms)
        np.asarray(res.exitflag)
        t0 = time.perf_counter()
        res = batch_mod.solve_batch_lp_pallas_jit(fs, As, bus, bls, se,
                                                  stl, ms=ms)
        flags = np.asarray(res.exitflag)
        dt = time.perf_counter() - t0
        err = np.abs(np.asarray(res.x) - xs).max(axis=1)
        rows.append(dict(kind="batch_lp", n=n, m=m, ms=ms, nAct=0,
                         solve_ms=1e3 * dt / B,
                         max_err=float(np.median(err)),
                         median_iters=int(B / dt)))
        print(f"batch LP B={B}: {B/dt:.0f} solves/s, "
              f"optimal {(flags==1).sum()}/{B}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="small")
    ap.add_argument("--out", default="bench_results.csv")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env "
                         "var is unreliable here: the axon plugin wins)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    rows = []
    names = (list(SUITES) + ["batch"] if args.suite == "all"
             else [args.suite])
    for s in names:
        if s == "batch":
            _bench_batch(rows)
        else:
            _bench_qp(SUITES[s], args.repeats, rows)
            _bench_lp(SUITES[s], args.repeats, rows)

    with open(args.out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
