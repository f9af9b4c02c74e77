"""Chip-verified f32 accuracy on the reference benchmark grid
(VERDICT r4 weak #6: reconcile the n=500 story).

Runs the reference suite sizes (benchmark.jl:32-36) through the f32
single-instance path WITHOUT the f64 backstop and records per-instance
exit flags and ||x - xref||.  Writes one JSON line per size to
GRID_r05.json at the repo root — the committed artifact that decides
whether "DAQP-equivalent accuracy" holds without the backstop.
"""
import json
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import daqp_tpu
from tests.gen import generate_test_qp

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/GRID_r05.json"
SIZES = [(10, 50, 5, 8), (50, 250, 25, 40), (100, 500, 50, 80),
         (200, 1000, 100, 160), (500, 2500, 250, 400)]
KAPPA, N_PROBLEMS = 1e2, 10

with open(OUT, "w") as fh:
    for (n, m, ms, nact) in SIZES:
        rng = np.random.default_rng(1000 + n)
        flags, errs = [], []
        for _ in range(N_PROBLEMS):
            x, H, f, A, bu, bl, sense = generate_test_qp(n, m, ms, nact,
                                                         KAPPA, rng)
            res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms,
                                    f64_backstop=False)
            flags.append(int(res.exitflag))
            errs.append(float(np.linalg.norm(np.asarray(res.x) - x)))
        clean_errs = [e for e, fl in zip(errs, flags) if fl == 1]
        rec = {"n": n, "m": m, "flags": flags,
               "errs": [float(f"{e:.3e}") for e in errs],
               "max_err": max(errs), "median_err": float(np.median(errs)),
               "clean": all(fl == 1 for fl in flags),
               "max_err_clean_flags": (max(clean_errs) if clean_errs
                                       else None),
               "under_ref_gate": max(errs) < 1e-4,
               "clean_under_ref_gate": (max(clean_errs) < 1e-4
                                        if clean_errs else None)}
        line = json.dumps(rec)
        print(line, flush=True)
        fh.write(line + "\n")
