"""Minimal repro: v5e miscompiles vmapped dynamic scatters into small
BOOL arrays at batch >= 1024.

History: the flat batched solver produced corrupt state at >= ~1024 lanes
in one vmapped program (bitwise-correct at B <= 768), which forced
``solve_batch_flat_jit`` to chunk at 512 (batch.py).  Bisection found the
entire divergence enters through ONE op: ``used.at[slot].set(bool_val)``
under ``jit(vmap(...))`` — the scatter's write is silently dropped for a
subset of lanes.  CPU and <=1000-lane TPU programs agree bitwise; the
1024-lane program loses writes.

Characterization measured on v5e (2026-08-17 toolchain):

    op                                   B=1000  B=1024  B=1152  B=2048
    bool  x.at[i].set(x[i] & ~v)         clean   REPRO   REPRO   REPRO
    bool  x.at[i].set(v)                 clean   REPRO
    int32 x.at[i].set(v)                 clean   clean
    int32 x.at[i].set(x[i]+v)            clean   clean
    f32   x.at[i].set(v)                 clean   clean
    bool, K=8 / 11 / 16                          REPRO
    bool, K=128                                  clean

i.e. the trigger is: BOOL element type + small minor dimension
(K < lane width) + batch >= 1024.  Integer/float scatters of identical
shape are compiled correctly.

Workaround used by the solver: one-hot mask algebra instead of dynamic
bool scatters (``used | ((arange(K) == slot) & ok)``), see
ldp_flat.py.  This fully fixes the small-problem class (n=10/m=24 flat
solves are now correct at any batch size in one program).

SECOND manifestation (n=50/m=100, K=51) — CHARACTERIZED (round 4, 2026-08-19
toolchain).  Inside repeated flat_step application at B >= 1024, the
inverse-Gram invariant ||G E - I|| on used slots drifts to O(1) (median
residual exactly 1.0 — an E row of a used slot zeroed).  Measured facts:

    batch per program   1016-  1024  1025  1032  1152  1536  2048
    invariant           3e-6   REPRO REPRO REPRO REPRO REPRO REPRO

  * The trigger is PURELY the vmapped batch size crossing 1024 — the
    same threshold as the bool-scatter manifestation above.  B = 1016
    is bitwise-healthy; B = 1024 corrupts ~85% of lanes by 48 steps.
  * NOT the loop primitive: fori_loop, while_loop (production
    flat_solve) and a fully UNROLLED 32-step composition corrupt
    identically (164 identical lanes at 32 steps).  An
    optimization_barrier on the carry every step changes nothing.
  * NOT the slot capacity: K = 51 / 56 / 64 corrupt the same 865 lanes.
  * Onset is between 24 and 32 step applications (24: clean, 32: 164
    lanes, 48: 865 of 1024).
  * Failure mode at CONVERGENCE is loud, not silent: running the full
    production solve at lane_chunk=1024, 1022/1024 lanes exit -1
    (infeasible) on feasible problems; the handful that exit optimal
    are KKT-correct to f64, and no lane produced a clean-flag wrong x
    across 2048 lanes / 2 seeds.  (Round 3 feared a silent-wrong-answer
    class; the observed class is wrong-flag.)
  * Chunked at ANY size <= 1016 per program, all 1024 lanes solve
    correctly (KKT stationarity ~1e-7, violation ~1e-5) and chunk
    results are identical to 3e-7 across chunkings.

CAUTION for future bisection: bitwise full-vs-chunked comparison of
SYNTHETIC iterated kernels is a false-positive trap.  A chaotic
rank-one-update toy "reproduced" K-dependent bands ([51,56] and
[81,104] repro, 48/49/50/57..80/105+ clean) that were really legal f32
reassociation differences between the B=1024 and B=512 compilations
amplified by the iteration (values at 1e13 scale, relative diff 1e-6).
Only a semantic invariant (||G E - I||, exit-flag/KKT quality) is a
valid repro signal for iterated solvers.

The production 512-lane chunk in batch.py is therefore LOAD-BEARING
and proven sound (512 also divides every production batch and reduces
lockstep waste).  Re-run this script on every toolchain bump; once it
prints CLEAN everywhere (incl. --invariant), the cap can be lifted.

Usage: python scripts/repro_v5e_bool_scatter.py   (needs the TPU; prints
one line per case, exits 1 if any REPRO is found).
"""
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    assert jax.default_backend() != 'cpu', "run on the TPU"
    rng = np.random.default_rng(0)
    any_repro = False

    def test(name, fn, B, K, dtype=bool):
        nonlocal any_repro
        if dtype is bool:
            used = rng.random((B, K)) < 0.6
            val = rng.random(B) < 0.5
        else:
            used = rng.integers(0, 100, (B, K)).astype(dtype)
            val = rng.integers(0, 100, B).astype(dtype)
        idx = rng.integers(0, K, B).astype(np.int32)
        f = jax.jit(jax.vmap(fn))
        full = np.asarray(f(jnp.asarray(used), jnp.asarray(idx),
                            jnp.asarray(val)))
        C = B // 2
        halves = [np.asarray(f(jnp.asarray(used[i * C:(i + 1) * C]),
                               jnp.asarray(idx[i * C:(i + 1) * C]),
                               jnp.asarray(val[i * C:(i + 1) * C])))
                  for i in range(2)]
        chunk = np.concatenate(halves, 0)
        bad = int(np.sum(np.any(full != chunk, axis=1)))
        print(f"{name:34s} B={B:5d} K={K:3d}: "
              f"{'REPRO %d lanes' % bad if bad else 'clean'}", flush=True)
        any_repro |= bad > 0

    setread = lambda u, i, v: u.at[i].set(u[i] & ~v)
    for B in (512, 1000, 1024, 2048):
        test("bool set(read & ~v)", setread, B, 11)
    test("bool set(v)", lambda u, i, v: u.at[i].set(v), 1024, 11)
    test("int32 set(v)",
         lambda u, i, v: u.at[i].set(v), 1024, 11, np.int32)
    test("f32 set(v)",
         lambda u, i, v: u.at[i].set(v), 1024, 11, np.float32)
    test("bool one-hot workaround",
         lambda u, i, v: u & ~((jnp.arange(11) == i) & v), 1024, 11)

    print("RESULT:", "REPRO (workaround still needed)" if any_repro
          else "CLEAN (bug fixed in this toolchain)")

    if "--invariant" in sys.argv:
        any_repro |= fused_loop_invariant_check()
    return 1 if any_repro else 0


def fused_loop_invariant_check():
    """The open n=50 fused-loop manifestation: 48 flat_step iterations at
    B=1024 in one program corrupt the inverse-Gram invariant (see module
    docstring).  Slow to compile (~minutes); run with --invariant."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax
    import jax.tree_util as jtu
    sys.path.insert(0, '/root/repo')
    from daqp_tpu import transform, ldp_flat
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B, n, m = 1024, 50, 100
    # B=1016 is the control: the threshold is exactly 1024 (see module
    # docstring); a toolchain where BOTH are clean can lift the cap.
    d = generate_test_qp_batch(B, n, m, 0, 40, 1e2, rng=3,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))

    def build(H, f, A, bu, bl, se):
        with jax.default_matmul_precision('highest'):
            return jax.vmap(functools.partial(
                transform.build_ldp, ms=0, st=st))(H, f, A, bu, bl, se)
    ldpd = jax.jit(build)(*args)
    ldpd = jtu.tree_map(lambda a: jnp.asarray(np.asarray(a)), ldpd)

    def steps48(M, du, dl, se, sc):
        def one(M1, du1, dl1, se1, sc1):
            s = ldp_flat.flat_init(M1, du1, dl1, se1, sc1, K=n + 1)
            return lax.fori_loop(
                0, 48, lambda _, q: ldp_flat.flat_step(q, st), s)
        with jax.default_matmul_precision('highest'):
            return jax.vmap(one)(M, du, dl, se, sc)

    def residuals(s1, Bv):
        E = np.asarray(s1.E, np.float64)
        Mw = np.asarray(s1.Mw, np.float64)
        used = np.asarray(s1.used)
        res = np.zeros(Bv)
        for b in range(Bv):
            k = used[b]
            if k.sum():
                G = Mw[b][k] @ Mw[b][k].T
                res[b] = np.abs(G @ E[b][np.ix_(k, k)]
                                - np.eye(k.sum())).max()
        return res

    f = jax.jit(steps48)
    any_repro = False
    for Bv in (1016, 1024):
        s1 = f(ldpd.M[:Bv], ldpd.dupper[:Bv], ldpd.dlower[:Bv],
               ldpd.sense[:Bv], ldpd.scaling[:Bv])
        res = residuals(s1, Bv)
        bad = int(np.sum(res > 0.1))
        expect = "control, expect clean" if Bv == 1016 else "threshold"
        print(f"fused-loop invariant @B={Bv} ({expect}): residual p50 "
              f"{np.percentile(res, 50):.2e} max {res.max():.2e}; "
              f"{bad} lanes > 0.1 "
              f"({'REPRO' if bad else 'clean'})")
        any_repro |= bad > 0
    if not any_repro:
        print("both clean — chunk cap can be lifted")
    return any_repro


if __name__ == "__main__":
    sys.exit(main())
