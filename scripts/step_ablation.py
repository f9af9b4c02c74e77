"""Differential step-cost decomposition of the slot kernel on the chip.

Runs ``run_slot_round`` directly on a synthetic full-occupancy state with
'noexit' forced (every lane runs all ``steps`` masked iterations), then
re-times with one section stubbed at a time (see ``_solve_tile_live``'s
``ablate`` dev parameter).  The deltas attribute per-step time to each
section — the measurement VERDICT r3 weak #8 asks for, needed because
two model-driven optimizations (pass fusion, static step chunking)
measured NEUTRAL on the pipeline: neither the VMEM-bandwidth model nor
the loop-overhead model predicts the step cost.

Timing: several distinct pipelined calls, one stacked host fetch (see
CLAUDE.md on tunnel timing).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp
import numpy as np
import functools

from daqp_tpu.ops import pallas_slot as ps
from daqp_tpu.api import _as_settings
from daqp_tpu import transform
from tests.gen import generate_test_qp_batch

B, n, m, ms = 256, 50, 100, 0
STEPS = 192
NCALL = 16
st = _as_settings({"iter_limit": 100000}, jnp.float32)

d = generate_test_qp_batch(B, n, m, ms, 40, 1e2, rng=5, dtype=np.float32)
args = [jnp.asarray(d[k]) for k in ('H', 'f', 'A', 'bupper', 'blower')]
ldpd = jax.vmap(lambda H, f, A, bu, bl: transform.build_ldp(
    H, f, A, bu, bl, None, ms, st))(*args)
immut = jnp.zeros_like(ldpd.dupper)
s0 = ps.slot_init(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.scaling, immut,
                  n_true=n)

states = [s0._replace(fval=s0.fval + 1e-9 * i) for i in range(NCALL)]
stack = jax.jit(lambda *fs: jnp.stack(fs))


def time_variant(ablate, label):
    ab = frozenset(ablate) | {'noexit'}
    fn = jax.jit(functools.partial(ps.run_slot_round, st=st, n_true=n,
                                   steps=STEPS, ablate=ab))
    _ = np.asarray(stack(*[fn(s).fval[0, :4] for s in states]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(s) for s in states]
        np.asarray(stack(*[o.fval[0, :4] for o in outs]))
        best = min(best, time.perf_counter() - t0)
    per_step = best / NCALL / (B // 128) / STEPS
    print(f"{label:28s} {best*1e3/NCALL:8.3f} ms/call"
          f"  {per_step*1e6:7.3f} us/step/tile", flush=True)
    return per_step


if not (len(sys.argv) > 1 and sys.argv[1] == "--floor"):
    base = time_variant([], "full body")
    for sec in ('argmin', 'unew', 'mu', 'mj', 'gram', 'epass2', 'wupd',
                'eupd', 'csp', 'gp'):
        t = time_variant([sec], f"minus {sec}")
        print(f"    -> {sec} share: {(base-t)*1e6:+.3f} us/step",
              flush=True)
    # everything big off at once: the irreducible small-op + loop floor
    t = time_variant(['argmin', 'unew', 'mu', 'mj', 'gram', 'epass2',
                      'wupd', 'eupd', 'csp', 'gp'], "minus ALL sections")
    print(f"    -> floor: {t*1e6:.3f} us/step (base {base*1e6:.3f})")

# second level: decompose the small-op floor (run with --floor)
if len(sys.argv) > 1 and sys.argv[1] == '--floor':
    ALL = ['argmin', 'unew', 'mu', 'mj', 'gram', 'epass2', 'wupd',
           'eupd', 'csp', 'gp']
    base_all = time_variant(ALL, "floor (ALL big off)")
    for sec in ('block2', 'pmask2', 'sred2', 'book2', 'stat2'):
        t = time_variant(ALL + [sec], f"floor minus {sec}")
        print(f"    -> {sec} share: {(base_all-t)*1e6:+.3f} us/step",
              flush=True)
    t = time_variant(ALL + ['block2', 'pmask2', 'sred2', 'book2',
                            'stat2'], "floor minus ALL small")
    print(f"    -> residual: {t*1e6:.3f} us/step")
