"""Per-stage timing of the Pallas batch pipeline on the real chip.

Stages measured independently (sustained: several distinct batches
pipelined, synced by a host transfer — see CLAUDE.md on tunnel timing):
  * the three batched-factorization formulations head-to-head
  * the production regularized wrapper
  * the full transform (factorization + M/v/d build)
  * the full pallas solve (bench.py path)
Differences give the active-set-kernel + driver share.
"""
import time
import sys
import os
import numpy as np

sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')

from tests import gen
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from daqp_tpu.ops import chol as chol_ops
from daqp_tpu import transform

B, n, m, ms = 1024, 50, 100, 0
rng = np.random.default_rng(0)
batches = []
for i in range(4):
    d = gen.generate_test_qp_batch(B, n, m, ms, 25, 100.0, rng=rng,
                                   dtype=np.float32)
    batches.append(tuple(jnp.asarray(d[k]) for k in
                         ('H', 'f', 'A', 'bupper', 'blower')))
st = _as_settings(None, jnp.float32)
sense0 = jnp.zeros((B, m), jnp.int32)


_stack = None


def timeit(fn, args_list, label, reps=3):
    # ONE device-side stack + ONE host fetch as the sync (per-output
    # fetches serialize ~32 ms of tunnel round-trip per batch into the
    # wall — see bench.py / CLAUDE.md)
    global _stack
    if _stack is None:
        _stack = jax.jit(lambda *fs: jnp.stack(fs))
    first = lambda o: jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(_stack(*[first(fn(*a)) for a in args_list]))  # warm
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        np.asarray(_stack(*[first(o) for o in outs]))
        dt = (time.perf_counter() - t0) / len(args_list)
        best = min(best, dt)
    print(f"{label:44s} {best*1e3:8.2f} ms/batch", flush=True)
    return best


# NOTE: every fn returns a (B,)-sized reduction, NOT the full result —
# host transfer of a 10 MB Rinv over the tunnel costs ~400 ms and would
# swamp the compute being measured.

@jax.jit
def fact_tile(H):
    return jnp.sum(chol_ops.batched_chol_rinv_tile(H), axis=(1, 2))


@jax.jit
def fact_dense(H):
    return jnp.sum(chol_ops.batched_chol_rinv_dense(H), axis=(1, 2))


@jax.jit
def fact_xla(H):
    with jax.default_matmul_precision('highest'):
        R = jnp.linalg.cholesky(H)
        I = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)
        Li = jax.scipy.linalg.solve_triangular(R, I, lower=True)
        return jnp.sum(jnp.swapaxes(Li, 1, 2), axis=(1, 2))


@jax.jit
def fact_prod(H):
    R, ok, reg, eps = chol_ops.batched_rinv_regularized(H, st)
    return jnp.sum(R, axis=(1, 2))


@jax.jit
def transform_full(H, f, A, bu, bl):
    with jax.default_matmul_precision('high'):
        Rb, okl, regl, eps_l = chol_ops.batched_rinv_regularized(H, st)
        ldpd = jax.vmap(
            lambda H_, f_, A_, bu_, bl_, R_: transform.build_ldp(
                H_, f_, A_, bu_, bl_, None, ms, st, Rinv=R_))(
            H, f, A, bu, bl, Rb)
    return (jnp.sum(ldpd.M, axis=(1, 2)) + jnp.sum(ldpd.dupper, axis=1)
            + jnp.sum(ldpd.v, axis=1))


def full_solve(H, f, A, bu, bl):
    out = batch_mod.solve_batch_pallas_jit(H, f, A, bu, bl, sense0, st,
                                           ms=ms, has_soft=False)
    return out.exitflag


targs = [(b[0],) for b in batches]
timeit(fact_tile, targs, "tile chol+inv kernel")
timeit(fact_dense, targs, "dense-mask chol+inv kernel")
timeit(fact_xla, targs, "XLA cholesky+triangular expanders")
timeit(fact_prod, targs, "regularized wrapper (production)")
timeit(transform_full, batches, "full transform (fact + M/v/d)")
timeit(full_solve, batches, "full pallas solve")
