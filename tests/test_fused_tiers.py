"""CPU-interpret coverage for the fused outer-loop kernels
(run_prox_segment / run_avi_segment / run_lp_segment): the production
gate enables them only on the TPU backend, so these tests force the
fused path through ``fused="force"`` with the Pallas interpreter.  The
chip gates live in scripts/tpu_smoke.py."""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch, generate_test_avi_two_sided


def test_fused_prox_interpret():
    B, n, m = 128, 8, 18
    d = generate_test_qp_batch(B, n, m, 0, 5, 1e2, rng=3,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    res = batch_mod.solve_batch_prox_pallas_jit(
        *args, st, ms=0, interpret=True, fused="force")
    flags = np.asarray(res.exitflag)
    assert (flags > 0).all(), np.unique(flags)
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-3, err.max()


def test_fused_avi_interpret():
    rng = np.random.default_rng(5)
    B, n, m = 128, 8, 18
    probs = [generate_test_avi_two_sided(n, m, rng) for _ in range(B)]
    xs_ref = np.stack([p[0] for p in probs])
    Hs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    fs = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    As = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    bus = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
    bls = jnp.asarray(np.stack([p[5] for p in probs]), jnp.float32)
    se = jnp.zeros((B, m), jnp.int32)
    st = _as_settings({"iter_limit": 1500}, jnp.float32)
    res = batch_mod.solve_batch_avi_pallas_jit(
        Hs, fs, As, bus, bls, se, st, ms=0, interpret=True,
        fused="force")
    flags = np.asarray(res.exitflag)
    err = np.abs(np.asarray(res.x) - xs_ref).max(axis=1)
    ok = (flags == 1) & (err < 1e-3)
    assert ok.mean() >= 0.95, (np.unique(flags, return_counts=True),
                               err.max())


def test_fused_lp_interpret():
    from tests.gen import generate_test_lp
    rng = np.random.default_rng(7)
    B, n, m = 128, 6, 16
    probs = [generate_test_lp(n, m, 0, rng) for _ in range(B)]
    xs = np.stack([p[0] for p in probs])
    fs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    As = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    bus = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    bls = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
    se = jnp.zeros((B, m), jnp.int32)
    st = _as_settings({"iter_limit": 3000}, jnp.float32)
    res = batch_mod.solve_batch_lp_pallas_jit(
        fs, As, bus, bls, se, st, ms=0, interpret=True, fused="force")
    flags = np.asarray(res.exitflag)
    ok = flags == 1
    assert ok.mean() >= 0.9, np.unique(flags, return_counts=True)
    x = np.asarray(res.x)
    fv_ref = np.einsum('bn,bn->b', np.asarray(fs), xs)
    fv_got = np.einsum('bn,bn->b', np.asarray(fs), x)
    gap = np.abs(fv_got - fv_ref) / (1.0 + np.abs(fv_ref))
    assert gap[ok].max() < 2e-4, gap[ok].max()
