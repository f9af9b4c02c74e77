"""Batched factorization ops (ops/chol.py): correctness of the three
formulations (XLA fori, unrolled Pallas in interpret mode, Newton-Schulz
inverse square root)."""
import numpy as np
import jax
import jax.numpy as jnp

from daqp_tpu.ops import chol


def _spd_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    return np.einsum('bij,bkj->bik', A, A) + np.eye(n, dtype=np.float32)


def test_batched_chol_rinv():
    H = _spd_batch(4, 10)
    R = np.asarray(jax.jit(chol.batched_chol_rinv)(jnp.asarray(H)))
    for b in range(4):
        L = np.linalg.cholesky(H[b].astype(np.float64))
        Rref = np.linalg.inv(L.T)
        assert np.abs(R[b] - Rref).max() < 1e-4


def test_pallas_chol_interpret():
    H = _spd_batch(128, 12, seed=1)
    f = jax.jit(lambda h: chol.batched_chol_rinv_pallas(h, interpret=True))
    R = np.asarray(f(jnp.asarray(H)))
    for b in (0, 64, 127):
        L = np.linalg.cholesky(H[b].astype(np.float64))
        Rref = np.linalg.inv(L.T)
        assert np.abs(R[b] - Rref).max() < 1e-4


def test_newton_schulz_invsqrt():
    H = _spd_batch(8, 16, seed=2)
    S = np.asarray(jax.jit(chol.batched_invsqrt)(jnp.asarray(H)))
    for b in range(8):
        Hinv = np.linalg.inv(H[b].astype(np.float64))
        rel = np.abs(S[b].astype(np.float64) @ S[b] - Hinv).max() \
            / np.abs(Hinv).max()
        assert rel < 1e-3, rel
