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


def test_tile_chol_interpret():
    H = _spd_batch(128, 13, seed=3)
    f = jax.jit(lambda h: chol.batched_chol_rinv_tile(h, interpret=True))
    R = np.asarray(f(jnp.asarray(H)))
    for b in (0, 31, 127):
        L = np.linalg.cholesky(H[b].astype(np.float64))
        Rref = np.linalg.inv(L.T)
        assert np.abs(np.tril(R[b], -1)).max() == 0.0     # upper triangular
        assert np.abs(R[b] - Rref).max() < 1e-4


def test_tile_rinv_regularized_matches_factorize_hessian():
    # healthy SPD lanes: tile path == per-lane factorize_hessian (both
    # produce THE Cholesky Rinv); a singular lane gets the full-shift
    # retry (utils.c:253-283) and reports reg_mask
    from daqp_tpu import transform
    from daqp_tpu.api import _as_settings
    st = _as_settings(None, jnp.float32)
    H = _spd_batch(128, 9, seed=4)
    H[3] = np.outer(np.arange(9.0), np.arange(9.0)).astype(np.float32) \
        + np.diag(np.arange(9, dtype=np.float32) * 0)    # rank-1, singular
    fn = jax.jit(lambda h: chol.batched_rinv_regularized(
        h, st, interpret=True))
    R, ok, reg, eps = fn(jnp.asarray(H))
    R, ok, reg, eps = (np.asarray(v) for v in (R, ok, reg, eps))
    assert ok.all()
    assert reg[3] and float(eps[3]) > 0
    assert not reg[[0, 1, 2] + list(range(4, 128))].any()
    Rref = np.asarray(jax.vmap(
        lambda h: transform.factorize_hessian(h, st)[0])(jnp.asarray(H)))
    healthy = [b for b in range(128) if b != 3]
    for b in (0, 5, 77):
        assert np.abs(R[b] - Rref[b]).max() < 1e-4 * np.abs(Rref[b]).max()


def test_newton_schulz_invsqrt():
    H = _spd_batch(8, 16, seed=2)
    S = np.asarray(jax.jit(chol.batched_invsqrt)(jnp.asarray(H)))
    for b in range(8):
        Hinv = np.linalg.inv(H[b].astype(np.float64))
        rel = np.abs(S[b].astype(np.float64) @ S[b] - Hinv).max() \
            / np.abs(Hinv).max()
        assert rel < 1e-3, rel
