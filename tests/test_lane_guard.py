"""v5e B>=1024 miscompile guard: every whole-batch kernel driver splits
oversized batches into <=_LANE_GUARD-lane programs (the trigger is the
vmapped batch size of ONE fused program — scripts/
repro_v5e_bool_scatter.py; B=1016 clean, B>=1024 corrupt).  CPU cannot
reproduce the miscompile itself; these tests pin the chunk PLUMBING
(pad + lax.map + merge, lane order restored) with a shrunken guard."""
import numpy as np
import pytest

import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch, generate_test_lp


@pytest.fixture()
def small_guard(monkeypatch):
    # must stay a multiple of the 128-lane tile (the real 512 is);
    # 128 is the smallest legal value and keeps interpret-mode cheap
    monkeypatch.setattr(batch_mod, "_LANE_GUARD", 128)


def test_guard_constant_is_v5e_safe():
    # the real guard must keep every program strictly below the 1024
    # trigger (1016 was the largest verified-clean size)
    assert batch_mod._LANE_GUARD <= 1016


def test_lp_driver_chunks(small_guard):
    B, n, m = 200, 6, 14                     # pads to 256 = 2 chunks
    rng = np.random.default_rng(5)
    probs = [generate_test_lp(n, m, 0, rng) for _ in range(B)]
    xs = np.stack([p[0] for p in probs])
    fs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float64)
    As = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float64)
    bus = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float64)
    bls = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float64)
    se = jnp.zeros((B, m), jnp.int32)
    st = _as_settings({"iter_limit": 2000}, jnp.float64)
    res = batch_mod.solve_batch_lp_pallas_jit(fs, As, bus, bls, se, st,
                                              ms=0, interpret=True)
    flags = np.asarray(res.exitflag)
    ok = flags == 1
    assert ok.mean() > 0.9, np.unique(flags, return_counts=True)
    # gate on the optimality certificate, not ||x - xref||: the random
    # LP generator draws multipliers in [0, 1) and near-zero entries
    # make the optimal vertex non-unique (an alternative optimum is
    # correct but far from xref)
    x = np.asarray(res.x)
    fv_ref = np.einsum('bn,bn->b', np.asarray(fs), xs)
    fv_got = np.einsum('bn,bn->b', np.asarray(fs), x)
    gap = np.abs(fv_got - fv_ref) / (1.0 + np.abs(fv_ref))
    Ax = np.einsum('bmn,bn->bm', np.asarray(As), x)
    feas = np.maximum((Ax - np.asarray(bus)).max(axis=1),
                      (np.asarray(bls) - Ax).max(axis=1))
    assert gap[ok].max() < 1e-4, gap[ok].max()
    assert feas[ok].max() < 1e-4, feas[ok].max()


def test_prox_driver_chunks(small_guard):
    # constructed PD QPs through the prox driver (PD H = one-shot
    # regime): the test pins the chunk plumbing + lane-order merge
    B, n, m = 140, 6, 14                     # pads to 256 = 2 chunks
    d = generate_test_qp_batch(B, n, m, 0, 4, 1e2, rng=7)
    st = _as_settings({"iter_limit": 2000}, jnp.float64)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    res = batch_mod.solve_batch_prox_pallas_jit(*args, st, ms=0,
                                                interpret=True)
    flags = np.asarray(res.exitflag)
    assert (flags > 0).all(), np.unique(flags)
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-4, err.max()


def test_miqp_driver_chunks(small_guard):
    B, n, m, nb = 140, 6, 12, 3              # pads to 256 = 2 chunks
    rng = np.random.default_rng(11)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + 0.5 * np.eye(n,
                                                      dtype=np.float32)
    f = (8 * rng.standard_normal((B, n))).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (15 * rng.random((B, m))).astype(np.float32)
    bl = (-15 * rng.random((B, m))).astype(np.float32)
    A[:, :nb] = 0.0
    A[:, np.arange(nb), np.arange(nb)] = 1.0
    bu[:, :nb] = 1.0
    bl[:, :nb] = 0.0
    se = np.zeros((B, m), np.int32)
    se[:, :nb] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(se), st, ms=0,
        bin_ids=tuple(range(nb)), interpret=True)
    flags = np.asarray(res.exitflag)
    for b in (0, 77, 139):
        ref = daqp_tpu.quadprog(H[b].astype(np.float64),
                                f[b].astype(np.float64),
                                A[b].astype(np.float64),
                                bu[b].astype(np.float64),
                                bl[b].astype(np.float64), se[b], ms=0)
        assert int(flags[b]) == int(ref.exitflag), b
        if int(ref.exitflag) == 1:
            assert abs(float(np.asarray(res.fval)[b]) - float(ref.fval)) \
                < 1e-3 * (1 + abs(float(ref.fval))), b


def test_hiqp_driver_chunks(small_guard):
    B, n = 150, 6                            # pads to 256 = 2 chunks
    bp = (0, 4, 8)
    m = bp[-1]
    rng = np.random.default_rng(13)
    As = rng.standard_normal((B, m, n)).astype(np.float32)
    x0 = rng.standard_normal((B, n)).astype(np.float32)
    b0 = np.einsum('bmn,bn->bm', As, x0)
    bus = (b0 + 0.2).astype(np.float32)
    bls = (b0 - 0.4).astype(np.float32)
    se = np.zeros((B, m), np.int32)
    fs = np.zeros((B, n), np.float32)
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.asarray(fs), jnp.asarray(As), jnp.asarray(bus),
        jnp.asarray(bls), jnp.asarray(se), st, ms=0, break_points=bp,
        interpret=True)
    flags = np.asarray(res.exitflag)
    assert (flags > 0).all(), np.unique(flags)
