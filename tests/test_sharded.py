"""Mesh-sharded solves on the 8-virtual-device CPU mesh: batch sharding
with statistics collectives, and the tree-sharded MIQP with incumbent-
bound exchange (SURVEY.md §2.3 components — no reference analogue)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu.api import _as_settings
from daqp_tpu.parallel import make_mesh, solve_batch_sharded, \
    solve_miqp_sharded
from tests.gen import generate_test_qp_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_solve_batch_sharded(mesh):
    B = 16
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=31)
    st = _as_settings(None, jnp.float64)
    res, stats = solve_batch_sharded(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(d['A']),
        jnp.asarray(d['bupper']), jnp.asarray(d['blower']),
        jnp.asarray(d['sense']), st, mesh, ms=0)
    assert int(stats.n_optimal) == B
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-6


def test_solve_batch_sharded_fast_tiers(mesh):
    # the sharded path must compose with the FAST per-device solvers
    # (round-1 weakness: it wrapped only the naive tier); all tiers must
    # agree with the constructed optima and with each other
    B = 16
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=77)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    st = _as_settings(None, jnp.float64)
    res_f, stats_f = solve_batch_sharded(*args, st, mesh, ms=0,
                                         tier="flat", lane_chunk=2)
    assert int(stats_f.n_optimal) == B
    err = np.linalg.norm(np.asarray(res_f.x) - d['x'], axis=1)
    assert err.max() < 1e-6

    res_n, _ = solve_batch_sharded(*args, st, mesh, ms=0, tier="naive")
    assert np.allclose(np.asarray(res_f.x), np.asarray(res_n.x),
                       atol=1e-8)

    res_p, stats_p = solve_batch_sharded(*args, st, mesh, ms=0,
                                         tier="pallas", interpret=True)
    assert int(stats_p.n_optimal) == B
    # pallas state is f32 internally; compare at the f32 gate
    err_p = np.linalg.norm(np.asarray(res_p.x) - d['x'], axis=1)
    assert err_p.max() < 2e-3


def test_solve_miqp_sharded_matches_single(mesh):
    rng = np.random.default_rng(37)
    n, m, ms, nb = 12, 30, 6, 4
    M = rng.standard_normal((n, n))
    H = M.T @ M + 0.5 * np.eye(n)
    A = rng.standard_normal((m - ms, n))
    bu = 20 * rng.random(m)
    bl = -20 * rng.random(m)
    f = 10 * rng.standard_normal(n)
    f[:nb] = -np.abs(f[:nb])
    bu[:nb] = 1.0
    bl[:nb] = 0.0
    sense = np.zeros(m, np.int32)
    sense[:nb] = daqp_tpu.BINARY

    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms)
    assert int(ref.exitflag) == daqp_tpu.EXIT_OPTIMAL

    st = _as_settings(None, jnp.float64)
    x, fval, status, nodes = solve_miqp_sharded(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A),
        jnp.asarray(bu), jnp.asarray(bl), sense, ms, st, mesh,
        rounds=4, node_budget=8)
    assert int(status) == daqp_tpu.EXIT_OPTIMAL
    assert abs(float(fval) - float(ref.fval)) < 1e-6, \
        (float(fval), float(ref.fval))
    xb = np.asarray(x)[:nb]
    assert np.all((np.abs(xb - 1) < 1e-5) | (np.abs(xb) < 1e-5))


def test_solve_batch_sharded_prox_tier(mesh):
    # semidefinite-H shard batches through the batched proximal driver
    from daqp_tpu.parallel import solve_batch_sharded
    B, n, m, rank = 16, 8, 20, 5
    rng = np.random.default_rng(91)
    Q = rng.standard_normal((B, n, rank))
    H = np.einsum('bir,bjr->bij', Q, Q)
    f = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    bu = 5 + 5 * rng.random((B, m))
    bl = -(5 + 5 * rng.random((B, m)))
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    res, stats = solve_batch_sharded(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(A, jnp.float32), jnp.asarray(bu, jnp.float32),
        jnp.asarray(bl, jnp.float32), jnp.asarray(sense), st, mesh,
        ms=0, tier="prox", interpret=True)
    assert int(stats.n_optimal) == B, np.asarray(res.exitflag)
    import daqp_tpu
    xs = np.asarray(res.x)
    for b in range(0, B, 5):
        ref = daqp_tpu.quadprog(H[b], f[b], A[b], bu[b], bl[b], ms=0)
        # rank-deficient H can have NON-UNIQUE optima: compare the
        # objective and feasibility, not the point
        fval = 0.5 * xs[b] @ H[b] @ xs[b] + f[b] @ xs[b]
        assert abs(fval - float(ref.fval)) \
            < 2e-3 * (1 + abs(float(ref.fval))), b
        v = A[b] @ xs[b]
        assert np.all(v <= bu[b] + 1e-3) and np.all(v >= bl[b] - 1e-3), b


def test_solve_batch_miqp_sharded(mesh):
    # instance-parallel MIQP batch: node-wave driver per shard
    from daqp_tpu.parallel import solve_batch_miqp_sharded
    import daqp_tpu
    B, n, m, nb = 16, 6, 14, 3
    rng = np.random.default_rng(93)
    Q = rng.standard_normal((B, n, n))
    H = np.einsum('bij,bkj->bik', Q, Q) + 0.5 * np.eye(n)
    f = 8 * rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    bu = 15 * rng.random((B, m))
    bl = -15 * rng.random((B, m))
    A[:, :nb] = 0.0
    A[:, np.arange(nb), np.arange(nb)] = 1.0
    bu[:, :nb] = 1.0
    bl[:, :nb] = 0.0
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    res, stats = solve_batch_miqp_sharded(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(A, jnp.float32), jnp.asarray(bu, jnp.float32),
        jnp.asarray(bl, jnp.float32), jnp.asarray(sense), st, mesh,
        ms=0, bin_ids=tuple(range(nb)), interpret=True)
    flags = np.asarray(res.exitflag)
    fv = np.asarray(res.fval)
    for b in range(B):
        ref = daqp_tpu.quadprog(H[b], f[b], A[b], bu[b], bl[b],
                                sense[b], ms=0)
        assert int(flags[b]) == int(ref.exitflag), b
        if int(ref.exitflag) == 1:
            assert abs(fv[b] - float(ref.fval)) \
                < 1e-3 * (1 + abs(float(ref.fval))), b
