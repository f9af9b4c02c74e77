"""Batched (vmapped) MIQP branch-and-bound."""
import numpy as np

import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings


def test_batch_miqp_matches_single():
    rng = np.random.default_rng(41)
    B, n, m, ms, nb = 6, 8, 20, 4, 3
    Hs, fs, As, bus, bls = [], [], [], [], []
    for _ in range(B):
        M = rng.standard_normal((n, n))
        Hs.append(M.T @ M + 0.5 * np.eye(n))
        As.append(rng.standard_normal((m - ms, n)))
        bu = 15 * rng.random(m); bl = -15 * rng.random(m)
        f = 5 * rng.standard_normal(n); f[:nb] = -np.abs(f[:nb])
        bu[:nb] = 1.0; bl[:nb] = 0.0
        fs.append(f); bus.append(bu); bls.append(bl)
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    st = _as_settings(None, jnp.float64)
    out = batch_mod.solve_batch_miqp_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=ms, bin_ids=tuple(range(nb)))
    for b in range(B):
        ref = daqp_tpu.quadprog(Hs[b], fs[b], As[b], bus[b], bls[b],
                                sense[b], ms=ms)
        assert int(out.exitflag[b]) == int(ref.exitflag), b
        if int(ref.exitflag) == 1:
            assert abs(float(out.fval[b]) - float(ref.fval)) < 1e-8, b


def test_batch_miqp_pallas_waves():
    # Node-wave BnB on the Pallas tier (BASELINE config 5 path): per-lane
    # DFS stacks, batched kernel relaxations; flags and objectives vs the
    # single-lane BnB reference
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings

    B, n, m, nb = 128, 10, 24, 4
    rng = np.random.default_rng(31)
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
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    res = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st, ms=0,
        bin_ids=tuple(range(nb)), interpret=True)
    flags = np.asarray(res.exitflag)
    fv = np.asarray(res.fval)
    for b in range(0, B, 7):
        ref = daqp_tpu.quadprog(
            H[b].astype(np.float64), f[b].astype(np.float64),
            A[b].astype(np.float64), bu[b].astype(np.float64),
            bl[b].astype(np.float64), sense[b], ms=0)
        assert int(flags[b]) == int(ref.exitflag), b
        if int(ref.exitflag) == 1:
            assert abs(fv[b] - float(ref.fval)) \
                < 1e-3 * (1 + abs(float(ref.fval))), b


def test_batch_miqp_pallas_infeasible_lanes():
    # mixed batch: some lanes integer-infeasible
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings

    B, n = 128, 2
    H = np.tile(np.eye(n, dtype=np.float32)[None], (B, 1, 1))
    f = np.zeros((B, n), np.float32)
    A = np.tile(np.array([[1., 0], [0, 1], [1, 1]],
                         np.float32)[None], (B, 1, 1))
    bu = np.tile(np.array([1., 1., 0.4], np.float32)[None], (B, 1))
    bl = np.tile(np.array([0., 0., 0.3], np.float32)[None], (B, 1))
    bu[::2, 2] = 2.5                     # even lanes feasible (1+1 <= 2.5)
    bl[::2, 2] = 1.5
    sense = np.zeros((B, 3), np.int32)
    sense[:, :2] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    res = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st, ms=0, bin_ids=(0, 1),
        interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags[::2] == 1), np.unique(flags[::2])
    assert np.all(flags[1::2] == -1), np.unique(flags[1::2])


def test_batch_miqp_pallas_subopt_folding():
    # rel/abs suboptimality folded into the wave prune bound exactly as
    # bnb_core does (bnb.c:29-31,68): with a loose rel_subopt the driver
    # must return an incumbent within the tolerance of the true optimum
    # (and identical to the single-lane BnB under the same settings).
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings

    B, n, m, nb = 128, 10, 24, 4
    rng = np.random.default_rng(77)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + 0.5 * np.eye(n, dtype=np.float32)
    f = (8 * rng.standard_normal((B, n))).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (15 * rng.random((B, m))).astype(np.float32)
    bl = (-15 * rng.random((B, m))).astype(np.float32)
    A[:, :nb] = 0.0
    A[:, np.arange(nb), np.arange(nb)] = 1.0
    bu[:, :nb] = 1.0
    bl[:, :nb] = 0.0
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 1000, "rel_subopt": 0.3}, jnp.float32)
    res = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st, ms=0,
        bin_ids=tuple(range(nb)), interpret=True)
    flags = np.asarray(res.exitflag)
    fv = np.asarray(res.fval)
    nodes_subopt = np.asarray(res.iterations)
    for b in range(0, B, 11):
        ref = daqp_tpu.quadprog(
            H[b].astype(np.float64), f[b].astype(np.float64),
            A[b].astype(np.float64), bu[b].astype(np.float64),
            bl[b].astype(np.float64), sense[b], ms=0)
        if int(ref.exitflag) != 1:
            continue
        assert int(flags[b]) == 1, b
        # within the relative tolerance of the true optimum, on the
        # conservative side (fval >= optimum)
        fstar = float(ref.fval)
        assert fv[b] >= fstar - 1e-3 * (1 + abs(fstar)), (b, fv[b], fstar)
        assert fv[b] <= fstar + 0.3 * abs(fstar) + 1e-2, (b, fv[b], fstar)

    # exact run explores at least as many nodes on average
    st0 = _as_settings({"iter_limit": 1000}, jnp.float32)
    res0 = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st0, ms=0,
        bin_ids=tuple(range(nb)), interpret=True)
    assert np.mean(np.asarray(res0.iterations)) \
        >= np.mean(nodes_subopt) - 1e-9


def test_batch_pallas_fval_bound():
    # per-lane dominance cut in the kernel (daqp.c:20-23): a bound below
    # the optimum flags the lane infeasible, matching the flat tier
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=5,
                               dtype=np.float32)
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    base = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0,
                                            has_soft=False,
                                            interpret=True)
    fv = np.asarray(base.fval)
    assert np.all(np.asarray(base.exitflag) == 1)
    # bound below every lane's optimum -> all lanes cut as infeasible
    st_cut = _as_settings({"iter_limit": 400,
                           "fval_bound": float(fv.min()) - 10.0},
                          jnp.float32)
    cut = batch_mod.solve_batch_pallas_jit(*args, st=st_cut, ms=0,
                                           has_soft=False, interpret=True)
    assert np.all(np.asarray(cut.exitflag) == -1), \
        np.unique(np.asarray(cut.exitflag))
    # bound above every optimum -> unchanged
    st_ok = _as_settings({"iter_limit": 400,
                          "fval_bound": float(fv.max()) + 10.0},
                         jnp.float32)
    ok = batch_mod.solve_batch_pallas_jit(*args, st=st_ok, ms=0,
                                          has_soft=False, interpret=True)
    assert np.all(np.asarray(ok.exitflag) == 1)
    assert np.allclose(np.asarray(ok.x), np.asarray(base.x), atol=1e-5)


def test_batch_miqp_pallas_many_binaries():
    # VERDICT r4 #10: no binary-count cap on the wave tier.  nb = 33
    # spans two bitmask words; binaries 0/15/31/32 are made genuinely
    # fractional (f = -0.5 on coordinates with H = I puts the relaxation
    # optimum mid-interval) so branching exercises bits in BOTH words,
    # including bit 31 (the old single-word encoding's overflow edge).
    B, nb, mg = 3, 33, 6
    n = nb
    m = nb + mg
    rng = np.random.default_rng(61)
    H = np.broadcast_to(np.eye(n), (B, n, n)).copy()
    f = np.zeros((B, n))
    # most binaries pushed hard to an endpoint (no branch, zero-dual
    # endpoint rule)...
    f[:] = -3.0
    # ...except these, which are mid-interval => must branch
    frac_ids = [0, 15, 31, 32]
    for j in frac_ids:
        f[:, j] = -0.5
    A_bin = np.eye(n)
    A_gen = rng.standard_normal((mg, n))
    A = np.broadcast_to(np.vstack([A_bin, A_gen]), (B, m, n)).copy()
    bu = np.concatenate([np.ones(nb), 50 * np.ones(mg)])
    bl = np.concatenate([np.zeros(nb), -50 * np.ones(mg)])
    bu = np.broadcast_to(bu, (B, m)).copy()
    bl = np.broadcast_to(bl, (B, m)).copy()
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    out = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(A, jnp.float32), jnp.asarray(bu, jnp.float32),
        jnp.asarray(bl, jnp.float32), jnp.asarray(sense), st, ms=0,
        bin_ids=tuple(range(nb)), interpret=True, max_waves=64)
    flags = np.asarray(out.exitflag)
    assert np.all(flags == 1), flags
    xs = np.asarray(out.x)
    # every binary coordinate must sit at an endpoint
    bin_x = xs[:, :nb]
    assert np.all(np.minimum(np.abs(bin_x), np.abs(bin_x - 1.0)) < 1e-4)
    # separable objective => exact optimum known: 0.5 x^2 + f x over
    # {0, 1} per coordinate
    best = np.minimum(0.0, 0.5 + f).sum(axis=1)
    assert np.allclose(np.asarray(out.fval), best, atol=1e-4), \
        (np.asarray(out.fval), best)
