"""Batched AVI tier (batch.solve_batch_avi_pallas_jit): the DR splitting
of daqp_solve_avi (avi.c:6-101) carried by one outer loop over the
whole-batch slot-kernel state — differential vs the single-instance
``daqp_tpu.avi`` on the reference AVI generator (utils.jl:91-115 port)."""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_avi


def test_batch_avi_differential():
    rng = np.random.default_rng(41)
    B, n, m = 16, 8, 20
    xs_ref, Hs, fs, As, bus, bls = [], [], [], [], [], []
    for _ in range(B):
        x, H, f, A, bu = generate_test_avi(n, m, rng)
        xs_ref.append(x); Hs.append(H); fs.append(f)
        As.append(A); bus.append(bu); bls.append(np.full(m, -1e30))
    xs_ref = np.stack(xs_ref)
    Hs = np.stack(Hs); fs = np.stack(fs); As = np.stack(As)
    bus = np.stack(bus); bls = np.stack(bls)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1500}, jnp.float32)
    res = batch_mod.solve_batch_avi_pallas_jit(
        jnp.asarray(Hs, jnp.float32), jnp.asarray(fs, jnp.float32),
        jnp.asarray(As, jnp.float32), jnp.asarray(bus, jnp.float32),
        jnp.asarray(bls, jnp.float32), jnp.asarray(sense), st, ms=0,
        interpret=True)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    ok = flags == 1
    assert ok.mean() >= 0.9, np.unique(flags, return_counts=True)
    err = np.abs(xs - xs_ref).max(axis=1)
    assert err[ok].max() < 1e-3, err[ok].max()
    # single-lane differential vs the f64 AVI path
    for b in np.flatnonzero(ok)[::5]:
        one = daqp_tpu.avi(Hs[b], fs[b], As[b], bus[b], bls[b], ms=0)
        assert int(one.exitflag) == 1
        assert np.abs(xs[b] - np.asarray(one.x)).max() < 1e-3, b


def test_batch_avi_unconstrained_shortcut():
    # lanes whose unconstrained AVI point is interior exit immediately
    rng = np.random.default_rng(3)
    B, n, m = 8, 5, 10
    Q = rng.standard_normal((B, n, n))
    Hs = np.einsum('bij,bkj->bik', Q, Q) + 2 * np.eye(n)
    Hs = Hs + 0.1 * rng.standard_normal((B, n, n))   # asymmetric part
    fs = 0.01 * rng.standard_normal((B, n))
    As = rng.standard_normal((B, m, n))
    bus = np.full((B, m), 50.0)
    bls = np.full((B, m), -50.0)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings(None, jnp.float32)
    res = batch_mod.solve_batch_avi_pallas_jit(
        jnp.asarray(Hs, jnp.float32), jnp.asarray(fs, jnp.float32),
        jnp.asarray(As, jnp.float32), jnp.asarray(bus, jnp.float32),
        jnp.asarray(bls, jnp.float32), jnp.asarray(sense), st, ms=0,
        interpret=True)
    flags = np.asarray(res.exitflag)
    assert (flags == 1).all(), np.unique(flags)
    # x solves H x = -f
    r = np.einsum('bij,bj->bi', Hs, np.asarray(res.x)) + fs
    assert np.abs(r).max() < 1e-3, np.abs(r).max()


def test_batch_avi_full_tile_two_sided():
    # VERDICT r4 #5: full 128-lane tile, reference-ish size, TWO-SIDED
    # bounds (generate_test_avi_two_sided), every lane accounted:
    # optimal lanes within gate, non-optimal lanes loud and re-solved
    # by the f64 single-instance AVI
    from tests.gen import generate_test_avi_two_sided
    rng = np.random.default_rng(83)
    B, n, m = 128, 20, 50
    probs = [generate_test_avi_two_sided(n, m, rng) for _ in range(B)]
    xs_ref = np.stack([p[0] for p in probs])
    Hs = np.stack([p[1] for p in probs])
    fs = np.stack([p[2] for p in probs])
    As = np.stack([p[3] for p in probs])
    bus = np.stack([p[4] for p in probs])
    bls = np.stack([p[5] for p in probs])
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 3000}, jnp.float32)
    res = batch_mod.solve_batch_avi_pallas_jit(
        jnp.asarray(Hs, jnp.float32), jnp.asarray(fs, jnp.float32),
        jnp.asarray(As, jnp.float32), jnp.asarray(bus, jnp.float32),
        jnp.asarray(bls, jnp.float32), jnp.asarray(sense), st, ms=0,
        interpret=True)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    err = np.abs(xs - xs_ref).max(axis=1)
    for b in range(B):
        if flags[b] == 1:
            assert err[b] < 1e-3, (b, err[b])
        else:
            assert flags[b] < 0, (b, flags[b])   # loud, never silent
            one = daqp_tpu.avi(Hs[b], fs[b], As[b], bus[b], bls[b],
                               ms=0)
            assert int(one.exitflag) == 1, b
            assert np.abs(np.asarray(one.x) - xs_ref[b]).max() < 1e-5, b


def test_batch_avi_backstop():
    # loud lanes escalate through the f64 single-instance AVI (the
    # recovery-ladder tail for this tier); inject a "failure" by
    # flag-flipping a healthy lane and confirm the backstop re-solves it
    from tests.gen import generate_test_avi_two_sided
    rng = np.random.default_rng(47)
    B, n, m = 8, 8, 20
    probs = [generate_test_avi_two_sided(n, m, rng) for _ in range(B)]
    xs_ref = np.stack([p[0] for p in probs])
    Hs = np.stack([p[1] for p in probs])
    fs = np.stack([p[2] for p in probs])
    As = np.stack([p[3] for p in probs])
    bus = np.stack([p[4] for p in probs])
    bls = np.stack([p[5] for p in probs])
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1500}, jnp.float32)
    res = batch_mod.solve_batch_avi_pallas_jit(
        jnp.asarray(Hs, jnp.float32), jnp.asarray(fs, jnp.float32),
        jnp.asarray(As, jnp.float32), jnp.asarray(bus, jnp.float32),
        jnp.asarray(bls, jnp.float32), jnp.asarray(sense), st, ms=0,
        interpret=True)
    flags = np.asarray(res.exitflag).copy()
    # inject: mark lane 3 loud with garbage x
    flags[3] = -2
    x_bad = np.asarray(res.x).copy()
    x_bad[3] = 1e9
    injected = res._replace(exitflag=jnp.asarray(flags, jnp.int32),
                            x=jnp.asarray(x_bad))
    rep = batch_mod.backstop_resolve_avi(injected, Hs, fs, As, bus, bls,
                                         sense, ms=0)
    flags2 = np.asarray(rep.exitflag)
    assert flags2[3] == 1, flags2
    assert np.abs(np.asarray(rep.x)[3] - xs_ref[3]).max() < 1e-5
    # untouched lanes unchanged
    for b in range(B):
        if b != 3 and flags[b] == 1:
            assert np.allclose(np.asarray(rep.x)[b],
                               np.asarray(res.x)[b])
