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
