"""AOT warm-up surface (daqp_tpu.warmup).

The kernel tiers Mosaic-compile only on real TPU hardware (covered by
scripts/tpu_smoke.py / bench paths); on CPU we exercise the lowering
machinery through the flat tier plus argument validation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import daqp_tpu


def test_warmup_flat_compiles_and_runs():
    n, m, B = 4, 7, 8
    ex = daqp_tpu.warmup(n, m, B, tiers=("flat",), dtype=jnp.float64)
    assert "flat" in ex
    # the jit cache now holds the executable: a real call must not
    # retrace (smoke: it just runs and solves)
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((B, n, n))
    H = np.einsum('bij,bkj->bik', Q, Q) + np.eye(n)
    f = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    bu = 10 * np.ones((B, m))
    bl = -10 * np.ones((B, m))
    res = daqp_tpu.solve_batch(jnp.asarray(H), jnp.asarray(f),
                               jnp.asarray(A), jnp.asarray(bu),
                               jnp.asarray(bl))
    assert np.all(np.asarray(res.exitflag) == 1)


def test_warmup_rejects_unknown_tier():
    with pytest.raises(ValueError):
        daqp_tpu.warmup(4, 7, 8, tiers=("nope",))
