"""Time-limit tests — ports of the reference testset 'Time limit'
(interfaces/daqp-julia/test/core_tests.jl:498-535)."""
import numpy as np

import daqp_tpu
from tests.gen import generate_test_qp


def test_time_limit_triggers():
    rng = np.random.default_rng(83)
    x, H, f, A, bu, bl, sense = generate_test_qp(100, 500, 50, 80, 1e2, rng)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=50,
                            settings={"time_limit": 1e-9})
    assert int(res.exitflag) == daqp_tpu.EXIT_TIMELIMIT, int(res.exitflag)


def test_time_limit_generous():
    rng = np.random.default_rng(83)
    x, H, f, A, bu, bl, sense = generate_test_qp(100, 500, 50, 80, 1e2, rng)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=50,
                            settings={"time_limit": 100.0})
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4


def test_time_limit_avi_outer():
    # The AVI DR outer loop must check the wall clock itself: in the
    # stable phase each inner solve does 1 iteration and never reaches the
    # inner every-32-iterations check.
    rng = np.random.default_rng(5)
    n, m = 50, 150
    Hn = rng.standard_normal((n, n))
    H = Hn @ Hn.T + 0.5 * np.eye(n) + 0.3 * (Hn - Hn.T)  # asymmetric PD part
    f = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    bu = 2 + 2 * rng.random(m)
    bl = -(2 + 2 * rng.random(m))
    res = daqp_tpu.avi(H, f, A, bu, bl, settings={"time_limit": 1e-9})
    assert int(res.exitflag) in (daqp_tpu.EXIT_TIMELIMIT,), int(res.exitflag)


def test_time_limit_prox_outer():
    # Semidefinite H forces the proximal outer loop; its per-pass deadline
    # check must fire even when every inner solve is short.
    rng = np.random.default_rng(6)
    n, m, rank = 40, 80, 20
    Q = rng.standard_normal((n, rank))
    H = Q @ Q.T
    f = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    bu = 5 + 5 * rng.random(m)
    bl = -(5 + 5 * rng.random(m))
    res = daqp_tpu.quadprog(H, f, A, bu, bl, None, ms=0,
                            settings={"time_limit": 1e-9})
    assert int(res.exitflag) == daqp_tpu.EXIT_TIMELIMIT, int(res.exitflag)


def test_time_limit_bnb_tree_level():
    # core_tests.jl:514-534: node relaxations can each finish before the
    # inner periodic check; the tree-level check must still enforce it.
    rng = np.random.default_rng(1)
    nt, nbt, mt = 30, 14, 6
    Qt = rng.standard_normal((nt, nt))
    Ht = Qt.T @ Qt / nt + 0.2 * np.eye(nt)
    target = 0.15 + 0.7 * rng.random(nt)
    ft = -Ht @ target
    At = np.zeros((mt, nt))
    for row in range(mt):
        At[row, :nbt] = 0.2 + rng.random(nbt)
        At[row, nbt:] = 0.1 * rng.standard_normal(nt - nbt)
    center = At @ target
    width = 0.15 + 0.15 * rng.random(mt)
    but = np.concatenate([np.ones(nbt), np.full(nt - nbt, 2.0),
                          center + width])
    blt = np.concatenate([np.zeros(nbt), np.full(nt - nbt, -2.0),
                          center - width])
    sense = np.concatenate([np.full(nbt, daqp_tpu.BINARY, np.int32),
                            np.zeros(nt - nbt + mt, np.int32)])
    res = daqp_tpu.quadprog(Ht, ft, At, but, blt, sense, ms=nt,
                            settings={"time_limit": 1e-9})
    assert int(res.exitflag) == daqp_tpu.EXIT_TIMELIMIT, int(res.exitflag)
    assert int(res.nodes) <= 33, int(res.nodes)


def test_time_limit_batched_flat():
    # batched flat tier: an already-expired deadline returns per-lane
    # EXIT_TIMELIMIT from every chunk (daqp.c:95-103 at chunk granularity)
    import time
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.types import EXIT_TIMELIMIT
    from tests.gen import generate_test_qp_batch

    B, n, m = 24, 8, 16
    d = generate_test_qp_batch(B, n, m, 0, 5, 1e2, rng=61)
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    st = _as_settings(None, jnp.float64)
    expired = jnp.asarray(time.perf_counter() - 1.0, jnp.float64)
    r = batch_mod.solve_batch_flat_jit(*args, st=st, ms=0,
                                       deadline=expired)
    assert np.all(np.asarray(r.exitflag) == EXIT_TIMELIMIT), \
        np.unique(np.asarray(r.exitflag))
    # a generous deadline changes nothing
    far = jnp.asarray(time.perf_counter() + 1e6, jnp.float64)
    r2 = batch_mod.solve_batch_flat_jit(*args, st=st, ms=0, deadline=far)
    assert np.all(np.asarray(r2.exitflag) == 1)
    # the public wrapper maps settings.time_limit to the deadline
    r3 = batch_mod.solve_batch(d['H'], d['f'], d['A'], d['bupper'],
                               d['blower'], d['sense'], ms=0,
                               settings=_as_settings(
                                   {"time_limit": 1e6}, jnp.float64))
    assert np.all(np.asarray(r3.exitflag) == 1)


def test_time_limit_batched_kernel():
    # kernel tier (slot path): round-granularity deadline; expired ->
    # per-lane EXIT_TIMELIMIT, generous -> untouched
    import time
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.types import EXIT_TIMELIMIT
    from tests.gen import generate_test_qp_batch

    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=62,
                               dtype=np.float32)
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    expired = jnp.asarray(time.perf_counter() - 1.0, jnp.float64)
    r = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0,
                                         has_soft=False, interpret=True,
                                         deadline=expired)
    assert np.all(np.asarray(r.exitflag) == EXIT_TIMELIMIT), \
        np.unique(np.asarray(r.exitflag))
    far = jnp.asarray(time.perf_counter() + 1e6, jnp.float64)
    r2 = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0,
                                          has_soft=False, interpret=True,
                                          deadline=far)
    assert np.all(np.asarray(r2.exitflag) == 1)
