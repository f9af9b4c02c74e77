"""Model lifecycle tests: setup/solve/update/warm re-solve/settings.

Mirrors the reference testset 'Model interface' (core_tests.jl:203-229) and
the MPC update contract (docs/docs/c.md:60-73: update only f and bounds,
keep the factorization and working set)."""
import numpy as np

import daqp_tpu
from tests.gen import generate_test_qp


def test_model_setup_solve():
    rng = np.random.default_rng(61)
    x, H, f, A, bu, bl, sense = generate_test_qp(20, 100, 10, 15, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, bu, bl, sense, ms=10)
    res = d.solve()
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4
    # KKT stationarity (core_tests.jl:210): ||Hx + f + A'lam|| small
    lam = np.asarray(res.lam)
    grad = H @ np.asarray(res.x) + f
    grad[:10] += lam[:10]
    grad += A.T @ lam[10:]
    assert np.linalg.norm(grad) < 1e-5


def test_model_warm_resolve_one_iteration():
    rng = np.random.default_rng(67)
    x, H, f, A, bu, bl, sense = generate_test_qp(20, 100, 0, 15, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, bu, bl, sense, ms=0)
    r1 = d.solve()
    assert int(r1.exitflag) == daqp_tpu.EXIT_OPTIMAL
    r2 = d.solve()   # warm: active set already optimal
    assert int(r2.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert int(r2.iterations) == 1, int(r2.iterations)
    assert np.allclose(np.asarray(r2.x), np.asarray(r1.x), atol=1e-10)


def test_model_update_fb_warm():
    # MPC pattern: perturb f and b slightly, expect few iterations and a
    # correct re-solve (persistent factorization + working set)
    rng = np.random.default_rng(71)
    x, H, f, A, bu, bl, sense = generate_test_qp(20, 100, 0, 15, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, bu, bl, sense, ms=0)
    r1 = d.solve()
    f2 = f * 1.001
    bu2 = bu + 1e-4
    bl2 = bl - 1e-4
    d.update(f=f2, bupper=bu2, blower=bl2)
    r2 = d.solve()
    assert int(r2.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert int(r2.iterations) <= 5, int(r2.iterations)
    # Reference check: solve the perturbed problem cold
    ref = daqp_tpu.quadprog(H, f2, A, bu2, bl2, sense, ms=0)
    assert np.allclose(np.asarray(r2.x), np.asarray(ref.x), atol=1e-8)


def test_model_update_structural():
    rng = np.random.default_rng(73)
    x1, H1, f1, A1, bu1, bl1, s1 = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    x2, H2, f2, A2, bu2, bl2, s2 = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H1, f1, A1, bu1, bl1, s1, ms=0)
    r1 = d.solve()
    assert np.linalg.norm(np.asarray(r1.x) - x1) < 1e-4
    d.update(H=H2, f=f2, A=A2, bupper=bu2, blower=bl2)
    r2 = d.solve()
    assert np.linalg.norm(np.asarray(r2.x) - x2) < 1e-4


def test_model_settings():
    d = daqp_tpu.Model()
    s = d.settings({"iter_limit": 123})
    assert s["iter_limit"] == 123


def test_model_avi_update_resolve():
    # core_tests.jl:414-425: update then re-solve an AVI model
    from tests.gen import generate_test_avi
    rng = np.random.default_rng(79)
    x, H, f, A, b = generate_test_avi(10, 50, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, b, is_avi=True, ms=0)
    r1 = d.solve()
    assert int(r1.exitflag) > 0
    d.update(f=-f)
    r2 = d.solve()
    assert int(r2.exitflag) > 0


def test_model_update_sense_only_no_refactor():
    # UPDATE_sense (utils.c:31-39): swapping sense bits must not
    # refactorize or rebuild M/v/d — the cached Rinv object survives —
    # and the next solve matches a fresh setup with the same sense.
    rng = np.random.default_rng(101)
    x, H, f, A, bu, bl, sense = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, bu, bl, sense, ms=0)
    r1 = d.solve()
    assert np.linalg.norm(np.asarray(r1.x) - x) < 1e-4
    rinv_before = d._ldpd.Rinv
    m_before = d._ldpd.M

    sense2 = np.array(sense, np.int32)
    sense2[0] |= daqp_tpu.SOFT            # soften one row
    d.update(sense=sense2)
    assert d._ldpd.Rinv is rinv_before    # no refactorization
    assert d._ldpd.M is m_before          # no M rebuild
    r2 = d.solve()

    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense2, ms=0)
    assert int(r2.exitflag) == int(ref.exitflag)
    assert np.linalg.norm(np.asarray(r2.x) - np.asarray(ref.x)) < 1e-8


def test_model_update_sense_warm_activation():
    # activating via sense bits after setup: the cold re-solve must
    # enforce the new ACTIVE rows like a fresh warm start would
    rng = np.random.default_rng(103)
    x, H, f, A, bu, bl, sense = generate_test_qp(8, 20, 0, 5, 1e2, rng)
    d = daqp_tpu.Model()
    d.setup(H, f, A, bu, bl, sense, ms=0)
    r1 = d.solve()
    lam = np.asarray(r1.lam)
    sense2 = np.array(sense, np.int32)
    for i in np.nonzero(np.abs(lam) > 1e-9)[0]:
        sense2[i] |= daqp_tpu.ACTIVE
        if lam[i] < 0:
            sense2[i] |= daqp_tpu.LOWER
    d.update(sense=sense2)
    r2 = d.solve()
    assert int(r2.iterations) == 1        # optimal set pre-activated
    assert np.linalg.norm(np.asarray(r2.x) - np.asarray(r1.x)) < 1e-7


def test_model_update_A_reuses_factorization():
    # UPDATE_M (utils.c:72-76): a new A rebuilds M/d against the CACHED
    # Rinv — results must match a fresh setup
    rng = np.random.default_rng(105)
    x1, H, f, A1, bu, bl, sense = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    A2 = A1 + 0.05 * rng.standard_normal(A1.shape)
    d = daqp_tpu.Model()
    d.setup(H, f, A1, bu, bl, sense, ms=0)
    r1 = d.solve()
    rinv_before = d._ldpd.Rinv
    d.update(A=A2)
    assert d._ldpd.Rinv is rinv_before    # factorization reused
    r2 = d.solve()
    ref = daqp_tpu.quadprog(H, f, A2, bu, bl, sense, ms=0)
    assert int(r2.exitflag) == int(ref.exitflag)
    assert np.linalg.norm(np.asarray(r2.x) - np.asarray(ref.x)) < 1e-8


def test_model_update_break_points_only():
    # UPDATE_hierarchy (utils.c:115-118): swap levels without re-setup
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    bu = np.array([1.0, 1.0, 5.0])
    bl = np.array([1.0, -1.0, -5.0])
    d = daqp_tpu.Model()
    d.setup(np.eye(2), np.zeros(2), A, bu, bl, break_points=(2, 3))
    r1 = d.solve()
    d.update(break_points=(1, 3))
    r2 = d.solve()
    ref = daqp_tpu.quadprog(np.eye(2), np.zeros(2), A, bu, bl,
                            break_points=(1, 3))
    assert np.linalg.norm(np.asarray(r2.x) - np.asarray(ref.x)) < 1e-8
