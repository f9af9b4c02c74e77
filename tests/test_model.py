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
