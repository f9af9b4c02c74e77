"""Native C binding (native/daqp_c.c via daqp_tpu.native): the C-consumer
surface with runtime problem data — differentially tested against the JAX
core on every family it supports (QP, equalities, soft, warm re-update,
MIQP, infeasible/nonconvex probes)."""
import shutil

import numpy as np
import pytest

import daqp_tpu
from daqp_tpu.native import NativeModel
from tests.gen import generate_test_qp

requires_cc = pytest.mark.skipif(shutil.which("cc") is None
                                 and shutil.which("gcc") is None,
                                 reason="no C compiler")


@requires_cc
def test_native_qp_differential():
    rng = np.random.default_rng(11)
    for trial in range(6):
        n, m, ms = 8, 20, 3
        x, H, f, A, bu, bl, sense = generate_test_qp(n, m, ms, 6, 1e2,
                                                     rng)
        mdl = NativeModel(H, f, A, bu, bl, sense, ms=ms)
        out = mdl.solve()
        ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms)
        assert out['exitflag'] == int(ref.exitflag), trial
        assert np.linalg.norm(out['x'] - np.asarray(ref.x)) < 1e-8, trial
        assert abs(out['fval'] - float(ref.fval)) < 1e-8, trial
        # dual stationarity through the C duals
        grad = H @ out['x'] + f
        grad[:ms] += out['lam'][:ms]
        grad += A.T @ out['lam'][ms:]
        assert np.linalg.norm(grad) < 1e-7, trial


@requires_cc
def test_native_equalities_and_soft():
    rng = np.random.default_rng(13)
    n, m = 6, 14
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 4, 1e2, rng)
    # two equality rows (auto-detected) + two soft rows
    bu, bl, sense = bu.copy(), bl.copy(), sense.copy()
    mid = 0.5 * (bu[0] + bl[0])
    bu[0] = bl[0] = mid
    sense[5] |= daqp_tpu.SOFT
    sense[6] |= daqp_tpu.SOFT
    mdl = NativeModel(H, f, A, bu, bl, sense, ms=0)
    out = mdl.solve()
    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    assert out['exitflag'] == int(ref.exitflag)
    assert np.linalg.norm(out['x'] - np.asarray(ref.x)) < 1e-7


@requires_cc
def test_native_mpc_update_warm():
    rng = np.random.default_rng(17)
    n, m = 8, 20
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 5, 1e2, rng)
    mdl = NativeModel(H, f, A, bu, bl, ms=0)
    out = mdl.solve()
    assert out['exitflag'] == 1
    f2 = f * 1.0001
    mdl.update(f=f2, bupper=bu, blower=bl)
    out2 = mdl.solve()
    assert out2['exitflag'] == 1
    assert out2['iterations'] <= 3, out2['iterations']
    ref = daqp_tpu.quadprog(H, f2, A, bu, bl, ms=0)
    assert np.linalg.norm(out2['x'] - np.asarray(ref.x)) < 1e-7


@requires_cc
def test_native_miqp():
    rng = np.random.default_rng(19)
    for trial in range(3):
        n, m, nb = 6, 14, 4
        Mx = rng.standard_normal((n, n))
        H = Mx.T @ Mx + 0.1 * np.eye(n)
        f = 10 * rng.standard_normal(n)
        A = rng.standard_normal((m, n))
        bu = 15 * rng.random(m)
        bl = -15 * rng.random(m)
        A[:nb] = 0.0
        A[np.arange(nb), np.arange(nb)] = 1.0
        bu[:nb] = 1.0
        bl[:nb] = 0.0
        sense = np.zeros(m, np.int32)
        sense[:nb] = daqp_tpu.BINARY
        mdl = NativeModel(H, f, A, bu, bl, sense, ms=0)
        out = mdl.solve_miqp()
        ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
        assert out['exitflag'] == int(ref.exitflag), trial
        if out['exitflag'] == 1:
            assert abs(out['fval'] - float(ref.fval)) < 1e-6, trial
            assert np.linalg.norm(out['x'] - np.asarray(ref.x)) < 1e-5
        # a plain solve after the MIQP must give the clean relaxation
        out3 = mdl.solve()
        relax = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
        assert out3['exitflag'] == 1
        assert abs(out3['fval'] - float(relax.fval)) < 1e-7, trial


@requires_cc
def test_native_probes():
    n = 2
    H = np.eye(n)
    # geometric infeasibility: x0 <= -1 and x0 >= 1
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([-1.0, 30.0])
    bl = np.array([-30.0, 1.0])
    mdl = NativeModel(H, np.zeros(n), A, bu, bl, ms=0)
    assert mdl.solve()['exitflag'] == -1
    # nonconvex H
    mdl2 = NativeModel(-np.eye(n), np.zeros(n), A,
                       np.array([1.0, 1.0]), np.array([-1.0, -1.0]), ms=0)
    assert mdl2.solve()['exitflag'] == -5
    # fval_bound dominance cut + suboptimality settings accepted
    x, H3, f3, A3, bu3, bl3, sense3 = generate_test_qp(
        4, 10, 0, 3, 1e2, np.random.default_rng(3))
    ref = daqp_tpu.quadprog(H3, f3, A3, bu3, bl3, ms=0)
    mdl3 = NativeModel(H3, f3, A3, bu3, bl3, ms=0,
                       settings={"fval_bound": float(ref.fval) - 1.0})
    assert mdl3.solve()['exitflag'] == -1
    with pytest.raises(ValueError):
        NativeModel(H3, f3, A3, bu3, bl3, ms=0, settings={"bogus": 1.0})


@requires_cc
def test_native_lp_differential():
    # H = NULL -> the adaptive-eps proximal LP regime (api.c:175-177 +
    # daqp_prox.c:21-271), differential vs linprog_core on the reference
    # LP grid construction (generate_test_lp)
    from tests.gen import generate_test_lp
    rng = np.random.default_rng(91)
    for trial in range(6):
        n, m, ms = 10, 50, 5
        x_ref, f, A, bu, bl, _ = generate_test_lp(n, m, ms, rng)
        ref = daqp_tpu.linprog(f, A, bu, bl, ms=ms)
        assert int(ref.exitflag) == 1
        mdl = NativeModel(None, f, A, bu, bl, ms=ms)
        out = mdl.solve()
        assert out['exitflag'] == 1, (trial, out['exitflag'])
        assert np.abs(out['x'] - x_ref).max() < 1e-6, \
            (trial, np.abs(out['x'] - x_ref).max())
        assert abs(out['fval'] - float(f @ x_ref)) < 1e-6 * (
            1 + abs(float(f @ x_ref)))
        # dual feasibility + stationarity of the rescaled duals:
        # f + [I_ms; A]' lam = 0
        lam = out['lam']
        G = np.vstack([np.eye(n)[:ms], A])
        stat = np.abs(f + G.T @ lam).max()
        assert stat < 1e-6, (trial, stat)


@requires_cc
def test_native_lp_unbounded():
    # min -x0 with only an upper-free ray: unbounded
    f = np.array([-1.0, 0.0])
    A = np.array([[0.0, 1.0]])
    bu = np.array([1.0])
    bl = np.array([-1.0])
    mdl = NativeModel(None, f, A, bu, bl, ms=0)
    assert mdl.solve()['exitflag'] == -3


@requires_cc
def test_native_time_limit():
    # an adversarially tiny wall-clock bound must exit -7, not hang
    rng = np.random.default_rng(7)
    x, H, f, A, bu, bl, sense = generate_test_qp(30, 120, 0, 25, 1e2, rng)
    mdl = NativeModel(H, f, A, bu, bl, ms=0,
                      settings={"time_limit": 1e-9})
    out = mdl.solve()
    assert out['exitflag'] == -7, out['exitflag']
    # and a generous bound solves normally
    mdl2 = NativeModel(H, f, A, bu, bl, ms=0,
                       settings={"time_limit": 30.0})
    out2 = mdl2.solve()
    assert out2['exitflag'] == 1
    assert np.abs(out2['x'] - x).max() < 1e-6


@requires_cc
def test_native_miqp_time_limit():
    # BnB tree-level deadline (bnb.c:51-59): the check fires every 32
    # nodes, so the tree must be forced deep — H = I with f = -0.5 on
    # each binary puts every relaxation optimum at the midpoint and ties
    # defeat the dominance cut (no pruning)
    from daqp_tpu.types import BINARY
    nb = 8
    n = nb
    H = np.eye(n)
    f = np.full(n, -0.5)
    A = np.eye(n)
    bu = np.ones(n)
    bl = np.zeros(n)
    sense = np.full(n, BINARY, np.int32)
    mdl = NativeModel(H, f, A, bu, bl, sense, ms=0,
                      settings={"time_limit": 1e-9})
    out = mdl.solve_miqp()
    assert out['exitflag'] == -7, out['exitflag']


@requires_cc
def test_native_avi_differential():
    # AVI mode (daqp_tpu_setup_avi, reference avi.c:6-221): asymmetric-H
    # DR splitting with exact-KKT acceleration, vs the constructed-
    # solution generator and KKT stationarity of the returned duals
    from tests.gen import generate_test_avi
    rng = np.random.default_rng(37)
    for trial in range(6):
        n, m = (8, 30) if trial < 4 else (20, 80)
        x_ref, H, f, A, b = generate_test_avi(n, m, rng)
        mdl = NativeModel(H, f, A, b, np.full(m, -1e30), ms=0, avi=True)
        out = mdl.solve()
        assert out['exitflag'] == 1, (trial, out['exitflag'])
        assert np.linalg.norm(out['x'] - x_ref) < 1e-5, trial
        # stationarity through the original-space duals: Hx + f + A'lam = 0
        stat = np.abs(H @ out['x'] + f + A.T @ out['lam']).max()
        assert stat < 1e-6, (trial, stat)
        # dual feasibility (upper rows: lam >= 0) + complementarity
        assert out['lam'].min() > -1e-8, trial
        slack = b - A @ out['x']
        assert np.abs(out['lam'] * slack).max() < 1e-5, trial


@requires_cc
def test_native_avi_vs_jax():
    # differential against the JAX avi_core on the same instance
    from tests.gen import generate_test_avi
    rng = np.random.default_rng(41)
    x_ref, H, f, A, b = generate_test_avi(10, 40, rng)
    res = daqp_tpu.avi(H, f, A, b, ms=0)
    assert int(res.exitflag) == 1
    mdl = NativeModel(H, f, A, b, np.full(40, -1e30), ms=0, avi=True)
    out = mdl.solve()
    assert out['exitflag'] == 1
    assert np.linalg.norm(out['x'] - np.asarray(res.x)) < 1e-4


@requires_cc
def test_native_avi_unconstrained_and_warm():
    # unconstrained shortcut (utils.c:547-551) exits in one iteration;
    # a re-solve warm-starts from the persistent outer iterate
    from tests.gen import generate_test_avi
    rng = np.random.default_rng(31)
    Mm = rng.random((6, 6))
    H = Mm.T @ Mm + np.eye(6) + 0.1 * (rng.random((6, 6))
                                       - rng.random((6, 6)))
    f = rng.standard_normal(6)
    x_unc = np.linalg.solve(H, -f)
    A = rng.standard_normal((4, 6))
    b = A @ x_unc + 1.0
    mdl = NativeModel(H, f, A, b, np.full(4, -1e30), ms=0, avi=True)
    out = mdl.solve()
    assert out['exitflag'] == 1 and out['iterations'] == 1
    assert np.linalg.norm(out['x'] - x_unc) < 1e-8
    # warm restart on a constrained instance
    x_ref, H2, f2, A2, b2 = generate_test_avi(8, 30, rng)
    mdl2 = NativeModel(H2, f2, A2, b2, np.full(30, -1e30), ms=0, avi=True)
    out1 = mdl2.solve()
    out2 = mdl2.solve()
    assert out1['exitflag'] == 1 and out2['exitflag'] == 1
    assert out2['iterations'] <= out1['iterations']
    assert np.linalg.norm(out2['x'] - x_ref) < 1e-5


@requires_cc
def test_native_hiqp_basic():
    # mirror of test_hierarchical_basic (core_tests.jl:294-302): 3 bound
    # rows hard, then 3 one-row priority levels; identity metric makes
    # the C QP setup equivalent to the Python H=None hiqp path
    A = np.array([[1.0, 1, 1], [1, -1, 0], [3, 1, -1]])
    bu = np.concatenate([np.ones(3), [1, 0.5, 20]])
    bl = np.concatenate([-np.ones(3), [-1e30, 0.5, 10]])
    mdl = NativeModel(np.eye(3), np.zeros(3), A, bu, bl, ms=3)
    out = mdl.solve_hiqp([3, 4, 5, 6])
    assert out['exitflag'] > 0, out['exitflag']
    xref = np.array([1.0, 0.5, -1.0])
    assert np.linalg.norm(out['x'] - xref) < 1e-4, out['x']


@requires_cc
def test_native_hiqp_conflicting_equalities():
    # two inconsistent equalities resolved in the least-squares sense
    # (x1 = 4 vs x1 = 8 -> x1 = 6) and the frozen slack duals ~(+2, -2)
    A = np.array([[1.0, 0], [1, 0], [0, 1]])
    b = np.array([4.0, 8.0, 1.0])
    mdl = NativeModel(np.eye(2), np.zeros(2), A, b, b, ms=0)
    out = mdl.solve_hiqp([0, 2, 3])
    assert out['exitflag'] > 0, out['exitflag']
    assert np.linalg.norm(out['x'] - np.array([6.0, 1.0])) < 1e-4, out['x']
    assert abs(out['lam'][0] - 2.0) < 1e-3, out['lam']
    assert abs(out['lam'][1] + 2.0) < 1e-3, out['lam']


@requires_cc
def test_native_hiqp_differential():
    # random multi-level hierarchies vs the f64 NumPy oracle (the JAX
    # path runs f32 on chip, so the oracle is the precision-matched
    # differential target)
    from oracle import hiqp_numpy
    rng = np.random.default_rng(29)
    for trial in range(4):
        n, m = 6, 12
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        bp = (0, 4, 8, 12)
        ref = hiqp_numpy.hiqp(None, None, A, b.copy(), b.copy(), ms=0,
                              break_points=bp)
        mdl = NativeModel(np.eye(n), np.zeros(n), A, b, b, ms=0)
        out = mdl.solve_hiqp(bp)
        assert out['exitflag'] > 0 and ref['exitflag'] > 0, \
            (trial, out['exitflag'], ref['exitflag'])
        scale = 1.0 + np.linalg.norm(ref['x'])
        assert np.linalg.norm(out['x'] - ref['x']) < 1e-4 * scale, \
            (trial, out['x'], ref['x'])


@requires_cc
def test_native_minrep_differential():
    # C daqp_tpu_minrep vs the vmapped JAX geometry.minrep on random
    # polyhedra with planted duplicate (redundant) rows
    from daqp_tpu.native import native_minrep
    from daqp_tpu import geometry
    rng = np.random.default_rng(23)
    for trial in range(4):
        n, m = 4, 14
        A = rng.standard_normal((m, n))
        b = 1.0 + rng.random(m)
        # plant redundancies: row m-1 strictly dominated by row 0
        A[m - 1] = A[0]
        b[m - 1] = b[0] + 1.0
        red_c = native_minrep(A, b, ms=0)
        red_j = np.asarray(geometry.minrep(A, b, ms=0))
        assert np.array_equal(red_c, red_j), (trial, red_c, red_j)
        assert red_c[m - 1] == 1


@requires_cc
def test_native_minrep_simple_bounds():
    from daqp_tpu.native import native_minrep
    from daqp_tpu import geometry
    rng = np.random.default_rng(29)
    n, ms, mg = 3, 3, 8
    A = rng.standard_normal((mg, n))
    b = np.concatenate([10.0 + rng.random(ms),     # loose box: redundant
                        0.5 + 0.2 * rng.random(mg)])
    red_c = native_minrep(A, b, ms=ms)
    red_j = np.asarray(geometry.minrep(A, b, ms=ms))
    assert np.array_equal(red_c, red_j), (red_c, red_j)


@requires_cc
def test_native_soft_slack():
    # force a soft violation; the C soft_slack must match the JAX
    # Result.soft_slack (rho_soft * sum lam_soft^2, api.c:441-471)
    rng = np.random.default_rng(31)
    n, m = 5, 8
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 3, 1e2, rng)
    bu, bl, sense = bu.copy(), bl.copy(), sense.copy()
    # conflicting pair: a hard equality vs a SOFT row forced past it
    sense[0] |= daqp_tpu.SOFT
    bu[0] = bl[0] = (A[0] @ np.linalg.solve(H, -f)) - 5.0  # far-off target
    mdl = NativeModel(H, f, A, bu, bl, sense, ms=0,
                      settings={"rho_soft": 1e-3})
    out = mdl.solve()
    assert out['exitflag'] in (1, 2)
    ss = mdl.soft_slack()
    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0,
                            settings={"rho_soft": 1e-3})
    assert abs(ss - float(ref.soft_slack)) < 1e-6 * (1.0 + abs(ss)), \
        (ss, float(ref.soft_slack))


@requires_cc
def test_native_primal_dual_init_active():
    # activating the true active set at the optimum must re-solve in one
    # iteration (the reference warm-start contract, core_tests.jl:449-496)
    rng = np.random.default_rng(37)
    n, m = 8, 20
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 5, 1e2, rng)
    mdl = NativeModel(H, f, A, bu, bl, ms=0)
    out = mdl.solve()
    assert out['exitflag'] == 1
    xstar, lamstar = out['x'], out['lam']

    m2 = NativeModel(H, f, A, bu, bl, ms=0)
    m2.primal_init_active(xstar)
    out2 = m2.solve()
    assert out2['exitflag'] == 1
    assert out2['iterations'] <= 2, out2['iterations']
    assert np.linalg.norm(out2['x'] - xstar) < 1e-7

    m3 = NativeModel(H, f, A, bu, bl, ms=0)
    m3.dual_init_active(lamstar)
    out3 = m3.solve()
    assert out3['exitflag'] == 1
    assert out3['iterations'] <= 2, out3['iterations']
    assert np.linalg.norm(out3['x'] - xstar) < 1e-7


@requires_cc
def test_native_set_primal_start_lp():
    # seeding the LP outer iterate at the optimum shortens the proximal
    # outer loop (daqp_set_primal_start, api.c:612-617)
    from tests.gen import generate_test_lp
    rng = np.random.default_rng(41)
    x, f, A, bu, bl, _ = generate_test_lp(6, 18, 0, rng)
    mdl = NativeModel(None, f, A, bu, bl, ms=0)
    out = mdl.solve()
    assert out['exitflag'] == 1
    m2 = NativeModel(None, f, A, bu, bl, ms=0)
    m2.set_primal_start(out['x'])
    m2.dual_init_active(out['lam'])
    out2 = m2.solve()
    assert out2['exitflag'] == 1
    assert np.linalg.norm(out2['x'] - out['x']) < 1e-6
    assert out2['iterations'] <= out['iterations']


@requires_cc
def test_native_update_masked_differential():
    # every mask combination must equal a fresh setup on the same data
    # (flag parity always; x parity when the solve is optimal)
    rng = np.random.default_rng(43)
    n, m, ms = 7, 16, 2
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, ms, 5, 1e2, rng)
    x2, H2, f2, A2, bu2, bl2, _ = generate_test_qp(n, m, ms, 5, 1e2, rng)

    def fresh(Hn, fn, An, bun, bln, sn):
        return NativeModel(Hn, fn, An, bun, bln, sn, ms=ms).solve()

    def check(mdl, Hn, fn, An, bun, bln, sn, want_optimal):
        got = mdl.solve()
        ref = fresh(Hn, fn, An, bun, bln, sn)
        assert got['exitflag'] == ref['exitflag'], (got['exitflag'],
                                                   ref['exitflag'])
        if want_optimal:
            assert got['exitflag'] == 1
        if got['exitflag'] > 0:
            assert np.linalg.norm(got['x'] - ref['x']) < 1e-7
        return got

    # d-only (keeps the working set): widened bounds stay feasible
    mdl = NativeModel(H, f, A, bu, bl, sense, ms=ms)
    mdl.solve()
    bu_w, bl_w = bu + 0.05, bl - 0.05
    assert mdl.update_masked(bupper=bu_w, blower=bl_w) == 0
    check(mdl, H, f, A, bu_w, bl_w, sense, want_optimal=True)

    # v update (scaled f stays optimal-feasible: same constraint set)
    f_s = 1.3 * f
    assert mdl.update_masked(f=f_s) == 0
    check(mdl, H, f_s, A, bu_w, bl_w, sense, want_optimal=True)

    # M update: new A against the CACHED Rinv (utils.c:345-383); the
    # mixed (A2, old bounds) problem may be infeasible — flag parity
    # with a fresh setup is the contract
    assert mdl.update_masked(A=A2) == 0
    check(mdl, H, f_s, A2, bu_w, bl_w, sense, want_optimal=False)

    # full switch to problem 2 (Rinv update implies M + v): optimal by
    # construction
    assert mdl.update_masked(H=H2, f=f2, A=A2, bupper=bu2,
                             blower=bl2) == 0
    check(mdl, H2, f2, A2, bu2, bl2, sense, want_optimal=True)

    # sense update: flag a row soft (OPTIMAL or SOFT_OPTIMAL, in parity)
    s2 = np.asarray(sense, np.int32).copy()
    s2[ms] |= daqp_tpu.SOFT
    assert mdl.update_masked(sense=s2) == 0
    got = check(mdl, H2, f2, A2, bu2, bl2, s2, want_optimal=False)
    assert got['exitflag'] > 0


@requires_cc
def test_native_update_masked_guards():
    rng = np.random.default_rng(47)
    n, m = 5, 10
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 3, 1e2, rng)
    # LP-mode workspace rejects an Rinv update
    lp = NativeModel(None, f, A, bu, bl, ms=0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lp.update_masked(H=H)
    # inverted bounds -> INFEASIBLE rc, then a repairing d update clears it
    mdl = NativeModel(H, f, A, bu, bl, ms=0)
    bad_bu = bu.copy()
    bad_bu[0] = bl[0] - 1.0
    rc = mdl.update_masked(bupper=bad_bu, blower=bl)
    assert rc == daqp_tpu.EXIT_INFEASIBLE or rc == -1 or rc < 0
    rc = mdl.update_masked(bupper=bu, blower=bl)
    assert rc == 0
    out = mdl.solve()
    assert out['exitflag'] == 1
