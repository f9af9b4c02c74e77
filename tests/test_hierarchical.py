"""Hierarchical (lexicographic) QP tests — ports of the reference testset
'Hierarchical QP' (interfaces/daqp-julia/test/core_tests.jl:293-357)."""
import numpy as np

import daqp_tpu


def test_hierarchical_basic():
    # core_tests.jl:294-302: 3 bound rows hard, then 3 one-row levels
    A = np.array([[1.0, 1, 1], [1, -1, 0], [3, 1, -1]])
    bu = np.concatenate([np.ones(3), [1, 0.5, 20]])
    bl = np.concatenate([-np.ones(3), [-1e30, 0.5, 10]])
    res = daqp_tpu.solve(H=None, f=None, A=A, bupper=bu, blower=bl, ms=3,
                         break_points=(3, 4, 5, 6))
    assert int(res.exitflag) > 0, int(res.exitflag)
    xref = np.array([1.0, 0.5, -1.0])
    assert np.linalg.norm(np.asarray(res.x) - xref) < 1e-4, res.x


def test_hierarchical_degenerate():
    # core_tests.jl:334-346: duplicated level rows + an ignored row
    H = np.array([[10.5, 4.0, 2.0], [4.0, 5.5, 0.5], [2.0, 0.5, 2.0]])
    f = np.array([-53.0, -30.0, -11.5])
    A = np.array([[1.0, 0, 0], [1, 1, 0], [0, 0, 0], [1, 0, 0]])
    bu = np.concatenate([3 * np.ones(3), [7.5, 7.5, 5.0, 10.0]])
    bl = np.concatenate([-3 * np.ones(3), [4.5, 4.5, 2.0, 7.0]])
    sense = np.zeros(7, np.int32)
    sense[5] = daqp_tpu.IMMUTABLE
    res = daqp_tpu.solve(H=H, f=f, A=A, bupper=bu, blower=bl, sense=sense,
                         ms=3, break_points=(3, 5, 7))
    assert int(res.exitflag) > 0, int(res.exitflag)


def test_hierarchical_conflicting_equalities():
    # core_tests.jl:348-356: two inconsistent equalities resolved in the
    # least-squares sense (x1 = 4 vs x1 = 8 -> x1 = 6), then x2 = 1
    A = np.array([[1.0, 0], [1, 0], [0, 1]])
    b = np.array([4.0, 8.0, 1.0])
    res = daqp_tpu.solve(H=None, f=None, A=A, bupper=b, blower=b, ms=0,
                         break_points=(0, 2, 3))
    assert int(res.exitflag) > 0, int(res.exitflag)
    assert np.linalg.norm(np.asarray(res.x) - np.array([6.0, 1.0])) < 1e-4, \
        res.x


def test_hierarchical_slack_duals():
    # The output duals of a hierarchical solve are the frozen soft
    # violations w = lam* rho_soft (hierarchical.c:51-65): conflicting
    # equalities at 4 and 8 freeze at 6 with slacks ~(+2, -2).
    A = np.array([[1.0, 0], [1, 0], [0, 1]])
    b = np.array([4.0, 8.0, 1.0])
    res = daqp_tpu.solve(H=None, f=None, A=A, bupper=b, blower=b, ms=0,
                         break_points=(0, 2, 3))
    lam = np.asarray(res.lam)
    assert abs(lam[0] - 2.0) < 1e-3, lam
    assert abs(lam[1] + 2.0) < 1e-3, lam
