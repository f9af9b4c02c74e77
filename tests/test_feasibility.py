"""Raw LDP feasibility interface with Farkas validation (reference Julia
isfeasible, api.jl:417-466; tested at core_tests.jl:231-251)."""
import numpy as np

import daqp_tpu
from daqp_tpu.geometry import isfeasible


def test_feasible_box():
    A = np.array([[1.0, 1.0]])
    assert isfeasible(A, np.array([1.0, 1, 1.5]), -np.ones(3) * 2, ms=2)


def test_infeasible_with_farkas_validation():
    # x1 <= -1 and x1 >= 1: infeasible; certificate must validate
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([-1.0, 5.0])
    bl = np.array([-5.0, 1.0])
    assert not isfeasible(A, bu, bl, ms=0, validate=True)


def test_feasibility_region_queries():
    # explicit-MPC-style region membership: shrinking boxes
    A = np.vstack([np.eye(3), np.ones((1, 3))])
    for r in (2.0, 1.0, 0.4):
        bu = np.concatenate([np.full(3, r), [1.0]])
        bl = np.concatenate([np.full(3, -r), [0.9]])
        expected = 3 * r >= 0.9
        assert isfeasible(A, bu, bl, ms=0) == expected, r
