"""Prefactored-Hessian path (reference problem_type=2,
core_tests.jl:427-447): pass the upper Cholesky factor R with H = R'R."""
import numpy as np

import daqp_tpu
from tests.gen import generate_test_qp


def test_prefactored_matches_raw():
    rng = np.random.default_rng(223)
    x, H, f, A, bu, bl, sense = generate_test_qp(20, 60, 0, 12, 1e2, rng)
    R = np.linalg.cholesky(H).T          # upper factor, H = R'R
    r_pre = daqp_tpu.quadprog(R, f, A, bu, bl, sense, ms=0,
                              prefactored=True)
    r_raw = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    assert int(r_pre.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(r_pre.x) - x) < 1e-4
    assert np.allclose(np.asarray(r_pre.x), np.asarray(r_raw.x), atol=1e-8)
    assert np.isclose(float(r_pre.fval), float(r_raw.fval), atol=1e-8)
