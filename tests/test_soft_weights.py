"""Per-constraint soft weights (the reference SOFT_WEIGHTS rho arrays,
types.h:168-180; here realized by exact soft-row rescaling)."""
import numpy as np

import daqp_tpu


def test_weighted_soft_equalities():
    # conflicting soft equalities x=4 and x=8 with penalty weights
    # rho1, rho2: optimum at the (1/rho)-weighted mean
    H = np.eye(1) * 1e-6          # negligible objective pull
    f = np.zeros(1)
    A = np.array([[1.0], [1.0]])
    b = np.array([4.0, 8.0])
    sense = np.array([daqp_tpu.SOFT, daqp_tpu.SOFT], np.int32)
    rho = np.array([1e-6, 3e-6])  # first constraint 3x stiffer
    res = daqp_tpu.quadprog(H, f, A, b, b, sense, ms=0, soft_weights=rho)
    assert int(res.exitflag) in (1, 2), int(res.exitflag)
    # x* = (4/rho1 + 8/rho2) / (1/rho1 + 1/rho2) = (12 + 8) / 4 = 5
    assert abs(float(res.x[0]) - 5.0) < 0.01, res.x


def test_uniform_weights_match_default():
    rng = np.random.default_rng(401)
    from tests.gen import generate_test_qp
    x, H, f, A, bu, bl, sense = generate_test_qp(8, 20, 0, 5, 1e2, rng)
    sense = np.full(20, daqp_tpu.SOFT, np.int32)
    r1 = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    r2 = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0,
                           soft_weights=np.full(20, 1e-6))
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-9)
