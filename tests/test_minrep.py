"""Minimal-representation tests (``daqp_minrep``, src/api.c:507-534)."""
import numpy as np

import daqp_tpu


def test_minrep_box_with_redundant_rows():
    # Unit box plus rows that never bind
    A = np.array([
        [1.0, 0], [0, 1.0], [-1.0, 0], [0, -1.0],   # box |x|<=1
        [1.0, 1.0],                                   # x1+x2 <= 3 redundant
        [1.0, 0.0],                                   # x1 <= 2 redundant
    ])
    b = np.array([1.0, 1, 1, 1, 3.0, 2.0])
    red = daqp_tpu.minrep(A, b, ms=0)
    assert list(red) == [0, 0, 0, 0, 1, 1], red


def test_minrep_tight_diagonal():
    # x1 + x2 <= 2 touches the box corner (1,1): NOT redundant
    A = np.array([[1.0, 0], [0, 1.0], [-1.0, 0], [0, -1.0], [1.0, 1.0]])
    b = np.array([1.0, 1, 1, 1, 2.0])
    red = daqp_tpu.minrep(A, b, ms=0)
    assert list(red) == [0, 0, 0, 0, 0], red


def test_minrep_simple_bounds():
    # ms > 0: first rows bound x directly
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0, 1.0, 5.0])   # x1<=1, x2<=1, x1+x2<=5 (redundant)
    red = daqp_tpu.minrep(A, b, ms=2)
    assert list(red) == [0, 0, 1], red
