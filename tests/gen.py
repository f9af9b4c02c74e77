"""Random test-problem generators with constructed ground-truth solutions.

Port of the reference's central test fixture
(``interfaces/daqp-julia/test/utils.jl:3-115``): builds QPs/LPs whose
optimizer is known in closed form by construction, enabling exact
``||x - xref||`` assertions without a second solver.
"""
from __future__ import annotations

import numpy as np


def generate_test_qp(n, m, ms, n_active, kappa, rng=None):
    """QP with known optimizer; cond(H) = kappa (utils.jl:3-53).

    Returns (x, H, f, A, bupper, blower, sense) with A of shape (m-ms, n);
    the first ms constraints are simple bounds on x[:ms].
    """
    rng = np.random.default_rng(rng)
    eigens = np.empty(n)
    eigens[0], eigens[1] = 1.0, kappa
    eigens[2:] = 1.0 + (kappa - 1.0) * rng.random(n - 2)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    T = np.diag(np.sqrt(eigens)) @ Q.T
    Tinv = Q @ np.diag(1.0 / np.sqrt(eigens))
    H = T.T @ T

    M = np.vstack([Tinv[:ms, :], rng.standard_normal((m - ms, n))])
    dupper = np.zeros(m)
    dlower = np.zeros(m)
    shuffle = rng.permutation(m)
    n_up = rng.integers(0, n_active + 1)
    n_lo = n_active - n_up
    ids_up = shuffle[:n_up]
    ids_lo = shuffle[n_up:n_active]
    ids_in = shuffle[n_active:]

    lam = rng.random(n_active)
    Ma = np.vstack([M[ids_up, :], -M[ids_lo, :]])
    da = -Ma @ (Ma.T @ lam)
    dupper[ids_up] = da[:n_up]
    dlower[ids_lo] = -da[n_up:n_active]
    u = -Ma.T @ lam

    dupper[ids_lo] = dlower[ids_lo] + (0.01 + rng.random(n_lo))
    dlower[ids_up] = dupper[ids_up] - (0.01 + rng.random(n_up))
    dupper[ids_in] = M[ids_in, :] @ u + (0.01 + rng.random(len(ids_in)))
    dlower[ids_in] = M[ids_in, :] @ u - (0.01 + rng.random(len(ids_in)))

    v = rng.standard_normal(n)
    f = T.T @ v
    x = np.linalg.solve(T, u - v)
    A = M[ms:, :] @ T
    bupper = dupper - M @ v
    blower = dlower - M @ v
    sense = np.zeros(m, dtype=np.int32)
    return x, H, f, A, bupper, blower, sense


def generate_test_lp(n, m, ms, rng=None):
    """LP with known vertex optimizer (utils.jl:56-89)."""
    rng = np.random.default_rng(rng)
    A = np.vstack([np.eye(n)[:ms, :], rng.standard_normal((m - ms, n))])
    bupper = np.zeros(m)
    blower = np.zeros(m)
    shuffle = rng.permutation(m)
    n_up = rng.integers(0, n + 1)
    n_lo = n - n_up
    ids_up = shuffle[:n_up]
    ids_lo = shuffle[n_up:n]
    ids_in = shuffle[n:]

    lam = rng.random(n)
    x = rng.standard_normal(n)
    Aa = np.vstack([A[ids_up, :], -A[ids_lo, :]])
    f = -Aa.T @ lam
    ba = Aa @ x
    bupper[ids_up] = ba[:n_up]
    blower[ids_lo] = -ba[n_up:n]
    bupper[ids_lo] = blower[ids_lo] + (0.01 + rng.random(n_lo))
    blower[ids_up] = bupper[ids_up] - (0.01 + rng.random(n_up))
    bupper[ids_in] = A[ids_in, :] @ x + (0.01 + rng.random(len(ids_in)))
    blower[ids_in] = A[ids_in, :] @ x - (0.01 + rng.random(len(ids_in)))
    A = A[ms:, :]
    sense = np.zeros(m, dtype=np.int32)
    return x, f, A, bupper, blower, sense


def generate_test_avi(n, m, rng=None):
    """AVI with asymmetric PD H and known solution (utils.jl:91-115)."""
    rng = np.random.default_rng(rng)
    A = rng.standard_normal((m, n))
    shuffle = rng.permutation(m)
    n_as = rng.integers(0, n + 1)
    AS = shuffle[:n_as]

    lam = np.zeros(m)
    lam[AS] = rng.random(n_as)
    x = rng.standard_normal(n)

    Mm = rng.random((n, n))
    Nn = rng.standard_normal((n, n))
    sym = Mm.T @ Mm
    asym = Nn - Nn.T
    H = sym / np.linalg.norm(sym) + asym / np.linalg.norm(asym)

    f = -H @ x - A[AS, :].T @ lam[AS]
    Ax = A @ x
    b = Ax + 5 * rng.random(m)
    b[AS] = Ax[AS]
    return x, H, f, A, b
