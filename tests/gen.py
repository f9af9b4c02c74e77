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


def generate_test_avi_two_sided(n, m, rng=None):
    """Two-sided AVI with asymmetric PD H and known solution — the
    two-sided extension of ``generate_test_avi`` (utils.jl:91-115):
    lower-active rows carry negative multipliers, inactive rows get
    slack on both sides."""
    rng = np.random.default_rng(rng)
    A = rng.standard_normal((m, n))
    shuffle = rng.permutation(m)
    n_act = int(rng.integers(0, n + 1))
    n_up = int(rng.integers(0, n_act + 1))
    AS_up = shuffle[:n_up]
    AS_lo = shuffle[n_up:n_act]

    lam = np.zeros(m)
    lam[AS_up] = rng.random(n_up)
    lam[AS_lo] = -rng.random(n_act - n_up)
    x = rng.standard_normal(n)

    Mm = rng.random((n, n))
    Nn = rng.standard_normal((n, n))
    sym = Mm.T @ Mm
    asym = Nn - Nn.T
    H = sym / np.linalg.norm(sym) + asym / np.linalg.norm(asym)

    f = -H @ x - A.T @ lam
    Ax = A @ x
    bu = Ax + 5 * rng.random(m)
    bl = Ax - 5 * rng.random(m)
    bu[AS_up] = Ax[AS_up]
    bl[AS_lo] = Ax[AS_lo]
    return x, H, f, A, bu, bl


def generate_test_qp_batch(B, n, m, ms, n_active, kappa, rng=None,
                           dtype=None):
    """Vectorized batch version of ``generate_test_qp``: constructs B
    strictly convex QPs with known optimizers in one shot (batched QR /
    einsum), for vmap tests and throughput benchmarks.

    Active-set membership is drawn per-constraint (first ``n_active`` of a
    random permutation), with upper/lower chosen i.i.d. — statistically
    equivalent coverage to the reference fixture.
    Returns dict of arrays with leading batch dim B.
    """
    rng = np.random.default_rng(rng)
    eig = np.empty((B, n))
    eig[:, 0], eig[:, 1] = 1.0, kappa
    eig[:, 2:] = 1.0 + (kappa - 1.0) * rng.random((B, n - 2))
    Q, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    sq = np.sqrt(eig)
    T = sq[:, :, None] * np.swapaxes(Q, 1, 2)          # diag(sq) @ Q'
    Tinv = Q / sq[:, None, :]
    H = np.einsum('bij,bik->bjk', T, T)                 # T'T

    M = np.concatenate([Tinv[:, :ms, :],
                        rng.standard_normal((B, m - ms, n))], axis=1)
    perm = np.argsort(rng.random((B, m)), axis=1)
    act = perm[:, :n_active]                            # (B, nA)
    inact = perm[:, n_active:]                          # (B, m-nA)
    is_up = rng.random((B, n_active)) < 0.5             # upper vs lower

    lam = rng.random((B, n_active))
    Mact = np.take_along_axis(M, act[:, :, None], axis=1)  # (B,nA,n)
    sgn = np.where(is_up, 1.0, -1.0)
    Ma = sgn[:, :, None] * Mact
    u = -np.einsum('bij,bi->bj', Ma, lam)               # -Ma' lam  (B,n)
    d_act = np.einsum('bij,bj->bi', Ma, u)              # Ma u = -Ma Ma' lam

    dupper = np.zeros((B, m))
    dlower = np.zeros((B, m))
    # active rows: tight at the optimizer
    d_signed = sgn * d_act                              # value of M_i u
    up_val = np.where(is_up, d_signed, d_signed + (0.01 + rng.random((B, n_active))))
    lo_val = np.where(is_up, d_signed - (0.01 + rng.random((B, n_active))), d_signed)
    np.put_along_axis(dupper, act, up_val, axis=1)
    np.put_along_axis(dlower, act, lo_val, axis=1)
    # inactive rows: strictly feasible
    Minact = np.take_along_axis(M, inact[:, :, None], axis=1)
    mu_in = np.einsum('bij,bj->bi', Minact, u)
    np.put_along_axis(dupper, inact,
                      mu_in + (0.01 + rng.random(mu_in.shape)), axis=1)
    np.put_along_axis(dlower, inact,
                      mu_in - (0.01 + rng.random(mu_in.shape)), axis=1)

    v = rng.standard_normal((B, n))
    f = np.einsum('bij,bi->bj', T, v)                   # T'v
    x = np.linalg.solve(T, (u - v)[:, :, None])[:, :, 0]
    A = np.einsum('bij,bjk->bik', M[:, ms:, :], T)
    Mv = np.einsum('bij,bj->bi', M, v)
    bupper = dupper - Mv
    blower = dlower - Mv
    out = dict(x=x, H=H, f=f, A=A, bupper=bupper, blower=blower,
               sense=np.zeros((B, m), np.int32))
    if dtype is not None:
        out = {k: (val.astype(dtype) if val.dtype == np.float64 else val)
               for k, val in out.items()}
    return out
