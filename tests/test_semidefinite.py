"""Semidefinite-Hessian QPs via the proximal-point outer loop —
ports of the reference testset 'Semi-proximal regularization'
(core_tests.jl:537-646)."""
import numpy as np

import daqp_tpu


def _ref_solution_box(H, f, lo, hi):
    # brute-force reference on a box via projected gradient (small n)
    x = np.zeros(len(f))
    L = np.linalg.eigvalsh(H).max() + 1.0
    for _ in range(200000):
        x = np.clip(x - (H @ x + f) / L, lo, hi)
    return x


def test_diagonal_singular_semi_proximal():
    # diagonal H with zero entries: semi-proximal (perturb only the
    # singular directions, utils.c:179-207)
    H = np.diag([2.0, 0.0, 1.0, 0.0])
    f = np.array([-1.0, 1.0, -1.0, -2.0])
    n = 4
    A = np.eye(n)
    bu = np.ones(n)
    bl = -np.ones(n)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    xref = _ref_solution_box(H, f, bl, bu)
    assert np.linalg.norm(np.asarray(res.x) - xref) < 1e-4, \
        (res.x, xref)


def test_dense_singular_full_shift():
    # dense rank-deficient H: full proximal shift with retry-doubling
    # (utils.c:253-283)
    rng = np.random.default_rng(311)
    V = rng.standard_normal((4, 2))
    H = V @ V.T                      # rank 2, dense
    f = rng.standard_normal(4)
    A = np.eye(4)
    bu = np.ones(4)
    bl = -np.ones(4)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    xref = _ref_solution_box(H, f, bl, bu)
    assert 0.5 * res.x @ (H @ np.asarray(res.x)) + f @ np.asarray(res.x) \
        <= 0.5 * xref @ (H @ xref) + f @ xref + 1e-5


def test_semidefinite_objective_value():
    # fixed-point iteration must reach the true optimum of a
    # semidefinite problem with an interior + boundary mix
    H = np.diag([1.0, 0.0])
    f = np.array([-0.5, -1.0])       # x2 unbounded below in H -> bound
    A = np.eye(2)
    bu = np.array([2.0, 3.0])
    bl = np.array([-2.0, -3.0])
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.allclose(np.asarray(res.x), [0.5, 3.0], atol=1e-5), res.x


def test_semidefinite_f32_stagnation_acceptance():
    # In f32 the retry-doubling shift makes eps large (~5e-2 here) and the
    # reference fixed-point test eta/eps sits below the f32 noise floor;
    # the stagnation criterion must still certify the fixed point instead
    # of burning the iteration budget (observed: all lanes EXIT_ITERLIMIT
    # before the fix).
    import jax
    import jax.numpy as jnp
    from daqp_tpu import prox as prox_mod
    from daqp_tpu.api import _as_settings

    B, n, m, rank = 4, 30, 60, 18
    rng = np.random.default_rng(17)
    Q = rng.standard_normal((B, n, rank)).astype(np.float32)
    H = np.einsum('bir,bjr->bij', Q, Q)
    f = rng.standard_normal((B, n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (5 + 5 * rng.random((B, m))).astype(np.float32)
    bl = -(5 + 5 * rng.random((B, m))).astype(np.float32)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)

    def one(H, f, A, bu, bl, sense):
        out = prox_mod.solve_convex_or_prox(H, f, A, bu, bl, sense, 0, st)
        return out.exitflag, out.x

    with jax.default_matmul_precision('highest'):
        flags, x = jax.jit(jax.vmap(one))(
            *[jnp.asarray(v) for v in (H, f, A, bu, bl, sense)])
    flags = np.asarray(flags)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    # compare against the f64 solve per lane
    for b in range(B):
        ref = daqp_tpu.quadprog(H[b].astype(np.float64),
                                f[b].astype(np.float64),
                                A[b].astype(np.float64),
                                bu[b].astype(np.float64),
                                bl[b].astype(np.float64), ms=0)
        err = np.linalg.norm(np.asarray(x[b], np.float64)
                             - np.asarray(ref.x))
        assert err < 5e-2, (b, err)


def test_batch_prox_pallas():
    # Batched Pallas-tier proximal driver (BASELINE config 4 path):
    # rank-deficient Hessians, per-lane results vs the f64 single solver
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings

    B, n, m, rank = 128, 20, 40, 12
    rng = np.random.default_rng(11)
    Q = rng.standard_normal((B, n, rank)).astype(np.float32)
    H = np.einsum('bir,bjr->bij', Q, Q)
    f = rng.standard_normal((B, n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (5 + 5 * rng.random((B, m))).astype(np.float32)
    bl = -(5 + 5 * rng.random((B, m))).astype(np.float32)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    res = batch_mod.solve_batch_prox_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st, ms=0, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == 1), np.unique(flags, return_counts=True)
    xs = np.asarray(res.x)
    for b in range(0, B, 11):
        ref = daqp_tpu.quadprog(
            H[b].astype(np.float64), f[b].astype(np.float64),
            A[b].astype(np.float64), bu[b].astype(np.float64),
            bl[b].astype(np.float64), ms=0)
        assert int(flags[b]) == int(ref.exitflag)
        assert np.linalg.norm(xs[b] - np.asarray(ref.x)) < 2e-3, b


def test_batch_prox_pallas_mixed_pd():
    # PD lanes mixed with semidefinite lanes: PD lanes exit after the
    # first outer pass (eps = 0), semidefinite lanes iterate
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings

    B, n, m = 128, 10, 24
    rng = np.random.default_rng(13)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + np.eye(n, dtype=np.float32)
    Qs = rng.standard_normal((B // 2, n, n // 2)).astype(np.float32)
    H[:B // 2] = np.einsum('bir,bjr->bij', Qs, Qs)     # semidefinite half
    f = rng.standard_normal((B, n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (4 + 4 * rng.random((B, m))).astype(np.float32)
    bl = -(4 + 4 * rng.random((B, m))).astype(np.float32)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 1000}, jnp.float32)
    res = batch_mod.solve_batch_prox_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st, ms=0, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == 1), np.unique(flags, return_counts=True)
    xs = np.asarray(res.x)
    for b in range(0, B, 17):
        ref = daqp_tpu.quadprog(
            H[b].astype(np.float64), f[b].astype(np.float64),
            A[b].astype(np.float64), bu[b].astype(np.float64),
            bl[b].astype(np.float64), ms=0)
        assert np.linalg.norm(xs[b] - np.asarray(ref.x)) < 2e-3, b


def test_proximal_regularization_getter():
    # daqp_get_proximal_regularization analogue (utils.c:299-343):
    # tracked value + factor-only recovery must agree; PD H gives 0
    import jax.numpy as jnp
    from daqp_tpu import transform
    from daqp_tpu.api import _as_settings

    st = _as_settings(None, jnp.float64)
    rng = np.random.default_rng(5)
    n, m = 8, 16
    A = rng.standard_normal((m, n))
    bu = 5 + rng.random(m)
    bl = -5 - rng.random(m)
    # dense singular H -> full shift applied
    Q = rng.standard_normal((n, n - 3))
    Hs = Q @ Q.T
    ldp = transform.build_ldp(jnp.asarray(Hs), jnp.zeros(n),
                              jnp.asarray(A), jnp.asarray(bu),
                              jnp.asarray(bl), None, 0, st)
    eps_tracked = float(ldp.eps_used)
    assert eps_tracked > 0
    eps_rec = float(transform.get_proximal_regularization(
        ldp, H=Hs, st=st))
    assert abs(eps_rec - eps_tracked) < 1e-9 * max(1.0, eps_tracked), \
        (eps_rec, eps_tracked)
    # PD H -> 0 both ways
    Hpd = Hs + np.eye(n)
    ldp2 = transform.build_ldp(jnp.asarray(Hpd), jnp.zeros(n),
                               jnp.asarray(A), jnp.asarray(bu),
                               jnp.asarray(bl), None, 0, st)
    assert float(ldp2.eps_used) == 0.0
    assert float(transform.get_proximal_regularization(
        ldp2, H=Hpd, st=st)) == 0.0
    # Model surface
    import daqp_tpu
    mdl = daqp_tpu.Model()
    mdl.setup(Hpd, np.zeros(n), A, bu, bl, ms=0)
    assert mdl.proximal_regularization() == 0.0
