"""SOFT_WEIGHTS slack-bound semantics (reference optional build,
CMakeLists.txt:27-30, types.h:168-180, auxiliary.c:199-274):

    min 0.5 x'Hx + f'x + 0.5 su'su + 0.5 sl'sl
    s.t. blower - rho_ls*sl <= Ax <= bupper + rho_us*su,
         su >= d_us, sl >= d_ls       (bounds include the d contribution)

Ground truth: the LIFTED plain QP in (x, tu, tl) with tu = su - d_us >= 0,
tl = sl - d_ls >= 0 solved by the hard-constraint solver in f64.
"""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu.types import SOFT, SLACK_FIXED


def _sw_objective(x, H, f, A, bu, bl, soft_rows, d_ls, d_us, rho_ls,
                  rho_us):
    """The SOFT_WEIGHTS objective at x (slacks eliminated in closed
    form) + the max HARD-row violation — the arbiter for near-tie
    disputes between realizations (two points within ~primal_tol of the
    same objective are both correct answers of the f32 solver)."""
    m = A.shape[0]
    su = np.sqrt(rho_us)
    sl = np.sqrt(rho_ls)
    obj = 0.5 * x @ H @ x + f @ x
    hard = 0.0
    for i in range(m):
        ai = A[i] @ x
        if i in soft_rows:
            t1 = max(0.0, (ai - bu[i]) / su[i])
            obj += 0.5 * (t1 + d_us[i] * su[i]) ** 2
            t2 = max(0.0, (bl[i] - ai) / sl[i])
            obj += 0.5 * (t2 + d_ls[i] * sl[i]) ** 2
        else:
            hard = max(hard, ai - bu[i], bl[i] - ai)
    return obj, hard


def _lift_and_solve(H, f, A, bu, bl, soft_rows, d_ls, d_us, rho_ls, rho_us):
    """Solve the lifted slack QP with the plain solver; returns x.

    Code-level SOFT_WEIGHTS semantics (the optional build has no in-tree
    tests; the code is the spec): ``rho`` is the SQUARED relaxation
    coefficient (it lands directly on the dual Gram diagonal,
    factorization.c:31-40, and is scaled by scaling^2, utils.c:99-110)
    and ``d`` is the slack bound in dual units (the FREE/FIXED threshold
    compares it to lam, auxiliary.c:30-36).  The equivalent explicit QP:
    variables (x, t >= 0) with constraint  a'x - sqrt(rho) t <= b  and
    penalty 0.5 (t + d*sqrt(rho))^2 — derived from the KKT conditions and
    verified here against the solver's free/fixed transitions.
    """
    n = H.shape[0]
    m = A.shape[0]
    soft_rows = list(soft_rows)
    k = len(soft_rows)
    nz = n + 2 * k
    Hz = np.eye(nz)
    Hz[:n, :n] = H
    su = np.sqrt(rho_us)
    sl = np.sqrt(rho_ls)
    fz = np.concatenate([f, (d_us * su)[soft_rows], (d_ls * sl)[soft_rows]])
    rows, rub, rlb = [], [], []
    for i in range(m):
        if i in soft_rows:
            j = soft_rows.index(i)
            up = np.zeros(nz)
            up[:n] = A[i]
            up[n + j] = -su[i]
            rows.append(up)
            rub.append(bu[i])
            rlb.append(-1e30)
            lo = np.zeros(nz)
            lo[:n] = A[i]
            lo[n + k + j] = sl[i]
            rows.append(lo)
            rub.append(1e30)
            rlb.append(bl[i])
        else:
            r = np.zeros(nz)
            r[:n] = A[i]
            rows.append(r)
            rub.append(bu[i])
            rlb.append(bl[i])
    for j in range(2 * k):                      # slack nonnegativity
        r = np.zeros(nz)
        r[n + j] = 1.0
        rows.append(r)
        rub.append(1e30)
        rlb.append(0.0)
    res = daqp_tpu.quadprog(Hz, fz, np.asarray(rows), np.asarray(rub),
                            np.asarray(rlb), ms=0)
    assert int(res.exitflag) in (1, 2), int(res.exitflag)
    return np.asarray(res.x)[:n]


def _solve_sw(H, f, A, bu, bl, sense, d_ls, d_us, rho_ls, rho_us):
    return daqp_tpu.quadprog(
        H, f, A, bu, bl, sense, ms=0,
        soft_weights={'d_ls': d_ls, 'd_us': d_us,
                      'rho_ls': rho_ls, 'rho_us': rho_us})


def test_soft_weights_1d_free_and_fixed():
    # min 0.5 x^2 - c x, soft x <= b, slack bound d, Gram weight R.
    # Free regime (lam >= d): lam = (c - b + R d)/(1 + R), x = c - lam.
    # Fixed regime (lam_free < d): slack pinned, row behaves hard, x = b.
    H = np.eye(1)
    A = np.array([[1.0]])
    bl = np.array([-1e30])
    sense = np.array([SOFT], np.int32)
    d = np.array([0.5])
    rho = np.array([1.0])
    zero = np.zeros(1)

    # strongly violated -> slack free
    c, b = 5.0, 1.0
    res = _solve_sw(H, np.array([-c]), A, np.array([b]), bl, sense,
                    zero, d, rho, rho)
    lam = (c - b + d[0]) / 2.0
    assert lam >= d[0]
    assert abs(float(res.x[0]) - (c - lam)) < 1e-8, res.x
    assert int(res.exitflag) == daqp_tpu.EXIT_SOFT_OPTIMAL

    # mildly violated -> slack pinned at its bound, row behaves hard
    c2 = 1.3                     # lam_free = 0.4 < d = 0.5
    res2 = _solve_sw(H, np.array([-c2]), A, np.array([b]), bl, sense,
                     zero, d, rho, rho)
    assert abs(float(res2.x[0]) - b) < 1e-8, res2.x

    # inactive constraint
    res3 = _solve_sw(H, np.array([-0.5]), A, np.array([b]), bl, sense,
                     zero, d, rho, rho)
    assert abs(float(res3.x[0]) - 0.5) < 1e-8, res3.x


def test_soft_weights_matches_lifted_qp():
    rng = np.random.default_rng(21)
    for trial in range(8):
        n, m = 6, 14
        Q = rng.standard_normal((n, n))
        H = Q @ Q.T + 0.5 * np.eye(n)
        f = 3 * rng.standard_normal(n)
        A = rng.standard_normal((m, n))
        bu = 0.3 * rng.random(m)
        bl = bu - 0.3 - 0.5 * rng.random(m)
        soft_rows = [0, 3, 7, 11]
        sense = np.zeros(m, np.int32)
        sense[soft_rows] = SOFT
        d_ls = np.zeros(m)
        d_us = np.zeros(m)
        rho_ls = np.full(m, 1.0)
        rho_us = np.full(m, 1.0)
        d_ls[soft_rows] = 0.4 * rng.random(len(soft_rows))
        d_us[soft_rows] = 0.4 * rng.random(len(soft_rows))
        rho_ls[soft_rows] = 0.5 + rng.random(len(soft_rows))
        rho_us[soft_rows] = 0.5 + rng.random(len(soft_rows))

        x_ref = _lift_and_solve(H, f, A, bu, bl, soft_rows,
                                d_ls, d_us, rho_ls, rho_us)
        res = _solve_sw(H, f, A, bu, bl, sense, d_ls, d_us,
                        rho_ls, rho_us)
        assert int(res.exitflag) in (1, 2), (trial, int(res.exitflag))
        err = np.abs(np.asarray(res.x) - x_ref).max()
        assert err < 1e-6, (trial, err, np.asarray(res.x), x_ref)


def test_soft_weights_defaults_match_plain_soft():
    # d = 0, rho = rho_soft reproduces the plain-soft build's behavior.
    # Rows are unit-normalized in u-space first: the plain build applies
    # rho_soft to NORMALIZED rows while the SOFT_WEIGHTS build scales the
    # user rho by scaling^2 (utils.c:99-110) — they coincide at
    # scaling == 1, exactly as in the reference.
    rng = np.random.default_rng(33)
    from tests.gen import generate_test_qp
    x, H, f, A, bu, bl, sense = generate_test_qp(8, 20, 0, 5, 1e2, rng)
    # normalize in u-space: rows of A R^{-1} to unit norm
    R = np.linalg.cholesky(H).T
    M = A @ np.linalg.inv(R)
    nrm = np.linalg.norm(M, axis=1)
    A = A / nrm[:, None]
    bu = bu / nrm
    bl = bl / nrm
    sense = sense.copy()
    sense[:6] = SOFT
    plain = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    m = len(bu)
    rho = float(daqp_tpu.Settings().rho_soft)
    sw = _solve_sw(H, f, A, bu, bl, sense, np.zeros(m), np.zeros(m),
                   np.full(m, rho), np.full(m, rho))
    assert int(sw.exitflag) == int(plain.exitflag)
    assert np.abs(np.asarray(sw.x) - np.asarray(plain.x)).max() < 1e-7


def test_soft_weights_batched_flat_tier():
    # SOFT_WEIGHTS on the BATCHED flat tier (this framework's main
    # surface): a batch of random instances with per-row slack bounds,
    # differentially tested against the lifted slack QP in f64.
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.types import SoftWeights

    rng = np.random.default_rng(57)
    B, n, m = 24, 6, 14
    soft_rows = [0, 3, 7, 11]
    Hs = np.empty((B, n, n)); fs = np.empty((B, n))
    As = np.empty((B, m, n)); bus = np.empty((B, m)); bls = np.empty((B, m))
    d_ls = np.zeros((B, m)); d_us = np.zeros((B, m))
    rho_ls = np.ones((B, m)); rho_us = np.ones((B, m))
    for b in range(B):
        Q = rng.standard_normal((n, n))
        Hs[b] = Q @ Q.T + 0.5 * np.eye(n)
        fs[b] = 3 * rng.standard_normal(n)
        As[b] = rng.standard_normal((m, n))
        bus[b] = 0.3 * rng.random(m)
        bls[b] = bus[b] - 0.3 - 0.5 * rng.random(m)
        d_ls[b, soft_rows] = 0.4 * rng.random(len(soft_rows))
        d_us[b, soft_rows] = 0.4 * rng.random(len(soft_rows))
        rho_ls[b, soft_rows] = 0.5 + rng.random(len(soft_rows))
        rho_us[b, soft_rows] = 0.5 + rng.random(len(soft_rows))
    sense = np.zeros((B, m), np.int32)
    sense[:, soft_rows] = SOFT

    st = _as_settings({"iter_limit": 500}, jnp.float64)
    sw = SoftWeights(d_ls=jnp.asarray(d_ls), d_us=jnp.asarray(d_us),
                     rho_ls=jnp.asarray(rho_ls), rho_us=jnp.asarray(rho_us))
    res = batch_mod.solve_batch_flat_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, K=n + len(soft_rows) + 1, sw=sw)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    assert np.all(flags > 0), np.unique(flags)
    for b in range(B):
        x_ref = _lift_and_solve(Hs[b], fs[b], As[b], bus[b], bls[b],
                                soft_rows, d_ls[b], d_us[b],
                                rho_ls[b], rho_us[b])
        err = np.abs(xs[b] - x_ref).max()
        assert err < 1e-6, (b, err, xs[b], x_ref)

    # single-lane differential: flags and x match the single-instance
    # SOFT_WEIGHTS path exactly
    for b in range(0, B, 5):
        one = _solve_sw(Hs[b], fs[b], As[b], bus[b], bls[b], sense[b],
                        d_ls[b], d_us[b], rho_ls[b], rho_us[b])
        assert int(flags[b]) == int(one.exitflag), b
        assert np.abs(xs[b] - np.asarray(one.x)).max() < 1e-7, b


def test_soft_weights_backstop_escalation():
    # Historically this seed produced flat-tier EXIT_CYCLE lanes (the
    # singular-pend transition limitation).  Round 3's fix — pend
    # transitions participate in the blocking search — solves every lane
    # cleanly, which part 1 pins as a regression test.  Part 2 then
    # injects a failed lane to exercise backstop_resolve's SOFT_WEIGHTS
    # escalation: a bad SW lane must be repaired through the f64
    # SINGLE-instance solver (full SW support) — never silently
    # re-solved as plain-soft by the oracle.
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.types import SoftWeights

    rng = np.random.default_rng(170010)
    n = int(rng.integers(3, 10)); m = int(rng.integers(n + 3, 2 * n + 8))
    ns = int(rng.integers(1, max(2, m // 3)))
    B = 16
    soft_rows = sorted(rng.choice(m, ns, replace=False).tolist())
    Hs = np.empty((B, n, n)); fs = np.empty((B, n))
    As = np.empty((B, m, n)); bus = np.empty((B, m)); bls = np.empty((B, m))
    d_ls = np.zeros((B, m)); d_us = np.zeros((B, m))
    rho_ls = np.ones((B, m)); rho_us = np.ones((B, m))
    for b in range(B):
        Q = rng.standard_normal((n, n))
        Hs[b] = Q @ Q.T + 0.5 * np.eye(n)
        fs[b] = 3 * rng.standard_normal(n)
        As[b] = rng.standard_normal((m, n))
        bus[b] = 0.3 * rng.random(m)
        bls[b] = bus[b] - 0.3 - 0.5 * rng.random(m)
        d_ls[b, soft_rows] = 0.4 * rng.random(ns)
        d_us[b, soft_rows] = 0.4 * rng.random(ns)
        rho_ls[b, soft_rows] = 0.5 + rng.random(ns)
        rho_us[b, soft_rows] = 0.5 + rng.random(ns)
    sense = np.zeros((B, m), np.int32)
    sense[:, soft_rows] = SOFT
    st = _as_settings({"iter_limit": 2000}, jnp.float64)
    sw = SoftWeights(jnp.asarray(d_ls), jnp.asarray(d_us),
                     jnp.asarray(rho_ls), jnp.asarray(rho_us))
    res = batch_mod.solve_batch_flat_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, K=n + ns + 1, sw=sw)
    flags0 = np.asarray(res.exitflag)
    # part 1 — regression: the round-3 pend-transition fix solves every
    # lane of the formerly-degenerate batch cleanly on the flat tier
    assert (flags0 > 0).all(), flags0

    # part 2 — escalation: corrupt one SW lane (wrong x + EXIT_CYCLE
    # flag) and verify backstop_resolve repairs it through the f64
    # single-instance SW solver
    b = 5
    bad_flags = jnp.asarray(flags0).at[b].set(-2)
    bad_x = jnp.asarray(res.x).at[b].set(1e3)
    corrupted = res._replace(exitflag=bad_flags, x=bad_x)
    rep = batch_mod.backstop_resolve(corrupted, Hs, fs, As, bus, bls,
                                     sense, ms=0, sw=sw)
    flags1 = np.asarray(rep.exitflag)
    assert (flags1 > 0).all(), flags1
    one = _solve_sw(Hs[b], fs[b], As[b], bus[b], bls[b], sense[b],
                    d_ls[b], d_us[b], rho_ls[b], rho_us[b])
    assert int(flags1[b]) == int(one.exitflag)
    assert np.abs(np.asarray(rep.x)[b] - np.asarray(one.x)).max() < 1e-9
    # untouched lanes keep their flat-tier solution
    others = np.ones(B, bool); others[b] = False
    assert np.array_equal(np.asarray(rep.x)[others],
                          np.asarray(res.x)[others])
