"""Real-chip smoke gate for the Pallas kernel VARIANTS.

bench.py exercises only the hard cold-start kernel; the equality/warm bulk
activation (``dense_activate``) and the ``has_soft=True`` compile variant
previously ran only in interpret mode on CPU — and interpret mode skips
``input_output_aliases``, so the aliased-buffer behavior was exactly the
part not covered.  This script runs the adversarial mixed batch, the soft
batch, and a warm-activation batch through the REAL kernel and checks
per-lane results against the f64 single-instance solver.

Run manually on the chip:  python scripts/tpu_smoke.py
Exit code 0 = all gates pass.  (Not part of the CPU pytest suite — it
needs the TPU; keep it in sync with tests/test_pallas_adversarial.py.)
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import daqp_tpu
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from tests.gen import generate_test_qp_batch

    assert jax.default_backend() != 'cpu', "run on the TPU"
    failures = []

    # --- mixed adversarial batch (infeasible/equality/degenerate lanes) --
    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=11, dtype=np.float32)
    bu, bl, sense, A = (d['bupper'].copy(), d['blower'].copy(),
                        d['sense'].copy(), d['A'].copy())
    for b in range(10):
        A[b][1] = A[b][0]
        bu[b][0], bl[b][0] = -1.0, -30.0
        bu[b][1], bl[b][1] = 30.0, 1.0
    for b in range(10, 20):
        mid = 0.5 * (bu[b][2] + bl[b][2])
        bu[b][2] = bl[b][2] = mid
    for b in range(20, 30):
        A[b][3] = A[b][4]
        bu[b][3] = bu[b][4]
        bl[b][3] = bl[b][4]
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(A),
        jnp.asarray(bu), jnp.asarray(bl), jnp.asarray(sense), st=st, ms=0)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    if not np.all(flags[:10] == daqp_tpu.EXIT_INFEASIBLE):
        failures.append(f"mixed: infeasible lanes {flags[:10]}")
    # per-lane gate: distance to the f64 optimum, OR a clean f64 KKT
    # certificate — an equality forced to a midpoint can leave a
    # low-curvature direction where the f32 solution is KKT-consistent
    # (stat ~1e-5) yet ~5e-3 from the f64 point on BOTH solver tiers;
    # that is instance conditioning, not a kernel defect
    stat, viol = batch_mod.kkt_residuals(
        d['H'], d['f'], A, bu, bl, sense, xs, np.asarray(res.lam), ms=0)
    for b in range(10, 30):
        ref = daqp_tpu.quadprog(d['H'][b].astype(np.float64),
                                d['f'][b].astype(np.float64),
                                A[b].astype(np.float64),
                                bu[b].astype(np.float64),
                                bl[b].astype(np.float64), ms=0)
        if int(flags[b]) != int(ref.exitflag):
            failures.append(f"mixed lane {b}: {flags[b]} vs "
                            f"{int(ref.exitflag)}")
        elif int(ref.exitflag) == 1 and \
                np.linalg.norm(xs[b] - np.asarray(ref.x)) > 2e-3 and \
                (stat[b] > 1e-4 or viol[b] > 1e-4):
            failures.append(f"mixed lane {b}: err "
                            f"{np.linalg.norm(xs[b] - np.asarray(ref.x))}"
                            f" stat {stat[b]:.2g} viol {viol[b]:.2g}")
    if not np.all(flags[30:] == daqp_tpu.EXIT_OPTIMAL):
        failures.append("mixed: clean lanes not optimal")
    err = np.linalg.norm(xs[30:] - d['x'][30:], axis=1)
    if err.max() >= 2e-3:
        failures.append(f"mixed: clean-lane err {err.max()}")
    print("mixed batch:", "FAIL" if failures else "ok", flush=True)

    # --- soft variant (has_soft=True kernel compile) --------------------
    nf0 = len(failures)
    B, n = 128, 8
    rng = np.random.default_rng(19)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + np.eye(n, dtype=np.float32)
    f = np.zeros((B, n), np.float32)
    A = np.tile(np.eye(n, dtype=np.float32)[None], (B, 1, 1))
    A = np.concatenate([A, A[:, :1]], axis=1)
    bu = np.concatenate([np.zeros((B, 1)), np.full((B, n - 1), 10.0),
                         np.full((B, 1), 1e30)], axis=1).astype(np.float32)
    bl = np.concatenate([np.full((B, n), -10.0), np.ones((B, 1))],
                        axis=1).astype(np.float32)
    sense = np.zeros((B, n + 1), np.int32)
    sense[:, n] = daqp_tpu.SOFT
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st=st, ms=0)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    if not np.all(flags == daqp_tpu.EXIT_SOFT_OPTIMAL):
        failures.append(f"soft: flags {np.unique(flags)}")
    if np.any(xs[:, 0] > 1e-3):
        failures.append("soft: hard bound x1<=0 violated")
    print("soft batch:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    # --- SOFT_WEIGHTS variant (has_sw kernel compile; slack state
    # machine + aliased sfix/pfix buffers) vs the flat SW tier ----------
    nf0 = len(failures)
    from tests.test_pallas_sw import _make_batch
    B, n, m = 128, 6, 14
    soft_rows = [0, 3, 7, 11]
    Hs, fs, As, bus, bls, sense, sw, _ = _make_batch(
        B, n, m, soft_rows, seed=57)
    stsw = _as_settings({"iter_limit": 500}, jnp.float32)
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), stsw,
        ms=0, sw=sw)
    res_f = batch_mod.solve_batch_flat_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), stsw,
        ms=0, K=n + len(soft_rows) + 1, sw=sw)
    flags = np.asarray(res.exitflag)
    flags_f = np.asarray(res_f.exitflag)
    if not (np.all(flags > 0) and np.all(flags_f > 0)):
        failures.append(f"sw: flags {np.unique(flags)} vs flat "
                        f"{np.unique(flags_f)}")
    else:
        dx = np.abs(np.asarray(res.x) - np.asarray(res_f.x)).max()
        if dx > 5e-4:
            failures.append(f"sw: kernel-vs-flat dx {dx}")
    print("SOFT_WEIGHTS batch:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    # --- warm/equality bulk activation (dense_activate path) ------------
    nf0 = len(failures)
    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=23,
                               dtype=np.float32)
    bu, bl = d['bupper'].copy(), d['blower'].copy()
    sense = d['sense'].copy()
    for b in range(B):                      # two equality rows per lane
        for r in (0, 1):
            mid = 0.5 * (bu[b][r] + bl[b][r])
            bu[b][r] = bl[b][r] = mid
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(d['A']),
        jnp.asarray(bu), jnp.asarray(bl), jnp.asarray(sense), st=st, ms=0)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    stat, viol = batch_mod.kkt_residuals(
        d['H'], d['f'], d['A'], bu, bl, sense, xs, np.asarray(res.lam),
        ms=0)
    nbad = 0
    for b in range(B):
        ref = daqp_tpu.quadprog(d['H'][b].astype(np.float64),
                                d['f'][b].astype(np.float64),
                                d['A'][b].astype(np.float64),
                                bu[b].astype(np.float64),
                                bl[b].astype(np.float64), ms=0)
        if int(flags[b]) != int(ref.exitflag):
            nbad += 1
        elif int(ref.exitflag) == 1 and \
                np.linalg.norm(xs[b] - np.asarray(ref.x)) > 2e-3 and \
                (stat[b] > 1e-4 or viol[b] > 1e-4):
            nbad += 1
    if nbad:
        failures.append(f"warm-activation: {nbad}/{B} lanes mismatch")
    print("warm-activation batch:", "FAIL" if len(failures) > nf0
          else "ok", flush=True)

    # --- node-wave MIQP (slot kernel + warm-started waves + bound cut) --
    nf0 = len(failures)
    B, n, m, nb = 128, 10, 24, 4
    rng = np.random.default_rng(31)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + 0.5 * np.eye(n,
                                                       dtype=np.float32)
    f = (8 * rng.standard_normal((B, n))).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    bu = (15 * rng.random((B, m))).astype(np.float32)
    bl = (-15 * rng.random((B, m))).astype(np.float32)
    A[:, :nb] = 0.0
    A[:, np.arange(nb), np.arange(nb)] = 1.0
    bu[:, :nb] = 1.0
    bl[:, :nb] = 0.0
    sense = np.zeros((B, m), np.int32)
    sense[:, :nb] = daqp_tpu.BINARY
    stm = _as_settings({"iter_limit": 1000}, jnp.float32)
    res = batch_mod.solve_batch_miqp_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), stm, ms=0,
        bin_ids=tuple(range(nb)))
    flags = np.asarray(res.exitflag)
    fv = np.asarray(res.fval)
    nbad = 0
    for b in range(0, B, 7):
        ref = daqp_tpu.quadprog(
            H[b].astype(np.float64), f[b].astype(np.float64),
            A[b].astype(np.float64), bu[b].astype(np.float64),
            bl[b].astype(np.float64), sense[b], ms=0)
        if int(flags[b]) != int(ref.exitflag):
            nbad += 1
        elif int(ref.exitflag) == 1 and \
                abs(fv[b] - float(ref.fval)) \
                > 1e-3 * (1 + abs(float(ref.fval))):
            nbad += 1
    if nbad:
        failures.append(f"wave MIQP: {nbad} sampled lanes mismatch")
    print("wave MIQP batch:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    # fused MPC horizon segment (run_mpc_segment): the in-kernel T loop
    # with input/output ALIASING — interpret mode cannot cover aliasing,
    # so the per-(scenario, step) outputs are gated against the per-step
    # Pallas scan ON CHIP (both paths share slot_solve semantics; the
    # fused path adds the in-kernel cold retry)
    nf0 = len(failures)
    from daqp_tpu import mpc as mpc_mod
    S_m, T_m, n_m, m_m = 128, 8, 20, 40
    rngm = np.random.default_rng(57)
    from tests.gen import generate_test_qp
    _, Hm, fm, Am, bum, blm, _se = generate_test_qp(n_m, m_m, 0, 12,
                                                    1e2, rngm)
    Hm, fm, Am, bum, blm = (v.astype(np.float32)
                            for v in (Hm, fm, Am, bum, blm))
    dfm = 0.02 * rngm.standard_normal((S_m, T_m, n_m)).astype(np.float32)
    dbm = 0.02 * rngm.standard_normal((S_m, T_m, m_m)).astype(np.float32)
    fseq = np.cumsum(dfm, axis=1) + fm
    buseq = np.cumsum(np.abs(dbm), axis=1) + bum
    blseq = blm - np.cumsum(np.abs(dbm), axis=1)
    stm = _as_settings({"iter_limit": 500}, jnp.float32)
    outf = mpc_mod.solve_mpc_scan_pallas_fused(
        jnp.asarray(Hm), jnp.asarray(Am), jnp.asarray(fseq),
        jnp.asarray(buseq), jnp.asarray(blseq), stm, ms=0, seg=4)
    outp = mpc_mod.solve_mpc_scan_pallas(
        jnp.asarray(Hm), jnp.asarray(Am), jnp.asarray(fseq),
        jnp.asarray(buseq), jnp.asarray(blseq), stm, ms=0)
    ff = np.asarray(outf.exitflag)
    fp = np.asarray(outp.exitflag)
    if not (ff == 1).all():
        failures.append(f"fused MPC: flags {np.unique(ff)}")
    dx = np.abs(np.asarray(outf.x) - np.asarray(outp.x)).max()
    if dx > 5e-4:
        failures.append(f"fused MPC: |x_fused - x_scan| = {dx:.2e}")
    print("fused MPC horizon:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    # fused prox outer loop (run_prox_segment, aliasing + in-kernel
    # Rinv application): gated against the XLA per-pass path ON CHIP —
    # flags must agree and the objective at the accepted fixed point
    # must match (x can differ along semidefinite-H null directions)
    nf0 = len(failures)
    Bp, n_p, m_p, rk = 128, 20, 40, 12
    rngp = np.random.default_rng(67)
    Qp = rngp.standard_normal((Bp, n_p, rk)).astype(np.float32)
    Hp = np.einsum('bir,bjr->bij', Qp, Qp)
    fp = rngp.standard_normal((Bp, n_p)).astype(np.float32)
    Ap = rngp.standard_normal((Bp, m_p, n_p)).astype(np.float32)
    bup = (4 + 4 * rngp.random((Bp, m_p))).astype(np.float32)
    blp = -(4 + 4 * rngp.random((Bp, m_p))).astype(np.float32)
    sep = np.zeros((Bp, m_p), np.int32)
    stp = _as_settings({"iter_limit": 1000}, jnp.float32)
    argsp = tuple(jnp.asarray(v) for v in (Hp, fp, Ap, bup, blp, sep))
    rpx = batch_mod.solve_batch_prox_pallas_jit(*argsp, stp, ms=0,
                                                fused=False)
    rpf = batch_mod.solve_batch_prox_pallas_jit(*argsp, stp, ms=0,
                                                fused=True)
    fxp = np.asarray(rpx.exitflag)
    ffp = np.asarray(rpf.exitflag)
    if not np.array_equal(fxp > 0, ffp > 0):
        failures.append("fused prox: flag split vs XLA path")
    H64p = Hp.astype(np.float64)
    xv = np.asarray(rpx.x).astype(np.float64)
    xw = np.asarray(rpf.x).astype(np.float64)
    fvx = 0.5 * np.einsum('bi,bij,bj->b', xv, H64p, xv) \
        + np.einsum('bi,bi->b', fp, xv)
    fvf = 0.5 * np.einsum('bi,bij,bj->b', xw, H64p, xw) \
        + np.einsum('bi,bi->b', fp, xw)
    dgap = np.abs(fvf - fvx).max()
    if dgap > 1e-2:
        failures.append(f"fused prox: objective gap {dgap:.2e}")
    print("fused prox batch:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    # fused AVI outer loop (run_avi_segment): constructed two-sided AVIs,
    # fused vs XLA path flags + accuracy vs the known solutions
    nf0 = len(failures)
    from tests.gen import generate_test_avi_two_sided
    rnga = np.random.default_rng(73)
    Ba, n_a, m_a = 128, 12, 30
    pav = [generate_test_avi_two_sided(n_a, m_a, rnga) for _ in range(Ba)]
    xr_a = np.stack([p_[0] for p_ in pav])
    Ha = jnp.asarray(np.stack([p_[1] for p_ in pav]), jnp.float32)
    fa = jnp.asarray(np.stack([p_[2] for p_ in pav]), jnp.float32)
    Aa = jnp.asarray(np.stack([p_[3] for p_ in pav]), jnp.float32)
    bua = jnp.asarray(np.stack([p_[4] for p_ in pav]), jnp.float32)
    bla = jnp.asarray(np.stack([p_[5] for p_ in pav]), jnp.float32)
    sea = jnp.zeros((Ba, m_a), jnp.int32)
    sta = _as_settings({"iter_limit": 1000}, jnp.float32)
    raf = batch_mod.solve_batch_avi_pallas_jit(Ha, fa, Aa, bua, bla,
                                               sea, sta, ms=0,
                                               fused=True)
    fla = np.asarray(raf.exitflag)
    erra = np.abs(np.asarray(raf.x) - xr_a).max(axis=1)
    oka = (fla == 1) & (erra < 1e-3)
    if oka.mean() < 0.97:
        failures.append(f"fused AVI: accuracy {oka.mean():.3f}")
    print("fused AVI batch:", "FAIL" if len(failures) > nf0 else "ok",
          flush=True)

    if failures:
        print("TPU_SMOKE_FAIL")
        for msg in failures:
            print(" -", msg)
        return 1
    print("TPU_SMOKE_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
