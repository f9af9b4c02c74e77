"""Randomized cross-tier differential fuzzer (CPU).

Loop-until-dry bug hunting across solver families and tiers: random
instances (shapes, conditioning, equalities, soft rows, binaries) solved
through several tiers and checked against ground truth — the constructed
optimum where available, the f64 single-instance solve otherwise — plus
the full KKT gate (stationarity, feasibility, complementarity).

Families x tiers:
  * QP: constructed ground truth; tiers = flat batch (f32), slot kernel
    (interpret, f32), naive batch (f64), native C, single f64;
  * QP with equalities / soft rows / high conditioning variants;
  * MIQP: wave driver (interpret) + native C vs single-lane BnB (f64);
  * SOFT_WEIGHTS: flat batch vs single vs lifted QP;
  * LP: batched slot tier + single + native C vs constructed optima
    (relative-objective + feasibility gates — vertex degeneracy makes
    ||x - xref|| ill-posed);
  * AVI: batched DR tier + single vs constructed solutions;
  * hierarchical: batched level walk vs single hiqp at matched rho;
  * Bland pricing variants of the above.

Usage: python scripts/fuzz_differential.py [seconds] (default 600)
Exit code 0 = no mismatches.  Prints found issues with repro seeds.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import daqp_tpu
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.native import NativeModel
    from daqp_tpu.types import SOFT, BINARY, SoftWeights
    from tests.gen import generate_test_qp_batch

    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    t0 = time.time()
    issues = []
    round_i = 0

    def check_qp(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 28))
        m = int(rng.integers(n + 2, 3 * n + 8))
        nact = int(rng.integers(1, n))
        kappa = float(10 ** rng.integers(1, 5))
        B = 128
        d = generate_test_qp_batch(B, n, m, 0, nact, kappa, rng=seed,
                                   dtype=np.float32)
        bu, bl, sense = (d['bupper'].copy(), d['blower'].copy(),
                         d['sense'].copy())
        # sprinkle equalities + soft rows on some lanes
        for b in range(0, B, 9):
            r = int(rng.integers(0, m))
            mid = 0.5 * (bu[b][r] + bl[b][r])
            bu[b][r] = bl[b][r] = mid
        pricing = int(rng.integers(0, 2))
        st = _as_settings({"iter_limit": 1500, "pricing": pricing},
                          jnp.float32)
        args = [jnp.asarray(a) for a in
                (d['H'], d['f'], d['A'], bu, bl, sense)]
        tiers = {
            'flat': lambda: batch_mod.solve_batch_flat_jit(
                *args, st=st, ms=0),
            'slot': lambda: batch_mod.solve_batch_pallas_jit(
                *args, st=st, ms=0, has_soft=False, interpret=True),
        }
        rates = {}
        tier_x = {}
        tier_ok = {}
        for name, solve in tiers.items():
            r = solve()
            flags = np.asarray(r.exitflag)
            ok = flags == 1
            tier_x[name] = np.asarray(r.x, float)
            tier_ok[name] = ok
            # forced-equality lanes can be legitimately infeasible; gate
            # optimal lanes on the full KKT instead of constructed x.
            # Gate calibration (measured): f32 primal_tol = 1e-4 in
            # ROW-NORMALIZED units maps to ~1e-3 in raw b-units when the
            # row scaling is small, so the viol gate sits at 5e-3; f32
            # Bland's degenerate plateaus legitimately trip the
            # progress-based cycle guard on up to ~25% of lanes at
            # larger shapes (loud -2 exits, matching the flat tier).
            stat, viol = batch_mod.kkt_residuals(
                d['H'], d['f'], d['A'], bu, bl, sense,
                np.asarray(r.x), np.asarray(r.lam), ms=0)
            tol_stat = max(1e-4, 2e-5 * np.sqrt(kappa))
            bad = ok & ((stat > tol_stat) | (viol > 5e-3))
            if bad.any():
                # raw-unit violations scale with 1/row-scaling: lanes at
                # adversarial scalings legitimately sit at the f32
                # tolerance envelope (tolerances are in row-normalized
                # units, like the reference).  Only report a lane when
                # THIS tier is far off the f64 truth while the OTHER
                # tier is not — the wrong-working-set signature.
                other = 'flat' if name == 'slot' else 'slot'
                kept = []
                for b in np.flatnonzero(bad)[:5]:
                    ref = daqp_tpu.quadprog(
                        d['H'][b].astype(float), d['f'][b].astype(float),
                        d['A'][b].astype(float), bu[b].astype(float),
                        bl[b].astype(float), ms=0)
                    if int(ref.exitflag) != 1:
                        continue
                    e_this = np.linalg.norm(tier_x[name][b]
                                            - np.asarray(ref.x))
                    e_oth = np.linalg.norm(tier_x[other][b]
                                           - np.asarray(ref.x))                         if other in tier_x and tier_ok[other][b] else None
                    if e_oth is not None and e_this > 10 * e_oth + 1e-3:
                        kept.append((int(b), float(e_this), float(e_oth)))
                if kept:
                    issues.append((seed, name, n, m, kappa, pricing,
                                   'kkt-vs-f64', kept))
            rates[name] = float((ok | (flags == -1)).mean())
            # Bland's degenerate plateaus trip the f32 progress-based
            # cycle guard at a rate that grows with conditioning
            # (measured: ~25% of lanes at kappa 1e2 larger shapes, ~47%
            # at kappa 1e3 on the slot tier — all LOUD -2 exits).
            # Bland is the anti-cycling FALLBACK pricing; Dantzig (the
            # default) holds 0.95 at every kappa.
            floor = 0.95 if pricing == 0 else \
                (0.70 if kappa <= 100 else 0.40)
            if rates[name] < floor:
                issues.append((seed, name, n, m, kappa, pricing, 'rate',
                               rates[name]))
        if abs(rates['flat'] - rates['slot']) > 0.2 \
                and not (pricing == 1 and kappa > 100):
            # (Bland at high kappa: the slot tier's plateau-cycle rate
            # is known to exceed the flat tier's — loud either way)
            issues.append((seed, 'tier-split', n, m, kappa, pricing,
                           rates))

    def check_miqp(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 14))
        m = int(rng.integers(n + 4, 2 * n + 12))
        nb = int(rng.integers(1, min(6, n)))
        B = 128
        Q = rng.standard_normal((B, n, n)).astype(np.float32)
        H = np.einsum('bij,bkj->bik', Q, Q) + 0.5 * np.eye(
            n, dtype=np.float32)
        f = (8 * rng.standard_normal((B, n))).astype(np.float32)
        A = rng.standard_normal((B, m, n)).astype(np.float32)
        bu = (15 * rng.random((B, m))).astype(np.float32)
        bl = (-15 * rng.random((B, m))).astype(np.float32)
        A[:, :nb] = 0.0
        A[:, np.arange(nb), np.arange(nb)] = 1.0
        bu[:, :nb] = 1.0
        bl[:, :nb] = 0.0
        sense = np.zeros((B, m), np.int32)
        sense[:, :nb] = BINARY
        st = _as_settings({"iter_limit": 2000}, jnp.float32)
        r = batch_mod.solve_batch_miqp_pallas_jit(
            jnp.asarray(H), jnp.asarray(f), jnp.asarray(A),
            jnp.asarray(bu), jnp.asarray(bl), jnp.asarray(sense), st,
            ms=0, bin_ids=tuple(range(nb)), interpret=True)
        flags = np.asarray(r.exitflag)
        fv = np.asarray(r.fval)
        for b in range(0, B, 17):
            ref = daqp_tpu.quadprog(
                H[b].astype(np.float64), f[b].astype(np.float64),
                A[b].astype(np.float64), bu[b].astype(np.float64),
                bl[b].astype(np.float64), sense[b], ms=0)
            natv = NativeModel(H[b].astype(np.float64),
                               f[b].astype(np.float64),
                               A[b].astype(np.float64),
                               bu[b].astype(np.float64),
                               bl[b].astype(np.float64), sense[b], ms=0)
            out = natv.solve_miqp()
            if int(flags[b]) != int(ref.exitflag):
                issues.append((seed, 'wave-miqp', n, m, nb, b, 'flag',
                               int(flags[b]), int(ref.exitflag)))
            elif int(ref.exitflag) == 1 and \
                    abs(fv[b] - float(ref.fval)) \
                    > 2e-3 * (1 + abs(float(ref.fval))):
                issues.append((seed, 'wave-miqp', n, m, nb, b, 'fval',
                               float(fv[b]), float(ref.fval)))
            if out['exitflag'] != int(ref.exitflag):
                issues.append((seed, 'native-miqp', n, m, nb, b, 'flag',
                               out['exitflag'], int(ref.exitflag)))
            elif int(ref.exitflag) == 1 and \
                    abs(out['fval'] - float(ref.fval)) > 1e-6:
                issues.append((seed, 'native-miqp', n, m, nb, b, 'fval',
                               out['fval'], float(ref.fval)))

    def check_sw(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3, 10))
        m = int(rng.integers(n + 3, 2 * n + 8))
        ns = int(rng.integers(1, max(2, m // 3)))
        B = 16
        soft_rows = sorted(rng.choice(m, ns, replace=False).tolist())
        Hs = np.empty((B, n, n)); fs = np.empty((B, n))
        As = np.empty((B, m, n)); bus = np.empty((B, m))
        bls = np.empty((B, m))
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
        r = batch_mod.solve_batch_flat_jit(
            jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
            jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
            ms=0, K=n + ns + 1, sw=sw)
        flags = np.asarray(r.exitflag)
        xs = np.asarray(r.x)
        # SW dense-mask kernel tier (f32, interpret) on the same batch
        st32 = _as_settings({"iter_limit": 2000}, jnp.float32)
        f32a = lambda a: jnp.asarray(a, jnp.float32)
        rk = batch_mod.solve_batch_pallas_jit(
            f32a(Hs), f32a(fs), f32a(As), f32a(bus), f32a(bls),
            jnp.asarray(sense), st32, ms=0, interpret=True,
            sw=SoftWeights(*(f32a(v) for v in
                             (d_ls, d_us, rho_ls, rho_us))))
        kflags = np.asarray(rk.exitflag)
        kxs = np.asarray(rk.x)
        def lifted_x(b):
            # lifted slack-QP arbiter (the SOFT_WEIGHTS executable
            # spec, tests/test_soft_weights._lift_and_solve)
            from tests.test_soft_weights import _lift_and_solve
            return _lift_and_solve(Hs[b], fs[b], As[b], bus[b], bls[b],
                                   soft_rows, d_ls[b], d_us[b],
                                   rho_ls[b], rho_us[b])

        def sw_gap(b, x):
            # objective gap of x vs the lifted optimum + hard violation
            # (a near-flat tie within ~primal_tol is a correct answer)
            from tests.test_soft_weights import _sw_objective
            xl = lifted_x(b)
            ox, hx = _sw_objective(np.asarray(x, float), Hs[b], fs[b],
                                   As[b], bus[b], bls[b], soft_rows,
                                   d_ls[b], d_us[b], rho_ls[b],
                                   rho_us[b])
            ol, _ = _sw_objective(xl, Hs[b], fs[b], As[b], bus[b],
                                  bls[b], soft_rows, d_ls[b], d_us[b],
                                  rho_ls[b], rho_us[b])
            return (ox - ol) / (1.0 + abs(ol)), hx

        for b in range(B):
            one = daqp_tpu.quadprog(
                Hs[b], fs[b], As[b], bus[b], bls[b], sense[b], ms=0,
                soft_weights={'d_ls': d_ls[b], 'd_us': d_us[b],
                              'rho_ls': rho_ls[b], 'rho_us': rho_us[b]},
                settings={"iter_limit": 2000})
            if int(kflags[b]) > 0 and int(one.exitflag) > 0:
                if np.abs(kxs[b] - np.asarray(one.x)).max() > 5e-4:
                    # dispute: objective gap vs the lifted optimum is
                    # the arbiter (near-flat f32 ties are correct)
                    gap, hard = sw_gap(b, kxs[b])
                    if gap > 1e-4 or hard > 1e-4:
                        issues.append((seed, 'sw-kernel', n, m, ns, b,
                                       'obj-gap', float(gap),
                                       float(hard)))
            elif int(kflags[b]) > 0 and int(one.exitflag) < 0:
                # kernel solved a lane the single path failed: verify
                # the kernel's answer against the lifted spec instead
                # of treating the flag split as a finding
                gap, hard = sw_gap(b, kxs[b])
                if gap > 1e-4 or hard > 1e-4:
                    issues.append((seed, 'sw-kernel', n, m, ns, b,
                                   'obj-gap-vs-lifted', float(gap),
                                   float(hard)))
            elif int(kflags[b]) != int(one.exitflag) \
                    and int(kflags[b]) != -2:
                # EXIT_CYCLE lanes escalate through backstop_resolve on
                # the production driver; here only log true flag splits
                issues.append((seed, 'sw-kernel', n, m, ns, b, 'flag',
                               int(kflags[b]), int(one.exitflag)))
            if int(flags[b]) > 0 and int(one.exitflag) > 0:
                if np.abs(xs[b] - np.asarray(one.x)).max() > 1e-5:
                    issues.append((seed, 'sw', n, m, ns, b, 'x',
                                   float(np.abs(xs[b]
                                                - np.asarray(one.x)).max())))
            elif int(flags[b]) == -2 and int(one.exitflag) > 0:
                # documented limitation: degenerate singular-pend +
                # slack-transition SW lanes exit EXIT_CYCLE on the flat
                # tier (the single path solves them) — see ldp_flat.py
                pass
            elif int(flags[b]) != int(one.exitflag):
                issues.append((seed, 'sw', n, m, ns, b, 'flag',
                               int(flags[b]), int(one.exitflag)))

    def check_prox_fused(seed):
        # fused outer-loop prox kernel (interpret) vs constructed optima
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 12))
        m = int(rng.integers(n + 4, 3 * n))
        B = 128
        d = generate_test_qp_batch(B, n, m, 0, max(1, n // 2), 1e2,
                                   rng=seed, dtype=np.float32)
        st = _as_settings({"iter_limit": 1500}, jnp.float32)
        args = tuple(jnp.asarray(d[k]) for k in
                     ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
        r = batch_mod.solve_batch_prox_pallas_jit(
            *args, st, ms=0, interpret=True, fused="force")
        flags = np.asarray(r.exitflag)
        err = np.linalg.norm(np.asarray(r.x) - d['x'], axis=1)
        if not (flags > 0).all():
            issues.append((seed, 'prox-fused', n, m, 'flags',
                           np.unique(flags).tolist()))
        elif err.max() > 1e-3:
            issues.append((seed, 'prox-fused', n, m, 'x',
                           float(err.max())))

    def check_avi_fused(seed):
        from tests.gen import generate_test_avi_two_sided
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 12))
        m = int(rng.integers(n + 4, 3 * n))
        B = 128
        probs = [generate_test_avi_two_sided(n, m, rng)
                 for _ in range(B)]
        xs = np.stack([p[0] for p in probs])
        Hs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
        fs = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
        As = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
        bus = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
        bls = jnp.asarray(np.stack([p[5] for p in probs]), jnp.float32)
        se = jnp.zeros((B, m), jnp.int32)
        st = _as_settings({"iter_limit": 2000}, jnp.float32)
        r = batch_mod.solve_batch_avi_pallas_jit(
            Hs, fs, As, bus, bls, se, st, ms=0, interpret=True,
            fused="force")
        flags = np.asarray(r.exitflag)
        err = np.abs(np.asarray(r.x) - xs).max(axis=1)
        mus = np.array([np.linalg.eigvalsh(
            0.5 * (np.asarray(Hs)[b] + np.asarray(Hs)[b].T
                   ).astype(np.float64)).min() for b in range(B)])
        tol = np.maximum(1e-3, 3e-5 / np.maximum(mus, 1e-8))
        ok = (flags == 1) & (err < tol)
        if ok.mean() < 0.95:
            issues.append((seed, 'avi-fused', n, m, 'acc',
                           float(ok.mean()), float(err.max())))

    def check_lp(seed):
        from tests.gen import generate_test_lp
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 16))
        m = int(rng.integers(2 * n, 5 * n))
        ms = int(rng.integers(0, max(1, n // 2)))
        B = 64
        probs = [generate_test_lp(n, m, ms, rng) for _ in range(B)]
        xs = np.stack([p[0] for p in probs])
        fs64 = np.stack([p[1] for p in probs])
        As64 = np.stack([p[2] for p in probs])
        bus64 = np.stack([p[3] for p in probs])
        bls64 = np.stack([p[4] for p in probs])
        fs = fs64.astype(np.float32)
        As = As64.astype(np.float32)
        bus = bus64.astype(np.float32)
        bls = bls64.astype(np.float32)
        se = np.zeros((B, m), np.int32)
        st = _as_settings({"iter_limit": 3000}, jnp.float32)
        r = batch_mod.solve_batch_lp_pallas_jit(
            jnp.asarray(fs), jnp.asarray(As), jnp.asarray(bus),
            jnp.asarray(bls), jnp.asarray(se), st, ms=ms,
            interpret=True)
        flags = np.asarray(r.exitflag)
        x = np.asarray(r.x)
        if np.mean(flags == 1) < 0.9:
            issues.append((seed, 'lp-tier', n, m, ms, 'optimal_rate',
                           float(np.mean(flags == 1))))
        # accuracy gate = relative objective + feasibility (degenerate
        # vertices make ||x - xref|| ill-posed)
        fv_ref = np.einsum('bn,bn->b', fs, xs)
        fv_got = np.einsum('bn,bn->b', fs, x)
        gap = np.abs(fv_got - fv_ref) / (1.0 + np.abs(fv_ref))
        vals = np.concatenate(
            [x[:, :ms], np.einsum('bmn,bn->bm', As, x)], axis=1)
        feas = np.maximum((vals - bus).max(axis=1),
                          (bls - vals).max(axis=1))
        for b in np.flatnonzero(flags == 1):
            if gap[b] > 2e-4 or feas[b] > 2e-4:
                issues.append((seed, 'lp-tier', n, m, ms, int(b),
                               'gap/feas', float(gap[b]),
                               float(feas[b])))
        # single-instance + native C LP on a few lanes: on the ORIGINAL
        # f64 data (comparing an exact solver on f32-ROUNDED data to the
        # f64-constructed optimum at 1e-5 false-positives on sensitive
        # vertices — found round 5: a 1.2e-4 'fval gap' that vanished on
        # unrounded data)
        for b in range(0, B, 23):
            one = daqp_tpu.linprog(fs64[b], As64[b], bus64[b],
                                   bls64[b], ms=ms)
            natv = NativeModel(None, fs64[b], As64[b], bus64[b],
                               bls64[b], ms=ms)
            out = natv.solve()
            fv_b = float(fs64[b] @ xs[b])
            if int(one.exitflag) != 1:
                issues.append((seed, 'lp-single', n, m, ms, b, 'flag',
                               int(one.exitflag)))
            elif abs(float(one.fval) - fv_b) > 1e-5 * (1 + abs(fv_b)):
                issues.append((seed, 'lp-single', n, m, ms, b, 'fval',
                               float(one.fval), fv_b))
            if out['exitflag'] != 1:
                issues.append((seed, 'lp-native', n, m, ms, b, 'flag',
                               out['exitflag']))
            elif abs(out['fval'] - fv_b) > 1e-5 * (1 + abs(fv_b)):
                issues.append((seed, 'lp-native', n, m, ms, b, 'fval',
                               out['fval'], fv_b))

    def check_avi(seed):
        from tests.gen import generate_test_avi_two_sided
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 14))
        m = int(rng.integers(n + 4, 3 * n))
        B = 64
        probs = [generate_test_avi_two_sided(n, m, rng)
                 for _ in range(B)]
        xs = np.stack([p[0] for p in probs])
        Hs = np.stack([p[1] for p in probs]).astype(np.float32)
        fs = np.stack([p[2] for p in probs]).astype(np.float32)
        As = np.stack([p[3] for p in probs]).astype(np.float32)
        bus = np.stack([p[4] for p in probs]).astype(np.float32)
        bls = np.stack([p[5] for p in probs]).astype(np.float32)
        se = np.zeros((B, m), np.int32)
        st = _as_settings({"iter_limit": 3000}, jnp.float32)
        r = batch_mod.solve_batch_avi_pallas_jit(
            jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
            jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(se), st,
            ms=0, interpret=True)
        flags = np.asarray(r.exitflag)
        x = np.asarray(r.x)
        if np.mean(flags == 1) < 0.9:
            issues.append((seed, 'avi-tier', n, m, 'optimal_rate',
                           float(np.mean(flags == 1))))
        err = np.abs(x - xs).max(axis=1)
        # x sensitivity of a VI scales with 1/mu, mu = min eig of
        # sym(H) (the monotonicity modulus): a weakly-monotone lane
        # amplifies the f32 residual into x by ~1/mu (triaged round 5:
        # residual 1e-5 at mu 8.5e-4 -> x off 1.3e-2, exactly 1/mu) —
        # gate per-lane accordingly, like the QP gates scale with kappa
        mus = np.array([np.linalg.eigvalsh(
            0.5 * (Hs[b] + Hs[b].T).astype(np.float64)).min()
            for b in range(B)])
        for b in np.flatnonzero(flags == 1):
            tol_b = max(5e-4, 3e-5 / max(mus[b], 1e-8))
            if err[b] > tol_b:
                issues.append((seed, 'avi-tier', n, m, int(b), 'x',
                               float(err[b]), float(mus[b])))
        for b in range(0, B, 23):
            one = daqp_tpu.avi(Hs[b].astype(np.float64),
                               fs[b].astype(np.float64),
                               As[b].astype(np.float64),
                               bus[b].astype(np.float64),
                               bls[b].astype(np.float64), ms=0)
            if int(one.exitflag) != 1:
                issues.append((seed, 'avi-single', n, m, b, 'flag',
                               int(one.exitflag)))
            elif np.abs(np.asarray(one.x) - xs[b]).max() > 1e-5:
                issues.append((seed, 'avi-single', n, m, b, 'x',
                               float(np.abs(np.asarray(one.x)
                                            - xs[b]).max())))

    def check_hiqp(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 12))
        nl = int(rng.integers(2, 4))
        per = int(rng.integers(3, n))
        bp = tuple(per * i for i in range(nl + 1))
        m = bp[-1]
        B = 32
        As = rng.standard_normal((B, m, n)).astype(np.float32)
        x0 = rng.standard_normal((B, n)).astype(np.float32)
        b0 = np.einsum('bmn,bn->bm', As, x0)
        bus = (b0 + 0.3 * rng.random((B, m))).astype(np.float32)
        bls = (b0 - 0.3 - 0.6 * rng.random((B, m))).astype(np.float32)
        # make some first-level rows conflict
        for b in range(0, B, 5):
            As[b, 1] = As[b, 0]
            bus[b, 0] = b0[b, 0] - 1.0
            bls[b, 0] = b0[b, 0] - 2.0
            bls[b, 1] = b0[b, 1] + 1.0
            bus[b, 1] = b0[b, 1] + 2.0
        se = np.zeros((B, m), np.int32)
        fs = np.zeros((B, n), np.float32)
        st = _as_settings({"iter_limit": 3000}, jnp.float32)
        r = batch_mod.solve_batch_hiqp_pallas_jit(
            None, jnp.asarray(fs), jnp.asarray(As), jnp.asarray(bus),
            jnp.asarray(bls), jnp.asarray(se), st, ms=0,
            break_points=bp, interpret=True)
        flags = np.asarray(r.exitflag)
        x = np.asarray(r.x)
        match = {"rho_soft": 3e-2, "primal_tol": float(st.primal_tol),
                 "iter_limit": 3000}
        nbad = 0
        for b in range(0, B, 7):
            one = daqp_tpu.quadprog(None, fs[b], As[b], bus[b], bls[b],
                                    se[b], ms=0, break_points=bp,
                                    settings=match)
            if int(flags[b]) <= 0 or int(one.exitflag) <= 0:
                if int(flags[b]) != int(one.exitflag):
                    issues.append((seed, 'hiqp-tier', n, bp, b, 'flag',
                                   int(flags[b]), int(one.exitflag)))
                continue
            if np.abs(x[b] - np.asarray(one.x)).max() > 2e-3:
                nbad += 1
        if nbad > 1:     # generic data: allow one f32 tie-break lane
            issues.append((seed, 'hiqp-tier', n, bp, 'xdiff_lanes',
                           nbad))

    while time.time() - t0 < budget:
        seed = 100000 + round_i
        try:
            check_qp(seed)
            if round_i % 3 == 0:
                check_miqp(seed + 50000)
            if round_i % 3 == 1:
                check_sw(seed + 70000)
            if round_i % 6 == 2:
                check_lp(seed + 90000)
            if round_i % 6 == 4:
                check_avi(seed + 110000)
            if round_i % 6 == 5:
                check_hiqp(seed + 130000)
            if round_i % 6 == 3:
                check_prox_fused(seed + 150000)
                check_avi_fused(seed + 170000)
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            issues.append((seed, 'exception', repr(e)[:300]))
        round_i += 1
        if round_i % 4 == 0:
            jax.clear_caches()   # XLA:CPU segfaults once hundreds of
                                 # live executables accumulate
        print(f"round {round_i} done, {len(issues)} issues, "
              f"{time.time()-t0:.0f}s", flush=True)
        for it in issues[-3:]:
            print("   ", it, flush=True)

    print(f"\nfuzz complete: {round_i} rounds, {len(issues)} issues")
    for it in issues:
        print(" -", it)
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
