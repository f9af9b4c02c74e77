"""MPC-style repeated solves: solver state carried through ``lax.scan``.

The reference's defining embedded use case (docs/docs/c.md:60-73,
SURVEY.md §3.5) is the warm-started re-solve loop: every control period
only f and the bounds change (mask UPDATE_v | UPDATE_d), the
factorization and working set persist, and each solve typically changes
the active set by 0-2 constraints.

``Model.update``/``Model.solve`` expose that loop from the host; this
module runs the WHOLE horizon inside one jitted ``lax.scan`` — zero
host round-trips, one compilation, the LDP workspace (working set +
inverse Gram) carried warm from step to step.  ``vmap`` the scan for a
batch of scenario rollouts.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from .types import Settings, EXIT_RUNNING


class MPCStep(NamedTuple):
    x: jnp.ndarray           # (T, n)
    fval: jnp.ndarray        # (T,)
    exitflag: jnp.ndarray    # (T,) int32
    iterations: jnp.ndarray  # (T,) int32


@functools.partial(jax.jit,
                   static_argnames=("st", "ms", "steps", "interpret"))
def solve_mpc_scan_pallas(H, A, f_seq, bupper_seq, blower_seq,
                          st: Settings, ms: int = 0,
                          steps: int = 32,
                          interpret: bool = False) -> MPCStep:
    """Scenario-BATCHED warm MPC horizon on the Pallas kernel tier.

    ``f_seq``: (S, T, n); ``bupper_seq``/``blower_seq``: (S, T, m) — S
    scenario rollouts sharing (H, A), each a horizon of T steps where
    only f and the bounds change (the UPDATE_v | UPDATE_d contract,
    docs/docs/c.md:60-73).

    TPU-first structure: ONE ``lax.scan`` over time whose carry is the
    whole S-lane VMEM-kernel state — the inverse Gram and active set ride
    warm from step to step, each step updates only d and runs a few
    kernel iterations.  This inverts the naive vmap(scan(single-lane))
    nesting, under which every per-round repair/refresh (a batched
    Cholesky) executes for ALL scenarios at EVERY round because vmap
    turns lane-level branches into selects; at batch level the repair is
    a real ``lax.cond`` that usually never fires.  Measured on v5e
    (S=512, T=20, n=50, m=100): 1.4k warm QP steps/s on the
    vmap(scan(flat)) nesting vs 10k+ here.

    S must be a multiple of 128 (the kernel lane width).  Returns
    per-(scenario, step) results with leading dims (S, T).
    """
    from .ops import pallas_slot as ps
    from .types import IMMUTABLE

    S, T, n = f_seq.shape
    m = bupper_seq.shape[-1]
    assert S % ps.LANES == 0, (S, ps.LANES)
    st0 = st
    with jax.default_matmul_precision('highest'):
        # shared transform: factorization + M once (UPDATE_Rinv | M)
        ldpd0 = transform.build_ldp(H, f_seq[0, 0], A, bupper_seq[0, 0],
                                    blower_seq[0, 0], None, ms, st0)
        Rinv = ldpd0.Rinv
        M = ldpd0.M                              # (m, n) normalized
        scaling = ldpd0.scaling
        # per-(scenario, step) v and d: batched GEMMs on the MXU
        v_st = jnp.einsum('ij,stj->sti', Rinv.T, f_seq,
                          precision=jax.lax.Precision.HIGHEST)
        Mv = jnp.einsum('mj,stj->stm', M, v_st,
                        precision=jax.lax.Precision.HIGHEST)
        du_st = bupper_seq * scaling + Mv        # (S, T, m)
        dl_st = blower_seq * scaling + Mv

        immut = jnp.broadcast_to(
            ((ldpd0.sense & IMMUTABLE) > 0).astype(jnp.float32), (S, m))
        s0 = ps.slot_init(
            jnp.broadcast_to(M, (S, m, n)), du_st[:, 0], dl_st[:, 0],
            jnp.broadcast_to(scaling, (S, m)), immut, n_true=n)
        mp = s0.dupper.shape[0]                  # padded m

        def pad_T(x):                            # (S, m) -> (mp, S) padded
            return jnp.moveaxis(
                jnp.pad(x, ((0, 0), (0, mp - m))), 0, -1)

        def step(s, inp):
            du_t, dl_t = inp                     # (S, m) each
            big = jnp.asarray(1e30, jnp.float32)
            row_real = jnp.arange(mp)[:, None] < m
            s = ps.slot_refresh_bounds(
                s,
                jnp.where(row_real, pad_T(du_t.astype(jnp.float32)), big),
                jnp.where(row_real, pad_T(dl_t.astype(jnp.float32)),
                          -big))
            s = s._replace(
                status=jnp.full_like(s.status, EXIT_RUNNING),
                iterations=jnp.zeros_like(s.iterations),
                cycle=jnp.zeros_like(s.cycle),
                repaired=jnp.zeros_like(s.repaired),
                best_fval=jnp.zeros_like(s.best_fval) - 1.0,
                pend=jnp.zeros_like(s.pend))
            s = ps.slot_solve(s, st0, n_true=n, steps=steps,
                              interpret=interpret)
            u_b = jnp.moveaxis(s.u, -1, 0)[:, :n]          # (S, n)
            fval_ldp = s.fval[0]                           # (S,)
            out = (u_b, fval_ldp, s.status[0], s.iterations[0])
            return s, out

        du_seq = jnp.moveaxis(du_st, 1, 0)       # (T, S, m)
        dl_seq = jnp.moveaxis(dl_st, 1, 0)
        _, (us, fvals, flags, iters) = lax.scan(step, s0,
                                                (du_seq, dl_seq))
        # x = Rinv (u - v): per (t, s)
        xs = jnp.einsum('ij,tsj->tsi', Rinv,
                        us - jnp.moveaxis(v_st, 1, 0),
                        precision=jax.lax.Precision.HIGHEST)
        fq = 0.5 * (fvals - jnp.sum(jnp.moveaxis(v_st, 1, 0) ** 2, -1))
        return MPCStep(
            x=jnp.moveaxis(xs, 0, 1),
            fval=jnp.moveaxis(fq, 0, 1),
            exitflag=jnp.moveaxis(flags, 0, 1).astype(jnp.int32),
            iterations=jnp.moveaxis(iters, 0, 1).astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("st", "ms", "seg", "steps",
                                    "interpret"))
def solve_mpc_scan_pallas_fused(H, A, f_seq, bupper_seq, blower_seq,
                                st: Settings, ms: int = 0,
                                seg: int = 10, steps: int = 192,
                                interpret: bool = False) -> MPCStep:
    """Scenario-batched warm MPC horizon with the T loop INSIDE the
    kernel (VERDICT r4 #3): ``seg`` consecutive steps run per kernel
    launch with E/W/M staged into VMEM once, so a ~2-3-iteration warm
    step stops paying the full ~19 MB/tile staging plus the per-step
    XLA round overhead of ``solve_mpc_scan_pallas`` (measured there:
    ~9 ms per 512-scenario scan step, ~98% overhead).

    Correctness contract: any lane that ends an in-kernel step in a
    state the between-round repair machinery would normally fix
    (RUNNING at the step cap / CYCLE / REFACTOR) raises a per-segment
    ``failed`` flag and the WHOLE segment is redone through the
    per-step ``slot_solve`` path under a ``lax.cond`` — the fallback
    costs nothing when no lane fails.  Between segments E gets one
    Newton refresh against the exact slot Gram (drift hygiene for the
    f32 rank-one updates accumulating across the horizon).

    Same signature/semantics as ``solve_mpc_scan_pallas`` plus ``seg``
    (horizon steps per kernel launch; T is padded up to a multiple by
    repeating the final step, outputs sliced back to T).
    """
    from .ops import pallas_slot as ps
    from .types import IMMUTABLE

    S, T, n = f_seq.shape
    m = bupper_seq.shape[-1]
    assert S % ps.LANES == 0, (S, ps.LANES)
    st0 = st
    with jax.default_matmul_precision('highest'):
        ldpd0 = transform.build_ldp(H, f_seq[0, 0], A, bupper_seq[0, 0],
                                    blower_seq[0, 0], None, ms, st0)
        Rinv = ldpd0.Rinv
        M = ldpd0.M
        scaling = ldpd0.scaling
        v_st = jnp.einsum('ij,stj->sti', Rinv.T, f_seq,
                          precision=jax.lax.Precision.HIGHEST)
        Mv = jnp.einsum('mj,stj->stm', M, v_st,
                        precision=jax.lax.Precision.HIGHEST)
        du_st = bupper_seq * scaling + Mv        # (S, T, m)
        dl_st = blower_seq * scaling + Mv

        immut = jnp.broadcast_to(
            ((ldpd0.sense & IMMUTABLE) > 0).astype(jnp.float32), (S, m))
        s0 = ps.slot_init(
            jnp.broadcast_to(M, (S, m, n)), du_st[:, 0], dl_st[:, 0],
            jnp.broadcast_to(scaling, (S, m)), immut, n_true=n)
        mp = s0.dupper.shape[0]                  # padded m
        np_ = s0.u.shape[0]                      # padded n

        big = jnp.asarray(1e30, jnp.float32)
        row_real = jnp.arange(mp)[None, :, None] < m
        # (T, mp, S) lanes-last padded step bounds
        duq_all = jnp.where(
            row_real,
            jnp.moveaxis(jnp.pad(du_st.astype(jnp.float32),
                                 ((0, 0), (0, 0), (0, mp - m))), 0, -1),
            big)
        dlq_all = jnp.where(
            row_real,
            jnp.moveaxis(jnp.pad(dl_st.astype(jnp.float32),
                                 ((0, 0), (0, 0), (0, mp - m))), 0, -1),
            -big)
        Tp = ((T + seg - 1) // seg) * seg
        if Tp != T:
            rep = jnp.broadcast_to(duq_all[-1:], (Tp - T, mp, S))
            repl = jnp.broadcast_to(dlq_all[-1:], (Tp - T, mp, S))
            duq_all = jnp.concatenate([duq_all, rep], axis=0)
            dlq_all = jnp.concatenate([dlq_all, repl], axis=0)
        NSEG = Tp // seg
        duq_all = duq_all.reshape(NSEG, seg, mp, S)
        dlq_all = dlq_all.reshape(NSEG, seg, mp, S)

        def slow_segment(s_in, duq, dlq):
            # per-step repair path (identical to solve_mpc_scan_pallas)
            def one(sc, dd):
                du_t, dl_t = dd                  # (mp, S)
                sc = ps.slot_refresh_bounds(sc, du_t, dl_t)
                sc = sc._replace(
                    status=jnp.full_like(sc.status, EXIT_RUNNING),
                    iterations=jnp.zeros_like(sc.iterations),
                    cycle=jnp.zeros_like(sc.cycle),
                    repaired=jnp.zeros_like(sc.repaired),
                    best_fval=jnp.zeros_like(sc.best_fval) - 1.0,
                    pend=jnp.zeros_like(sc.pend))
                sc = ps.slot_solve(sc, st0, n_true=n, steps=steps,
                                   interpret=interpret)
                return sc, (sc.u, sc.fval[0], sc.iterations[0],
                            sc.status[0])
            s2, (useq, fvseq, itseq, stseq) = lax.scan(one, s_in,
                                                       (duq, dlq))
            return s2, useq, fvseq, itseq, stseq

        def seg_step(s, inp):
            duq, dlq = inp                       # (seg, mp, S)
            s_in = s
            s_f, useq, fvseq, itseq, stseq, failed = ps.run_mpc_segment(
                s_in, duq, dlq, st0, n, steps=steps,
                interpret=interpret)

            def slow(_):
                return slow_segment(s_in, duq, dlq)

            def fast(_):
                return s_f, useq, fvseq, itseq, stseq.astype(jnp.int32)

            s2, useq2, fvseq2, itseq2, stseq2 = lax.cond(
                jnp.any(failed > 0), slow, fast, 0)
            # inter-segment drift hygiene (the per-step path's polish
            # Newton-refreshes every round; here once per segment)
            s2 = ps.newton_refresh(s2)
            return s2, (useq2, fvseq2, itseq2, stseq2)

        # Segment 0 always goes through the per-step repair path: its
        # first step is the COLD solve (~100 iterations, pivot-guard
        # parks and repair rounds are ROUTINE there, not exceptional),
        # so the in-kernel fast path would flag failure and fall back
        # almost every time — paying both paths.  Warm segments (1..)
        # rarely fail.
        s1, us0, fv0, it0, stq0 = slow_segment(s0, duq_all[0],
                                               dlq_all[0])
        s1 = ps.newton_refresh(s1)
        if NSEG > 1:
            _, (us1, fv1, it1, stq1) = lax.scan(seg_step, s1,
                                                (duq_all[1:],
                                                 dlq_all[1:]))
            us = jnp.concatenate([us0[None], us1], axis=0)
            fvals = jnp.concatenate([fv0[None], fv1], axis=0)
            iters = jnp.concatenate([it0[None], it1], axis=0)
            flags = jnp.concatenate([stq0.astype(jnp.int32)[None],
                                     stq1], axis=0)
        else:
            us, fvals = us0[None], fv0[None]
            iters, flags = it0[None], stq0.astype(jnp.int32)[None]
        # (NSEG, seg, ...) -> (Tp, ...) -> slice back to T
        us = us.reshape(Tp, np_, S)[:T, :n]      # (T, n, S)
        fvals = fvals.reshape(Tp, S)[:T]
        iters = iters.reshape(Tp, S)[:T]
        flags = flags.reshape(Tp, S)[:T]
        v_tns = jnp.moveaxis(v_st, 0, -1)        # (T, n, S)
        xs = jnp.einsum('ij,tjs->tsi', Rinv, us - v_tns,
                        precision=jax.lax.Precision.HIGHEST)
        fq = 0.5 * (fvals - jnp.sum(v_tns * v_tns, axis=1))  # (T, S)
        return MPCStep(
            x=jnp.moveaxis(xs, 0, 1),                    # (S, T, n)
            fval=jnp.moveaxis(fq, 0, 1),
            exitflag=jnp.moveaxis(flags, 0, 1).astype(jnp.int32),
            iterations=jnp.moveaxis(iters, 0, 1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("ms",))
def solve_mpc_scan(H, A, f_seq, bupper_seq, blower_seq, st: Settings,
                   ms: int = 0) -> MPCStep:
    """Solve a whole horizon of QPs sharing (H, A): per step t, recompute
    only v and d (``daqp_update_ldp`` with UPDATE_v | UPDATE_d,
    utils.c:14-135) and warm re-solve from the previous step's working
    set.

    f_seq: (T, n); bupper_seq/blower_seq: (T, m).  Returns per-step
    primal solutions, objective values, exit flags and iteration counts
    (the iteration counts are the interesting output: at a slowly varying
    reference they should sit at 1-3).
    """
    n = A.shape[-1] if A.size else H.shape[0]
    st0 = st
    # HIGHEST matmul precision: solver-critical contractions in the scan
    # body must not run at TPU's bf16 default (see CLAUDE.md invariant).
    with jax.default_matmul_precision('highest'):
        from . import ldp_flat
        ldpd0 = transform.build_ldp(H, f_seq[0], A, bupper_seq[0],
                                    blower_seq[0], None, ms, st0)
        # Flat (slot-table) tier, not the naive ldp path: under a
        # scenario-batch vmap the branch-free flat_step is ~10x cheaper
        # per lockstep iteration (measured on v5e: config-3 horizon-20
        # scenario batch went 880 -> 9.1k warm QP steps/s)
        state0 = ldp_flat.flat_init(ldpd0.M, ldpd0.dupper, ldpd0.dlower,
                                    ldpd0.sense, ldpd0.scaling, K=n + 1)

        def step(state, inp):
            f_t, bu_t, bl_t = inp
            ldpd = transform.update_vd(ldpd0, f_t, bu_t, bl_t)
            state = state._replace(
                dupper=ldpd.dupper, dlower=ldpd.dlower,
                status=jnp.asarray(EXIT_RUNNING, jnp.int32),
                iterations=jnp.zeros((), jnp.int32),
                repaired=jnp.zeros((), jnp.int32),
                cycle=jnp.zeros((), jnp.int32),
                best_fval=jnp.asarray(-1.0, state.fval.dtype))
            # One Newton polish of the warm inverse Gram, E <- E(2I - GE)
            # (two (K, K) GEMMs): a 1-3 iteration warm re-solve exits
            # BEFORE flat_solve's scheduled refresh ever runs, so f32
            # factor drift would otherwise compound across the horizon
            # (observed 2% spurious EXIT_CYCLE at step 15+ on v5e).
            G = ldp_flat.flat_gram(state, st0)
            um = state.used
            Iu = jnp.diag(um.astype(state.E.dtype))
            P = jnp.matmul(G, state.E,
                           precision=jax.lax.Precision.HIGHEST)
            E_new = jnp.matmul(state.E, 2 * Iu - P,
                               precision=jax.lax.Precision.HIGHEST)
            # f32 mask algebra, NOT an i1 outer mask + scalar-bool select:
            # that op family silently miscompiles on v5e at vmapped
            # batch >= 1024 (scripts/repro_v5e_bool_scatter.py), and this
            # function is vmapped over scenario batches.
            umf = um.astype(state.E.dtype)
            E_new = E_new * umf[:, None] * umf[None, :]
            okf = (jnp.max(jnp.abs(P - Iu)) < 0.5)   # contraction basin
            okf = okf.astype(state.E.dtype)
            state = state._replace(
                E=okf * E_new + (1 - okf) * state.E)
            state = ldp_flat.flat_solve(state, st0)
            x = transform.ldp_to_qp_solution(ldpd, state.u)
            fval = 0.5 * (state.fval - ldpd.v @ ldpd.v)
            out = (x, fval, state.status,
                   jnp.maximum(state.iterations, 1))
            return state, out

        _, (xs, fvals, flags, iters) = lax.scan(
            step, state0, (f_seq, bupper_seq, blower_seq))
        return MPCStep(x=xs, fval=fvals, exitflag=flags, iterations=iters)
