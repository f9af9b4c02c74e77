"""Mixed-integer QP via branch-and-bound over binary constraints.

Reference: ``src/bnb.c``.  Binary constraints (sense BINARY) must hold with
equality at either their lower or upper bound; the tree fixes them one at a
time, solving warm-started dual relaxations.  Reproduced semantics:

  * DFS over a fixed-capacity node stack, two children per spawn, nearest
    endpoint explored first (daqp_get_branch_id, bnb.c:130-156: branch on
    the first binary whose relaxation value is interior to its bounds,
    by midpoint distance)
  * dominance cut via the dual objective bound: a relaxation whose dual
    objective exceeds fval_bound is pruned as infeasible (bnb.c:62 +
    daqp.c:20-23); rel/abs suboptimality folds into the bound (bnb.c:29-31)
  * warm starts: each spawned node snapshots the free working set into a
    flat ``tree_WS`` buffer (ids with a side flag, bnb.c:211-222) and
    replays it on entry; the first child processed directly after its
    parent reuses the live workspace and only adds the new fixed binary
    (the sibling-on-stack fast path, bnb.c:99-112)
  * cold restart of a node on inner-solver cycling (bnb.c:118-125)

Where the reference truncates its LDL factorization to a clean prefix
(``n_clean``), this implementation *downdates* the inverse Gram by removing
trailing working-set entries one rank-one update at a time
(``_truncate_ws``) — same O(K^2) per removed entry, no prefix requirement.

The whole solver is a single-instance pure function: ``vmap`` it over a
batch of MIQPs for throughput; the distributed incumbent-bound exchange
(psum-min of ``fval_bound``) lives in ``parallel.sharding``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ldp as ldp_mod
from . import transform
from . import core as solve_mod
from .types import (ACTIVE, BINARY, IMMUTABLE, LOWER, Settings, DAQP_INF,
                    EXIT_CYCLE, EXIT_INFEASIBLE, EXIT_OPTIMAL, EXIT_RUNNING)


class BnBCarry(NamedTuple):
    state: ldp_mod.LDPState
    # node stack (capacity 2*nb+2): bin id, side (1=lower), depth,
    # warm-start slice [ws_start, ws_end) into tree_WS
    node_id: jnp.ndarray      # (cap,) int32
    node_lower: jnp.ndarray   # (cap,) int32
    node_depth: jnp.ndarray   # (cap,) int32
    node_ws0: jnp.ndarray     # (cap,) int32
    node_ws1: jnp.ndarray     # (cap,) int32
    n_nodes: jnp.ndarray      # () int32
    tree_ws: jnp.ndarray      # (wcap,) int32: id*2 + is_lower
    n_ws: jnp.ndarray         # () int32
    fixed_id: jnp.ndarray     # (nb,) int32 current fixed path ids
    fixed_lower: jnp.ndarray  # (nb,) int32
    last_depth: jnp.ndarray   # () int32 depth of last processed node
    neq: jnp.ndarray          # () int32 equality prefix size
    bound: jnp.ndarray        # () current fval_bound (already eps-folded)
    incumbent_u: jnp.ndarray  # (n,)
    incumbent_found: jnp.ndarray  # () bool
    nodecount: jnp.ndarray    # () int32
    itercount: jnp.ndarray    # () int32
    status: jnp.ndarray       # () int32


def _truncate_ws(state, keep, st):
    """Remove trailing working-set entries down to ``keep``; clears
    IMMUTABLE on fixed binaries so they become branchable again
    (``daqp_node_cleanup_workspace``, bnb.c:175-187)."""
    def cond(s):
        return s.n_active > keep

    def body(s):
        pos = s.n_active - 1
        idx = s.WS[pos]
        is_bin = (s.sense[idx] & BINARY) > 0
        s = ldp_mod.remove_constraint(s, pos, st)
        bits = jnp.where(is_bin, s.sense[idx] & ~IMMUTABLE, s.sense[idx])
        return s._replace(sense=s.sense.at[idx].set(bits))

    return lax.while_loop(cond, body, state)


def _add_fixed_binary(state, bid, is_lower, st):
    """Fix a binary at one bound as an immutable equality
    (``daqp_add_upper_lower`` + IMMUTABLE, bnb.c:106-107, 224-236)."""
    bits = jnp.where(is_lower > 0, state.sense[bid] | LOWER,
                     state.sense[bid] & ~LOWER)
    state = state._replace(sense=state.sense.at[bid].set(bits))
    state = ldp_mod.add_constraint(
        state, bid, jnp.where(is_lower > 0, -1.0, 1.0), st)
    return state._replace(
        sense=state.sense.at[bid].set(state.sense[bid] | IMMUTABLE))


def _rebuild_node(c: BnBCarry, depth, st) -> BnBCarry:
    """Cold rebuild: truncate to the equality prefix and re-add the fixed
    path fixed_id[0..depth] (``daqp_setup_cold_bnb``, bnb.c:238-246,
    without warm-start replay)."""
    s = _truncate_ws(c.state, c.neq, st)
    nb = c.fixed_id.shape[0]

    def body(i, s):
        return lax.cond(
            (i <= depth) & ~s.sing,
            lambda s: _add_fixed_binary(s, c.fixed_id[i], c.fixed_lower[i],
                                        st),
            lambda s: s, s)

    s = lax.fori_loop(0, nb, body, s)
    return c._replace(state=s)


def _replay_warmstart(c: BnBCarry, ws0, ws1, st) -> BnBCarry:
    """Re-activate the saved free working set of a node; abort on a
    singular basis (``daqp_warmstart_node``, bnb.c:190-209)."""
    s = c.state

    def body(i, carry):
        s, aborted = carry

        def add(args):
            s, _ = args
            code = c.tree_ws[i]
            bid = code // 2
            is_lower = code % 2
            bits = jnp.where(is_lower > 0, s.sense[bid] | LOWER,
                             s.sense[bid] & ~LOWER)
            s = s._replace(sense=s.sense.at[bid].set(bits))
            s = ldp_mod.add_constraint(
                s, bid, jnp.where(is_lower > 0, -1.0, 1.0), st)

            def undo(s):
                pos = s.n_active - 1
                idx = s.WS[pos]
                return s._replace(
                    n_active=pos,
                    sense=s.sense.at[idx].set(s.sense[idx] & ~ACTIVE),
                    sing=jnp.zeros((), bool))

            aborted = s.sing
            s = lax.cond(s.sing, undo, lambda s: s, s)
            return s, aborted

        in_range = (i >= ws0) & (i < ws1) & ~aborted
        return lax.cond(in_range, add, lambda x: x, (s, aborted))

    wcap = c.tree_ws.shape[0]
    s, _ = lax.fori_loop(0, wcap, body, (s, jnp.zeros((), bool)))
    return c._replace(state=s)


def _find_branch(state, bin_ids, st):
    """First fractional binary by midpoint distance; nearest endpoint first
    (``daqp_get_branch_id`` + ``daqp_binary_diff``, bnb.c:6-21,130-156).
    Returns (found, id, explore_lower_first)."""
    Mb = state.M[bin_ids]                       # (nb, n)
    mu = Mb @ state.u
    du = state.dupper[bin_ids]
    dl = state.dlower[bin_ids]
    diff = 0.5 * (du + dl) - mu
    dist = 0.5 * (du - dl) - jnp.abs(diff)
    tol = st.primal_tol * state.scaling[bin_ids]
    fixed = (state.sense[bin_ids] & ACTIVE) > 0
    frac = (~fixed) & (dist > tol)
    found = jnp.any(frac)
    pos = jnp.argmax(frac)                      # first True
    bid = bin_ids[pos]
    lower_first = diff[pos] >= 0                # nearest endpoint first
    return found, bid.astype(jnp.int32), lower_first


def bnb_init(ldpd: transform.LDPData, bin_ids, st: Settings, K: int
             ) -> BnBCarry:
    """Initial BnB carry (root node on the stack, equalities activated)."""
    nb = int(bin_ids.shape[0])
    cap = 2 * nb + 2
    wcap = max(nb, 1) * K
    n = ldpd.M.shape[1]
    dtype = ldpd.M.dtype

    state = ldp_mod.init_state(ldpd.M, ldpd.dupper, ldpd.dlower, ldpd.sense,
                               ldpd.scaling, K=K)
    state = state._replace(in_bnb=jnp.ones((), bool))
    act_flag, state = ldp_mod.activate_constraints(state, st)

    eps_r = 1.0 / (1.0 + st.rel_subopt)
    bound0 = (st.fval_bound - st.abs_subopt) * eps_r

    zi = jnp.zeros((cap,), jnp.int32)
    return BnBCarry(
        state=state,
        node_id=zi, node_lower=zi,
        node_depth=zi.at[0].set(-1), node_ws0=zi, node_ws1=zi,
        n_nodes=jnp.ones((), jnp.int32),
        tree_ws=jnp.zeros((wcap,), jnp.int32),
        n_ws=jnp.zeros((), jnp.int32),
        fixed_id=jnp.zeros((max(nb, 1),), jnp.int32),
        fixed_lower=jnp.zeros((max(nb, 1),), jnp.int32),
        last_depth=jnp.full((), -1, jnp.int32),
        neq=state.n_active,
        bound=jnp.asarray(bound0, dtype),
        incumbent_u=jnp.zeros((n,), dtype),
        incumbent_found=jnp.zeros((), bool),
        nodecount=jnp.zeros((), jnp.int32),
        itercount=jnp.zeros((), jnp.int32),
        status=jnp.where(act_flag < 0, act_flag,
                         EXIT_RUNNING).astype(jnp.int32),
    )


def bnb_run(c0: BnBCarry, bin_ids, st: Settings, node_budget=None,
            deadline=None) -> BnBCarry:
    """Process nodes from the carry's stack until it empties, the solver
    errors, or ``node_budget`` nodes have been processed (the resumable
    form behind periodic incumbent-bound exchange across devices)."""
    dtype = c0.incumbent_u.dtype
    wcap = c0.tree_ws.shape[0]
    eps_r = 1.0 / (1.0 + st.rel_subopt)
    target = None if node_budget is None \
        else c0.nodecount + jnp.asarray(node_budget, jnp.int32)

    def cond(c: BnBCarry):
        ok = (c.n_nodes > 0) & (c.status == EXIT_RUNNING) \
            & (c.itercount < st.iter_limit)
        if target is not None:
            ok = ok & (c.nodecount < target)
        return ok

    def body(c: BnBCarry):
        p = c.n_nodes - 1
        depth = c.node_depth[p]
        bid = c.node_id[p]
        blo = c.node_lower[p]
        ws0 = c.node_ws0[p]
        ws1 = c.node_ws1[p]
        c = c._replace(n_nodes=p, nodecount=c.nodecount + 1)

        def setup_nonroot(c):
            c = c._replace(
                fixed_id=c.fixed_id.at[depth].set(bid),
                fixed_lower=c.fixed_lower.at[depth].set(blo))
            sibling_on_stack = (c.n_nodes > 0) & (
                c.node_depth[c.n_nodes - 1] == depth)

            def fast(c):
                # Workspace still holds the parent state: add our binary.
                s = _add_fixed_binary(c.state, bid, blo, st)
                c = c._replace(state=s)
                # Singular: fall back to a cold rebuild (bnb.c:108-110)
                return lax.cond(c.state.sing,
                                lambda c: _rebuild_node(c, depth, st),
                                lambda c: c, c)

            def slow(c):
                c = _rebuild_node(c, depth, st)
                c = _replay_warmstart(c, ws0, ws1, st)
                # nWS rewinds to this node's slice start (bnb.c:208)
                return c._replace(n_ws=ws0)

            return lax.cond(sibling_on_stack, fast, slow, c)

        c = lax.cond(depth >= 0, setup_nonroot, lambda c: c, c)
        c = c._replace(last_depth=depth)

        # Solve the relaxation under the current dominance bound
        st_node = st._replace(fval_bound=c.bound)
        s = c.state._replace(
            status=jnp.asarray(EXIT_RUNNING, jnp.int32),
            tried_repair=jnp.zeros((), jnp.int32),
            cycle_counter=jnp.zeros((), jnp.int32),
            best_fval=jnp.asarray(-1.0, dtype))
        s = ldp_mod.ldp_solve(s, st_node, deadline=deadline)
        c = c._replace(state=s, itercount=c.itercount + s.iterations)

        def retry_cold(c):
            # Cycling: cold restart the node once (bnb.c:118-125)
            c = _rebuild_node(c, depth, st)
            s = c.state._replace(
                status=jnp.asarray(EXIT_RUNNING, jnp.int32),
                tried_repair=jnp.zeros((), jnp.int32),
                cycle_counter=jnp.zeros((), jnp.int32),
                best_fval=jnp.asarray(-1.0, dtype))
            s = ldp_mod.ldp_solve(s, st_node, deadline=deadline)
            return c._replace(state=s, itercount=c.itercount + s.iterations)

        c = lax.cond(c.state.status == EXIT_CYCLE, retry_cold,
                     lambda c: c, c)
        flag = c.state.status

        def pruned(c):  # dominance / infeasibility cut
            return c

        def errored(c):
            return c._replace(status=flag)

        def explore(c):
            found, branch_bid, lower_first = _find_branch(
                c.state, bin_ids, st)

            def integer_feasible(c):
                new_bound = (0.5 * c.state.fval - st.abs_subopt) * eps_r
                return c._replace(
                    bound=new_bound.astype(dtype),
                    incumbent_u=c.state.u,
                    incumbent_found=jnp.ones((), bool))

            def spawn(c):
                # Snapshot the free working set (bnb.c:211-222)
                s = c.state
                Kc = s.E.shape[0]
                pos_mask = (jnp.arange(Kc) >= c.neq) \
                    & (jnp.arange(Kc) < s.n_active)
                ws_sense = s.sense[s.WS]
                is_fixed_bin = (ws_sense & (IMMUTABLE | BINARY)) \
                    == (IMMUTABLE | BINARY)
                save = pos_mask & ~is_fixed_bin
                codes = s.WS * 2 + ((ws_sense & LOWER) > 0)
                # Compact the saved codes to the front via sort
                order = jnp.argsort(~save)          # saved entries first
                codes_sorted = codes[order]
                nsave = jnp.sum(save).astype(jnp.int32)
                sl = jnp.arange(wcap)
                write = (sl >= c.n_ws) & (sl < c.n_ws + nsave)
                src = jnp.clip(sl - c.n_ws, 0, Kc - 1)
                tree_ws = jnp.where(write, codes_sorted[src], c.tree_ws)
                ws0n = c.n_ws
                ws1n = c.n_ws + nsave
                # child pushed first = other side; top = nearest side
                near_lo = lower_first.astype(jnp.int32)
                far_lo = 1 - near_lo
                q = c.n_nodes
                c = c._replace(
                    tree_ws=tree_ws, n_ws=ws1n,
                    node_id=c.node_id.at[q].set(branch_bid)
                                     .at[q + 1].set(branch_bid),
                    node_lower=c.node_lower.at[q].set(far_lo)
                                          .at[q + 1].set(near_lo),
                    node_depth=c.node_depth.at[q].set(depth + 1)
                                          .at[q + 1].set(depth + 1),
                    node_ws0=c.node_ws0.at[q].set(ws0n)
                                      .at[q + 1].set(ws0n),
                    node_ws1=c.node_ws1.at[q].set(ws1n)
                                      .at[q + 1].set(ws1n),
                    n_nodes=q + 2)
                return c

            return lax.cond(found, spawn, integer_feasible, c)

        c = lax.cond(
            flag == EXIT_INFEASIBLE, pruned,
            lambda c: lax.cond(flag < 0, errored, explore, c), c)

        if deadline is not None:
            # Tree-level wall-clock check every 32 nodes (bnb.c:51-59):
            # node relaxations can each finish before the inner solver's
            # periodic check fires.
            from .utils.timers import now_callback
            from .types import EXIT_TIMELIMIT

            def check_time(c):
                t = now_callback()
                return c._replace(status=jnp.where(
                    (t > deadline) & (c.status == EXIT_RUNNING),
                    EXIT_TIMELIMIT, c.status).astype(jnp.int32))

            c = lax.cond(c.nodecount % 32 == 0, check_time, lambda c: c, c)
        return c

    return lax.while_loop(cond, body, c0)


def bnb_finalize(c: BnBCarry, st: Settings) -> BnBCarry:
    """Recover fval from the folded bound, select the incumbent
    (bnb.c:77-89)."""
    eps_r = 1.0 / (1.0 + st.rel_subopt)
    fval_internal = 2.0 * c.bound / eps_r + 2.0 * st.abs_subopt
    final_status = jnp.where(
        c.incumbent_found,
        jnp.where(c.status < EXIT_INFEASIBLE, c.status, EXIT_OPTIMAL),
        jnp.where(c.status == EXIT_RUNNING, EXIT_INFEASIBLE, c.status))
    final_state = c.state._replace(
        u=jnp.where(c.incumbent_found, c.incumbent_u, c.state.u),
        fval=jnp.where(c.incumbent_found, fval_internal, c.state.fval))
    return c._replace(state=final_state,
                      status=final_status.astype(jnp.int32))


def bnb_solve(ldpd: transform.LDPData, bin_ids, st: Settings, K: int,
              deadline=None):
    """Run branch-and-bound on a built LDP. ``bin_ids``: (nb,) int32 indices
    of binary constraints (static count nb)."""
    c = bnb_init(ldpd, bin_ids, st, K)
    c = bnb_run(c, bin_ids, st, deadline=deadline)
    return bnb_finalize(c, st)


class BnBOut(NamedTuple):
    x: jnp.ndarray
    lam: jnp.ndarray
    fval: jnp.ndarray
    exitflag: jnp.ndarray
    iterations: jnp.ndarray
    soft_slack: jnp.ndarray
    nodes: jnp.ndarray


def bnb_core(H, f, A, bupper, blower, sense, ms: int, st: Settings,
             bin_ids: tuple = (), deadline=None, K=None):
    """MIQP entry: build LDP, run BnB, extract (api.c dispatch work->bnb).

    ``bin_ids`` is the *static* tuple of binary-constraint indices (the
    tree structure is shape-determining and must be known at trace time).
    """
    n = A.shape[1] if A.size else H.shape[0]
    if K is None:
        K = n + 1
    ldpd = transform.build_ldp(H, f, A, bupper, blower, sense, ms, st)
    c = bnb_solve(ldpd, jnp.asarray(bin_ids, jnp.int32), st, K,
                  deadline=deadline)
    x = transform.ldp_to_qp_solution(ldpd, c.state.u)
    lam = solve_mod.extract_duals(c.state)
    fval = 0.5 * (c.state.fval - ldpd.v @ ldpd.v)
    return BnBOut(x=x, lam=lam, fval=fval, exitflag=c.status,
                  iterations=c.itercount, soft_slack=c.state.soft_slack,
                  nodes=c.nodecount)
