"""Felsenstein pruning as batched tensor contractions (the hot path).

Math (reference: tree/phylokernelnew.h computePartialLikelihoodSIMD :1290,
computeLikelihoodBranchSIMD :2643, theta buffer :2050/:3196):

  partial[v](c,x,p) = prod_{children u} sum_y P_e(c,x,y) partial[u](c,y,p)
  P_e(c) = U_m exp(Lambda_m r_c t_e) V_m          (m = mixture class of c)
  site_lh(p) = sum_c w_c sum_x pi_c(x) partial[root](c,x,p)  (+ invariant)
  logL = sum_p freq_p log site_lh(p)

Layout is category/state-major, **pattern-last** ([C, S, Ppat]) so the
pattern axis rides the TPU lane dimension; the (S x S) contraction per edge
is a small matmul batched over categories — XLA maps the pattern axis onto
VPU lanes / MXU columns. Site patterns are the data-parallel shard axis.

Numerical scaling: partials are kept in [2^-B, 1] by per-pattern rescaling
with 2^B (B=30 for float32, 256 for float64 — reference analog
SCALING_THRESHOLD, tree/phylotree.h:74); integer scale counts enter the
final log. Invariant-site likelihood is added outside the scaled product
in log space (reference contract: tree/phylokernelnew.h:3295).

All functions are pure and jit-safe with static shapes; topology lives in
index arrays (schedule), so NNI moves never recompile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST
import numpy as np


def scaling_consts(dtype) -> tuple[float, float, float]:
    """(threshold, rescale_factor, log_rescale) for a partials dtype."""
    if jnp.dtype(dtype) == jnp.float64:
        b = 256
    else:
        b = 30
    return 2.0 ** (-b), 2.0 ** b, b * float(np.log(2.0))


# --------------------------------------------------------------- transition
def transition_tensors(blens, pack):
    """P[e,c] = exp(Q_m r_c t_e)  -> [E, C, S, S].

    Reversible models use the cancellation-free orthonormal form
      P = D^{-1/2} (I + W diag(expm1(lambda r t)) W^T) D^{1/2}
    which keeps tiny off-diagonal entries accurate in float32 (the naive
    U e^{Lt} V form loses them to catastrophic cancellation). Nonreversible
    models (pack["Q"] present) use a scaling-and-squaring matrix
    exponential — all matmuls, MXU-friendly (reference analog: the nonrev
    kernel path, tree/phylokernelnonrev.h). Reference:
    ModelMarkov::computeTransMatrix (model/modelmarkov.cpp:504) folded
    per-category as in computePartialInfo (tree/phylokernelnew.h:896).
    """
    cat_mix = pack["cat_mix"]
    if pack.get("Q") is not None:
        Qc = pack["Q"][cat_mix]             # [C, S, S]
        A = Qc[None] * (pack["cat_rate"][None, :, None, None]
                        * blens[:, None, None, None])   # [E, C, S, S]
        return jnp.maximum(expm_ss(A), 0.0)
    lam = pack["eigvals"][cat_mix]          # [C, S]
    expo = lam[None, :, :] * pack["cat_rate"][None, :, None] \
        * blens[:, None, None]              # [E, C, S]
    if pack.get("W") is not None:
        Wc = pack["W"][cat_mix]             # [C, S, S]
        sq = pack["sqrt_freqs"][cat_mix]    # [C, S]
        em1 = jnp.expm1(expo)
        core = jnp.einsum("cxk,eck,cyk->ecxy", Wc, em1, Wc, precision=HIGHEST)
        S = lam.shape[-1]
        eye = jnp.eye(S, dtype=core.dtype)
        P = (eye[None, None] + core) * (sq[None, :, None, :]
                                        / sq[None, :, :, None])
    else:
        Uc = pack["U"][cat_mix]
        Vc = pack["V"][cat_mix]
        P = jnp.einsum("cxk,eck,cky->ecxy", Uc, jnp.exp(expo), Vc,
                       precision=HIGHEST)
    return jnp.maximum(P, 0.0)


def expm_ss(A, order: int = 8, squarings: int = 8):
    """Batched matrix exponential by scaling-and-squaring with a truncated
    Taylor series: exp(A) = (exp(A/2^k))^(2^k). For rate matrices Q*t with
    t <= 10 and mean rate 1 the scaled norm is tiny, so a fixed (order,
    squarings) is accurate to float32 precision and — unlike the Padé path
    of jax.scipy.linalg.expm — contains no data-dependent control flow, so
    it fuses cleanly under jit. All work is [.., S, S] matmuls (MXU)."""
    A = A / (2.0 ** squarings)
    S = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(S, dtype=A.dtype), A.shape)
    P = eye
    term = eye
    for k in range(1, order + 1):
        term = jnp.matmul(term, A, precision=HIGHEST) / k
        P = P + term
    for _ in range(squarings):
        P = jnp.matmul(P, P, precision=HIGHEST)
    return P


def tip_partials(tip_codes, tip_table):
    """[L, Ppat] codes + [ncodes, S] table -> [L, S, Ppat] leaf partials."""
    return jnp.swapaxes(tip_table[tip_codes], 1, 2)


class DownPass(NamedTuple):
    partials: jax.Array      # [n_int, C, S, Ppat]
    scale: jax.Array         # [n_int, Ppat] int32
    msgs: jax.Array          # [n_int, 3, C, S, Ppat] child messages
    msg_scale: jax.Array     # [n_int, 3, Ppat] child msg scale counts


def down_pass(P, tipP, child_ptr, child_is_leaf, child_edge, child_valid,
              *, keep_msgs: bool = True) -> DownPass:
    """Post-order sweep computing internal-node partials.

    P: [E, C, S, S] transition tensors; tipP: [L, S, Ppat] leaf partials.
    Schedule arrays: [n_int, 3] (see tree/schedule.py).
    """
    dtype = tipP.dtype
    thresh, rescale, _ = scaling_consts(dtype)
    n_int = child_ptr.shape[0]
    C, S = P.shape[1], P.shape[2]
    Pp = tipP.shape[2]
    L = tipP.shape[0]

    B0 = jnp.zeros((n_int, C, S, Pp), dtype)
    SC0 = jnp.zeros((n_int, Pp), jnp.int32)
    M0 = jnp.zeros((n_int, 3, C, S, Pp), dtype) if keep_msgs else None
    MS0 = jnp.zeros((n_int, 3, Pp), jnp.int32) if keep_msgs else None

    def body(carry, xs):
        B, SC, M, MS = carry
        i, ptr, isleaf, eids, valid = xs
        prod = jnp.ones((C, S, Pp), dtype)
        sc = jnp.zeros((Pp,), jnp.int32)
        step_msgs = []
        step_msc = []
        for k in range(3):  # static unroll over child slots
            def leaf_src(ptr_k=ptr[k]):
                idx = jnp.clip(ptr_k, 0, L - 1)
                return jnp.broadcast_to(tipP[idx][None], (C, S, Pp))

            def int_src(ptr_k=ptr[k]):
                idx = jnp.clip(ptr_k, 0, n_int - 1)
                return B[idx]

            src = jax.lax.cond(isleaf[k] > 0, leaf_src, int_src)
            msg = jnp.einsum("cxy,cyp->cxp", P[eids[k]], src, precision=HIGHEST)
            msg = jnp.where(valid[k] > 0, msg, jnp.ones((), dtype))
            msc = jnp.where(
                (valid[k] > 0) & (isleaf[k] == 0),
                SC[jnp.clip(ptr[k], 0, n_int - 1)], 0)
            prod = prod * msg
            sc = sc + msc
            step_msgs.append(msg)
            step_msc.append(msc)
        # per-pattern rescale
        mx = prod.max(axis=(0, 1))
        need = mx < thresh
        prod = prod * jnp.where(need, rescale, 1.0).astype(dtype)[None, None]
        sc = sc + need.astype(jnp.int32)
        B = B.at[i].set(prod)
        SC = SC.at[i].set(sc)
        if M is not None:
            M = M.at[i].set(jnp.stack(step_msgs))
            MS = MS.at[i].set(jnp.stack(step_msc))
        return (B, SC, M, MS), None

    xs = (jnp.arange(n_int), child_ptr, child_is_leaf, child_edge,
          child_valid)
    (B, SC, M, MS), _ = jax.lax.scan(body, (B0, SC0, M0, MS0), xs)
    return DownPass(B, SC, M, MS)


def root_loglik(Broot, SCroot, root_freqs, cat_weight, log_ptn_invar,
                pattern_weights, axis_name: str | None = None,
                asc_mask=None, asc_nsites=None):
    """Site log-likelihoods + total logL from the root partials.

    Returns (logL, site_lp[Ppat]). When the pattern axis is sharded over a
    mesh axis, pass its name: the pattern-sum becomes a psum over ICI
    (site sharding is embarrassingly parallel — SURVEY §5).

    asc_mask/asc_nsites: Lewis ascertainment-bias correction (+ASC) —
    pseudo-patterns (one all-same-state column per state, weight 0) are
    flagged by asc_mask; logL -= N * log(1 - sum_x L_x) (reference:
    tree/phylokernelnew.h:3275-3330 ASC_LEWIS).
    """
    dtype = Broot.dtype
    _, _, log_rescale = scaling_consts(dtype)
    lh_cat = jnp.einsum("cx,cxp->cp", root_freqs, Broot, precision=HIGHEST)
    site = jnp.einsum("c,cp->p", cat_weight, lh_cat, precision=HIGHEST)
    tiny = jnp.finfo(dtype).tiny
    lp = jnp.log(jnp.maximum(site, tiny)) \
        - SCroot.astype(dtype) * jnp.asarray(log_rescale, dtype)
    lp = jnp.logaddexp(lp, log_ptn_invar)
    logL = jnp.sum(pattern_weights * lp)
    if axis_name is not None:
        logL = jax.lax.psum(logL, axis_name)
    if asc_mask is not None:
        prob_unobs = jnp.sum(asc_mask * jnp.exp(lp))
        if axis_name is not None:
            prob_unobs = jax.lax.psum(prob_unobs, axis_name)
        logL = logL - asc_nsites * jnp.log1p(
            -jnp.minimum(prob_unobs, 1.0 - 1e-10))
    return logL, lp


def tree_loglik(blens, tipP, sched, pack, pattern_weights,
                axis_name: str | None = None):
    """Full tree log-likelihood in one call.

    sched: dict of device schedule arrays; pack: dict of model arrays
    (eigvals,U,V,cat_rate,cat_mix,cat_weight,root_freqs,log_ptn_invar).
    """
    P = transition_tensors(blens.astype(tipP.dtype), pack)
    dp = down_pass(P, tipP, sched["child_ptr"], sched["child_is_leaf"],
                   sched["child_edge"], sched["child_valid"],
                   keep_msgs=False)
    return root_loglik(dp.partials[-1], dp.scale[-1], pack["root_freqs"],
                       pack["cat_weight"], pack["log_ptn_invar"],
                       pattern_weights, axis_name=axis_name,
                       asc_mask=pack.get("asc_mask"),
                       asc_nsites=pack.get("asc_nsites"))


# ------------------------------------------------------------------ up pass
class UpPass(NamedTuple):
    edge_E: jax.Array        # [E, C, S, Ppat] outside partial per edge
    edge_E_scale: jax.Array  # [E, Ppat]
    up_in: jax.Array         # [n_int, C, S, Ppat] outside partial per node
    up_scale: jax.Array      # [n_int, Ppat]


def up_pass(P, dp: DownPass, child_ptr, child_is_leaf, child_edge,
            child_valid, root_freqs) -> UpPass:
    """Pre-order sweep: for every edge e=(child v, parent u), compute
    E_e(c,x,p) = likelihood of everything outside v's subtree as a function
    of u's state x (stationary frequencies folded in at the root).

    With E and the down partials, any branch's likelihood and its t-derivatives
    are O(C*S*Ppat) — the theta-buffer trick (tree/phylokernelnew.h:2050).
    """
    dtype = dp.partials.dtype
    thresh, rescale, _ = scaling_consts(dtype)
    n_int, _, C, S, Pp = dp.msgs.shape
    n_edges = P.shape[0]

    # UP[i] = outside-likelihood at internal node i (pattern of its state)
    UP0 = jnp.zeros((n_int, C, S, Pp), dtype)
    UPS0 = jnp.zeros((n_int, Pp), jnp.int32)
    root_out = jnp.broadcast_to(root_freqs[:, :, None], (C, S, Pp))
    UP0 = UP0.at[n_int - 1].set(root_out.astype(dtype))
    E0 = jnp.zeros((n_edges, C, S, Pp), dtype)
    ES0 = jnp.zeros((n_edges, Pp), jnp.int32)

    def body(carry, xs):
        UP, UPS, E, ES = carry
        i, ptr, isleaf, eids, valid = xs
        up_i = UP[i]
        ups_i = UPS[i]
        msgs = dp.msgs[i]          # [3, C, S, Pp]
        mscs = dp.msg_scale[i]     # [3, Pp]
        for k in range(3):  # static unroll
            # product of the *other* children's messages
            prod = up_i
            sc = ups_i
            for k2 in range(3):
                if k2 == k:
                    continue
                prod = prod * jnp.where(valid[k2] > 0, msgs[k2],
                                        jnp.ones((), dtype))
                sc = sc + jnp.where(valid[k2] > 0, mscs[k2], 0)
            # rescale E before storing
            mx = prod.max(axis=(0, 1))
            need = mx < thresh
            prod = prod * jnp.where(need, rescale,
                                    1.0).astype(dtype)[None, None]
            sc = sc + need.astype(jnp.int32)
            ok = valid[k] > 0
            e_idx = jnp.where(ok, eids[k], n_edges)  # OOB write dropped
            E = E.at[e_idx].set(jnp.where(ok, prod, E[jnp.minimum(
                e_idx, n_edges - 1)]), mode="drop")
            ES = ES.at[e_idx].set(jnp.where(ok, sc, 0), mode="drop")
            # propagate to internal children: up[child] = E_e^T P_e
            is_int = ok & (isleaf[k] == 0)
            up_child = jnp.einsum("cxy,cxp->cyp", P[eids[k]], prod, precision=HIGHEST)
            mx2 = up_child.max(axis=(0, 1))
            need2 = mx2 < thresh
            up_child = up_child * jnp.where(need2, rescale,
                                            1.0).astype(dtype)[None, None]
            sc2 = sc + need2.astype(jnp.int32)
            c_idx = jnp.where(is_int, ptr[k], n_int)
            UP = UP.at[c_idx].set(jnp.where(is_int, up_child, 0.0),
                                  mode="drop")
            UPS = UPS.at[c_idx].set(jnp.where(is_int, sc2, 0), mode="drop")
        return (UP, UPS, E, ES), None

    n_idx = jnp.arange(n_int - 1, -1, -1)
    xs = (n_idx, child_ptr[::-1], child_is_leaf[::-1], child_edge[::-1],
          child_valid[::-1])
    (UP, UPS, E, ES), _ = jax.lax.scan(body, (UP0, UPS0, E0, ES0), xs)
    return UpPass(E, ES, UP, UPS)


# ------------------------------------------------------------ theta buffers
class Thetas(NamedTuple):
    theta: jax.Array        # [E, C, S, Ppat] eigenbasis products
    scale: jax.Array        # [E, Ppat] total scale counts


def edge_down_partials(dp: DownPass, tipP, n_edges: int):
    """Per-edge child-side partials (leaf or internal) + scale counts.

    Edge id convention: leaves own edges 0..L-1, internal node (postorder j)
    owns edge L+j."""
    C, S, Pp = dp.partials.shape[1:]
    L = tipP.shape[0]
    dtype = dp.partials.dtype
    down = jnp.zeros((n_edges, C, S, Pp), dtype)
    down_sc = jnp.zeros((n_edges, Pp), jnp.int32)
    leafD = jnp.broadcast_to(tipP[:, None, :, :], (L, C, S, Pp))
    down = down.at[:L].set(leafD.astype(dtype))
    down = down.at[L:].set(dp.partials[: n_edges - L])
    down_sc = down_sc.at[L:].set(dp.scale[: n_edges - L])
    return down, down_sc


def edge_thetas(up: UpPass, dp: DownPass, tipP, child_ptr, child_is_leaf,
                child_valid, pack) -> Thetas:
    """theta_e(c,k,p) = (sum_x E_e(c,x,p) U(c,x,k)) (sum_y V(c,k,y) D_e(c,y,p))

    where D_e is the down partial of the child endpoint of e. Branch
    likelihood: f(t) = sum_k theta_k exp(lambda_k r_c t) per category.
    """
    n_edges = up.edge_E.shape[0]
    Uc = pack["U"][pack["cat_mix"]]   # [C, S, S]
    Vc = pack["V"][pack["cat_mix"]]
    down, down_sc = edge_down_partials(dp, tipP, n_edges)
    a = jnp.einsum("cxk,ecxp->eckp", Uc, up.edge_E, precision=HIGHEST)
    b = jnp.einsum("cky,ecyp->eckp", Vc, down, precision=HIGHEST)
    theta = a * b
    return Thetas(theta, up.edge_E_scale + down_sc)


# ------------------------------------------- nonreversible branch derivatives
def branch_lh_derivs_nonrev(down, out, scale, t, pack, log_ptn_invar,
                            pattern_weights, order: int = 2,
                            axis_name: str | None = None):
    """Branch logL + d/dt + d2/dt2 for nonreversible models (no eigenbasis):
    site0 = out . P(t) . down, dP/dt = (sum_c w_c r_c Q) P, etc.

    down/out: [C, S, Ppat]; scale: [Ppat]. Reference analog: the nonrev
    derivative kernels (tree/phylokernelnonrev.h)."""
    dtype = down.dtype
    _, _, log_rescale = scaling_consts(dtype)
    Qc = pack["Q"][pack["cat_mix"]]                    # [C, S, S]
    r = pack["cat_rate"]
    w = pack["cat_weight"]
    A = Qc * (r[:, None, None] * t)                    # [C, S, S]
    P = expm_ss(A)
    outP = jnp.einsum("cxp,cxy->cyp", out, P, precision=HIGHEST)
    site0 = jnp.einsum("c,cyp,cyp->p", w, outP, down, precision=HIGHEST)
    site0 = jnp.maximum(site0, 0.0)
    sc = scale.astype(dtype) * jnp.asarray(log_rescale, dtype)
    tiny = jnp.finfo(dtype).tiny
    lp = jnp.log(jnp.maximum(site0, tiny)) - sc
    lp = jnp.logaddexp(lp, log_ptn_invar)
    logL = jnp.sum(pattern_weights * lp)
    if axis_name is not None:
        logL = jax.lax.psum(logL, axis_name)
    if order == 0:
        return logL, None, None
    rQ = Qc * r[:, None, None]
    outQP = jnp.einsum("cxp,cxy->cyp",
                       jnp.einsum("cxp,cxz->czp", out, rQ,
                                  precision=HIGHEST),
                       P, precision=HIGHEST)
    outQQP = jnp.einsum("cxp,cxy->cyp",
                        jnp.einsum("cxp,cxz->czp",
                                   jnp.einsum("cxp,cxw->cwp", out, rQ,
                                              precision=HIGHEST),
                                   rQ, precision=HIGHEST),
                        P, precision=HIGHEST)
    site1 = jnp.einsum("c,cyp,cyp->p", w, outQP, down, precision=HIGHEST)
    site2 = jnp.einsum("c,cyp,cyp->p", w, outQQP, down, precision=HIGHEST)
    inv_scaled = jnp.exp(log_ptn_invar + sc)
    denom = site0 + inv_scaled
    d1p = site1 / denom
    d2p = site2 / denom - d1p * d1p
    d1 = jnp.sum(pattern_weights * d1p)
    d2 = jnp.sum(pattern_weights * d2p)
    if axis_name is not None:
        d1 = jax.lax.psum(d1, axis_name)
        d2 = jax.lax.psum(d2, axis_name)
    return logL, d1, d2


def newton_branch_step_nonrev(down, out, scale, t0, pack, log_ptn_invar,
                              pattern_weights, t_min, t_max,
                              n_iter: int = 4):
    def one(i, t):
        _, d1, d2 = branch_lh_derivs_nonrev(down, out, scale, t, pack,
                                            log_ptn_invar, pattern_weights)
        newton_t = t - d1 / d2
        bad = (d2 >= 0) | ~jnp.isfinite(newton_t)
        fallback = jnp.where(d1 > 0, jnp.minimum(t * 4.0, t_max),
                             jnp.maximum(t * 0.25, t_min))
        return jnp.where(bad, fallback, jnp.clip(newton_t, t_min, t_max))
    return jax.lax.fori_loop(0, n_iter, one, t0)


def branch_lh_derivs(theta, scale, t, pack, log_ptn_invar, pattern_weights,
                     order: int = 2, axis_name: str | None = None):
    """logL(t) of one branch from its theta buffer, with d/dt and d2/dt2.

    theta: [C, K, Ppat]; scale: [Ppat]; t scalar. Returns (logL, d1, d2).
    Reference analog: computeLikelihoodDervSIMD / FromBufferSIMD
    (tree/phylokernelnew.h:2235, :3196).
    """
    dtype = theta.dtype
    _, _, log_rescale = scaling_consts(dtype)
    lam = pack["eigvals"][pack["cat_mix"]]           # [C, K]
    lr = lam * pack["cat_rate"][:, None]             # [C, K]
    w = pack["cat_weight"]
    et = jnp.exp(lr * t)                             # [C, K]
    wet = w[:, None] * et
    site0 = jnp.einsum("ckp,ck->p", theta, wet, precision=HIGHEST)
    site0 = jnp.maximum(site0, 0.0)
    sc = scale.astype(dtype) * jnp.asarray(log_rescale, dtype)
    tiny = jnp.finfo(dtype).tiny
    lp = jnp.log(jnp.maximum(site0, tiny)) - sc
    lp = jnp.logaddexp(lp, log_ptn_invar)
    logL = jnp.sum(pattern_weights * lp)
    if axis_name is not None:
        logL = jax.lax.psum(logL, axis_name)
    asc_mask = pack.get("asc_mask")
    if order == 0:
        if asc_mask is not None:
            prob_unobs = jnp.sum(asc_mask * jnp.exp(lp))
            if axis_name is not None:
                prob_unobs = jax.lax.psum(prob_unobs, axis_name)
            logL = logL - pack["asc_nsites"] * jnp.log1p(
                -jnp.minimum(prob_unobs, 1.0 - 1e-10))
        return logL, None, None
    site1 = jnp.einsum("ckp,ck->p", theta, wet * lr, precision=HIGHEST)
    site2 = jnp.einsum("ckp,ck->p", theta, wet * lr * lr, precision=HIGHEST)
    # denom = site0 + inv * 2^{B*sc}; overflow -> inf -> ratios 0 (correct:
    # when scaled-out variable part is negligible vs invariant part)
    inv_scaled = jnp.exp(log_ptn_invar + sc)
    denom = site0 + inv_scaled
    d1p = site1 / denom
    d2p = site2 / denom - d1p * d1p
    d1 = jnp.sum(pattern_weights * d1p)
    d2 = jnp.sum(pattern_weights * d2p)
    if axis_name is not None:
        d1 = jax.lax.psum(d1, axis_name)
        d2 = jax.lax.psum(d2, axis_name)
    if asc_mask is not None:
        # d/dt of -N log(1 - s),  s = sum_x e^{lp_x}:
        #   s'  = sum_x e^{lp_x} (lp_x)'
        #   s'' = sum_x e^{lp_x} ((lp_x)'' + (lp_x)'^2)
        sx = asc_mask * jnp.exp(lp)
        s = jnp.sum(sx)
        s1 = jnp.sum(sx * d1p)
        s2 = jnp.sum(sx * (d2p + d1p * d1p))
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
        N = pack["asc_nsites"]
        om = jnp.maximum(1.0 - s, 1e-10)
        logL = logL - N * jnp.log(om)
        d1 = d1 + N * s1 / om
        d2 = d2 + N * (s2 / om + (s1 / om) ** 2)
    return logL, d1, d2


def branch_site_lp(theta, scale, t, pack, log_ptn_invar):
    """Per-pattern log-likelihood of one branch configuration from its
    theta buffer (for SH-aLRT / RELL resampling of NNI alternatives)."""
    dtype = theta.dtype
    _, _, log_rescale = scaling_consts(dtype)
    lam = pack["eigvals"][pack["cat_mix"]]
    lr = lam * pack["cat_rate"][:, None]
    wet = pack["cat_weight"][:, None] * jnp.exp(lr * t)
    site0 = jnp.maximum(
        jnp.einsum("ckp,ck->p", theta, wet, precision=HIGHEST), 0.0)
    sc = scale.astype(dtype) * jnp.asarray(log_rescale, dtype)
    tiny = jnp.finfo(dtype).tiny
    lp = jnp.log(jnp.maximum(site0, tiny)) - sc
    return jnp.logaddexp(lp, log_ptn_invar)


def newton_branch_step(theta, scale, t0, pack, log_ptn_invar,
                       pattern_weights, t_min, t_max, n_iter: int = 4,
                       axis_name: str | None = None):
    """A few bounded Newton iterations on one branch length (vmapped over
    edges by the caller). Mirrors minimizeNewton (utils/optimization.cpp:422):
    fall back to stepping toward a bound when curvature is wrong.
    """
    def one(i, t):
        _, d1, d2 = branch_lh_derivs(theta, scale, t, pack, log_ptn_invar,
                                     pattern_weights, axis_name=axis_name)
        newton_t = t - d1 / d2
        bad = (d2 >= 0) | ~jnp.isfinite(newton_t)
        # wrong curvature: move in gradient direction geometrically
        fallback = jnp.where(d1 > 0, jnp.minimum(t * 4.0, t_max),
                             jnp.maximum(t * 0.25, t_min))
        t_new = jnp.where(bad, fallback, jnp.clip(newton_t, t_min, t_max))
        return t_new
    return jax.lax.fori_loop(0, n_iter, one, t0)
