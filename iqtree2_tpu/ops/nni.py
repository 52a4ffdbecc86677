"""Batched NNI candidate evaluation on-chip.

For every internal edge e=(u child, v parent) the two NNI rearrangements are
scored *simultaneously for all edges* from the down-pass partials and
up-pass outside partials — no per-candidate tree traversal:

  around e the four subtrees are (a, b | c, d):  a,b = children of u,
  c = the other child of v, d = rest (everything above v — the up-pass
  outside partial, which already folds in the root frequencies and the
  leaf-0 message when v is the root).
  variant 0 swaps b<->c:  down' = m_a * m_c ; out' = rest * m_b
  variant 1 swaps a<->c:  down' = m_b * m_c ; out' = rest * m_a
  theta' = (out' U) (V down') ; central branch re-optimized by Newton.

Child messages m_* are recomputed from the unified partial buffer
(one gather + small contraction each — they are no longer stored).

This is the NNI1 evaluation mode (re-optimize the central branch only);
reference analog: getBestNNIForBran (tree/phylotree.cpp:4058). The CPU
reference evaluates candidates one at a time; batching them is the TPU win
(SURVEY §7 step 3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import TreeSchedule
from iqtree2_tpu.tree.topology import Tree


class NNICandidates(NamedTuple):
    """Host-built index arrays, one row per internal edge."""
    iu: np.ndarray        # [n] postorder idx of child node u
    iv: np.ndarray        # [n] postorder idx of parent node v
    slot_c: np.ndarray    # [n] slot of the sibling c at v (u is 1-slot_c)
    edge_id: np.ndarray   # [n] central edge id
    # host bookkeeping for applying moves
    nodes_u: list
    nodes_v: list


def build_nni_candidates(tree: Tree, sched: TreeSchedule) -> NNICandidates:
    L = sched.ntaxa
    order_idx = {v: i for i, v in enumerate(sched.postorder_nodes)}
    rows = []
    nodes_u, nodes_v = [], []
    for e, pair in enumerate(sched.edge_nodes):
        if pair is None:
            continue
        u, v = pair
        if tree.is_leaf(u) or tree.is_leaf(v):
            continue
        iu = e - L  # internal node u owns edge L + postorder(u)
        iv = order_idx[v]
        k_u = 0 if int(sched.child_edge[iv, 0]) == e else 1
        rows.append((iu, iv, 1 - k_u, e))
        nodes_u.append(u)
        nodes_v.append(v)
    if not rows:
        z = np.zeros(0, np.int32)
        return NNICandidates(z, z, z, z, [], [])
    arr = np.asarray(rows, dtype=np.int32)
    return NNICandidates(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
                         nodes_u, nodes_v)


@functools.partial(jax.jit, static_argnames=("n_newton", "return_site_lp",
                                             "nonrev"))
def evaluate_nnis(cand_arrays, blens, dp: pruning.DownPass, up_in, up_scale,
                  sched, pack, pattern_weights, t_min, t_max,
                  n_newton: int = 4, return_site_lp: bool = False,
                  nonrev: bool = False):
    """Score both NNI variants (and the no-swap baseline) for all candidate
    edges at once. Returns (logl [n,3], t_opt [n,3]) where column 2 is the
    re-optimized current topology (baseline). With return_site_lp, also
    returns per-pattern log-likelihoods [n, 3, Ppat] (for SH-aLRT RELL)."""
    iu, iv, slot_c, eid = cand_arrays
    log_ptn_invar = pack["log_ptn_invar"]
    child_src = sched["child_src"]
    child_edge = sched["child_edge"]
    P = pruning.transition_tensors(blens.astype(dp.all.dtype), pack)

    def one(iu_, iv_, sc__, eid_):
        m_a, s_a = pruning.gather_messages(dp, P, child_src[iu_, 0],
                                           child_edge[iu_, 0])
        m_b, s_b = pruning.gather_messages(dp, P, child_src[iu_, 1],
                                           child_edge[iu_, 1])
        m_c, s_c = pruning.gather_messages(dp, P, child_src[iv_, sc__],
                                           child_edge[iv_, sc__])
        rest = up_in[iv_]
        s_rest = up_scale[iv_]
        t0 = blens[eid_]

        Uc = pack["U"][pack["cat_mix"]]
        Vc = pack["V"][pack["cat_mix"]]

        def score_nonrev(down, s_down, out, s_out):
            scale = s_down + s_out
            t_opt = pruning.newton_branch_step_nonrev(
                down, out, scale, t0, pack, log_ptn_invar, pattern_weights,
                t_min, t_max, n_iter=n_newton)
            logl, _, _ = pruning.branch_lh_derivs_nonrev(
                down, out, scale, t_opt, pack, log_ptn_invar,
                pattern_weights, order=0)
            lp = jnp.zeros((0,), down.dtype)
            return logl, t_opt, lp

        def score(down, s_down, out, s_out):
            if nonrev:
                return score_nonrev(down, s_down, out, s_out)
            a = jnp.einsum("cxk,cxp->ckp", Uc, out,
                           precision=jax.lax.Precision.HIGHEST)
            b = jnp.einsum("cky,cyp->ckp", Vc, down,
                           precision=jax.lax.Precision.HIGHEST)
            theta = a * b
            scale = s_down + s_out
            t_opt = pruning.newton_branch_step(
                theta, scale, t0, pack, log_ptn_invar, pattern_weights,
                t_min, t_max, n_iter=n_newton)
            logl, _, _ = pruning.branch_lh_derivs(
                theta, scale, t_opt, pack, log_ptn_invar, pattern_weights,
                order=0)
            if return_site_lp:
                lp = pruning.branch_site_lp(theta, scale, t_opt, pack,
                                            log_ptn_invar)
            else:
                lp = jnp.zeros((0,), theta.dtype)
            return logl, t_opt, lp

        l0, tt0, p0 = score(m_a * m_c, s_a + s_c, rest * m_b, s_rest + s_b)
        l1, tt1, p1 = score(m_b * m_c, s_b + s_c, rest * m_a, s_rest + s_a)
        l2, tt2, p2 = score(m_a * m_b, s_a + s_b, rest * m_c, s_rest + s_c)
        out = (jnp.stack([l0, l1, l2]), jnp.stack([tt0, tt1, tt2]))
        if return_site_lp:
            return out + (jnp.stack([p0, p1, p2]),)
        return out

    return jax.vmap(one)(iu, iv, slot_c, eid)
