"""Batched NNI candidate evaluation on-chip.

For every internal edge e=(u child, v parent) the two NNI rearrangements are
scored *simultaneously for all edges* from the cached down-pass messages and
up-pass outside partials — no per-candidate tree traversal:

  around e the four subtrees are (a, b | c, d):  a,b = children of u,
  c = one sibling at v, d = rest (parent side of v, or the second sibling
  when v is the root).
  variant 0 swaps b<->c:  down' = m_a * m_c ; out' = rest * m_b
  variant 1 swaps a<->c:  down' = m_b * m_c ; out' = rest * m_a
  theta' = (out' U) (V down') ; central branch re-optimized by Newton.

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
    slot_a: np.ndarray    # [n] slot of child a at u
    slot_b: np.ndarray    # [n] slot of child b at u
    slot_c: np.ndarray    # [n] slot of sibling c at v
    has_c2: np.ndarray    # [n] 1 if v is root (second sibling exists)
    slot_c2: np.ndarray   # [n] slot of second sibling at root
    edge_id: np.ndarray   # [n] central edge id
    # host bookkeeping for applying moves
    nodes_u: list
    nodes_v: list


def build_nni_candidates(tree: Tree, sched: TreeSchedule) -> NNICandidates:
    order_idx = {v: i for i, v in enumerate(sched.postorder_nodes)}
    rows = []
    nodes_u, nodes_v = [], []
    for e, pair in enumerate(sched.edge_nodes):
        if pair is None:
            continue
        u, v = pair
        if tree.is_leaf(u) or tree.is_leaf(v):
            continue
        iu, iv = order_idx[u], order_idx[v]
        u_slots = [k for k in range(3) if sched.child_valid[iu, k] > 0]
        if len(u_slots) != 2:
            continue  # u must be a binary internal node (not the root)
        v_slots = [k for k in range(3) if sched.child_valid[iv, k] > 0]
        k_u = next(k for k in v_slots
                   if sched.child_is_leaf[iv, k] == 0
                   and sched.child_ptr[iv, k] == iu
                   and sched.child_edge[iv, k] == e)
        sibs = [k for k in v_slots if k != k_u]
        has_c2 = 1 if len(sibs) == 2 else 0
        rows.append((iu, iv, u_slots[0], u_slots[1], sibs[0], has_c2,
                     sibs[1] if has_c2 else 0, e))
        nodes_u.append(u)
        nodes_v.append(v)
    if not rows:
        z = np.zeros(0, np.int32)
        return NNICandidates(z, z, z, z, z, z, z, z, [], [])
    arr = np.asarray(rows, dtype=np.int32)
    return NNICandidates(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
                         arr[:, 4], arr[:, 5], arr[:, 6], arr[:, 7],
                         nodes_u, nodes_v)


@functools.partial(jax.jit, static_argnames=("n_newton", "return_site_lp",
                                             "nonrev"))
def evaluate_nnis(cand_arrays, blens, dp_msgs, dp_msg_scale, up_in, up_scale,
                  pack, pattern_weights, t_min, t_max, n_newton: int = 4,
                  return_site_lp: bool = False, nonrev: bool = False):
    """Score both NNI variants (and the no-swap baseline) for all candidate
    edges at once. Returns (logl [n,3], t_opt [n,3]) where column 2 is the
    re-optimized current topology (baseline). With return_site_lp, also
    returns per-pattern log-likelihoods [n, 3, Ppat] (for SH-aLRT RELL)."""
    iu, iv, sa, sb, sc_, hc2, sc2, eid = cand_arrays
    log_ptn_invar = pack["log_ptn_invar"]

    def one(iu_, iv_, sa_, sb_, sc__, hc2_, sc2_, eid_):
        m_a = dp_msgs[iu_, sa_]
        m_b = dp_msgs[iu_, sb_]
        m_c = dp_msgs[iv_, sc__]
        s_a = dp_msg_scale[iu_, sa_]
        s_b = dp_msg_scale[iu_, sb_]
        s_c = dp_msg_scale[iv_, sc__]
        rest = up_in[iv_]
        s_rest = up_scale[iv_]
        dtype = m_a.dtype
        m_c2 = jnp.where(hc2_ > 0, dp_msgs[iv_, sc2_], jnp.ones((), dtype))
        s_c2 = jnp.where(hc2_ > 0, dp_msg_scale[iv_, sc2_], 0)
        rest = rest * m_c2
        s_rest = s_rest + s_c2
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

    return jax.vmap(one)(iu, iv, sa, sb, sc_, hc2, sc2, eid)
