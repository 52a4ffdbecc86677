"""Single-branch support tests: SH-aLRT, parametric aLRT, aBayes, local
bootstrap.

Reference analog (SURVEY A5): testAllBranches (tree/phylotree.cpp:5315) ->
testOneBranch (:5217): per internal branch, the two NNI-alternative logLs
are computed, then RELL site resampling with per-configuration centering
gives the SH-aLRT proportion; aBayes = 1/(1+e^{l1-l0}+e^{l2-l0}) (:5244).

All per-branch NNI configurations are evaluated in one batched device call;
the RELL resampling is a single [reps,P] x [P,3*n] matmul.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2

import jax.numpy as jnp

from iqtree2_tpu.ops.nni import build_nni_candidates
from iqtree2_tpu.tree.schedule import build_schedule
from iqtree2_tpu.tree.topology import Tree


def test_all_branches(eng, tree: Tree,
                      n_rell: int = 1000,
                      rng: np.random.Generator | None = None,
                      do_alrt: bool = True,
                      do_abayes: bool = False,
                      do_lbp: bool = False,
                      do_parametric_alrt: bool = False
                      ) -> dict[tuple[int, int], tuple]:
    """Returns {branch key: (SH_aLRT_pct, [aLRT], [aBayes], [LBP_pct])} for
    every internal branch."""
    if rng is None:
        rng = np.random.default_rng(1)
    aln = eng.aln
    sched = build_schedule(tree)
    cand = build_nni_candidates(tree, sched)
    if len(cand.nodes_u) == 0:
        return {}
    cand_arrays = (jnp.asarray(cand.iu), jnp.asarray(cand.iv),
                   jnp.asarray(cand.slot_a), jnp.asarray(cand.slot_b),
                   jnp.asarray(cand.slot_c), jnp.asarray(cand.has_c2),
                   jnp.asarray(cand.slot_c2), jnp.asarray(cand.edge_id))
    logl, t_opt, site_lp = eng.evaluate_nni_batch(sched, cand_arrays,
                                                  return_site_lp=True)
    logl = np.asarray(logl, np.float64)          # [n, 3] cols: nni1,nni2,cur
    site_lp = np.asarray(site_lp, np.float64)    # [n, 3, P]
    w = aln.pattern_weights

    # reorder to (current, nni1, nni2)
    order = [2, 0, 1]
    lh = logl[:, order]                          # [n, 3]
    pat = site_lp[:, order, :]                   # [n, 3, P]

    # RELL resampling: one multinomial weight matrix for all branches
    nsites = int(w.sum())
    probs = w / w.sum()
    Wb = rng.multinomial(nsites, probs, size=n_rell).astype(np.float64)
    # lh_new[b, rep, c] = Wb[rep] . pat[b, c]
    lh_new = np.einsum("rp,bcp->brc", Wb, pat)

    cs = lh_new - lh[:, None, :]                 # centered
    aLRT = lh[:, 0] - np.maximum(lh[:, 1], lh[:, 2])
    cs_sorted = np.sort(cs, axis=2)
    cs_best = cs_sorted[:, :, 2]
    cs_2nd = cs_sorted[:, :, 1]
    sh_count = (aLRT[:, None] > (cs_best - cs_2nd) + 0.05).sum(axis=1)
    sh_support = 100.0 * sh_count / n_rell

    wins = (lh_new[:, :, 0] > lh_new[:, :, 1]) & \
        (lh_new[:, :, 0] > lh_new[:, :, 2])
    lbp = 100.0 * wins.sum(axis=1) / n_rell

    abayes = 1.0 / (1.0 + np.exp(np.minimum(lh[:, 1] - lh[:, 0], 50))
                    + np.exp(np.minimum(lh[:, 2] - lh[:, 0], 50)))
    # parametric aLRT: mixture 0.5 chi2_0 + 0.5 chi2_1 (Anisimova-Gascuel)
    stat = np.maximum(2.0 * aLRT, 0.0)
    para = 1.0 - 0.5 * chi2.sf(stat, 1)

    out = {}
    for i in range(len(lh)):
        u, v = cand.nodes_u[i], cand.nodes_v[i]
        vals = [float(sh_support[i])]
        if do_parametric_alrt:
            vals.append(float(100 * para[i]))
        if do_abayes:
            vals.append(float(abayes[i]))
        if do_lbp:
            vals.append(float(lbp[i]))
        out[Tree._key(u, v)] = tuple(round(x, 3) for x in vals)
    return out
