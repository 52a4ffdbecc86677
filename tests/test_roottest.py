"""Root position test / rootstrap (--root-test; doRootTest analog)."""

import numpy as np

import jax.numpy as jnp

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.roottest import (rooted_newick, rooted_tree_on_branch,
                                  run_root_test, root_alignment,
                                  write_roottest_csv)
from iqtree2_tpu.tree.topology import Tree


def _dna_aln(ntaxa=6, nsites=200, seed=3):
    rng = np.random.default_rng(seed)
    chars = np.array(list("ACGT"))
    seqs = ["".join(chars[rng.integers(0, 4, nsites)]) for _ in range(ntaxa)]
    return Alignment.from_sequences([f"s{i}" for i in range(ntaxa)], seqs,
                                    seqtype="DNA"), rng


def test_rooted_machinery_matches_unrooted_at_default_root():
    """Rooting at the engine's default root (the internal node adjacent to
    leaf 0, frac=1 along branch (leaf0, nb)) must reproduce the unrooted
    nonreversible logL: the pseudo-taxon contributes exactly 1."""
    aln, rng = _dna_aln()
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("UNREST", aln)
    m.rates = np.asarray([1.5, 4.0, 1.2, 0.8, 5.0, 1.1,
                          2.0, 0.5, 1.7, 0.9, 3.0, 1.0])
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    L_unrooted = eng.loglik_tree(tree)

    nb = tree.adj[0][0]
    rt = rooted_tree_on_branch(tree, 0, nb, frac=1.0)
    reng = LikelihoodEngine(root_alignment(aln), m, r,
                            dtype=jnp.float64, pattern_pad=32)
    L_rooted = reng.loglik_tree(rt)
    # the zero sub-branch is clamped to 1e-8, leaving an O(1e-5) residual
    assert abs(L_rooted - L_unrooted) < 1e-4


def test_reversible_model_root_invariance():
    """Pulley principle: under a reversible model every rooting of the
    SAME branch lengths has the same likelihood (optimize=False keeps the
    comparison exact; optimized runs may land in different local optima
    on random data)."""
    aln, rng = _dna_aln(seed=11)
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("HKY{2.0}+G4", aln)
    res = run_root_test(aln, tree, m, r, dtype=jnp.float64,
                        nboot=1000, optimize=False,
                        log=lambda *a, **k: None)
    assert res.logL.shape[0] == len(tree.edges())
    assert res.logL.max() - res.logL.min() < 1e-4
    assert abs(res.rootstrap.sum() - 1.0) < 1e-9


def test_nonrev_root_test_outputs(tmp_path):
    aln, rng = _dna_aln(seed=5, ntaxa=5, nsites=120)
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("UNREST", aln)
    m.rates = np.asarray([1.5, 4.0, 1.2, 0.8, 5.0, 1.1,
                          2.0, 0.5, 1.7, 0.9, 3.0, 1.0])
    res = run_root_test(aln, tree, m, r, dtype=jnp.float64,
                        nboot=1000, log=lambda *a, **k: None)
    # best rooting is at least as good as every other (by construction)
    assert res.logL[res.best] == res.logL.max()
    assert res.tests.p_sh[res.best] > 0.5

    out = tmp_path / "x.roottest.csv"
    write_roottest_csv(str(out), res)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 1 + len(res.branches)
    assert lines[0].startswith("ID,Branch,logL")

    a, b = res.branches[res.best]
    nwk = rooted_newick(tree, a, b)
    assert "__ROOT__" not in nwk
    t2 = Tree.from_newick(nwk, tree.taxon_names)
    # the rooted newick keeps all taxa and total length ~ original
    assert sorted(t2.taxon_names) == sorted(tree.taxon_names)
