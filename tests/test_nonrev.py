"""Nonreversible models: expm device path, UNREST, Lie-Markov family."""

import numpy as np

import jax.numpy as jnp

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.model.liemarkov import LM_MODELS, LieMarkovModel
from iqtree2_tpu.model.nonrev import UnrestModel
from iqtree2_tpu.model.subst import build_gtr_rate_matrix
from iqtree2_tpu.tree.topology import Tree


def _dna_aln(ntaxa=6, nsites=150, seed=2):
    rng = np.random.default_rng(seed)
    chars = np.array(list("ACGT"))
    seqs = ["".join(chars[rng.integers(0, 4, nsites)]) for _ in range(ntaxa)]
    return Alignment.from_sequences([f"s{i}" for i in range(ntaxa)], seqs,
                                    seqtype="DNA"), rng


def test_expm_path_matches_eigen_path():
    """A GTR matrix fed through the nonreversible (expm) path must
    reproduce the eigendecomposition path's logL exactly."""
    aln, rng = _dna_aln()
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("GTR{1.5,4.0,1.2,0.8,5.0}+F{0.3,0.2,0.2,0.3}+G4",
                          aln)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    L_eig = eng.loglik_tree(tree)
    Q = build_gtr_rate_matrix(m.exch_rates, m.freqs)
    off = [Q[i, j] for i in range(4) for j in range(4) if i != j]
    um = UnrestModel(4, rates=np.asarray(off))
    eng2 = LikelihoodEngine(aln, um, r, dtype=jnp.float64, pattern_pad=32)
    assert abs(L_eig - eng2.loglik_tree(tree)) < 1e-6


def test_unrest_branch_opt_and_nni():
    aln, rng = _dna_aln(seed=7)
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("UNREST", aln)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    L0 = eng.loglik_tree(tree)
    L1 = eng.optimize_branches(tree, n_rounds=6)
    assert L1 >= L0 - 1e-9
    from iqtree2_tpu.search.nni import nni_optimize
    res = nni_optimize(eng, tree, max_rounds=3)
    assert res.logL >= L1 - 1e-6


def test_all_lie_markov_valid():
    rng = np.random.default_rng(0)
    for key in LM_MODELS:
        m = LieMarkovModel(key)
        m.set_params(rng.uniform(-0.5, 0.5, m.num_free_params()))
        Q, pi = m._build_q()
        off = Q - np.diag(np.diag(Q))
        assert (off >= -1e-12).all(), key
        assert abs(Q.sum(1)).max() < 1e-10, key
        assert abs(pi.sum() - 1.0) < 1e-10, key


def test_lm11_equals_jc():
    aln, rng = _dna_aln(seed=4)
    tree = Tree.random_topology(aln.names, rng)
    m1, r1, _ = build_model("1.1", aln)
    mj, rj, _ = build_model("JC", aln)
    e1 = LikelihoodEngine(aln, m1, r1, dtype=jnp.float64, pattern_pad=32)
    ej = LikelihoodEngine(aln, mj, rj, dtype=jnp.float64, pattern_pad=32)
    assert abs(e1.loglik_tree(tree) - ej.loglik_tree(tree)) < 1e-8
