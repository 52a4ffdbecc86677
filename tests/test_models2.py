"""Mixture models, codon models, and the +ASC Lewis correction."""

import numpy as np
import pytest

import jax.numpy as jnp

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.tree.topology import Tree


def _aa_aln(ntaxa=6, nsites=80, seed=2):
    rng = np.random.default_rng(seed)
    aas = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    seqs = ["".join(aas[rng.integers(0, 20, nsites)]) for _ in range(ntaxa)]
    return Alignment.from_sequences([f"s{i}" for i in range(ntaxa)], seqs,
                                    seqtype="AA")


def test_mixture_matches_manual_sum():
    """MIX likelihood = weighted sum of component likelihoods per site."""
    aln = _aa_aln()
    rng = np.random.default_rng(0)
    tree = Tree.random_topology(aln.names, rng)

    mix, rates, _ = build_model("MIX{LG,WAG}", aln)
    mix.weights = np.array([0.3, 0.7])
    eng = LikelihoodEngine(aln, mix, rates, dtype=jnp.float64,
                           pattern_pad=32)
    logL_mix, lp_mix = eng.site_lp(tree)

    lps = []
    for comp in ("LG", "WAG"):
        m, r, _ = build_model(comp, aln)
        e = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
        _, lp = e.site_lp(tree)
        lps.append(lp)
    manual = np.log(0.3 * np.exp(lps[0]) + 0.7 * np.exp(lps[1]))
    w = aln.pattern_weights
    assert np.allclose(lp_mix, manual, atol=1e-8)
    assert abs(logL_mix - (w * manual).sum()) < 1e-6


def test_profile_mixture_c10_runs():
    aln = _aa_aln(seed=5)
    rng = np.random.default_rng(1)
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("C10", aln)
    assert len(m.components) == 10
    assert len(r.category_rates()) == 4  # implied +G4
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    assert np.isfinite(eng.loglik_tree(tree))


def test_lg4x_fused_categories():
    aln = _aa_aln(seed=6)
    m, r, _ = build_model("LG4X", aln)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    # fused: 4 categories, one per matrix (not 4x4)
    assert len(eng.pack_np.cat_rate) == 4
    assert (np.asarray(eng.pack_np.cat_mix) == np.arange(4)).all()


def _codon_aln(ntaxa=5, ncodons=60, seed=4):
    rng = np.random.default_rng(seed)
    dna = np.array(list("ACGT"))
    # avoid stop codons by rejection
    from iqtree2_tpu.data import seqtypes
    idx, sense, _ = seqtypes.codon_maps(1)
    seqs = []
    for _ in range(ntaxa):
        cods = []
        while len(cods) < ncodons:
            tri = "".join(dna[rng.integers(0, 4, 3)])
            t = "TCAG".index(tri[0]) * 16 + "TCAG".index(tri[1]) * 4 + \
                "TCAG".index(tri[2])
            if idx[t] >= 0:
                cods.append(tri)
        seqs.append("".join(cods))
    return Alignment.from_sequences([f"c{i}" for i in range(ntaxa)], seqs,
                                    seqtype="CODON1")


def test_codon_gy_sanity():
    aln = _codon_aln()
    assert aln.num_states == 61
    m, r, _ = build_model("GY", aln)
    rng = np.random.default_rng(3)
    tree = Tree.random_topology(aln.names, rng)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    logL = eng.optimize_branches(tree, n_rounds=4)
    assert np.isfinite(logL)
    # P(t) rows sum to 1
    from iqtree2_tpu.model.subst import transition_matrix
    P = transition_matrix(m.get_eigensystem(), 0.3)
    assert np.allclose(P.sum(1), 1.0, atol=1e-8)
    # omega=0 forbids nonsynonymous: check Q structure
    m.omega = 1e-9
    from iqtree2_tpu.model.subst import build_gtr_rate_matrix
    Q = build_gtr_rate_matrix(m._exch(), m.freqs, normalize=False)
    pairs = m._pairs
    nonsyn = pairs[pairs[:, 3] == 0]
    assert all(Q[a, b] < 1e-6 for a, b, *_ in nonsyn)


def test_asc_lewis_correction():
    """+ASC logL equals the conditional likelihood log(L_p / (1 - sum_x
    L_const_x)) computed by brute force on a tiny tree."""
    rng = np.random.default_rng(9)
    chars = np.array(list("ACGT"))
    # variable-only alignment (ASC requires no constant sites)
    mat = rng.integers(0, 4, size=(40, 4))
    keep = np.array([len(set(row)) > 1 for row in mat])
    mat = mat[keep]
    seqs = ["".join(chars[mat[:, i]]) for i in range(4)]
    aln = Alignment.from_sequences(list("abcd"), seqs, seqtype="DNA")
    tree = Tree.random_topology(aln.names, rng)

    m, r, _ = build_model("HKY{2.0}+F{0.3,0.2,0.2,0.3}", aln)
    plain = LikelihoodEngine(aln, m, r, dtype=jnp.float64, pattern_pad=32)
    logL_plain, lp = plain.site_lp(tree)

    m2, r2, ex = build_model("HKY{2.0}+F{0.3,0.2,0.2,0.3}+ASC", aln)
    assert ex.get("asc")
    asc_eng = LikelihoodEngine(aln, m2, r2, dtype=jnp.float64,
                               pattern_pad=32, asc=True)
    logL_asc = asc_eng.loglik_tree(tree)

    # brute force: likelihood of each constant column under the same model
    const_lh = 0.0
    for x in range(4):
        col_aln = Alignment.from_sequences(
            list("abcd"), [chars[x] * 1] * 4, seqtype="DNA")
        e = LikelihoodEngine(col_aln, m, r, dtype=jnp.float64,
                             pattern_pad=32)
        _, lpx = e.site_lp(tree)
        const_lh += np.exp(lpx[0])
    n = aln.nsites
    expect = logL_plain - n * np.log1p(-const_lh)
    assert abs(logL_asc - expect) < 1e-6, (logL_asc, expect)

    # branch optimization under ASC must not decrease corrected logL
    t2 = tree.copy()
    logL_opt = asc_eng.optimize_branches(t2, n_rounds=6)
    assert logL_opt >= logL_asc - 1e-6


def test_empirical_codon_models():
    """KOSI07/SCHN05 empirical codon models (reference:
    model/modelcodon.cpp:343-357, readCodonModel :699)."""
    from iqtree2_tpu.model.subst import transition_matrix
    aln = _codon_aln()
    rng = np.random.default_rng(5)
    tree = Tree.random_topology(aln.names, rng)
    vals = {}
    for name in ("KOSI07", "SCHN05", "ECMREST"):
        m, r, _ = build_model(name, aln)
        assert m.num_free_params() == 0
        P = transition_matrix(m.get_eigensystem(), 0.2)
        assert np.allclose(P.sum(1), 1.0, atol=1e-8)
        assert (P >= -1e-10).all()
        eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64,
                               pattern_pad=32)
        vals[name] = eng.loglik_tree(tree)
        assert np.isfinite(vals[name])
    # the three matrices are genuinely different models
    assert len({round(v, 3) for v in vals.values()}) == 3
    # +F switches to counted frequencies
    mf, rf, _ = build_model("KOSI07+F", aln)
    engf = LikelihoodEngine(aln, mf, rf, dtype=jnp.float64, pattern_pad=32)
    assert abs(engf.loglik_tree(tree) - vals["KOSI07"]) > 1e-3
