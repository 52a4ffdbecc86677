"""Kernel correctness: jitted pruning vs brute-force numpy oracle, plus
golden-value parity against the reference iqtree2 binary outputs
(tests/golden/golden.json)."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.io.alignment_io import read_alignment
from iqtree2_tpu.model.dna import make_dna_model
from iqtree2_tpu.model.rates import (RateFree, RateGamma, RateGammaInvar,
                                     RateInvar, RateModel)
from iqtree2_tpu.tree.topology import Tree

from .reference_impl import brute_force_loglik

GOLDEN = Path(__file__).parent / "golden"


def random_alignment(rng, ntaxa, nsites, gap_frac=0.05):
    chars = np.array(list("ACGT"))
    mat = rng.integers(0, 4, size=(ntaxa, nsites))
    seqs = ["".join(chars[row]) for row in mat]
    # add gaps/ambiguity
    seqs = [
        "".join(c if rng.random() > gap_frac else rng.choice(list("N-RY"))
                for c in s) for s in seqs]
    names = [f"t{i}" for i in range(ntaxa)]
    return Alignment.from_sequences(names, seqs, seqtype="DNA")


@pytest.mark.parametrize("ntaxa,ncat", [(4, 1), (7, 4), (12, 4)])
def test_vs_brute_force(ntaxa, ncat):
    rng = np.random.default_rng(ntaxa * 100 + ncat)
    aln = random_alignment(rng, ntaxa, 200)
    tree = Tree.random_topology(aln.names, rng)
    model = make_dna_model("GTR", freqs=aln.state_frequencies(),
                           freq_type="empirical")
    model.set_rate_params(rng.uniform(0.5, 3.0, size=5))
    rates = RateGamma(ncat, alpha=0.7) if ncat > 1 else RateModel()
    want = brute_force_loglik(aln, tree, model, rates)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float64)
    got = eng.loglik_tree(tree)
    assert got == pytest.approx(want, abs=1e-8), (got, want)


def test_vs_brute_force_invar():
    rng = np.random.default_rng(7)
    aln = random_alignment(rng, 9, 300)
    tree = Tree.random_topology(aln.names, rng)
    model = make_dna_model("HKY", freqs=aln.state_frequencies(),
                           freq_type="empirical")
    rates = RateGammaInvar(4, alpha=0.9, p_invar=0.25)
    want = brute_force_loglik(aln, tree, model, rates)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float64)
    got = eng.loglik_tree(tree)
    assert got == pytest.approx(want, abs=1e-8)


def test_f32_close_to_f64():
    rng = np.random.default_rng(3)
    aln = random_alignment(rng, 15, 500)
    tree = Tree.random_topology(aln.names, rng)
    model = make_dna_model("GTR", freqs=aln.state_frequencies(),
                           freq_type="empirical")
    rates = RateGamma(4, alpha=0.5)
    e64 = LikelihoodEngine(aln, model, rates, dtype=jnp.float64)
    e32 = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    l64 = e64.loglik_tree(tree)
    l32 = e32.loglik_tree(tree)
    assert abs(l64 - l32) / abs(l64) < 1e-5


def test_deep_tree_scaling():
    """Likelihood stays finite on a long caterpillar (scale counts fire)."""
    rng = np.random.default_rng(11)
    ntaxa = 60
    aln = random_alignment(rng, ntaxa, 100)
    tree = Tree.random_topology(aln.names, rng)
    tree.set_all_blens(2.0)  # long branches force underflow
    model = make_dna_model("JC")
    eng = LikelihoodEngine(aln, model, RateModel(), dtype=jnp.float32)
    got = eng.loglik_tree(tree)
    want = brute_force_loglik_log64(aln, tree, model)
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=1e-5)


def brute_force_loglik_log64(aln, tree, model):
    # log-space brute force, immune to underflow
    from iqtree2_tpu.model.pack import build_model_pack
    pk = build_model_pack(aln, model, RateModel())
    codes = aln.tip_codes()
    P = aln.num_patterns
    S = pk.num_states

    def pmat(t):
        lam = pk.eigvals[0]
        return np.maximum((pk.U[0] * np.exp(lam * t)[None]) @ pk.V[0], 0.0)

    root = tree._default_root()

    def partial(v, parent):
        if tree.is_leaf(v):
            return np.log(np.maximum(pk.tip_table[codes[v]], 1e-300))
        out = np.zeros((P, S))
        for u in tree.adj[v]:
            if u == parent:
                continue
            lc = partial(u, v)
            mx = lc.max(axis=1, keepdims=True)
            m = np.exp(lc - mx) @ pmat(tree.get_blen(u, v)).T
            out += np.log(np.maximum(m, 1e-300)) + mx
        return out

    import sys
    sys.setrecursionlimit(10000)
    lp = partial(root, -1)
    mx = lp.max(axis=1)
    site = (np.exp(lp - mx[:, None]) @ pk.root_freqs[0])
    return float((aln.pattern_weights * (np.log(site) + mx)).sum())


# ----------------------------------------------------------- golden parity
@pytest.fixture(scope="module")
def example_aln():
    return read_alignment(GOLDEN / "example.phy", seqtype="DNA")


@pytest.fixture(scope="module")
def ref_tree(example_aln):
    nwk = (GOLDEN / "ref_tree.nwk").read_text()
    return Tree.from_newick(nwk, example_aln.names)


@pytest.fixture(scope="module")
def golden():
    return json.loads((GOLDEN / "golden.json").read_text())


def test_golden_jc(example_aln, ref_tree, golden):
    model = make_dna_model("JC")
    eng = LikelihoodEngine(example_aln, model, RateModel(),
                           dtype=jnp.float64)
    got = eng.loglik_tree(ref_tree)
    assert got == pytest.approx(golden["logL"]["g1_jc_fix"], abs=2e-3)


def test_golden_gtr_g(example_aln, ref_tree, golden):
    model = make_dna_model(
        "GTR", freqs=np.array([0.35, 0.18, 0.22, 0.25]), freq_type="user",
        rate_params=np.array([1.5, 4.0, 1.2, 0.8, 5.0]))
    rates = RateGamma(4, alpha=0.6)
    eng = LikelihoodEngine(example_aln, model, rates, dtype=jnp.float64)
    got = eng.loglik_tree(ref_tree)
    assert got == pytest.approx(golden["logL"]["g2_gtrg_fix"], abs=2e-3)


def test_golden_hky_i(example_aln, ref_tree, golden):
    model = make_dna_model(
        "HKY", freqs=np.array([0.3, 0.2, 0.2, 0.3]), freq_type="user",
        rate_params=np.array([3.0]))
    rates = RateInvar(0.2)
    eng = LikelihoodEngine(example_aln, model, rates, dtype=jnp.float64)
    got = eng.loglik_tree(ref_tree)
    assert got == pytest.approx(golden["logL"]["g3_hkyi_fix"], abs=2e-3)


def test_golden_hky_r3(example_aln, ref_tree, golden):
    model = make_dna_model(
        "HKY", freqs=np.array([0.3, 0.2, 0.2, 0.3]), freq_type="user",
        rate_params=np.array([2.5]))
    rates = RateFree(3, rates=np.array([0.3, 0.5, 2.0]),
                     weights=np.array([0.2, 0.3, 0.5]))
    eng = LikelihoodEngine(example_aln, model, rates, dtype=jnp.float64)
    got = eng.loglik_tree(ref_tree)
    assert got == pytest.approx(golden["logL"]["g6_r3_fix"], abs=2e-3)


def test_branch_opt_improves(example_aln, ref_tree):
    model = make_dna_model("JC")
    eng = LikelihoodEngine(example_aln, model, RateModel(),
                           dtype=jnp.float64)
    t = ref_tree.copy()
    l0 = eng.loglik_tree(t)
    l1 = eng.optimize_branches(t, n_rounds=10)
    assert l1 >= l0 - 1e-6
    # re-evaluating with written-back branch lengths agrees
    l2 = eng.loglik_tree(t)
    assert l2 == pytest.approx(l1, abs=1e-6)
