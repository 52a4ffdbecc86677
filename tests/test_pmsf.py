"""PMSF / site-specific-frequency engine tests.

1. The SSF engine with all sites sharing ONE frequency vector must equal
   the standard engine with those frequencies (same model).
2. The PMSF two-pass on a protein mixture runs end-to-end and improves
   (or matches) the guide fit of the base model.
"""
import numpy as np
import jax.numpy as jnp

from iqtree2_tpu.data import seqtypes
from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.pmsf import SSFEngine, run_pmsf, \
    site_frequency_profile
from iqtree2_tpu.model.rates import RateGamma
from iqtree2_tpu.tree.topology import Tree


def _protein_problem(ntaxa=8, npat=60, seed=4):
    rng = np.random.default_rng(seed)
    st = seqtypes.protein_type()
    pat = rng.integers(0, 20, size=(npat, ntaxa))
    codes = np.asarray(pat, dtype=np.int64)
    aln = Alignment(names=[f"t{i}" for i in range(ntaxa)], seqtype=st,
                    patterns=codes, pattern_weights=np.ones(npat),
                    site_to_pattern=np.arange(npat, dtype=np.int32))
    tree = Tree.random_topology(aln.names, rng)
    return aln, tree


def test_ssf_uniform_matches_standard():
    from iqtree2_tpu.model.protein import make_protein_model
    aln, tree = _protein_problem()
    model = make_protein_model("LG")
    rates = RateGamma(4, alpha=0.8)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float64)
    ref = eng.loglik_tree(tree)

    eig = model.get_eigensystem()
    from iqtree2_tpu.model.protein import _load
    exch = np.asarray(_load()["LG_rates"], dtype=np.float64)
    sf = np.tile(eig.freqs[0], (aln.num_patterns, 1))
    ssfe = SSFEngine(aln, exch, sf, RateGamma(4, alpha=0.8),
                     dtype=jnp.float64, min_freq=0.0)
    got = ssfe.loglik_tree(tree)
    assert abs(got - ref) < 1e-6 * max(1.0, abs(ref))


def test_pmsf_two_pass_runs():
    from iqtree2_tpu.model.factory import build_model
    aln, tree = _protein_problem(ntaxa=7, npat=40, seed=9)
    mix, rates, _ = build_model("LG+C10+G4", aln)
    eng = LikelihoodEngine(aln, mix, rates, dtype=jnp.float64)
    logL_mix = eng.optimize_branches(tree, n_rounds=4)

    prof = site_frequency_profile(eng, tree)
    assert prof.shape == (aln.num_patterns, 20)
    np.testing.assert_allclose(prof.sum(1), 1.0, atol=1e-6)

    eng2, t2, logL2, _ = run_pmsf(aln, eng, tree, log=lambda s: None,
                                  blen_rounds=4, dtype=jnp.float64)
    assert np.isfinite(logL2)
    # the site-specific profile model fits at least as well as the mixture
    # it approximates (it has per-site frequencies)
    assert logL2 >= logL_mix - 1.0
