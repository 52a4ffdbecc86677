"""TBE supports, symmetry tests, and PD analysis."""
import numpy as np

from tests.test_pallas2 import _setup
from iqtree2_tpu.tree.topology import Tree
from iqtree2_tpu.tbe import tbe_supports, transfer_distances, _split_matrix
from iqtree2_tpu.symtest import divergence_matrix, pair_symtest, run_symtest
from iqtree2_tpu.pd import greedy_pd, pd_score


def test_tbe_identical_trees_full_support():
    rng = np.random.default_rng(0)
    names = [f"t{i}" for i in range(10)]
    t = Tree.random_topology(names, rng)
    sup = tbe_supports(t, [t.to_newick()] * 5, names)
    assert sup and all(abs(v - 100.0) < 1e-9 for v in sup.values())


def test_tbe_between_zero_and_one_and_beats_classic():
    rng = np.random.default_rng(4)
    names = [f"t{i}" for i in range(12)]
    t = Tree.random_topology(names, rng)
    boots = []
    for i in range(10):
        b = t.copy()
        from iqtree2_tpu.search.perturb import random_nnis
        random_nnis(b, rng, 0.3)
        boots.append(b.to_newick())
    sup = tbe_supports(t, boots, names)
    assert all(0.0 <= v <= 100.0 for v in sup.values())
    # classic support counts exact split matches; TBE >= classic by def
    from collections import Counter
    cnt = Counter()
    for nwk in boots:
        for s in Tree.from_newick(nwk, names).splits().keys():
            cnt[s] += 1
    for s, e in t.splits().items():
        classic = 100.0 * cnt.get(s, 0) / len(boots)
        assert sup[Tree._key(*e)] >= classic - 1e-9


def test_symtest_symmetric_data_accepts():
    # perfectly symmetric divergence matrix => Bowker statistic 0, p = 1
    N = np.array([[50, 5, 3, 2], [5, 40, 4, 1],
                  [3, 4, 60, 6], [2, 1, 6, 30]], dtype=float)
    r = pair_symtest(N)
    assert r.bowker == 0.0 and r.p_bowker == 1.0
    # asymmetric matrix rejects
    N2 = N.copy()
    N2[0, 1] = 40.0
    r2 = pair_symtest(N2)
    assert r2.bowker > 10 and r2.p_bowker < 0.01


def test_symtest_runs_on_alignment():
    eng, _ = _setup(6, npat=64, seed=3)
    r = run_symtest(eng.aln)
    assert np.isfinite(r.bowker) and 0.0 <= r.p_bowker <= 1.0


def test_greedy_pd_matches_bruteforce():
    import itertools
    rng = np.random.default_rng(8)
    names = [f"t{i}" for i in range(7)]
    t = Tree.random_topology(names, rng)
    for (a, b) in list(t.blen):
        t.set_blen(a, b, float(rng.uniform(0.05, 1.0)))
    for k in (2, 3, 4):
        taxa, pd, _ = greedy_pd(t, k)
        best = max(pd_score(t, list(c))
                   for c in itertools.combinations(range(7), k))
        assert abs(pd - best) < 1e-9, (k, pd, best)
