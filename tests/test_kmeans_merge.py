"""k-means PartitionFinder merge mode (--merge kmeans).

Reference: doKmeansClustering (main/phylotesting.cpp:1793-1890), selected
by MERGE_KMEANS (:2114): partitions are clustered by their per-partition
ML tree length; every cluster count is scored and the best total
criterion wins.
"""

import numpy as np

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.data.superalignment import build_superalignment
from iqtree2_tpu.params import Params
from iqtree2_tpu.partition_analysis import _kmeans_1d, \
    select_partition_models
from iqtree2_tpu.simulator import simulate_alignment, write_phylip_seqs
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.tree.topology import Tree


def test_kmeans_1d_exact():
    x = np.array([0.1, 0.12, 0.11, 5.0, 5.2, 9.9])
    w = np.ones(6)
    g = _kmeans_1d(x, w, 3)
    assert sorted(map(sorted, g)) == [[0, 1, 2], [3, 4], [5]]
    # weighted: a heavy point forms its own cluster
    g2 = _kmeans_1d(np.array([0.0, 1.0, 1.1]), np.array([100.0, 1, 1]), 2)
    assert sorted(map(sorted, g2)) == [[0], [1, 2]]
    # k=1 returns everything
    assert _kmeans_1d(x, w, 1) == [[0, 1, 2, 3, 4, 5]]


def test_mset_mrate_restrict_candidates():
    """-mset/-mrate restrict the ModelFinder grid (reference:
    params.model_set / ratehet_set)."""
    from iqtree2_tpu.modelfinder import run_modelfinder
    rng = np.random.default_rng(1)
    chars = np.array(list("ACGT"))
    seqs = ["".join(chars[rng.integers(0, 4, 80)]) for _ in range(5)]
    aln = Alignment.from_sequences([f"x{i}" for i in range(5)], seqs,
                                   seqtype="DNA")
    params = Params(aln_file="", model="TESTONLY", mset="JC,K2P",
                    mrate="E,G", model_eps=0.5)
    res = run_modelfinder(aln, params, log=lambda *a: None)
    names = {e["name"] for e in res["table"]}
    assert names <= {"JC", "JC+G", "K2P", "K2P+G"}
    assert len(names) == 4


def test_kmeans_merge_joins_similar_partitions():
    """Two partitions simulated at the same rate and one at 4x: kmeans
    merging should not cross the rate classes (the slow pair may merge;
    the fast partition must stay apart from them)."""
    rng = np.random.default_rng(7)
    names = [f"s{i}" for i in range(8)]
    tree = Tree.random_topology(names, rng)
    for k in tree.blen:
        tree.blen[k] = rng.uniform(0.05, 0.15)
    fast = tree.copy()
    for k in fast.blen:
        fast.blen[k] = fast.blen[k] * 4.0

    m, r, _ = build_model("JC", Alignment.from_sequences(
        names, ["A" * 8] * 8, seqtype="DNA"))
    parts = []
    for i, t in enumerate([tree, tree, fast]):
        seqs = simulate_alignment(t, m, r, 300, rng)
        p = Alignment.from_sequences(names, [seqs[n] for n in names],
                                     seqtype="DNA", name=f"p{i}")
        parts.append(p)
    sa = build_superalignment(parts)
    sa.part_names = [p.name for p in parts]

    params = Params(aln_file="", model="TESTONLY",
                    merge_algorithm="kmeans", no_checkpoint=True,
                    model_eps=0.5, mset="JC,HKY", mrate="E,G")
    sel = select_partition_models(sa, params, log=lambda *a: None,
                                  merge=True)
    groups = sel["aln"].part_names
    # p2 (the 4x partition) is never merged with p0/p1
    for g in groups:
        if "p2" in g:
            assert "p0" not in g and "p1" not in g
