"""Partitioned supermatrix: SuperAlignment + PartitionEngine.

Oracle strategy: partition linkage modes have exact internal consistency
properties (SURVEY §4 "property tests"): a 2-partition supermatrix of the
same alignment under edge-equal linkage with identical models must equal the
unpartitioned logL; sum of per-partition logLs must equal the total; the
unlinked mode must dominate proportional, which dominates equal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.data.superalignment import (build_superalignment,
                                             read_partition_spec)
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.partition.engine import PartitionEngine
from iqtree2_tpu.tree.topology import Tree

GOLDEN = "tests/golden"


def _toy_aln(ntaxa=8, nsites=120, seed=3):
    rng = np.random.default_rng(seed)
    chars = np.array(list("ACGT"))
    mat = rng.integers(0, 4, size=(ntaxa, nsites))
    seqs = ["".join(chars[r]) for r in mat]
    return Alignment.from_sequences([f"t{i}" for i in range(ntaxa)], seqs,
                                    seqtype="DNA")


def test_split_supermatrix_matches_unpartitioned():
    aln = _toy_aln()
    rng = np.random.default_rng(0)
    tree = Tree.random_topology(aln.names, rng)

    # single-alignment engine
    m, r, _ = build_model("HKY{2.0}+F{0.3,0.2,0.2,0.3}", aln)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64)
    logL_full = eng.loglik_tree(tree)

    # split into two partitions with the same fixed model, edge-equal
    half = aln.nsites // 2
    p1 = aln.subset_sites(np.arange(half))
    p2 = aln.subset_sites(np.arange(half, aln.nsites))
    p1.name, p2.name = "first", "second"
    sa = build_superalignment([p1, p2])
    models, rates = [], []
    for p in sa.partitions:
        mo, ra, _ = build_model("HKY{2.0}+F{0.3,0.2,0.2,0.3}", p)
        models.append(mo)
        rates.append(ra)
    peng = PartitionEngine(sa, models, rates, partition_type="edge-equal",
                           dtype=jnp.float64)
    logL_part = peng.loglik_tree(tree)
    assert abs(logL_full - logL_part) < 1e-6, (logL_full, logL_part)


def test_missing_taxon_neutral():
    """A partition missing a taxon (all-unknown row) must match the
    likelihood of the pruned sub-alignment computed by the reference rule."""
    aln = _toy_aln(ntaxa=6, nsites=60, seed=5)
    rng = np.random.default_rng(1)
    tree = Tree.random_topology(aln.names, rng)
    m, r, _ = build_model("JC", aln)
    eng = LikelihoodEngine(aln, m, r, dtype=jnp.float64)
    base = eng.loglik_tree(tree)

    # same alignment, but taxon t5's row replaced by all-unknown
    mat = aln.expand_to_sites().copy()
    mat[:, 5] = aln.seqtype.unknown_code
    aln2 = Alignment(names=aln.names, seqtype=aln.seqtype,
                     patterns=mat, pattern_weights=np.ones(aln.nsites),
                     site_to_pattern=np.arange(aln.nsites, dtype=np.int32))
    m2, r2, _ = build_model("JC", aln2)
    eng2 = LikelihoodEngine(aln2, m2, r2, dtype=jnp.float64)
    with_unknown = eng2.loglik_tree(tree)

    # oracle: the 5-taxon restriction of the tree/alignment
    sub = aln.subset_taxa(list(range(5)))
    # build the induced 5-taxon tree by removing leaf 5
    t2 = tree.copy()
    nb = t2.adj[5][0]
    t2.remove_edge(5, nb)
    t2.suppress_degree_two(nb)
    sub_tree = Tree.from_newick(t2.to_newick(), sub.names)
    m3, r3, _ = build_model("JC", sub)
    eng3 = LikelihoodEngine(sub, m3, r3, dtype=jnp.float64)
    pruned = eng3.loglik_tree(sub_tree)
    assert abs(with_unknown - pruned) < 1e-6, (with_unknown, pruned)
    assert with_unknown > base  # fewer constraints -> higher logL


def test_read_partition_nexus_and_modes():
    sa = read_partition_spec(f"{GOLDEN}/example.nex", f"{GOLDEN}/example.phy")
    assert sa.n_partitions == 3
    assert [p.nsites for p in sa.partitions] == [666, 333, 999]
    assert sa.part_models == ["HKY", "GTR+G", "GTR+G"]
    tree = Tree.from_newick(open(f"{GOLDEN}/ref_tree.nwk").read(), sa.names)

    logs = {}
    for ptype in ("edge-equal", "edge-proportional", "unlinked"):
        models, rates = [], []
        for p, ms in zip(sa.partitions, sa.part_models):
            mo, ra, _ = build_model(ms, p)
            models.append(mo)
            rates.append(ra)
        peng = PartitionEngine(sa, models, rates, partition_type=ptype,
                               dtype=jnp.float64)
        t = tree.copy()
        logs[ptype] = peng.optimize_branches(t, n_rounds=6)
    # more linkage freedom -> higher logL
    assert logs["unlinked"] >= logs["edge-proportional"] - 0.5
    # proportional with rates=1 equals equal-linkage exactly at this stage;
    # after rate optimization it must dominate
    models, rates = [], []
    for p, ms in zip(sa.partitions, sa.part_models):
        mo, ra, _ = build_model(ms, p)
        models.append(mo)
        rates.append(ra)
    peng = PartitionEngine(sa, models, rates,
                           partition_type="edge-proportional",
                           dtype=jnp.float64)
    t = tree.copy()
    peng.optimize_branches(t, n_rounds=6)
    lp = peng.optimize_part_rates(t)
    assert lp >= logs["edge-equal"] - 1e-3
    assert peng.part_rates.argmax() == 2  # 3rd codon positions fastest


def test_partition_nni_eval_consistent():
    """Joint NNI scoring baseline equals the sum of partition logLs."""
    sa = read_partition_spec(f"{GOLDEN}/example.nex", f"{GOLDEN}/example.phy")
    tree = Tree.from_newick(open(f"{GOLDEN}/ref_tree.nwk").read(), sa.names)
    models, rates = [], []
    for p, ms in zip(sa.partitions, sa.part_models):
        mo, ra, _ = build_model(ms, p)
        models.append(mo)
        rates.append(ra)
    peng = PartitionEngine(sa, models, rates, partition_type="edge-equal",
                           dtype=jnp.float64)
    logL = peng.optimize_branches(tree, n_rounds=6)

    from iqtree2_tpu.ops.nni import build_nni_candidates
    from iqtree2_tpu.tree.schedule import build_schedule
    sched = build_schedule(tree)
    cand = build_nni_candidates(tree, sched)
    cand_arrays = tuple(jnp.asarray(x) for x in
                        (cand.iu, cand.iv, cand.slot_c, cand.edge_id))
    logl, t_opt = peng.evaluate_nni_batch(sched, cand_arrays)
    # baseline column re-optimizes the central branch, so >= logL - eps
    assert (logl[:, 2] >= logL - 1e-4).all()
    # after full branch opt no NNI should improve much on a decent tree
    assert np.isfinite(logl).all() and np.isfinite(t_opt).all()


def test_genewise_bootstrap_specs():
    """GENE/GENESITE resampling (reference alignment.cpp:3709-3732):
    whole-partition resampling with the right block structure."""
    from iqtree2_tpu.data.superalignment import read_partition_spec
    sa = read_partition_spec(f"{GOLDEN}/example.nex",
                             f"{GOLDEN}/example.phy")
    rng = np.random.default_rng(5)
    offs = sa.pattern_offsets()
    W = sa.bootstrap_pattern_weights(rng, nrep=6, spec="GENE")
    K = sa.n_partitions
    for r in range(6):
        mults = []
        for k in range(K):
            blk = W[r, offs[k]:offs[k + 1]]
            orig = sa.partitions[k].pattern_weights
            if blk.sum() == 0:
                mults.append(0)
                continue
            m = blk.sum() / orig.sum()
            assert m == int(m)
            np.testing.assert_allclose(blk, m * orig)
            mults.append(int(m))
        assert sum(mults) == K          # exactly K gene draws
    W2 = sa.bootstrap_pattern_weights(rng, nrep=4, spec="GENESITE")
    for r in range(4):
        # every drawn gene contributes exactly its site count
        tot = 0
        for k in range(K):
            blk = W2[r, offs[k]:offs[k + 1]]
            n_k = sa.partitions[k].nsites
            assert blk.sum() % n_k == 0
            tot += blk.sum() // n_k
        assert tot == K
    with pytest.raises(ValueError):
        sa.bootstrap_pattern_weights(rng, spec="BOGUS")


def test_topology_unlinked_analysis(tmp_path):
    """-S: one independent tree per locus (PhyloSuperTreeUnlinked analog).
    Fixed-topology per-locus fits must sum to the reported total."""
    import dataclasses
    from iqtree2_tpu.params import Params
    from iqtree2_tpu.partition_analysis import \
        run_unlinked_topology_analysis
    pr = Params()
    pr.aln_file = f"{GOLDEN}/example.phy"
    pr.partition_file = f"{GOLDEN}/example.nex"
    pr.user_tree = f"{GOLDEN}/ref_tree.nwk"
    pr.model = "HKY"
    pr.out_prefix = str(tmp_path / "unlinked")
    pr.verbose = 0
    pr.no_checkpoint = True
    res = run_unlinked_topology_analysis(pr)
    assert len(res["trees"]) == 3
    assert res["logL"] == pytest.approx(
        sum(r["logL"] for r in res["table"]))
    tf = (tmp_path / "unlinked.treefile").read_text().strip().splitlines()
    assert len(tf) == 3
    assert (tmp_path / "unlinked.partlh").exists()
