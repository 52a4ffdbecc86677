"""MPI-style AliSim replicate splitting (--alisim-nprocs/--alisim-rank).

Reference: AliSim's MPI mode splits --num-alignments replicates across
ranks. Property: per-replicate RNG streams make the union of all ranks'
outputs byte-identical to the single-process run.
"""

import numpy as np

from iqtree2_tpu.params import Params
from iqtree2_tpu.simulator import run_alisim
from iqtree2_tpu.tree.topology import Tree


def _tree_file(tmp_path):
    rng = np.random.default_rng(0)
    t = Tree.random_topology([f"s{i}" for i in range(6)], rng)
    f = tmp_path / "t.nwk"
    f.write_text(t.to_newick() + "\n")
    return str(f)


def test_split_union_matches_single_process(tmp_path):
    tf = _tree_file(tmp_path)
    base = dict(user_tree=tf, model="HKY", sim_length=120,
                sim_num_alignments=4, seed=7, aln_file="")
    single = Params(alisim=str(tmp_path / "one"), **base)
    outs = run_alisim(single)
    assert len(outs) == 4
    want = {o: open(o).read() for o in outs}

    got = {}
    for rank in range(2):
        p = Params(alisim=str(tmp_path / "one"), sim_nprocs=2,
                   sim_rank=rank, **base)
        for o in run_alisim(p):
            got[o] = open(o).read()
    assert sorted(got) == sorted(outs)
    assert got == want


def test_bad_rank_rejected(tmp_path):
    import pytest
    tf = _tree_file(tmp_path)
    p = Params(alisim=str(tmp_path / "x"), user_tree=tf, model="JC",
               sim_length=50, sim_nprocs=2, sim_rank=2)
    with pytest.raises(SystemExit):
        run_alisim(p)
