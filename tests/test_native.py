"""Native C++ runtime parity (native/iqtree2_native.cpp via ctypes)."""
import numpy as np
import pytest

from iqtree2_tpu import native
from tests.test_pallas2 import _setup
from iqtree2_tpu.tree.topology import Tree
from iqtree2_tpu.tree.schedule import build_schedule

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_compress_patterns_parity():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(9, 400)).astype(np.int32)
    pats, w, s2p = native.compress_patterns(codes)
    # reconstruction invariants
    assert w.sum() == 400
    assert (pats[s2p].T == codes).all()
    # same number of unique patterns as numpy
    n_np = np.unique(codes.T, axis=0).shape[0]
    assert pats.shape[0] == n_np


def test_fitch_parity():
    import os
    from iqtree2_tpu.ops import pars
    eng, _ = _setup(10, npat=64, seed=4)
    masks = pars.state_bitmasks(eng.aln)
    w = eng.aln.pattern_weights
    rng = np.random.default_rng(2)
    for seed in range(5):
        t = Tree.random_topology(eng.aln.names,
                                 np.random.default_rng(seed))
        got = pars.fitch_score(t, masks, w)
        os.environ["IQTREE2_TPU_DISABLE_NATIVE"] = "1"
        try:
            # force the pure-python branch by reimport-free flag check:
            # the python path runs when native.available() is False, so
            # compute it directly here
            root = t._default_root()
            cost = np.zeros(masks.shape[1])
            sets = {}
            for v, p in t.postorder(root):
                if t.is_leaf(v):
                    sets[v] = masks[v]
                    continue
                kids = [u for u in t.adj[v] if u != p]
                acc = sets[kids[0]]
                for u in kids[1:]:
                    acc, extra = pars.fitch_combine(acc, sets[u])
                    cost += extra
                sets[v] = acc
            want = float((cost * w).sum())
        finally:
            del os.environ["IQTREE2_TPU_DISABLE_NATIVE"]
        assert got == want


def test_plan_stream_parity():
    import os
    from iqtree2_tpu.tree import plan2
    for ntaxa in (8, 33, 64):
        t = Tree.random_topology([f"t{i}" for i in range(ntaxa)],
                                 np.random.default_rng(ntaxa))
        sched = build_schedule(t)
        p_nat = plan2.build_stream_plan(sched, S=4, C=4)
        os.environ["IQTREE2_TPU_DISABLE_NATIVE"] = "1"
        try:
            import iqtree2_tpu.native as n2
            n2._tried, n2._lib = False, None   # reset cache
            p_py = plan2.build_stream_plan(sched, S=4, C=4)
        finally:
            del os.environ["IQTREE2_TPU_DISABLE_NATIVE"]
            n2._tried, n2._lib = False, None
        for field in ("src_blk", "edge", "is_int", "tip", "dst_row",
                      "dst_sc", "valid", "node_of", "node_step",
                      "node_slot"):
            np.testing.assert_array_equal(
                getattr(p_nat, field), getattr(p_py, field), err_msg=field)
        assert p_nat.ring_blocks == p_py.ring_blocks
        assert p_nat.n_steps == p_py.n_steps
