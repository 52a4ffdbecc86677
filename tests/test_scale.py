"""Large-tree smoke tests: the engine must handle >=500 taxa without OOM
(verdict r1 item 7; reference: memory-saving mode, tree/memslot.h:44 —
ours is the v2 streaming kernel plus recompute-based up pass)."""
import numpy as np
import jax.numpy as jnp

from tests.test_pallas2 import _setup
from iqtree2_tpu.tree.schedule import build_schedule


def test_560_taxa_loglik_and_blen_opt():
    eng, tree = _setup(560, npat=128, seed=42)
    logL = eng.loglik_tree(tree)
    assert np.isfinite(logL) and logL < 0
    t = tree.copy()
    l2 = eng.optimize_branches(t, n_rounds=2)
    assert l2 >= logL - 1e-3

    # deep-tree scaling: many rescale events must accumulate correctly
    sched = build_schedule(tree)
    for (a, b) in list(t.blen):
        t.set_blen(a, b, 1.2)         # long branches -> heavy underflow
    l3 = eng.loglik_tree(t)
    assert np.isfinite(l3)


def test_500_taxa_stream_plan_properties():
    from iqtree2_tpu.tree.plan2 import build_stream_plan, plan_up
    eng, tree = _setup(500, npat=128, seed=11)
    sched = build_schedule(tree)
    plan = build_stream_plan(sched, S=4, C=4)
    # every node scheduled exactly once, children before parents
    assert (plan.valid.sum() == sched.n_int)
    order = np.full(sched.n_int, -1)
    for s in range(plan.n_steps_real):
        for g in range(plan.G):
            i = plan.node_of[s, g]
            if i < sched.n_int:
                order[i] = s
    assert (order >= 0).all()
    L = sched.ntaxa
    for i in range(sched.n_int):
        for k in range(2):
            cs = sched.child_src[i, k]
            if cs >= L:
                assert order[cs - L] < order[i]
    # ring stays small relative to the tree (the whole point)
    assert plan.ring_blocks * plan.G < sched.n_int
    plan_up(plan)
    assert plan.up_ring_blocks * plan.G < sched.n_int
