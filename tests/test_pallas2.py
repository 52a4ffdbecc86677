"""Correctness of the v2 streaming Pallas kernel (interpret mode on CPU).

Compares sitelp_v2 (and its export variant) against the XLA level-batched
reference path on random topologies of several sizes, float32.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqtree2_tpu.data import seqtypes
from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.dna import make_dna_model
from iqtree2_tpu.model.rates import RateGamma
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.ops import pallas_pruning2 as pp2
from iqtree2_tpu.tree.plan2 import build_stream_plan, pick_tile, slot_pitch
from iqtree2_tpu.tree.schedule import build_schedule
from iqtree2_tpu.tree.topology import Tree


def _setup(ntaxa, npat, seed=0, ncat=4):
    rng = np.random.default_rng(seed)
    st = seqtypes.dna_type()
    pat = rng.integers(0, 4, size=(npat, ntaxa)).astype(np.int32)
    codes = seqtypes.DNA_STATE_TO_CODE[pat]
    aln = Alignment(names=[f"t{i}" for i in range(ntaxa)], seqtype=st,
                    patterns=codes, pattern_weights=np.ones(npat),
                    site_to_pattern=np.arange(npat, dtype=np.int32))
    model = make_dna_model("GTR", freqs=np.array([0.3, 0.2, 0.2, 0.3]),
                           freq_type="user",
                           rate_params=np.array([1.5, 4.0, 1.2, 0.8, 5.0]))
    rates = RateGamma(ncat, alpha=0.6)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    tree = Tree.random_topology(aln.names, rng)
    return eng, tree




@pytest.fixture(params=["f32", "x3"], autouse=True)
def mm_mode(request):
    """Run every kernel parity test in both full-f32 and bf16x3 modes.

    f32 must match the XLA oracle to f32 roundoff; x3 (the production
    default, see ops/prec.py) to its ~2^-17-per-op error bound."""
    import os
    from iqtree2_tpu.ops import prec
    prec.set_precision({"f32": "highest", "x3": "high"}[request.param])
    yield request.param
    prec.set_precision(os.environ.get("IQTREE2_TPU_MM_PRECISION", "high"))


def _tol(mode, base=2e-5, x3=1e-3):
    return base if mode == "f32" else x3


@pytest.mark.parametrize("ntaxa", [8, 33, 80])
def test_sitelp_v2_matches_xla(ntaxa, mm_mode):
    eng, tree = _setup(ntaxa, npat=256, seed=ntaxa)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP

    P = pruning.transition_tensors(blens, pack)
    dp = pruning._down_pass_xla(P, tipP, sa)
    Broot, SCroot = pruning.root_partial(dp, P, tipP, sched.n_int)
    _, lp_ref = pruning.root_loglik(
        Broot, SCroot, pack["root_freqs"], pack["cat_weight"],
        pack["log_ptn_invar"], eng._dev_pw)

    C = int(pack["cat_rate"].shape[0])
    S = tipP.shape[1]
    plan = build_stream_plan(sched, S=S, C=C)
    pt = pick_tile(plan, eng.Pp)
    assert pt is not None
    ms, sl = plan.scalar_arrays()
    pa = dict(p2_meta_step=jnp.asarray(ms), p2_meta_slot=jnp.asarray(sl),
              p2_edge=jnp.asarray(plan.edge), p2_int=jnp.asarray(plan.is_int),
              p2_tip=jnp.asarray(plan.tip))
    wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)
    lp2 = pp2.sitelp_v2(P, tipP, pa, wf, pack["log_ptn_invar"],
                        CSP=slot_pitch(C * S), ring_blocks=plan.ring_blocks,
                        pt=pt, interpret=True)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp_ref),
                               rtol=_tol(mm_mode), atol=_tol(mm_mode))


def test_export_v2_matches_down_pass(mm_mode):
    eng, tree = _setup(24, npat=128, seed=5)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    P = pruning.transition_tensors(blens, pack)
    dp = pruning._down_pass_xla(P, tipP, sa)

    C = int(pack["cat_rate"].shape[0])
    S = tipP.shape[1]
    plan = build_stream_plan(sched, S=S, C=C)
    pt = pick_tile(plan, eng.Pp, export=True)
    ms, sl = plan.scalar_arrays()
    pa = dict(p2_meta_step=jnp.asarray(ms), p2_meta_slot=jnp.asarray(sl),
              p2_edge=jnp.asarray(plan.edge), p2_int=jnp.asarray(plan.is_int),
              p2_tip=jnp.asarray(plan.tip))
    wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)
    lp2, parts, scs, rhsA, rhsB, scA, scB = pp2.sitelp_v2(
        P, tipP, pa, wf, pack["log_ptn_invar"], CSP=slot_pitch(C * S),
        ring_blocks=plan.ring_blocks, pt=pt, export=True, interpret=True)
    parts = np.asarray(parts)   # [n_steps, R, Pp]
    scs = np.asarray(scs)       # [n_steps, G, Pp]
    L = tipP.shape[0]
    CS = C * S
    ref_all = np.asarray(dp.all)      # [L+n_int, C, S, Pp]
    ref_sc = np.asarray(dp.scale)
    for i in range(sched.n_int):
        s_, g_ = int(plan.node_step[i]), int(plan.node_slot[i])
        got = parts[s_, g_ * plan.CSP: g_ * plan.CSP + CS].reshape(
            C, S, -1)
        np.testing.assert_allclose(got, ref_all[L + i],
                                   rtol=_tol(mm_mode), atol=1e-30)
        np.testing.assert_allclose(scs[s_, g_], ref_sc[L + i], atol=0)


def test_passes_v2_matches_xla(mm_mode):
    """Full streaming down+up (export + up kernels + reassembly) must
    reproduce the XLA DownPass/UpPass buffers (interpret mode)."""
    from iqtree2_tpu.tree.plan2 import (build_stream_plan, edge_maps,
                                        pick_tile_export, pick_tile_up,
                                        up_scalar_arrays)
    eng, tree = _setup(20, npat=128, seed=9)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP

    P = pruning.transition_tensors(blens, pack)
    dp_ref = pruning._down_pass_xla(P, tipP, sa)
    up_ref = pruning._up_pass_xla(P, dp_ref, tipP, sa,
                                  pack["root_freqs"])

    C = int(pack["cat_rate"].shape[0])
    S = tipP.shape[1]
    plan = build_stream_plan(sched, S=S, C=C)
    pte = pick_tile_export(plan, eng.Pp)
    ptu = pick_tile_up(plan, eng.Pp)
    assert pte and ptu
    ms, sl = plan.scalar_arrays()
    ms_u, sl_u = up_scalar_arrays(plan)
    e_step, e_side, e_slot, *_ = edge_maps(plan, sched)
    pa = dict(p2_meta_step=jnp.asarray(ms), p2_meta_slot=jnp.asarray(sl),
              p2_edge=jnp.asarray(plan.edge),
              p2_int=jnp.asarray(plan.is_int),
              p2_tip=jnp.asarray(plan.tip),
              p2u_meta_step=jnp.asarray(ms_u),
              p2u_meta_slot=jnp.asarray(sl_u),
              p2_node_step=jnp.asarray(plan.node_step),
              p2_node_slot=jnp.asarray(plan.node_slot),
              p2_e_step=jnp.asarray(e_step),
              p2_e_side=jnp.asarray(e_side),
              p2_e_slot=jnp.asarray(e_slot),
              p2u_root_step=jnp.asarray(int(plan.node_step[sched.n_int - 1])),
              p2u_root_slot=jnp.asarray(int(plan.node_slot[sched.n_int - 1])))
    from iqtree2_tpu.tree.plan2 import slot_pitch
    dp2, up2 = pp2.passes_v2(P, tipP, pa, pack["root_freqs"],
                             CSP=slot_pitch(C * S),
                             ring_blocks=plan.ring_blocks,
                             up_ring_blocks=plan.up_ring_blocks,
                             pt=pte, ptu=ptu, interpret=True)

    # effective values (partial * 2^{30 sc}) must agree even if rescale
    # event counts differ between backends
    def _cmp_eff(a, asc, b, bsc):
        # stored = true * 2^{30 sc}  ->  true = stored * 2^{-30 sc}
        ae = np.asarray(a, np.float64) * np.exp2(
            -30.0 * np.asarray(asc, np.float64))[:, None, None, :]
        be = np.asarray(b, np.float64) * np.exp2(
            -30.0 * np.asarray(bsc, np.float64))[:, None, None, :]
        if mm_mode == "f32":
            np.testing.assert_allclose(ae, be, rtol=3e-5, atol=1e-30)
            return
        # x3: per-(node, pattern)-block relative criterion — elements far
        # below their [C, S] block max carry x3 absolute noise (their
        # relative error is unbounded but numerically irrelevant: every
        # consumer contracts them together with O(block max) elements)
        bm = be.max(axis=(1, 2), keepdims=True)
        assert (np.abs(ae - be) <= 1e-2 * bm + 1e-30).all()

    _cmp_eff(dp2.all, dp2.scale, dp_ref.all, dp_ref.scale)
    _cmp_eff(up2.edge_E, up2.edge_E_scale, up_ref.edge_E,
             up_ref.edge_E_scale)
    _cmp_eff(up2.up_in, up2.up_scale, up_ref.up_in, up_ref.up_scale)


def test_thetas_v2_matches_edge_thetas(mm_mode):
    """Fused theta-mode up kernel must reproduce edge_thetas over the XLA
    passes (interpret mode), and the packed Newton must agree with the
    per-edge vmapped Newton."""
    from iqtree2_tpu.tree.plan2 import (build_stream_plan, edge_maps,
                                        pick_tile_export, pick_tile_up,
                                        slot_pitch, up_scalar_arrays)
    eng, tree = _setup(20, npat=128, seed=13)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(np.maximum(sched.blens, 1e-6), jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP

    P = pruning.transition_tensors(blens, pack)
    dp_ref = pruning._down_pass_xla(P, tipP, sa)
    up_ref = pruning._up_pass_xla(P, dp_ref, tipP, sa, pack["root_freqs"])
    th_ref = pruning.edge_thetas(up_ref, dp_ref, sa["edge_src"], pack)

    C = int(pack["cat_rate"].shape[0])
    S = tipP.shape[1]
    CS = C * S
    plan = build_stream_plan(sched, S=S, C=C)
    pte = pick_tile_export(plan, eng.Pp)
    ptu = pick_tile_up(plan, eng.Pp)
    ms, sl = plan.scalar_arrays()
    ms_u, sl_u = up_scalar_arrays(plan)
    e_step, e_side, e_slot, *_ = edge_maps(plan, sched)
    pa = dict(p2_meta_step=jnp.asarray(ms), p2_meta_slot=jnp.asarray(sl),
              p2_edge=jnp.asarray(plan.edge),
              p2_int=jnp.asarray(plan.is_int),
              p2_tip=jnp.asarray(plan.tip),
              p2u_meta_step=jnp.asarray(ms_u),
              p2u_meta_slot=jnp.asarray(sl_u),
              p2u_root_step=jnp.asarray(int(plan.node_step[sched.n_int - 1])),
              p2u_root_slot=jnp.asarray(int(plan.node_slot[sched.n_int - 1])))
    thA, thB, tscA, tscB, th0, tsc0 = pp2.thetas_v2(
        P, tipP, pa, pack, CSP=slot_pitch(CS),
        ring_blocks=plan.ring_blocks,
        up_ring_blocks=plan.up_ring_blocks, pt=pte, ptu=ptu,
        interpret=True)
    thA = np.asarray(thA)
    thB = np.asarray(thB)
    tscA = np.asarray(tscA)
    tscB = np.asarray(tscB)
    ref_t = np.asarray(th_ref.theta)    # [E, C, K, Pp]
    ref_s = np.asarray(th_ref.scale)
    CSP = slot_pitch(CS)

    def eff(v, s):
        return v * np.exp2(30.0 * s)

    for e in range(1, sched.n_edges):
        s_, k_, g_ = int(e_step[e]), int(e_side[e]), int(e_slot[e])
        th = thA if k_ == 0 else thB
        ts = tscA if k_ == 0 else tscB
        got = th[s_, g_ * CSP: g_ * CSP + CS].reshape(C, S, -1)
        np.testing.assert_allclose(
            eff(got, ts[s_, g_][None, None, :]),
            eff(ref_t[e], ref_s[e][None, None, :]),
            rtol=_tol(mm_mode, base=3e-4, x3=6e-2),
            atol=_tol(mm_mode, base=1e-12, x3=1e-5))
    np.testing.assert_allclose(
        eff(np.asarray(th0), np.asarray(tsc0)[None, None, :]),
        eff(ref_t[0], ref_s[0][None, None, :]),
        rtol=_tol(mm_mode, base=3e-4, x3=6e-2),
            atol=_tol(mm_mode, base=1e-12, x3=1e-5))
