"""Pallas traversal kernels vs the XLA scan path (interpreter mode on CPU).

The real-TPU path is exercised by bench.py / the driver; here the same
kernel code runs under pltpu.force_tpu_interpret_mode so a logic regression
fails CI without TPU hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.dna import make_dna_model
from iqtree2_tpu.model.rates import RateGamma
from iqtree2_tpu.ops import pruning, pallas_pruning
from iqtree2_tpu.tree.schedule import build_schedule
from iqtree2_tpu.tree.topology import Tree




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


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(3)
    chars = np.array(list("ACGT"))
    mat = rng.integers(0, 4, size=(8, 256))
    aln = Alignment.from_sequences(
        [f"t{i}" for i in range(8)], ["".join(chars[r]) for r in mat],
        seqtype="DNA")
    model = make_dna_model("GTR", freqs=aln.state_frequencies(),
                           freq_type="empirical")
    rates = RateGamma(4, alpha=0.7)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    tree = Tree.random_topology(aln.names, rng)
    sched = build_schedule(tree)
    return eng, sched


def test_pallas_sitelp_matches_xla(prob, mm_mode):
    eng, sched = prob
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    P = pruning.transition_tensors(blens, pack)

    dp = pruning._down_pass_xla(P, tipP, sa)
    n_int = sched.n_int
    Broot, SCroot = pruning.root_partial(dp, P, tipP, n_int)
    _, lp_xla = pruning.root_loglik(
        Broot, SCroot, pack["root_freqs"], pack["cat_weight"],
        pack["log_ptn_invar"], eng._dev_pw)

    wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)
    with pltpu.force_tpu_interpret_mode():
        lp_pal = pallas_pruning.down_sitelp_pallas(
            jnp.asarray(sched.child_src.reshape(-1)),
            jnp.asarray(sched.child_edge.reshape(-1)),
            tipP, P, wf, pack["log_ptn_invar"], pt=128)
    t = _tol(mm_mode)
    np.testing.assert_allclose(np.asarray(lp_pal), np.asarray(lp_xla),
                               rtol=t, atol=t)


def test_pallas_passes_match_xla(prob, mm_mode):
    eng, sched = prob
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    P = pruning.transition_tensors(blens, pack)

    dp = pruning._down_pass_xla(P, tipP, sa)
    up = pruning._up_pass_xla(P, dp, tipP, sa, pack["root_freqs"])

    L = tipP.shape[0]
    with pltpu.force_tpu_interpret_mode():
        all_int, sc_int = pallas_pruning.down_pass_pallas(
            jnp.asarray(sched.child_src.reshape(-1)),
            jnp.asarray(sched.child_edge.reshape(-1)), tipP, P, pt=128)
        E, ES, UP, UPS = pallas_pruning.up_pass_pallas(
            jnp.asarray(sched.child_src.reshape(-1)),
            jnp.asarray(sched.child_edge.reshape(-1)), tipP,
            all_int, sc_int, P, pack["root_freqs"], pt=128)

    t = _tol(mm_mode)
    np.testing.assert_allclose(np.asarray(all_int),
                               np.asarray(dp.all[L:]), rtol=t, atol=0)
    np.testing.assert_array_equal(np.asarray(sc_int, np.int32),
                                  np.asarray(dp.scale[L:]))
    np.testing.assert_allclose(np.asarray(E), np.asarray(up.edge_E),
                               rtol=t, atol=0)
    np.testing.assert_allclose(np.asarray(UP), np.asarray(up.up_in),
                               rtol=t, atol=0)
    np.testing.assert_array_equal(np.asarray(ES, np.int32),
                                  np.asarray(up.edge_E_scale))
