"""Sharded-path regressions on the virtual 8-device CPU mesh.

Round-3 VERDICT Weak #6: parallel/shard.py had no pytest coverage and the
batch workloads (UFBoot RELL, the NNI candidate batch) were unsharded.
These tests pin sharded == unsharded for plain logL, the full Newton
optimization step, RELL rescoring, and the NNI candidate batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqtree2_tpu.data import seqtypes
from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.model.dna import make_dna_model
from iqtree2_tpu.model.rates import RateGamma
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.parallel import shard
from iqtree2_tpu.tree.schedule import build_schedule
from iqtree2_tpu.tree.topology import Tree

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
    return shard.make_mesh(N_DEV)


@pytest.fixture(scope="module")
def setup(mesh):
    rng = np.random.default_rng(3)
    ntaxa = 14
    npat = shard.pad_patterns_for_mesh(500, N_DEV)   # 1024
    st = seqtypes.dna_type()
    codes = seqtypes.DNA_STATE_TO_CODE[
        rng.integers(0, 4, size=(npat, ntaxa)).astype(np.int32)]
    aln = Alignment(names=[f"t{i}" for i in range(ntaxa)], seqtype=st,
                    patterns=codes, pattern_weights=np.ones(npat),
                    site_to_pattern=np.arange(npat, dtype=np.int32))
    model = make_dna_model("GTR", freqs=np.array([0.3, 0.2, 0.2, 0.3]),
                           freq_type="user",
                           rate_params=np.array([1.5, 4.0, 1.2, 0.8, 5.0]))
    eng = LikelihoodEngine(aln, model, RateGamma(4, alpha=0.7),
                           dtype=jnp.float32)
    assert eng.Pp % N_DEV == 0
    tree = Tree.random_topology(aln.names, rng)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    tipP, pw, log_inv = shard.shard_engine_arrays(
        mesh, eng._dev_tipP, eng._dev_pw, eng._dev_pack["log_ptn_invar"])
    pack = dict(eng._dev_pack, log_ptn_invar=log_inv)
    blens = jnp.asarray(sched.blens, jnp.float32)
    return eng, tree, sched, sa, pack, tipP, pw, blens


def test_sharded_loglik_matches_single(mesh, setup):
    eng, tree, sched, sa, pack, tipP, pw, blens = setup
    logL_s, lp_s = shard.sharded_loglik_fn(mesh, pack)(
        blens, tipP, sa, pack, pw)
    logL_1 = eng.loglik_sched(sched)
    assert float(logL_s) == pytest.approx(logL_1, abs=5e-3)
    _, lp_1 = pruning.tree_loglik(blens, eng._dev_tipP, sa,
                                  eng._dev_pack, eng._dev_pw)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_1),
                               rtol=2e-5, atol=1e-6)


def test_sharded_optimize_step_matches_single(mesh, setup):
    eng, tree, sched, sa, pack, tipP, pw, blens = setup
    t_min = jnp.asarray(1e-6, jnp.float32)
    t_max = jnp.asarray(10.0, jnp.float32)
    new_b, logL = shard.sharded_optimize_step_fn(mesh, pack)(
        blens, tipP, sa, pack, pw, t_min, t_max)

    @jax.jit
    def unsharded(b):
        Pm = pruning.transition_tensors(b, eng._dev_pack)
        dp = pruning.down_pass(Pm, eng._dev_tipP, sa)
        up = pruning.up_pass(Pm, dp, eng._dev_tipP, sa,
                             eng._dev_pack["root_freqs"])
        th = pruning.edge_thetas(up, dp, sa["edge_src"], eng._dev_pack)
        newton = jax.vmap(
            lambda t_e, th_e, sc_e: pruning.newton_branch_step(
                th_e, sc_e, t_e, eng._dev_pack,
                eng._dev_pack["log_ptn_invar"], eng._dev_pw,
                t_min, t_max, n_iter=4))
        return jnp.clip(newton(b, th.theta, th.scale), 1e-6, 10.0)

    ref = unsharded(blens)
    np.testing.assert_allclose(np.asarray(new_b), np.asarray(ref),
                               rtol=5e-4, atol=1e-6)
    assert np.isfinite(float(logL))


def test_sharded_rell_matches_numpy(mesh):
    rng = np.random.default_rng(11)
    R, Pn = 64, 700
    samples = rng.poisson(1.0, size=(R, Pn)).astype(np.float32)
    lp = rng.normal(-8.0, 1.0, size=Pn).astype(np.float32)
    Pp = shard.pad_patterns_for_mesh(Pn, N_DEV)
    from jax.sharding import NamedSharding, PartitionSpec as P
    s2 = NamedSharding(mesh, P(None, shard.AXIS))
    s1 = NamedSharding(mesh, P(shard.AXIS))
    got = shard.sharded_rell_fn(mesh)(
        jax.device_put(np.pad(samples, ((0, 0), (0, Pp - Pn))), s2),
        jax.device_put(np.pad(lp, (0, Pp - Pn)), s1))
    np.testing.assert_allclose(np.asarray(got), samples @ lp, rtol=2e-5)


def test_ufboot_device_rell_matches_host(mesh):
    from iqtree2_tpu.search.ufboot import UFBoot
    rng = np.random.default_rng(4)
    ntaxa, nsites = 8, 300
    st = seqtypes.dna_type()
    codes = seqtypes.DNA_STATE_TO_CODE[
        rng.integers(0, 4, size=(nsites, ntaxa)).astype(np.int32)]
    aln = Alignment(names=[f"t{i}" for i in range(ntaxa)], seqtype=st,
                    patterns=codes, pattern_weights=np.ones(nsites),
                    site_to_pattern=np.arange(nsites, dtype=np.int32))
    ub_host = UFBoot(aln, n_replicates=50, seed=7)
    ub_dev = UFBoot(aln, n_replicates=50, seed=7)
    ub_dev.enable_device_rell(mesh)
    lp = rng.normal(-7.0, 1.0, size=aln.num_patterns)
    np.testing.assert_allclose(ub_dev._rell_scores(lp),
                               ub_host._rell_scores(lp), rtol=2e-5)


def test_sharded_nni_batch_matches_single(mesh, setup):
    eng, tree, sched, sa, pack, tipP, pw, blens = setup
    from iqtree2_tpu.ops.nni import build_nni_candidates, evaluate_nnis
    cand = build_nni_candidates(tree, sched)
    cand_arrays = (jnp.asarray(cand.iu), jnp.asarray(cand.iv),
                   jnp.asarray(cand.slot_c), jnp.asarray(cand.edge_id))
    t_min = jnp.asarray(1e-6, jnp.float32)
    t_max = jnp.asarray(10.0, jnp.float32)
    Pm = pruning.transition_tensors(blens, eng._dev_pack)
    dp = pruning.down_pass(Pm, eng._dev_tipP, sa)
    up = pruning.up_pass(Pm, dp, eng._dev_tipP, sa,
                         eng._dev_pack["root_freqs"])
    logl_1, topt_1 = evaluate_nnis(
        cand_arrays, blens, dp, up.up_in, up.up_scale, sa, eng._dev_pack,
        eng._dev_pw, t_min, t_max)

    from jax.sharding import NamedSharding, PartitionSpec as P
    s4 = NamedSharding(mesh, P(None, None, None, shard.AXIS))
    s2 = NamedSharding(mesh, P(None, shard.AXIS))
    dp_s = pruning.DownPass(jax.device_put(dp.all, s4),
                            jax.device_put(dp.scale, s2))
    up_in_s = jax.device_put(up.up_in, s4)
    up_sc_s = jax.device_put(up.up_scale, s2)
    logl_s, topt_s = shard.sharded_nni_fn(mesh, pack)(
        cand_arrays, blens, dp_s, up_in_s, up_sc_s, sa, pack, pw,
        t_min, t_max)
    np.testing.assert_allclose(np.asarray(logl_s), np.asarray(logl_1),
                               rtol=1e-5, atol=5e-3)
    np.testing.assert_allclose(np.asarray(topt_s), np.asarray(topt_1),
                               rtol=5e-4, atol=1e-6)
