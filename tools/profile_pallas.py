#!/usr/bin/env python
"""Validate + time the Pallas traversal kernel vs the XLA level path."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make(ntaxa, npat, seed=0):
    from iqtree2_tpu.data.alignment import Alignment
    from iqtree2_tpu.data import seqtypes
    from iqtree2_tpu.engine import LikelihoodEngine
    from iqtree2_tpu.model.dna import make_dna_model
    from iqtree2_tpu.model.rates import RateGamma
    from iqtree2_tpu.tree.schedule import build_schedule
    from iqtree2_tpu.tree.topology import Tree

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
    rates = RateGamma(4, alpha=0.6)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    tree = Tree.random_topology(aln.names, rng)
    sched = build_schedule(tree)
    return eng, sched


def main():
    from iqtree2_tpu.ops import pruning, pallas_pruning

    print("device:", jax.devices()[0])
    for ntaxa, npat in ((64, 16384), (256, 16384), (1000, 16384)):
        eng, sched = make(ntaxa, npat)
        sa = eng.schedule_arrays(sched)
        blens = jnp.asarray(sched.blens, jnp.float32)
        pack = eng._dev_pack
        pw = eng._dev_pw
        tipP = eng._dev_tipP          # [L, S, Pp]

        n_int = sched.n_int
        pt = pallas_pruning.pick_pattern_tile(
            eng.Pp, ntaxa, n_int, 16, 4, sched.n_edges)
        print(f"\n== {ntaxa} taxa x {npat} pat: pt={pt}")
        if pt is None:
            continue

        flat_src = jnp.asarray(sched.child_src.reshape(-1))
        flat_eid = jnp.asarray(sched.child_edge.reshape(-1))
        wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)

        @jax.jit
        def lg_pallas(b):
            P = pruning.transition_tensors(b, pack)
            lp = pallas_pruning.down_sitelp_pallas(
                flat_src, flat_eid, tipP, P, wf, pack["log_ptn_invar"],
                pt=pt)
            return jnp.sum(pw * lp)

        @jax.jit
        def lg_xla(b):
            return pruning.tree_loglik(b, tipP, sa, pack, pw)[0]

        v_xla = float(lg_xla(blens))
        v_pal = float(lg_pallas(blens))
        print(f"logL xla={v_xla:.3f} pallas={v_pal:.3f} "
              f"diff={abs(v_xla-v_pal):.5f}")
        t_xla = timeit(lg_xla, blens, n=20)
        t_pal = timeit(lg_pallas, blens, n=20)
        print(f"xla: {t_xla*1e3:.3f} ms   pallas: {t_pal*1e3:.3f} ms   "
              f"speedup {t_xla/t_pal:.1f}x")


if __name__ == "__main__":
    main()
