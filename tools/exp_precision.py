"""Experiment: matmul precision in the v2 streaming kernel.

Times the chained 64-taxon and 1000-taxon logL at each jax matmul
precision (HIGHEST = 6-pass f32, HIGH = 3-pass bf16x3, DEFAULT = 1-pass
bf16) and prints logL deltas vs HIGHEST, to pick the default for the
hot path.  Run on the real chip:  python tools/exp_precision.py
"""
import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from iqtree2_tpu.ops import pallas_pruning2 as pp2
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import build_schedule


def make(ntaxa, npat=16384):
    sys.path.insert(0, str(REPO))
    import bench
    return bench.make_problem(ntaxa=ntaxa, npat=npat)


def chain_time(eng, tree, chain=256, reps=3):
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, eng.dtype)

    @functools.partial(jax.jit, static_argnames=("n",))
    def _chained(b, tipP, sa_, pack, pw, n):
        def body(i, acc):
            scale = (1.0 + 1e-6 * (i.astype(jnp.float32) + 1.0)
                     + acc * jnp.float32(1e-30))
            logL, _ = pruning.tree_loglik(b * scale, tipP, sa_, pack, pw)
            return acc + logL
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = _chained(blens, eng._dev_tipP, sa, eng._dev_pack, eng._dev_pw,
                 chain)
    # np.asarray forces real byte arrival (the tunnel's block_until_ready
    # can signal early); the device queue is in-order, so fetching the
    # LAST result's bytes proves all prior dispatches completed.
    np.asarray(f)
    K = max(reps, 3)
    t0 = time.perf_counter()
    outs = [_chained(blens * (1.0 + 1e-7 * k), eng._dev_tipP, sa,
                     eng._dev_pack, eng._dev_pw, chain)
            for k in range(K)]
    np.asarray(outs[-1])
    wall = time.perf_counter() - t0
    logL, _ = pruning.tree_loglik(blens, eng._dev_tipP, sa, eng._dev_pack,
                                  eng._dev_pw)
    return wall / (K * chain), float(logL)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    eng64, t64 = make(64)
    eng1k, t1k = make(1000)

    results = {}
    from iqtree2_tpu.ops import prec
    orig_tile = pruning._pallas_tile
    for name in ("HIGHEST", "HIGH", "DEFAULT"):
        prec.set_precision(name)
        t_64, lo64 = chain_time(eng64, t64)
        # force the v2 streaming kernel at 64 taxa for comparison
        pruning._pallas_tile = lambda *a, **k: None
        t_64b, lo64b = chain_time(eng64, t64)
        pruning._pallas_tile = orig_tile
        t_1k, lo1k = chain_time(eng1k, t1k, chain=64)
        results[name] = (t_64, lo64, t_1k, lo1k)
        print(f"{name:8s} 64tx(v1): {t_64*1e6:8.1f} us logL={lo64:.4f}"
              f" | 64tx(v2): {t_64b*1e6:8.1f} us logL={lo64b:.4f}"
              f" | 1000tx: {t_1k*1e3:8.3f} ms logL={lo1k:.4f}",
              flush=True)
    base = results["HIGHEST"]
    for name, r in results.items():
        print(f"{name:8s} dlogL64={r[1]-base[1]:+.5f} "
              f"dlogL1k={r[3]-base[3]:+.5f} "
              f"speedup64={base[0]/r[0]:.2f}x speedup1k={base[2]/r[2]:.2f}x")


if __name__ == "__main__":
    main()
