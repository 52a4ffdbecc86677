"""Benchmark the v2 streaming kernel vs v1 on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_problem
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import build_schedule

print("device:", jax.devices()[0])


def chained(eng, sched, sa, K=32, n=10):
    blens = jnp.asarray(sched.blens, eng.dtype)
    tipP, pack, pw = eng._dev_tipP, eng._dev_pack, eng._dev_pw

    def f(b):
        def body(i, acc):
            bl = b * (1.0 + 1e-7 * acc)
            logL, _ = pruning.tree_loglik(bl, tipP, sa, pack, pw)
            return acc + logL * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    fj = jax.jit(f)
    out = fj(blens); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fj(blens)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n / K
    # single logL for value check
    lg = jax.jit(lambda b: pruning.tree_loglik(b, tipP, sa, pack, pw)[0])
    return dt, float(lg(blens))


for ntaxa, npat in ((64, 16384), (1000, 16384)):
    eng, tree = make_problem(ntaxa=ntaxa, npat=npat)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    has_v2 = "p2_cfg" in sa
    if has_v2:
        rb, pt = sa["p2_cfg"].shape
        ms = sa["p2_meta_step"].shape[0]
        print(f"[{ntaxa}tx] v2 plan: steps={ms} ring_blocks={rb} pt={pt}")
        dt, lg = chained(eng, sched, sa, K=32, n=5)
        print(f"[{ntaxa}tx] v2 chained: {dt*1e3:.3f} ms/eval logL={lg:.1f}")
    # v1 comparison
    os.environ["IQTREE2_TPU_DISABLE_PALLAS2"] = "1"
    sa1 = eng.schedule_arrays(sched)
    try:
        dt1, lg1 = chained(eng, sched, sa1, K=8 if ntaxa > 500 else 32, n=3)
        print(f"[{ntaxa}tx] v1 chained: {dt1*1e3:.3f} ms/eval logL={lg1:.1f}")
    finally:
        del os.environ["IQTREE2_TPU_DISABLE_PALLAS2"]
