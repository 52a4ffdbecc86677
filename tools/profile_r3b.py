"""Separate per-program launch overhead from in-program kernel time."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_problem
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import build_schedule


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


print("device:", jax.devices()[0])

# 1. empty-program launch overhead
f_empty = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128), jnp.float32)
print(f"empty jit launch: {timeit(f_empty, x, n=100)*1e6:.1f} us")

eng, tree = make_problem(ntaxa=64, npat=16384)
sched = build_schedule(tree)
sa = eng.schedule_arrays(sched)
blens = jnp.asarray(sched.blens, eng.dtype)
pack = eng._dev_pack
tipP = eng._dev_tipP
pw = eng._dev_pw

# 2. K chained logL evals inside ONE program (amortizes launch)
for K in (1, 8, 32):
    def chained(b, K=K):
        def body(i, acc):
            bl = b * (1.0 + 1e-7 * acc)
            logL, _ = pruning.tree_loglik(bl, tipP, sa, pack, pw)
            return acc + logL * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    fK = jax.jit(chained)
    dt = timeit(fK, blens, n=10)
    print(f"chained K={K}: {dt*1e3:.3f} ms total, {dt/K*1e3:.3f} ms/eval")

# 3. transition_tensors alone, in-program chained
def tt_chain(b):
    def body(i, acc):
        P = pruning.transition_tensors(b * (1.0 + 1e-7 * acc), pack)
        return acc + P.sum() * 1e-12
    return jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))
dt = timeit(jax.jit(tt_chain), blens, n=10)
print(f"transition_tensors chained x32: {dt/32*1e3:.3f} ms/eval")
