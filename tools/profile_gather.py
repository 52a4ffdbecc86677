#!/usr/bin/env python
"""Round 4: why is the row gather slow, and what's the fastest variant?"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

NPAT = 16384
CS = 16
ROWS = 128
G2 = 16  # G*2 rows gathered per step


def timeit(fn, *args, n=50, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    ALL = jnp.asarray(rng.random((ROWS, CS, NPAT)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ROWS, size=(G2,)), jnp.int32)
    byts = G2 * CS * NPAT * 4

    g1 = jax.jit(lambda A, i: A[i])
    print(f"fancy gather: {timeit(g1, ALL, idx)*1e3:.4f} ms "
          f"-> {byts/timeit(g1, ALL, idx)/1e9:.0f} GB/s")

    g2 = jax.jit(lambda A, i: A.at[i].get(mode="promise_in_bounds"))
    print(f"promise_in_bounds: {timeit(g2, ALL, idx)*1e3:.4f} ms "
          f"-> {byts/timeit(g2, ALL, idx)/1e9:.0f} GB/s")

    @jax.jit
    def g3(A, i):  # unrolled dynamic slices
        outs = [jax.lax.dynamic_slice_in_dim(A, i[k], 1, axis=0)
                for k in range(G2)]
        return jnp.concatenate(outs, axis=0)

    print(f"unrolled dynslice: {timeit(g3, ALL, idx)*1e3:.4f} ms "
          f"-> {byts/timeit(g3, ALL, idx)/1e9:.0f} GB/s")

    # one-hot matmul gather
    @jax.jit
    def g4(A, i):
        oh = jax.nn.one_hot(i, ROWS, dtype=jnp.float32)      # [G2, ROWS]
        return jnp.einsum("gr,rcp->gcp", oh, A)

    print(f"one-hot matmul: {timeit(g4, ALL, idx)*1e3:.4f} ms "
          f"-> {byts/timeit(g4, ALL, idx)/1e9:.0f} GB/s")

    # gather on axis moved to sublane-major position: [CS, ROWS, NPAT]
    ALLt = jnp.asarray(rng.random((CS, ROWS, NPAT)), jnp.float32)
    g5 = jax.jit(lambda A, i: A[:, i])
    print(f"gather axis=1: {timeit(g5, ALLt, idx)*1e3:.4f} ms "
          f"-> {byts/timeit(g5, ALLt, idx)/1e9:.0f} GB/s")

    # scatter comparison
    vals = jnp.asarray(rng.random((G2, CS, NPAT)), jnp.float32)
    s1 = jax.jit(lambda A, i, v: A.at[i].set(v, mode="drop"))
    print(f"scatter rows: {timeit(s1, ALL, idx, vals)*1e3:.4f} ms")

    # fused: gather -> einsum -> product, static vs dynamic indices
    P = jnp.asarray(rng.random((G2, CS, CS)), jnp.float32)
    HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def fused_dyn(A, i, P_):
        s = A[i]
        m = jnp.einsum("guv,gvp->gup", P_, s, precision=HI)
        return m[0::2] * m[1::2]

    print(f"fused dyn-gather+einsum: {timeit(fused_dyn, ALL, idx, P)*1e3:.4f}"
          " ms")

    idx_np = np.asarray(idx)

    @jax.jit
    def fused_static(A, P_):
        s = A[idx_np]
        m = jnp.einsum("guv,gvp->gup", P_, s, precision=HI)
        return m[0::2] * m[1::2]

    print(f"fused static-gather+einsum: {timeit(fused_static, ALL, P)*1e3:.4f}"
          " ms")


if __name__ == "__main__":
    main()
