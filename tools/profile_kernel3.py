#!/usr/bin/env python
"""Round 3: scan-vs-unroll, scatter-vs-contiguous-slice for the down pass."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

NPAT = 16384
C, S = 4, 4
L = 64
N_INT = 62
G = 8
HI = jax.lax.Precision.HIGHEST


def timeit(fn, *args, n=20, warmup=2):
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
    n_steps = 20
    rows = L + n_steps * G

    tip = jnp.asarray(rng.random((L, C, S, NPAT)), jnp.float32)
    P = jnp.asarray(rng.random((2 * L - 3, 2, C, S, S)), jnp.float32)
    # schedule: step s writes rows L+s*G .. L+s*G+G, reads random earlier rows
    src_idx = np.zeros((n_steps, G, 2), np.int32)
    for s in range(n_steps):
        hi = L + s * G
        src_idx[s] = rng.integers(0, hi, size=(G, 2))
    eids = rng.integers(0, 2 * L - 3, size=(n_steps, G)).astype(np.int32)
    src_idx_j = jnp.asarray(src_idx)
    eids_j = jnp.asarray(eids)

    def step_math(ALL, sidx, Pe):
        s = ALL[sidx]                                    # [G,2,C,S,P]
        m = jnp.einsum("gkcxy,gkcyp->gkcxp", Pe, s, precision=HI)
        return m[:, 0] * m[:, 1]

    # A. lax.scan + scatter write
    out_rows = jnp.asarray(
        np.arange(L, L + n_steps * G, dtype=np.int32).reshape(n_steps, G))

    @jax.jit
    def scan_scatter(tip_):
        ALL = jnp.zeros((rows, C, S, NPAT), jnp.float32)
        ALL = ALL.at[:L].set(tip_)

        def body(A, xs):
            sidx, oo, es = xs
            pr = step_math(A, sidx, P[es])
            return A.at[oo].set(pr, mode="drop"), None

        A, _ = jax.lax.scan(body, ALL, (src_idx_j, out_rows, eids_j))
        return A[-1]

    print(f"A scan+scatter: {timeit(scan_scatter, tip)*1e3:.3f} ms")

    # B. lax.scan + contiguous dynamic_update_slice
    starts = jnp.asarray(np.arange(n_steps, dtype=np.int32) * G + L)

    @jax.jit
    def scan_dus(tip_):
        ALL = jnp.zeros((rows, C, S, NPAT), jnp.float32)
        ALL = ALL.at[:L].set(tip_)

        def body(A, xs):
            sidx, st, es = xs
            pr = step_math(A, sidx, P[es])
            A = jax.lax.dynamic_update_slice(A, pr, (st, 0, 0, 0))
            return A, None

        A, _ = jax.lax.scan(body, ALL, (src_idx_j, starts, eids_j))
        return A[-1]

    print(f"B scan+dus:     {timeit(scan_dus, tip)*1e3:.3f} ms")

    # C. unrolled + static slice writes
    @jax.jit
    def unrolled(tip_):
        ALL = jnp.zeros((rows, C, S, NPAT), jnp.float32)
        ALL = ALL.at[:L].set(tip_)
        for s in range(n_steps):
            pr = step_math(ALL, src_idx_j[s], P[eids_j[s]])
            ALL = ALL.at[L + s * G: L + (s + 1) * G].set(pr)
        return ALL[-1]

    print(f"C unrolled+slice: {timeit(unrolled, tip)*1e3:.3f} ms")

    # D. unrolled, no big buffer: step outputs kept as list, gathers from
    #    a concat'ed buffer built incrementally is O(n^2); instead gather
    #    via one concat per step from tip + stacked outputs so far.
    @jax.jit
    def unrolled_nobuf(tip_):
        outs = []
        for s in range(n_steps):
            if outs:
                A = jnp.concatenate([tip_] + outs, axis=0)
            else:
                A = tip_
            sidx = jnp.minimum(src_idx_j[s], A.shape[0] - 1)
            pr = step_math(A, sidx, P[eids_j[s]])
            outs.append(pr)
        return outs[-1][-1]

    print(f"D unrolled+concat: {timeit(unrolled_nobuf, tip)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
