#!/usr/bin/env python
"""Round 5: candidate down_pass_v2 — 3-D layout [rows, C*S, P], block-diag
transition matrices, slot-interleaved flat gathers."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

NPAT = 16384
C, S = 4, 4
CS = C * S
L = 64
N_INT = L - 2
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

    from iqtree2_tpu.tree.schedule import build_schedule
    from iqtree2_tpu.tree.topology import Tree

    tree = Tree.random_topology([f"t{i}" for i in range(L)], rng)

    for G in (4, 8, 16):
        sched = build_schedule(tree, group_size=G)
        n_steps = sched.step_node.shape[0]
        rows = L + sched.n_int
        n_edges = sched.n_edges

        tip = jnp.asarray(rng.random((L, CS, NPAT)), jnp.float32)
        Pbd = jnp.asarray(rng.random((n_edges, CS, CS)), jnp.float32)

        # flat per-step arrays: [n_steps, G*2] src rows + edge ids
        src_steps = np.full((n_steps, G, 2), rows - 1, np.int32)
        eid_steps = np.zeros((n_steps, G, 2), np.int32)
        out_steps = np.full((n_steps, G), sched.n_int, np.int32)
        for si in range(n_steps):
            for gi in range(G):
                nid = sched.step_node[si, gi]
                if nid >= sched.n_int:
                    continue
                src_steps[si, gi] = sched.child_src[nid]
                eid_steps[si, gi] = sched.child_edge[nid]
                out_steps[si, gi] = nid
        src_j = jnp.asarray(src_steps.reshape(n_steps, G * 2))
        eid_j = jnp.asarray(eid_steps.reshape(n_steps, G * 2))
        out_j = jnp.asarray(out_steps + L)  # pad slots -> L+n_int OOB

        thresh = jnp.float32(2.0 ** -30)
        resc = jnp.float32(2.0 ** 30)

        @jax.jit
        def down_v2(tip_):
            ALL = jnp.zeros((rows, CS, NPAT), jnp.float32)
            ALL = ALL.at[:L].set(tip_)
            SC = jnp.zeros((rows, NPAT), jnp.int32)

            def body(carry, xs):
                A, SCc = carry
                sidx, es, oo = xs
                src = A[sidx]                               # [G2, CS, P]
                m = jnp.einsum("guv,gvp->gup", Pbd[es], src,
                               precision=HI)
                m = m.reshape(G, 2, CS, NPAT)
                pr = m[:, 0] * m[:, 1]
                sc = SCc[sidx].reshape(G, 2, NPAT).sum(1).astype(jnp.int32)
                mx = pr.max(axis=1)
                need = mx < thresh
                pr = pr * jnp.where(need, resc, 1.0)[:, None]
                sc = sc + need.astype(jnp.int32)
                A = A.at[oo].set(pr, mode="drop")
                SCc = SCc.at[oo].set(sc, mode="drop")
                return (A, SCc), None

            (A, SCc), _ = jax.lax.scan(body, (ALL, SC), (src_j, eid_j, out_j))
            return A[-1], SCc[-1]

        t = timeit(down_v2, tip)
        print(f"down_v2 G={G:3d} steps={n_steps}: {t*1e3:.3f} ms")

        # variant: no scaling bookkeeping at all (upper bound)
        @jax.jit
        def down_v2_nosc(tip_):
            ALL = jnp.zeros((rows, CS, NPAT), jnp.float32)
            ALL = ALL.at[:L].set(tip_)

            def body(A, xs):
                sidx, es, oo = xs
                src = A[sidx]
                m = jnp.einsum("guv,gvp->gup", Pbd[es], src, precision=HI)
                m = m.reshape(G, 2, CS, NPAT)
                pr = m[:, 0] * m[:, 1]
                A = A.at[oo].set(pr, mode="drop")
                return A, None

            A, _ = jax.lax.scan(body, ALL, (src_j, eid_j, out_j))
            return A[-1]

        t = timeit(down_v2_nosc, tip)
        print(f"  noscale:              {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
