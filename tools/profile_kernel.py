#!/usr/bin/env python
"""Microbenchmarks for the pruning hot path on the real TPU chip.

Times each candidate formulation of the per-level contraction and the full
down pass so kernel-layout decisions are made from measurements, not guesses.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

NPAT = 16384
C, S = 4, 4
NTAXA = 64


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
    dev = jax.devices()[0]
    print("device:", dev)

    from iqtree2_tpu.data.alignment import Alignment
    from iqtree2_tpu.data import seqtypes
    from iqtree2_tpu.engine import LikelihoodEngine
    from iqtree2_tpu.model.dna import make_dna_model
    from iqtree2_tpu.model.rates import RateGamma
    from iqtree2_tpu.ops import pruning
    from iqtree2_tpu.tree.schedule import build_schedule
    from iqtree2_tpu.tree.topology import Tree

    st = seqtypes.dna_type()
    pat = rng.integers(0, 4, size=(NPAT, NTAXA)).astype(np.int32)
    codes = seqtypes.DNA_STATE_TO_CODE[pat]
    aln = Alignment(names=[f"t{i}" for i in range(NTAXA)], seqtype=st,
                    patterns=codes, pattern_weights=np.ones(NPAT),
                    site_to_pattern=np.arange(NPAT, dtype=np.int32))
    model = make_dna_model("GTR", freqs=np.array([0.3, 0.2, 0.2, 0.3]),
                           freq_type="user",
                           rate_params=np.array([1.5, 4.0, 1.2, 0.8, 5.0]))
    rates = RateGamma(C, alpha=0.6)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    tree = Tree.random_topology(aln.names, rng)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    print("n_int", sched.n_int, "steps", sched.step_node.shape)

    pack = eng._dev_pack
    tipP = eng._dev_tipP
    pw = eng._dev_pw

    # 1. transition tensors alone
    tt = jax.jit(lambda b: pruning.transition_tensors(b, pack))
    print(f"transition_tensors: {timeit(tt, blens)*1e3:.3f} ms")
    P = tt(blens)

    # 2. full down pass
    dpf = jax.jit(lambda P_: pruning.down_pass(P_, tipP, sa))
    t = timeit(dpf, P)
    print(f"down_pass: {t*1e3:.3f} ms")

    # 3. full logL
    lg = jax.jit(lambda b: pruning.tree_loglik(b, tipP, sa, pack, pw)[0])
    t = timeit(lg, blens)
    print(f"tree_loglik: {t*1e3:.3f} ms  (logL={float(lg(blens)):.1f})")

    # 4. one level-step einsum alone (no scan, no gather), G=64
    G = 64
    Pe = jnp.asarray(rng.standard_normal((G, 2, C, S, S)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((G, 2, C, S, NPAT)), jnp.float32)

    HI = jax.lax.Precision.HIGHEST
    e_hi = jax.jit(lambda a, b: jnp.einsum("gkcxy,gkcyp->gkcxp", a, b,
                                           precision=HI))
    e_def = jax.jit(lambda a, b: jnp.einsum("gkcxy,gkcyp->gkcxp", a, b))
    print(f"step einsum HIGHEST: {timeit(e_hi, Pe, src)*1e3:.3f} ms")
    print(f"step einsum DEFAULT: {timeit(e_def, Pe, src)*1e3:.3f} ms")

    # bytes moved per einsum ~ read src + write out = 2*G*2*C*S*NPAT*4
    byts = 2 * G * 2 * C * S * NPAT * 4
    t = timeit(e_hi, Pe, src)
    print(f"  -> {byts/t/1e9:.1f} GB/s effective (HBM ~819 GB/s)")

    # 5. block-diag (C*S) x (C*S) form
    PeB = jnp.asarray(rng.standard_normal((G, 2, C * S, C * S)), jnp.float32)
    srcB = src.reshape(G, 2, C * S, NPAT)
    e_bd = jax.jit(lambda a, b: jnp.einsum("gkuv,gkvp->gkup", a, b,
                                           precision=HI))
    print(f"blockdiag [16x16] einsum: {timeit(e_bd, PeB, srcB)*1e3:.3f} ms")

    # 6. patterns-on-rows form: [P, S] x [S, S] batched
    srcT = jnp.asarray(rng.standard_normal((G, 2, C, NPAT, S)), jnp.float32)
    e_pr = jax.jit(lambda a, b: jnp.einsum("gkcpy,gkcxy->gkcpx", a, b,
                                           precision=HI))
    print(f"patterns-rows einsum: {timeit(e_pr, srcT, Pe)*1e3:.3f} ms")

    # 7. gather+einsum+scatter single step (outside scan)
    ALL = jnp.asarray(
        rng.standard_normal((NTAXA + sched.n_int, C, S, NPAT)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, NTAXA, size=(G, 2)), jnp.int32)
    out_idx = jnp.asarray(rng.permutation(sched.n_int)[:G] + NTAXA,
                          jnp.int32)

    @jax.jit
    def one_step(ALL_, Pe_):
        s = ALL_[idx]
        m = jnp.einsum("gkcxy,gkcyp->gkcxp", Pe_, s, precision=HI)
        pr = m[:, 0] * m[:, 1]
        return ALL_.at[out_idx].set(pr, mode="drop")

    print(f"gather+einsum+scatter step: {timeit(one_step, ALL, Pe)*1e3:.3f}"
          " ms")

    # 8. scan of 12 steps with carry (isolates carry-copy overhead)
    steps_idx = jnp.asarray(
        rng.integers(0, NTAXA, size=(12, G, 2)), jnp.int32)
    steps_out = jnp.asarray(
        rng.integers(NTAXA, NTAXA + sched.n_int, size=(12, G)), jnp.int32)

    @jax.jit
    def scan12(ALL_, Pe_):
        def body(A, xs):
            ii, oo = xs
            s = A[ii]
            m = jnp.einsum("gkcxy,gkcyp->gkcxp", Pe_, s, precision=HI)
            pr = m[:, 0] * m[:, 1]
            A = A.at[oo].set(pr, mode="drop")
            return A, None
        A, _ = jax.lax.scan(body, ALL_, (steps_idx, steps_out))
        return A

    print(f"scan x12 gather/einsum/scatter: {timeit(scan12, ALL, Pe)*1e3:.3f}"
          " ms")


if __name__ == "__main__":
    main()
