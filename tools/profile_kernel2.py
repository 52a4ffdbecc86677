#!/usr/bin/env python
"""Round 2: bandwidth ceiling + adaptive level width for the down pass."""
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
    print("device:", jax.devices()[0])

    # 0. pure elementwise copy/mult ceiling on 67MB
    big = jnp.asarray(rng.standard_normal((64, 2, C, S, NPAT)), jnp.float32)
    mul = jax.jit(lambda x: x * 1.0001)
    t = timeit(mul, big)
    byts = 2 * big.size * 4
    print(f"elementwise x*c on 67MB: {t*1e3:.3f} ms -> {byts/t/1e9:.0f} GB/s")

    # 0b. elementwise product of two pattern-major arrays (the msg product)
    a = jnp.asarray(rng.standard_normal((64, C, S, NPAT)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64, C, S, NPAT)), jnp.float32)
    mul2 = jax.jit(lambda x, y: x * y)
    t = timeit(mul2, a, b)
    byts = 3 * a.size * 4
    print(f"elementwise a*b 2x33MB: {t*1e3:.3f} ms -> {byts/t/1e9:.0f} GB/s")

    # einsum at different batch sizes (bandwidth scaling check)
    HI = jax.lax.Precision.HIGHEST
    for G in (2, 4, 8, 16, 64):
        Pe = jnp.asarray(rng.standard_normal((G, 2, C, S, S)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((G, 2, C, S, NPAT)),
                          jnp.float32)
        e = jax.jit(lambda a_, b_: jnp.einsum("gkcxy,gkcyp->gkcxp", a_, b_,
                                              precision=HI))
        t = timeit(e, Pe, src)
        byts = 2 * src.size * 4
        print(f"einsum G={G:3d}: {t*1e3:.4f} ms -> {byts/t/1e9:6.1f} GB/s")

    # merged (c x) onto sublanes: [G,2,16,P] with blockdiag [G,2,16,16]
    for G in (4, 64):
        PeB = jnp.asarray(rng.standard_normal((G, 2, C * S, C * S)),
                          jnp.float32)
        srcB = jnp.asarray(rng.standard_normal((G, 2, C * S, NPAT)),
                           jnp.float32)
        e = jax.jit(lambda a_, b_: jnp.einsum("gkuv,gkvp->gkup", a_, b_,
                                              precision=HI))
        t = timeit(e, PeB, srcB)
        byts = 2 * srcB.size * 4
        print(f"blockdiag G={G:3d}: {t*1e3:.4f} ms -> {byts/t/1e9:6.1f} GB/s")

    # unrolled-by-state formulation: out[x] = sum_y P[...,x,y] * src[...,y,:]
    # (pure VPU broadcasts, no dot_general)
    for G in (4, 64):
        Pe = jnp.asarray(rng.standard_normal((G, 2, C, S, S)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((G, 2, C, S, NPAT)),
                          jnp.float32)

        @jax.jit
        def vpu_form(Pe_, src_):
            # [G,2,C,S,1,P] * [G,2,C,1,S,P] would blow memory; do explicit
            out = 0.0
            for y in range(S):
                out = out + Pe_[..., :, y, None] * src_[..., None, y, :]
            return out

        t = timeit(vpu_form, Pe, src)
        byts = 2 * src.size * 4
        print(f"vpu-unroll G={G:3d}: {t*1e3:.4f} ms -> {byts/t/1e9:6.1f}"
              " GB/s")

    # full down_pass with adaptive G
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

    for G in (2, 4, 8, 16):
        sched = build_schedule(tree, group_size=G)
        sa = eng.schedule_arrays(sched)
        blens = jnp.asarray(sched.blens, jnp.float32)
        lg = jax.jit(lambda b, sa_=sa: pruning.tree_loglik(
            b, eng._dev_tipP, sa_, eng._dev_pack, eng._dev_pw)[0])
        t = timeit(lg, blens)
        print(f"tree_loglik G={G:3d} steps={sched.step_node.shape[0]}: "
              f"{t*1e3:.3f} ms (logL={float(lg(blens)):.1f})")


if __name__ == "__main__":
    main()
