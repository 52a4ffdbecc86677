#!/usr/bin/env python
"""Validate + time the Pallas down/up passes vs the XLA scan path."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from profile_pallas import make, timeit


def main():
    from iqtree2_tpu.ops import pruning
    from iqtree2_tpu import engine as eng_mod

    print("device:", jax.devices()[0])
    eng, sched = make(64, 16384)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, jnp.float32)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    pw = eng._dev_pw

    @jax.jit
    def passes(b):
        P = pruning.transition_tensors(b, pack)
        dp = pruning.down_pass(P, tipP, sa)
        up = pruning.up_pass(P, dp, tipP, sa, pack["root_freqs"])
        return dp, up

    @jax.jit
    def passes_xla(b):
        P = pruning.transition_tensors(b, pack)
        dp = pruning._down_pass_xla(P, tipP, sa)
        up = pruning._up_pass_xla(P, dp, tipP, sa, pack["root_freqs"])
        return dp, up

    dp1, up1 = jax.block_until_ready(passes(blens))
    dp2, up2 = jax.block_until_ready(passes_xla(blens))

    def cmp(name, a, b):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = float(jnp.max(jnp.abs(a - b) /
                            (jnp.abs(b) + 1e-30)))
        print(f"{name}: max abs diff {d:.3e}  max rel {rel:.3e}")

    cmp("down.all", dp1.all, dp2.all)
    print("scale equal:", bool(jnp.all(dp1.scale == dp2.scale)))
    cmp("up.edge_E", up1.edge_E, up2.edge_E)
    cmp("up.up_in", up1.up_in, up2.up_in)
    print("E scale equal:", bool(jnp.all(up1.edge_E_scale ==
                                         up2.edge_E_scale)))

    print("passes pallas:", timeit(passes, blens, n=10) * 1e3, "ms")
    print("passes xla:   ", timeit(passes_xla, blens, n=5) * 1e3, "ms")

    # full branch optimization wall
    from iqtree2_tpu.tree.topology import Tree
    rng = np.random.default_rng(5)
    tree = Tree.random_topology(eng.aln.names, rng)
    t_ = tree.copy()
    eng.optimize_branches(t_, n_rounds=2)
    t_ = tree.copy()
    t0 = time.perf_counter()
    logL = eng.optimize_branches(t_, n_rounds=10)
    print(f"optimize_branches(10): {time.perf_counter()-t0:.3f} s "
          f"logL={logL:.2f}")


if __name__ == "__main__":
    main()
