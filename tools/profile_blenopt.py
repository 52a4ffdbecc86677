"""Round-4 profiling: where does the 64-taxon branch-length optimization
spend its 112 ms? Times each stage of one optimize sweep on-chip."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_problem
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import build_schedule


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, r


def main(ntaxa=64):
    eng, tree = make_problem(ntaxa=ntaxa)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    pw = eng._dev_pw
    blens = jnp.asarray(sched.blens, eng.dtype)

    @jax.jit
    def f_logl(b):
        return pruning.tree_loglik(b, tipP, sa, pack, pw)[0]

    @jax.jit
    def f_P(b):
        return pruning.transition_tensors(b, pack)

    @jax.jit
    def f_passes(b):
        P = pruning.transition_tensors(b, pack)
        dp, up = pruning.both_passes(P, tipP, sa, pack)
        return dp.all[-1], up.edge_E[-1]

    @jax.jit
    def f_thetas(b):
        P = pruning.transition_tensors(b, pack)
        dp, up = pruning.both_passes(P, tipP, sa, pack)
        th = pruning.edge_thetas(up, dp, sa["edge_src"], pack)
        return th.theta[-1]

    @jax.jit
    def f_newton(b):
        P = pruning.transition_tensors(b, pack)
        dp, up = pruning.both_passes(P, tipP, sa, pack)
        th = pruning.edge_thetas(up, dp, sa["edge_src"], pack)
        newton = jax.vmap(
            lambda t_e, th_e, sc_e: pruning.newton_branch_step(
                th_e, sc_e, t_e, pack, pack["log_ptn_invar"],
                pw, 1e-6, 10.0, n_iter=4))
        return newton(b, th.theta, th.scale)

    t, _ = timeit(f_logl, blens)
    print(f"logL eval:              {t*1e3:8.3f} ms")
    t, _ = timeit(f_P, blens)
    print(f"transition tensors:     {t*1e3:8.3f} ms")
    t, _ = timeit(f_passes, blens)
    print(f"P + both_passes:        {t*1e3:8.3f} ms")
    t, _ = timeit(f_thetas, blens)
    print(f"  + edge_thetas:        {t*1e3:8.3f} ms")
    t, _ = timeit(f_newton, blens)
    print(f"  + newton all edges:   {t*1e3:8.3f} ms")

    from iqtree2_tpu.engine import _optimize_blens_jit
    t0 = time.perf_counter()
    _optimize_blens_jit(blens, tipP, sa, pack, pw,
                        jnp.asarray(1e-6, eng.dtype),
                        jnp.asarray(10.0, eng.dtype), 10, 4)[1
                        ].block_until_ready()
    print(f"full 10-round optimize compile+run: "
          f"{(time.perf_counter()-t0):8.3f} s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _optimize_blens_jit(blens, tipP, sa, pack, pw,
                            jnp.asarray(1e-6, eng.dtype),
                            jnp.asarray(10.0, eng.dtype), 10, 4)[1
                            ].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"full 10-round optimize: {best*1e3:8.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
