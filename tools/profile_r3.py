"""Round-3 profiling: where does the time go in tree_loglik?

Times (on the real chip):
  - down_sitelp_pallas alone at several tile sizes
  - transition_tensors alone
  - full tree_loglik
  - the 1000-taxon path (which backend does it take?)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_problem
from iqtree2_tpu.ops import pruning, pallas_pruning
from iqtree2_tpu.tree.schedule import build_schedule


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def profile(ntaxa, npat):
    eng, tree = make_problem(ntaxa=ntaxa, npat=npat)
    sched = build_schedule(tree)
    sa = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, eng.dtype)
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    pw = eng._dev_pw

    tt = jax.jit(lambda b: pruning.transition_tensors(b, pack))
    P = tt(blens)
    dt_tt = timeit(tt, blens)
    print(f"[{ntaxa}tx] transition_tensors: {dt_tt*1e3:.3f} ms")

    full = jax.jit(lambda b: pruning.tree_loglik(b, tipP, sa, pack, pw)[0])
    dt_full = timeit(full, blens)
    print(f"[{ntaxa}tx] tree_loglik total: {dt_full*1e3:.3f} ms  "
          f"logL={float(full(blens)):.1f}")

    C = P.shape[1]; S = tipP.shape[1]
    CS = C * S
    n_int = sa["child_src"].shape[0]
    L = tipP.shape[0]
    pt_def = pallas_pruning.pick_pattern_tile(
        npat, L, n_int, CS, S, sa["edge_src"].shape[0])
    print(f"[{ntaxa}tx] default tile: {pt_def}")
    wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)
    for pt in (4096, 2048, 1024, 512, 256, 128):
        if npat % pt != 0:
            continue
        try:
            f = jax.jit(lambda P_, pt=pt: pallas_pruning.down_sitelp_pallas(
                sa["child_src"].reshape(-1), sa["child_edge"].reshape(-1),
                tipP, P_, wf, pack["log_ptn_invar"], pt=pt))
            dt = timeit(f, P, n=20)
            print(f"[{ntaxa}tx] pallas sitelp pt={pt}: {dt*1e3:.3f} ms")
        except Exception as e:
            print(f"[{ntaxa}tx] pallas sitelp pt={pt}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # XLA fallback for comparison
    os.environ["IQTREE2_TPU_DISABLE_PALLAS"] = "1"
    try:
        fx = jax.jit(lambda b: pruning.tree_loglik(b, tipP, sa, pack, pw)[0])
        dt_x = timeit(fx, blens, n=5)
        print(f"[{ntaxa}tx] XLA fallback total: {dt_x*1e3:.3f} ms")
    finally:
        del os.environ["IQTREE2_TPU_DISABLE_PALLAS"]


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    profile(64, 16384)
    profile(1000, 16384)
