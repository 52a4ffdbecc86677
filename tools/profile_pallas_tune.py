#!/usr/bin/env python
"""Tune the Pallas traversal kernel: fori unroll, pattern-tile size."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_pallas import make, timeit

_THRESH = 2.0 ** -30
_RESCALE = 2.0 ** 30
_LOG_RESCALE = 30.0 * float(np.log(2.0))
HI = jax.lax.Precision.HIGHEST


def build(eng, sched, pt, unroll, cond_free=False):
    pack = eng._dev_pack
    tipP = eng._dev_tipP
    pw = eng._dev_pw
    L, S, Pp = tipP.shape
    n_int = sched.n_int
    E = sched.n_edges
    C = pack["cat_rate"].shape[0]
    CS = C * S
    n_tiles = Pp // pt
    flat_src = jnp.asarray(sched.child_src.reshape(-1))
    flat_eid = jnp.asarray(sched.child_edge.reshape(-1))
    wf = (pack["cat_weight"][:, None] * pack["root_freqs"]).reshape(-1)

    def kernel(src_ref, eid_ref, tip_ref, pbd_ref, pres_ref, wf_ref,
               loginv_ref, out_ref, all_scr, sc_scr):
        def get_msg(slot_idx):
            s = src_ref[slot_idx]
            e = eid_ref[slot_idx]
            if cond_free:
                # branchless: always run both forms, select
                st = jnp.minimum(s, L - 1)
                r = jnp.clip(s - L, 0, n_int - 1)
                m_leaf = jnp.dot(pres_ref[e], tip_ref[st], precision=HI,
                                 preferred_element_type=jnp.float32)
                m_int = jnp.dot(pbd_ref[e], all_scr[r], precision=HI,
                                preferred_element_type=jnp.float32)
                isleaf = s < L
                m = jnp.where(isleaf, m_leaf, m_int)
                c = jnp.where(isleaf, 0.0, sc_scr[r])
                return m, c

            def leaf():
                return (jnp.dot(pres_ref[e], tip_ref[s], precision=HI,
                                preferred_element_type=jnp.float32),
                        jnp.zeros((pt,), jnp.float32))

            def internal():
                r = s - L
                return (jnp.dot(pbd_ref[e], all_scr[r], precision=HI,
                                preferred_element_type=jnp.float32),
                        sc_scr[r])

            return jax.lax.cond(s < L, leaf, internal)

        def body(i, _):
            m0, c0 = get_msg(2 * i)
            m1, c1 = get_msg(2 * i + 1)
            pr = m0 * m1
            sc = c0 + c1
            mx = jnp.max(pr, axis=0)
            need = mx < _THRESH
            pr = pr * jnp.where(need, _RESCALE, 1.0)[None, :]
            sc = sc + need.astype(jnp.float32)
            all_scr[i] = pr
            sc_scr[i] = sc
            return 0

        jax.lax.fori_loop(0, n_int, body, 0, unroll=unroll)

        broot = all_scr[n_int - 1]
        mleaf0 = jnp.dot(pres_ref[0], tip_ref[0], precision=HI,
                         preferred_element_type=jnp.float32)
        site0 = jnp.sum(wf_ref[:] * broot * mleaf0, axis=0)
        site0 = jnp.maximum(site0, 1e-37)
        lp = jnp.log(site0) - sc_scr[n_int - 1] * _LOG_RESCALE
        out_ref[0, :] = jnp.logaddexp(lp, loginv_ref[0, :])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, S, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, CS, CS), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, CS, S), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CS, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pt), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_int, CS, pt), jnp.float32),
            pltpu.VMEM((n_int, pt), jnp.float32),
        ],
    )

    from iqtree2_tpu.ops import pruning

    @jax.jit
    def lg(b):
        P = pruning.transition_tensors(b, pack)
        pres = P.reshape(E, CS, S)
        eye_c = jnp.eye(C, dtype=P.dtype)
        pbd = jnp.einsum("ecxy,cd->ecxdy", P, eye_c).reshape(E, CS, CS)
        lp = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        )(flat_src, flat_eid, tipP, pbd, pres, wf[:, None],
          pack["log_ptn_invar"][None, :])
        return jnp.sum(pw * lp[0])

    return lg


def main():
    print("device:", jax.devices()[0])
    for ntaxa in (64, 256):
        eng, sched_tree = make(ntaxa, 16384)
        from iqtree2_tpu.tree.schedule import build_schedule
        sched = sched_tree
        blens = jnp.asarray(sched.blens, jnp.float32)
        for pt in (512, 1024, 2048):
            scr = sched.n_int * 16 * pt * 4
            if scr > 11 * 2**20:
                continue
            for unroll in (1, 2, 4):
                for cf in (False, True):
                    try:
                        lg = build(eng, sched, pt, unroll, cf)
                        v = float(lg(blens))
                        t = timeit(lg, blens, n=20)
                        print(f"ntaxa={ntaxa} pt={pt} unroll={unroll} "
                              f"condfree={cf}: {t*1e3:.3f} ms  logL={v:.1f}")
                    except Exception as ex:
                        print(f"ntaxa={ntaxa} pt={pt} unroll={unroll} "
                              f"condfree={cf}: FAIL {str(ex)[:120]}")


if __name__ == "__main__":
    main()
