"""Pallas TPU kernel: whole-tree Felsenstein pruning in one kernel launch.

Design (the TPU analog of the reference's pattern-slab threading,
tree/phylokernelnew.h:1263-1290 — each OpenMP thread runs the *entire*
traversal on its contiguous pattern slab, keeping partials hot in cache):

  grid = pattern tiles. Each grid step owns a [*, pt] pattern tile and runs
  the full postorder traversal with ALL internal partials resident in VMEM
  scratch — no HBM round-trips between nodes, no XLA scan-carry copies, no
  level padding. Per node: two [CS, CS] x [CS, pt] MXU dots (categories
  folded into the state dimension as a block-diagonal operator), an
  elementwise product, and a per-pattern underflow rescale; leaves use the
  compact [CS, S] x [S, pt] form (tips are category-independent).

The kernel emits per-pattern site log-likelihoods (already corrected for
scaling and invariant sites); the weighted sum / ASC correction / psum stay
in XLA so the sharded paths reuse them unchanged.

Only float32 runs here; float64 (CPU parity tests) falls back to
ops/pruning.down_pass.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iqtree2_tpu.ops.prec import (MM_MODE as MODE, _mm, _mm2, _split_x,
                                  split_hilo, tip_dtype)

# float32 scaling constants (must match ops/pruning.scaling_consts)
_THRESH = 2.0 ** -30
_RESCALE = 2.0 ** 30
_LOG_RESCALE = 30.0 * float(np.log(2.0))

# VMEM budget for scratch + pipeline blocks (bytes); leave headroom for the
# compiler below the ~16 MB/core physical VMEM.
VMEM_BUDGET = 12 * 1024 * 1024


def pick_pattern_tile(Pp: int, L: int, n_int: int, CS: int, S: int,
                      n_edges: int) -> int | None:
    """Largest pattern tile that fits the VMEM budget, or None if even the
    smallest (128) does not fit."""
    for pt in (4096, 2048, 1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        scratch = n_int * CS * pt * 4 + n_int * pt * 4       # partials + sc
        tiles = 2 * L * S * pt * 4                           # tip dbl-buffer
        mats = n_edges * (CS * CS + CS * S) * 4
        misc = 4 * pt * 4 * 2
        if scratch + tiles + mats + misc <= VMEM_BUDGET:
            return pt
    return None


def _make_kernel(L: int, n_int: int, pt: int):
    def kernel(src_ref, eid_ref,                       # scalar prefetch
               tip_ref, pbd_ref, pres_ref, wf_ref, loginv_ref,
               out_ref,
               all_scr, sc_scr):
        """One pattern tile: full postorder traversal + root reduction.

        src_ref: [2*n_int] unified child rows (0..L-1 tips, L.. internal)
        eid_ref: [2*n_int] child edge ids
        tip_ref: [L, S, pt] leaf partials (no category broadcast)
        pbd_ref: [E, CS, CS] block-diagonal transition operators
        pres_ref: [E, CS, S] leaf-child form (P reshaped, no block structure)
        wf_ref: [CS, 1] root weights = cat_weight[c] * root_freqs[c, x]
        loginv_ref: [1, pt] log invariant-site likelihood
        out_ref: [1, pt] site log-likelihood
        all_scr: [n_int, CS, pt] internal partials
        sc_scr: [n_int, pt] float32 rescale counts
        """

        def get_msg(slot_idx):
            s = src_ref[slot_idx]
            e = eid_ref[slot_idx]

            def leaf():
                return (_mm(pres_ref[e], tip_ref[s], MODE),
                        jnp.zeros((pt,), jnp.float32))

            def internal():
                r = s - L
                return (_mm(pbd_ref[e], all_scr[r], MODE),
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
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_int), body, jnp.int32(0))

        # root reduction: fold leaf 0's message, weight, log, invariants
        broot = all_scr[n_int - 1]                           # [CS, pt]
        mleaf0 = _mm(pres_ref[0], tip_ref[0], MODE)          # [CS, pt]
        site0 = jnp.sum(wf_ref[:] * broot * mleaf0, axis=0)  # [pt]
        site0 = jnp.maximum(site0, 1e-37)
        lp = jnp.log(site0) - sc_scr[n_int - 1] * _LOG_RESCALE
        out_ref[0, :] = jnp.logaddexp(lp, loginv_ref[0, :])

    return kernel


def _make_down_export_kernel(L: int, n_int: int, pt: int):
    """Down kernel variant that writes the internal partials and scale
    counts to HBM (consumed by the up-pass kernel / theta buffers)."""

    def kernel(src_ref, eid_ref,
               tip_ref, pbd_ref, pres_ref,
               all_out, sc_out,
               all_scr, sc_scr):
        def get_msg(slot_idx):
            s = src_ref[slot_idx]
            e = eid_ref[slot_idx]

            def leaf():
                return (_mm(pres_ref[e], tip_ref[s], MODE),
                        jnp.zeros((pt,), jnp.float32))

            def internal():
                r = s - L
                return (_mm(pbd_ref[e], all_scr[r], MODE),
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
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_int), body, jnp.int32(0))
        all_out[...] = all_scr[...]
        sc_out[...] = sc_scr[...]

    return kernel


def pick_pattern_tile_export(Pp: int, L: int, n_int: int, CS: int, S: int,
                             n_edges: int) -> int | None:
    """Tile size for the export kernel. Pattern-blocked inputs/outputs are
    double-buffered by the pipeline (2x), scratch is not."""
    for pt in (2048, 1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        scratch = n_int * (CS + 1) * pt * 4
        out_blk = 2 * n_int * (CS + 1) * pt * 4
        tiles = 2 * L * S * pt * 4
        mats = n_edges * (CS * CS + CS * S) * 4
        if scratch + out_blk + tiles + mats <= VMEM_BUDGET:
            return pt
    return None


@functools.partial(jax.jit, static_argnames=("pt",))
def down_pass_pallas(flat_src, flat_eid, tipS, Pfull, pt: int):
    """Down pass exporting internal partials + scales.

    Returns (all_int [n_int, C, S, Pp], sc_int [n_int, Pp] f32).
    """
    E, C, S = Pfull.shape[0], Pfull.shape[1], Pfull.shape[2]
    CS = C * S
    L, _, Pp = tipS.shape
    n_int = flat_src.shape[0] // 2
    n_tiles = Pp // pt

    tipS = tipS.astype(tip_dtype(MODE))
    pres = jnp.swapaxes(split_hilo(Pfull.reshape(E, CS, S), MODE), 0, 1)
    eye_c = jnp.eye(C, dtype=Pfull.dtype)
    pbd = jnp.einsum("ecxy,cd->ecxdy", Pfull, eye_c).reshape(E, CS, CS)
    pbd = jnp.swapaxes(split_hilo(pbd, MODE), 0, 1)
    K = pbd.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, S, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K, CS, CS), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K, CS, S), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_int, CS, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_int, pt), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_int, CS, pt), jnp.float32),
            pltpu.VMEM((n_int, pt), jnp.float32),
        ],
    )

    all_int, sc_int = pl.pallas_call(
        _make_down_export_kernel(L, n_int, pt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_int, CS, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_int, Pp), jnp.float32),
        ),
    )(flat_src, flat_eid, tipS, pbd, pres)
    return all_int.reshape(n_int, C, S, Pp), sc_int


def _make_up_kernel(L: int, n_int: int, n_edges: int, pt: int):
    def kernel(src_ref, eid_ref,
               tip_ref, down_ref, dsc_ref, pbd_ref, pbdT_ref, pres_ref,
               rf_ref,
               e_out, esc_out, up_out, usc_out,
               up_scr, usc_scr):
        """Pre-order (reversed postorder) outside-partial sweep.

        down_ref: [n_int, CS, pt] internal down partials; dsc_ref their
        scale counts. rf_ref: [CS, 1] root frequencies (per category).
        Outputs: edge outside partials E [n_edges, CS, pt] + scales, node
        outside partials UP [n_int, CS, pt] + scales.
        """

        # root init: UP[root] = root_freqs * msg(leaf 0); E[0] = rf * B_root
        mleaf0 = _mm(pres_ref[0], tip_ref[0], MODE)
        up_scr[n_int - 1] = rf_ref[:] * mleaf0
        usc_scr[n_int - 1] = jnp.zeros((pt,), jnp.float32)
        e_out[0] = rf_ref[:] * down_ref[n_int - 1]
        esc_out[0] = dsc_ref[n_int - 1]

        def get_msg(slot_idx):
            s = src_ref[slot_idx]
            e = eid_ref[slot_idx]

            def leaf():
                return (_mm(pres_ref[e], tip_ref[s], MODE),
                        jnp.zeros((pt,), jnp.float32))

            def internal():
                r = s - L
                return (_mm(pbd_ref[e], down_ref[r], MODE),
                        dsc_ref[r])

            return jax.lax.cond(s < L, leaf, internal)

        def do_slot(i, k, up, us):
            s = src_ref[2 * i + k]
            e = eid_ref[2 * i + k]
            msib, csib = get_msg(2 * i + (1 - k))
            Ev = up * msib
            esc = us + csib
            mx = jnp.max(Ev, axis=0)
            need = mx < _THRESH
            Ev = Ev * jnp.where(need, _RESCALE, 1.0)[None, :]
            esc = esc + need.astype(jnp.float32)
            e_out[e] = Ev
            esc_out[e] = esc

            @pl.when(s >= L)
            def _():
                upc = _mm(pbdT_ref[e], Ev, MODE)
                mx2 = jnp.max(upc, axis=0)
                need2 = mx2 < _THRESH
                upc = upc * jnp.where(need2, _RESCALE, 1.0)[None, :]
                r = jnp.maximum(s - L, 0)
                up_scr[r] = upc
                usc_scr[r] = esc + need2.astype(jnp.float32)

        def body(ri, _):
            i = n_int - 1 - ri
            up = up_scr[i]
            us = usc_scr[i]
            do_slot(i, 0, up, us)
            do_slot(i, 1, up, us)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_int), body, jnp.int32(0))
        up_out[...] = up_scr[...]
        usc_out[...] = usc_scr[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("pt",))
def up_pass_pallas(flat_src, flat_eid, tipS, all_int, sc_int, Pfull,
                   root_freqs, pt: int):
    """Up pass: edge outside partials E + node outside partials UP.

    all_int/sc_int: down-pass exports ([n_int, C, S, Pp], [n_int, Pp] f32).
    Returns (E [n_edges, C, S, Pp], ES [n_edges, Pp] f32,
             UP [n_int, C, S, Pp], UPS [n_int, Pp] f32).
    """
    E_, C, S = Pfull.shape[0], Pfull.shape[1], Pfull.shape[2]
    CS = C * S
    L, _, Pp = tipS.shape
    n_int = flat_src.shape[0] // 2
    n_edges = E_
    n_tiles = Pp // pt

    tipS = tipS.astype(tip_dtype(MODE))
    pres = jnp.swapaxes(split_hilo(Pfull.reshape(n_edges, CS, S), MODE),
                        0, 1)
    eye_c = jnp.eye(C, dtype=Pfull.dtype)
    pbd0 = jnp.einsum("ecxy,cd->ecxdy", Pfull, eye_c).reshape(
        n_edges, CS, CS)
    pbd = jnp.swapaxes(split_hilo(pbd0, MODE), 0, 1)
    pbdT = jnp.swapaxes(split_hilo(jnp.swapaxes(pbd0, 1, 2), MODE), 0, 1)
    K = pbd.shape[1]
    down_flat = all_int.reshape(n_int, CS, Pp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, S, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_int, CS, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_int, pt), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_edges, K, CS, CS), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_edges, K, CS, CS), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_edges, K, CS, S), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CS, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_edges, CS, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_edges, pt), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_int, CS, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_int, pt), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_int, CS, pt), jnp.float32),
            pltpu.VMEM((n_int, pt), jnp.float32),
        ],
    )

    rf = root_freqs.reshape(CS)
    Ev, ES, UP, UPS = pl.pallas_call(
        _make_up_kernel(L, n_int, n_edges, pt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_edges, CS, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_edges, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_int, CS, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_int, Pp), jnp.float32),
        ),
    )(flat_src, flat_eid, tipS, down_flat, sc_int, pbd, pbdT, pres,
      rf[:, None])
    return (Ev.reshape(n_edges, C, S, Pp), ES,
            UP.reshape(n_int, C, S, Pp), UPS)


def pick_pattern_tile_up(Pp: int, L: int, n_int: int, CS: int, S: int,
                         n_edges: int) -> int | None:
    """Tile size for the up kernel: pattern-blocked inputs (tips, down
    partials) and outputs (E per edge, UP per node) are double-buffered by
    the pipeline (2x); scratch is not."""
    for pt in (1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        ins = 2 * (L * S + n_int * (CS + 1)) * pt * 4
        outs = 2 * (n_edges + n_int) * (CS + 1) * pt * 4
        scratch = n_int * (CS + 1) * pt * 4
        mats = n_edges * (2 * CS * CS + CS * S) * 4
        if ins + outs + scratch + mats <= VMEM_BUDGET:
            return pt
    return None


@functools.partial(jax.jit, static_argnames=("pt",))
def down_sitelp_pallas(flat_src, flat_eid, tipS, Pfull, wf, log_inv,
                       pt: int):
    """Site log-likelihoods for one topology via the Pallas traversal kernel.

    flat_src/flat_eid: [2*n_int] int32 (postorder, 2 child slots per node)
    tipS: [L, S, Pp] float32 leaf partials (category-independent)
    Pfull: [E, C, S, S] float32 transition tensors
    wf: [CS] root weights; log_inv: [Pp]
    Returns lp: [Pp].
    """
    E, C, S = Pfull.shape[0], Pfull.shape[1], Pfull.shape[2]
    CS = C * S
    L, _, Pp = tipS.shape
    n_int = flat_src.shape[0] // 2
    n_tiles = Pp // pt

    tipS = tipS.astype(tip_dtype(MODE))
    pres = jnp.swapaxes(split_hilo(Pfull.reshape(E, CS, S), MODE), 0, 1)
    # block-diagonal [CS, CS]: category blocks on the diagonal
    eye_c = jnp.eye(C, dtype=Pfull.dtype)
    pbd = jnp.einsum("ecxy,cd->ecxdy", Pfull, eye_c).reshape(E, CS, CS)
    pbd = jnp.swapaxes(split_hilo(pbd, MODE), 0, 1)
    K = pbd.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, S, pt), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K, CS, CS), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K, CS, S), lambda i, *_: (0, 0, 0, 0),
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

    lp = pl.pallas_call(
        _make_kernel(L, n_int, pt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_int * 2 * CS * CS * Pp,
            bytes_accessed=(L * S * Pp + Pp) * 4,
            transcendentals=Pp,
        ),
    )(flat_src, flat_eid, tipS, pbd, pres, wf[:, None], log_inv[None, :])
    return lp[0]
