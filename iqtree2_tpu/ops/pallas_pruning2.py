"""Streaming Pallas pruning kernel (v2): arbitrary tree size, MXU-packed.

One kernel launch computes site log-likelihoods for a whole topology.
grid = (pattern tiles, schedule steps); within a pattern tile the steps run
sequentially with the LIVE internal partials held in a VMEM ring buffer
(allocated by tree/plan2.py interval coloring), so VMEM usage is
O(live set * tile) instead of O(n_int * tile) — this is what lets the same
kernel serve 16 and 10,000 taxa.

Per step (G nodes), the children messages are TWO MXU-shaped matmuls per
side:  [R, R] block-diagonal operator  x  [R, pt] contiguous ring block
    + [R, TSP] tip operator           x  [TSP, pt] streamed raw tips
(R = G*CSP rows = up to 128), followed by the pairwise product, per-node
underflow rescale, and scattered [CSP, pt] writes into the consuming ring
blocks. Operators are rebuilt per evaluation in XLA from the transition
tensors (build_ops); raw tip columns are re-gathered per topology
(build_tip_streams) and streamed from HBM in consumption order.

Reference analog: computePartialLikelihoodSIMD over a traversal worklist
(tree/phylokernelnew.h:1263-1290) + the memory-saving slot machinery
(tree/memslot.h:44), fused into one static SPMD program.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iqtree2_tpu.tree.plan2 import StreamPlan

_THRESH = 2.0 ** -30
_RESCALE = 2.0 ** 30
_LOG_RESCALE = 30.0 * float(np.log(2.0))
from iqtree2_tpu.ops.prec import (MM_MODE as MODE,       # noqa: E402
                                  _mm, _mm2, _split_x, split_hilo,
                                  tip_dtype)
HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------- XLA-side builders
def build_ops(P, edge, is_int, tip, L: int, CSP: int):
    """Per-eval operator streams from transition tensors.

    P: [E, C, S, S]; edge/is_int/tip: [n_steps, G, 2] int32.
    Returns (opA, opB [n_steps, R, R], topA, topB [n_steps, R, TSP],
             pres0 [CSP, SP]).
    """
    n_steps, G, _ = edge.shape
    E, C, S, _ = P.shape
    CS = C * S
    R = G * CSP
    TSP = _round_up(G * S, 8)
    SP = max(8, S)
    eyeC = jnp.eye(C, dtype=P.dtype)
    eyeG = jnp.eye(G, dtype=P.dtype)

    def one_side(k):
        Pe = P[edge[:, :, k]]                       # [n, G, C, S, S]
        mi = is_int[:, :, k].astype(P.dtype)[:, :, None, None]
        blk = jnp.einsum("ngcxy,cd->ngcxdy", Pe,
                         eyeC).reshape(n_steps, G, CS, CS)
        blk = blk * mi
        blk = jnp.pad(blk, ((0, 0), (0, 0), (0, CSP - CS), (0, CSP - CS)))
        ops = jnp.einsum("ngab,gh->ngahb", blk,
                         eyeG).reshape(n_steps, R, R)
        mt = (tip[:, :, k] < L).astype(P.dtype)[:, :, None, None]
        pres = Pe.reshape(n_steps, G, CS, S) * mt
        pres = jnp.pad(pres, ((0, 0), (0, 0), (0, CSP - CS), (0, 0)))
        tops = jnp.einsum("ngas,gh->ngahs", pres,
                          eyeG).reshape(n_steps, R, G * S)
        tops = jnp.pad(tops, ((0, 0), (0, 0), (0, TSP - G * S)))
        # [n, K, R, *] hi/lo stacks (K=2 for x3, else 1) — see ops/prec.py
        return (jnp.swapaxes(split_hilo(ops, MODE), 0, 1),
                jnp.swapaxes(split_hilo(tops, MODE), 0, 1))

    opA, topA = one_side(0)
    opB, topB = one_side(1)
    pres0 = jnp.pad(P[0].reshape(CS, S),
                    ((0, CSP - CS), (0, SP - S)))
    return opA, opB, topA, topB, pres0


def build_tip_streams(tipP, tip, TSP: int):
    """Per-topology raw tip streams in consumption order.

    tipP: [L, S, Pp]; tip: [n_steps, G, 2] (leaf id, L = absent).
    Returns (tipA, tipB [n_steps, TSP, Pp], tip0 [SP, Pp])."""
    L, S, Pp = tipP.shape
    n_steps, G, _ = tip.shape
    SP = max(8, S)
    tp = jnp.concatenate(
        [tipP, jnp.zeros((1, S, Pp), tipP.dtype)], axis=0)

    dt = tip_dtype(MODE)   # 0/1 ambiguity codes: exact in bf16

    def side(k):
        t = tp[tip[:, :, k]].reshape(n_steps, G * S, Pp)
        return jnp.pad(t, ((0, 0), (0, TSP - G * S), (0, 0))).astype(dt)

    tip0 = jnp.pad(tipP[0], ((0, SP - S), (0, 0)))
    return side(0), side(1), tip0


# ------------------------------------------------------------------- kernel
def _make_kernel(G: int, CSP: int, R: int, n_steps: int, pt: int,
                 export: bool, slim: bool = False):
    """Streaming traversal kernel.

    sitelp mode (export=False): per-node scale counts are NOT tracked —
    every rescale event propagates multiplicatively to the root, so ONE
    per-pattern accumulator of rescale events (masked to valid nodes)
    recovers the root scale exactly. This removes all per-slot dynamic
    scale reads/writes from the hot path.

    export mode: per-node cumulative scale counts are kept in a sidecar
    ring at 8-row pitch (Mosaic dynamic stores must be sublane-aligned)
    and exported alongside the partials.

    slim export mode (export=True, slim=True): the theta-pass feeder —
    exports only what the theta up-kernel consumes (rhs blocks + child
    scale rows) plus the ROOT partial/scale as dedicated outputs,
    skipping the [n_steps, R, Pp] per-node partial export entirely
    (1 GB/round of pure waste at 1000 taxa x 16k patterns).
    """
    def kernel(ms_ref, sl_ref,
               tipA, tipB, opA, opB, topA, topB, pres0, wf, tip0, loginv,
               *rest):
        if export and slim:
            (lp_out, rhsA_out, rhsB_out, scA_out, scB_out, root_out,
             rootsc_out) = rest[:7]
            ring, scr, broot, scroot = rest[7:]
        elif export:
            (lp_out, part_out, sc_out, rhsA_out, rhsB_out, scA_out,
             scB_out) = rest[:7]
            ring, scr, broot, scroot = rest[7:]
        else:
            lp_out = rest[0]
            ring, broot, acc = rest[1:]

        i = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when((i == 0) & (s == 0))
        def _():
            ring[...] = jnp.zeros_like(ring)
            if export:
                scr[...] = jnp.zeros_like(scr)

        if not export:
            @pl.when(s == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

        blkA = ms_ref[s, 0]
        blkB = ms_ref[s, 1]
        ra = ring[pl.ds(pl.multiple_of(blkA * R, R), R), :]
        rb = ring[pl.ds(pl.multiple_of(blkB * R, R), R), :]
        A = _mm(opA[0], ra, MODE) + _mm(topA[0], tipA[0], MODE)
        B = _mm(opB[0], rb, MODE) + _mm(topB[0], tipB[0], MODE)
        prod = (A * B).reshape(G, CSP, pt)
        mx = jnp.max(prod, axis=1)                     # [G, pt]
        need = (mx < _THRESH).astype(jnp.float32)
        prod = prod * jnp.where(need > 0.5, _RESCALE, 1.0)[:, None, :]

        if export:
            # sidecar scale counts: slot (blk*G+g) owns 8 rows at 8-pitch;
            # one contiguous [G*8, pt] read per side covers all G slots.
            rA = scr[pl.ds(pl.multiple_of(blkA * (G * 8), 8), G * 8), :]
            rB = scr[pl.ds(pl.multiple_of(blkB * (G * 8), 8), G * 8), :]
            scs, scAs, scBs = [], [], []
            for g in range(G):
                scA = jnp.where(sl_ref[s, g, 0] > 0, rA[g * 8],
                                jnp.zeros((pt,), jnp.float32))
                scB = jnp.where(sl_ref[s, g, 1] > 0, rB[g * 8],
                                jnp.zeros((pt,), jnp.float32))
                scAs.append(scA)
                scBs.append(scB)
                scs.append(scA + scB + need[g])
        else:
            # root-total accumulator: masked sum of this step's rescales
            tot = jnp.zeros((pt,), jnp.float32)
            for g in range(G):
                vg = (sl_ref[s, g, 4] > 0).astype(jnp.float32)
                tot = tot + need[g] * vg
            acc[0, :] = acc[0, :] + tot

        for g in range(G):
            dst = sl_ref[s, g, 2]
            v = sl_ref[s, g, 4]

            @pl.when((v > 0) & (dst >= 0))
            def _(g=g, dst=dst):
                ring[pl.ds(pl.multiple_of(dst, 8), CSP), :] = prod[g]
                if export:
                    scr[pl.ds(pl.multiple_of(sl_ref[s, g, 3] * 8, 8),
                              8), :] = \
                        jnp.broadcast_to(scs[g][None, :], (8, pt))

            @pl.when((v > 0) & (dst == -2))
            def _(g=g):
                broot[...] = prod[g]
                if export:
                    scroot[...] = jnp.broadcast_to(scs[g][None, :],
                                                   (8, pt))
                    if slim:
                        root_out[...] = prod[g]
                        rootsc_out[...] = jnp.broadcast_to(
                            scs[g][None, :], (8, pt))

        if export:
            if not slim:
                part_out[0] = prod.reshape(R, pt)
                sc_out[0] = jnp.stack(scs)
            # RHS blocks + child scale rows feed the streaming up pass
            rhsA_out[0] = ra
            rhsB_out[0] = rb
            scA_out[0] = jnp.stack(scAs)
            scB_out[0] = jnp.stack(scBs)

        @pl.when(s == n_steps - 1)
        def _():
            m0 = jnp.dot(pres0[...], tip0[...], precision=HI,
                         preferred_element_type=jnp.float32)  # [CSP, pt]
            site0 = jnp.sum(wf[...] * broot[...] * m0, axis=0)
            site0 = jnp.maximum(site0, 1e-37)
            scroot_row = scroot[0, :] if export else acc[0, :]
            lp = jnp.log(site0) - scroot_row * _LOG_RESCALE
            lp_out[0, :] = jnp.logaddexp(lp, loginv[0, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("CSP", "ring_blocks", "pt",
                                             "export", "slim",
                                             "interpret"))
def stream_pass(meta_step, meta_slot, tipA, tipB, opA, opB, topA, topB,
                pres0, wf_pad, tip0, log_inv, CSP: int, ring_blocks: int,
                pt: int, export: bool = False, slim: bool = False,
                interpret: bool = False):
    """Run the streaming traversal.

    Returns lp [Pp] (site log-likelihoods, invariant-corrected), and with
    export=True also (partials [n_steps, R, Pp], scales [n_steps, G, Pp]).
    With export=True, slim=True the per-node partial export is skipped:
    returns (lp, rhsA, rhsB, scA, scB, root_part [CSP, Pp],
    root_sc [Pp]) — the exact inputs of the theta up-pass.
    """
    n_steps, G, _2 = meta_slot.shape[0], meta_slot.shape[1], None
    R = G * CSP
    TSP = tipA.shape[1]
    SP = tip0.shape[0]
    Pp = tipA.shape[2]
    n_tiles = Pp // pt
    K = opA.shape[1]                   # hi/lo stack depth (x3: 2, else 1)

    def im_step4(i, s, *_):
        return (s, 0, 0, 0)

    def im_tile_last(i, s, *_):
        return (s, 0, i)

    in_specs = [
        pl.BlockSpec((1, TSP, pt), im_tile_last, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TSP, pt), im_tile_last, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), im_step4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), im_step4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), im_step4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), im_step4, memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, SP), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, 1), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((1, Pp), jnp.float32)]
    out_specs = [pl.BlockSpec((1, pt), lambda i, s, *_: (0, i),
                              memory_space=pltpu.VMEM)]
    if export and slim:
        out_shape += [
            jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
            jax.ShapeDtypeStruct((CSP, Pp), jnp.float32),
            jax.ShapeDtypeStruct((8, Pp), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, R, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((CSP, pt), lambda i, s, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pt), lambda i, s, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ]
    elif export:
        out_shape += [
            jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, R, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, pt), im_tile_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, pt), im_tile_last, memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_steps),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if export else out_specs[0],
        scratch_shapes=(
            [pltpu.VMEM((ring_blocks * R, pt), jnp.float32)]
            + ([pltpu.VMEM((ring_blocks * G * 8, pt), jnp.float32)]
               if export else [])
            + [pltpu.VMEM((CSP, pt), jnp.float32),
               pltpu.VMEM((8, pt), jnp.float32)]),
    )

    flops_mm = 2 * n_steps * n_tiles * (2 * R * R * pt + 2 * R * TSP * pt)
    out = pl.pallas_call(
        _make_kernel(G, CSP, R, n_steps, pt, export, slim),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if export else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm, bytes_accessed=tipA.size * 8 + opA.size * 8,
            transcendentals=Pp),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta_step, meta_slot, tipA, tipB, opA, opB, topA, topB, pres0,
      wf_pad, tip0, log_inv)
    if export and slim:
        lp, rhsA, rhsB, scA, scB, root_part, root_sc = out
        return lp[0], rhsA, rhsB, scA, scB, root_part, root_sc[0]
    if export:
        lp, parts, scs, rhsA, rhsB, scA, scB = out
        return lp[0], parts, scs, rhsA, rhsB, scA, scB
    return out[0]


def sitelp_v2(P, tipP, plan_arrays, wf, log_inv, CSP: int,
              ring_blocks: int, pt: int, export: bool = False,
              interpret: bool = False):
    """Site log-likelihoods via the streaming kernel.

    P: [E, C, S, S] transition tensors (block-diagonal over C per edge);
    tipP: [L, S, Pp]; plan_arrays: dict of device plan arrays
    (meta_step, meta_slot, edge, is_int, tip); wf: [CS] root weights
    (cat_weight * root_freqs flattened); log_inv: [Pp].
    """
    L = tipP.shape[0]
    meta_step = plan_arrays["p2_meta_step"]
    meta_slot = plan_arrays["p2_meta_slot"]
    edge = plan_arrays["p2_edge"]
    is_int = plan_arrays["p2_int"]
    tip = plan_arrays["p2_tip"]
    G = edge.shape[1]
    TSP = _round_up(G * tipP.shape[1], 8)
    opA, opB, topA, topB, pres0 = build_ops(P, edge, is_int, tip, L, CSP)
    if "p2_tipA" in plan_arrays:
        tipA, tipB, tip0 = (plan_arrays["p2_tipA"],
                            plan_arrays["p2_tipB"],
                            plan_arrays["p2_tip0"])
    else:
        tipA, tipB, tip0 = build_tip_streams(tipP, tip, TSP)
    wf_pad = jnp.pad(wf, (0, CSP - wf.shape[0]))[:, None]
    return stream_pass(meta_step, meta_slot, tipA, tipB, opA, opB,
                       topA, topB, pres0, wf_pad, tip0, log_inv[None, :],
                       CSP=CSP, ring_blocks=ring_blocks, pt=pt,
                       export=export, interpret=interpret)


# -------------------------------------------------------- streaming up pass
def _make_up_kernel(G: int, CSP: int, R: int, n_steps: int, pt: int):
    """Reverse sweep computing per-edge outside partials E and per-node
    outside partials UP, with the live UP values in a VMEM ring.

    For the nodes of down-step s (all slots at once):
      msgX = opX[s] @ rhsX[s] + topX[s] @ tipX[s]   (same as the down pass)
      E(edge to child A) = UP(node) * msgB ; E(B) = UP(node) * msgA
      UP(child X)       = opX[s]^T @ E(X)      (block-diagonal transpose)
    Reference analog: the pre-order outside sweep of
    pruning._up_pass_xla / tree/phylokernelnew.h's theta precomputation.
    """
    def kernel(ms_ref, sl_ref,
               rhsA, rhsB, scA_in, scB_in, opA, opB, topA, topB,
               tipA, tipB, pres0, rf, tip0, rdown, rdsc,
               E_out, Esc_out, up_out, upsc_out,
               upring, upscr):
        i = pl.program_id(0)
        s_rev = pl.program_id(1)
        s = n_steps - 1 - s_rev

        @pl.when((i == 0) & (s_rev == 0))
        def _():
            upring[...] = jnp.zeros_like(upring)
            upscr[...] = jnp.zeros_like(upscr)

        @pl.when(s_rev == 0)
        def _():
            # root: UP = root_freqs * message(leaf 0); sc = 0
            m0 = jnp.dot(pres0[...], tip0[...], precision=HI,
                         preferred_element_type=jnp.float32)
            root_row = ms_ref[0, 1]
            upring[pl.ds(pl.multiple_of(root_row, 8), CSP), :] = \
                rf[...] * m0
            upscr[pl.ds(pl.multiple_of(ms_ref[0, 2] * 8, 8), 8), :] = \
                jnp.zeros((8, pt), jnp.float32)

        blk = ms_ref[s, 0]
        upv = upring[pl.ds(pl.multiple_of(blk * R, R), R), :]
        upsc_rows = upscr[pl.ds(pl.multiple_of(blk * (G * 8), 8),
                                G * 8), :]
        msgA = _mm(opA[0], rhsA[0], MODE) + _mm(topA[0], tipA[0], MODE)
        msgB = _mm(opB[0], rhsB[0], MODE) + _mm(topB[0], tipB[0], MODE)
        EA = (upv * msgB).reshape(G, CSP, pt)
        EB = (upv * msgA).reshape(G, CSP, pt)
        mxA = jnp.max(EA, axis=1)
        mxB = jnp.max(EB, axis=1)
        needA = (mxA < _THRESH).astype(jnp.float32)
        needB = (mxB < _THRESH).astype(jnp.float32)
        EA = EA * jnp.where(needA > 0.5, _RESCALE, 1.0)[:, None, :]
        EB = EB * jnp.where(needB > 0.5, _RESCALE, 1.0)[:, None, :]
        scEA, scEB, upscs = [], [], []
        for g in range(G):
            us = upsc_rows[g * 8]
            upscs.append(us)
            scEA.append(us + scB_in[0, g] + needA[g])
            scEB.append(us + scA_in[0, g] + needB[g])
        E_out[0, 0] = EA.reshape(R, pt)
        E_out[0, 1] = EB.reshape(R, pt)
        Esc_out[0, 0] = jnp.stack(scEA)
        Esc_out[0, 1] = jnp.stack(scEB)
        up_out[0] = upv
        upsc_out[0] = jnp.stack(upscs)

        upA = _mm2(opA[0], _split_x(EA.reshape(R, pt), MODE), MODE,
                   transpose=True)
        upB = _mm2(opB[0], _split_x(EB.reshape(R, pt), MODE), MODE,
                   transpose=True)
        upA3 = upA.reshape(G, CSP, pt)
        upB3 = upB.reshape(G, CSP, pt)
        mxA2 = jnp.max(upA3, axis=1)
        mxB2 = jnp.max(upB3, axis=1)
        nA2 = (mxA2 < _THRESH).astype(jnp.float32)
        nB2 = (mxB2 < _THRESH).astype(jnp.float32)
        upA3 = upA3 * jnp.where(nA2 > 0.5, _RESCALE, 1.0)[:, None, :]
        upB3 = upB3 * jnp.where(nB2 > 0.5, _RESCALE, 1.0)[:, None, :]

        for g in range(G):
            for k, (upc, scE, nd2) in enumerate(
                    ((upA3, scEA, nA2), (upB3, scEB, nB2))):
                dst = sl_ref[s, g, k]

                @pl.when(dst >= 0)
                def _(g=g, k=k, upc=upc, scE=scE, nd2=nd2, dst=dst):
                    upring[pl.ds(pl.multiple_of(dst, 8), CSP), :] = upc[g]
                    upscr[pl.ds(pl.multiple_of(
                        sl_ref[s, g, 2 + k] * 8, 8), 8), :] = \
                        jnp.broadcast_to((scE[g] + nd2[g])[None, :],
                                         (8, pt))

    return kernel


@functools.partial(jax.jit, static_argnames=("CSP", "up_ring_blocks",
                                             "pt", "interpret"))
def stream_up_pass(ms_up, sl_up, rhsA, rhsB, scA, scB,
                   opA, opB, topA, topB, tipA, tipB, pres0, rf_pad,
                   tip0, root_down, root_dsc,
                   CSP: int, up_ring_blocks: int, pt: int,
                   interpret: bool = False):
    """Streaming outside-partial sweep over the down-pass exports.

    Returns (E [n_steps, 2, R, Pp], Esc [n_steps, 2, G, Pp],
             UP [n_steps, R, Pp], UPsc [n_steps, G, Pp]); edge 0 (the
    folded root-leaf edge) is handled by the caller in XLA.
    """
    n_steps, G, _ = sl_up.shape
    R = G * CSP
    TSP = tipA.shape[1]
    SP = tip0.shape[0]
    Pp = tipA.shape[2]
    n_tiles = Pp // pt
    K = opA.shape[1]

    def rev4(i, s_rev, *_):
        return (n_steps - 1 - s_rev, 0, 0, 0)

    def rev_tile(i, s_rev, *_):
        return (n_steps - 1 - s_rev, 0, i)

    in_specs = [
        pl.BlockSpec((1, R, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TSP, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TSP, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, SP), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, 1), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((n_steps, 2, R, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, 2, G, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, 2, R, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, G, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((up_ring_blocks * R, pt), jnp.float32),
            pltpu.VMEM((up_ring_blocks * G * 8, pt), jnp.float32),
        ],
    )
    E, Esc, UP, UPsc = pl.pallas_call(
        _make_up_kernel(G, CSP, R, n_steps, pt),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ms_up, sl_up, rhsA, rhsB, scA, scB, opA, opB, topA, topB,
      tipA, tipB, pres0, rf_pad, tip0, root_down, root_dsc)
    return E, Esc, UP, UPsc


# ----------------------------------------------------- fused theta up pass
def build_theta_ops(pack, edge, is_int, tip, L: int, G: int, CSP: int):
    """Operators for the theta-mode up kernel (XLA, per evaluation).

    Ut_op [R, R]: block-diagonal U^T per (slot, category) — contracts the
    outside partial E into the eigenbasis (a = U^T E). V-side:
    vop [n_steps, R, R] (interior children, is_int-masked) and
    vtip [n_steps, R, TSP] (tip children) compute b = V down(child).
    Together theta = a * b (ops/pruning.edge_thetas, fused in-kernel).
    """
    U = pack["U"][pack["cat_mix"]]      # [C, S, S]
    V = pack["V"][pack["cat_mix"]]
    C, S, _ = U.shape
    CS = C * S
    n_steps = edge.shape[0]
    R = G * CSP
    TSP = _round_up(G * S, 8)
    dt = U.dtype
    eyeG = jnp.eye(G, dtype=dt)

    # [CS, CS] block-diag over categories of U^T / V
    eyeC = jnp.eye(C, dtype=dt)
    ut_cs = jnp.einsum("cxk,cd->ckdx", U, eyeC).reshape(CS, CS)
    v_cs = jnp.einsum("cky,cd->ckdy", V, eyeC).reshape(CS, CS)
    ut_cs = jnp.pad(ut_cs, ((0, CSP - CS), (0, CSP - CS)))
    v_cs = jnp.pad(v_cs, ((0, CSP - CS), (0, CSP - CS)))
    ut_op = jnp.einsum("ab,gh->gahb", ut_cs, eyeG).reshape(R, R)

    def one_side(k):
        mi = is_int[:, :, k].astype(dt)                 # [n, G]
        blk = v_cs[None, None] * mi[:, :, None, None]   # [n, G, CSP, CSP]
        vop = jnp.einsum("ngab,gh->ngahb", blk, eyeG).reshape(n_steps, R, R)
        mt = (tip[:, :, k] < L).astype(dt)              # [n, G]
        # V applied to the raw tip rows (same [S] partial for every c)
        vt = jnp.pad(V.reshape(CS, S), ((0, CSP - CS), (0, 0)))
        tp = vt[None, None] * mt[:, :, None, None]      # [n, G, CSP, S]
        vtip = jnp.einsum("ngas,gh->ngahs", tp, eyeG).reshape(
            n_steps, R, G * S)
        vtip = jnp.pad(vtip, ((0, 0), (0, 0), (0, TSP - G * S)))
        return (jnp.swapaxes(split_hilo(vop, MODE), 0, 1),
                jnp.swapaxes(split_hilo(vtip, MODE), 0, 1))

    vopA, vtipA = one_side(0)
    vopB, vtipB = one_side(1)
    return split_hilo(ut_op, MODE), vopA, vopB, vtipA, vtipB


def _make_theta_kernel(G: int, CSP: int, R: int, n_steps: int, pt: int):
    """Streaming up sweep that emits PACKED per-edge theta buffers
    (theta = (U^T E) * (V down_child)) and their total scale counts,
    instead of exporting E/UP for host-side reassembly.

    This is the branch-optimization hot path: one down export + one theta
    pass + packed Newton replaces the round-3 chain of six exported
    [n_steps, R, Pp] arrays + XLA gathers + U/V einsums
    (VERDICT.md round-3 Weak #4). Reference analog: the theta buffer
    trick, tree/phylokernelnew.h:2050."""
    def kernel(ms_ref, sl_ref,
               rhsA, rhsB, scA_in, scB_in, opA, opB, topA, topB,
               tipA, tipB, pres0, rf, tip0,
               ut_op, vopA, vopB, vtipA, vtipB,
               thA_out, thB_out, tscA_out, tscB_out,
               upring, upscr):
        i = pl.program_id(0)
        s_rev = pl.program_id(1)
        s = n_steps - 1 - s_rev

        @pl.when((i == 0) & (s_rev == 0))
        def _():
            upring[...] = jnp.zeros_like(upring)
            upscr[...] = jnp.zeros_like(upscr)

        @pl.when(s_rev == 0)
        def _():
            m0 = jnp.dot(pres0[...], tip0[...], precision=HI,
                         preferred_element_type=jnp.float32)
            root_row = ms_ref[0, 1]
            upring[pl.ds(pl.multiple_of(root_row, 8), CSP), :] = \
                rf[...] * m0
            upscr[pl.ds(pl.multiple_of(ms_ref[0, 2] * 8, 8), 8), :] = \
                jnp.zeros((8, pt), jnp.float32)

        blk = ms_ref[s, 0]
        upv = upring[pl.ds(pl.multiple_of(blk * R, R), R), :]
        upsc_rows = upscr[pl.ds(pl.multiple_of(blk * (G * 8), 8),
                                G * 8), :]
        rha = _split_x(rhsA[0], MODE)   # consumed by msgA AND bA
        rhb = _split_x(rhsB[0], MODE)
        msgA = _mm2(opA[0], rha, MODE) + _mm(topA[0], tipA[0], MODE)
        msgB = _mm2(opB[0], rhb, MODE) + _mm(topB[0], tipB[0], MODE)
        EA = (upv * msgB).reshape(G, CSP, pt)
        EB = (upv * msgA).reshape(G, CSP, pt)
        mxA = jnp.max(EA, axis=1)
        mxB = jnp.max(EB, axis=1)
        needA = (mxA < _THRESH).astype(jnp.float32)
        needB = (mxB < _THRESH).astype(jnp.float32)
        EA = EA * jnp.where(needA > 0.5, _RESCALE, 1.0)[:, None, :]
        EB = EB * jnp.where(needB > 0.5, _RESCALE, 1.0)[:, None, :]
        scEA, scEB = [], []
        for g in range(G):
            us = upsc_rows[g * 8]
            scEA.append(us + scB_in[0, g] + needA[g])
            scEB.append(us + scA_in[0, g] + needB[g])

        # ---- fused theta: a = U^T E, b = V down(child) ------------------
        ea2 = _split_x(EA.reshape(R, pt), MODE)   # feeds aA AND upA
        eb2 = _split_x(EB.reshape(R, pt), MODE)
        aA = _mm2(ut_op, ea2, MODE)
        aB = _mm2(ut_op, eb2, MODE)
        bA = _mm2(vopA[0], rha, MODE) + _mm(vtipA[0], tipA[0], MODE)
        bB = _mm2(vopB[0], rhb, MODE) + _mm(vtipB[0], tipB[0], MODE)
        thA_out[0] = aA * bA
        thB_out[0] = aB * bB
        tscA_out[0] = jnp.stack(
            [scEA[g] + scA_in[0, g] for g in range(G)])
        tscB_out[0] = jnp.stack(
            [scEB[g] + scB_in[0, g] for g in range(G)])

        # ---- continue the outside sweep into internal children ----------
        upA = _mm2(opA[0], ea2, MODE, transpose=True)
        upB = _mm2(opB[0], eb2, MODE, transpose=True)
        upA3 = upA.reshape(G, CSP, pt)
        upB3 = upB.reshape(G, CSP, pt)
        mxA2 = jnp.max(upA3, axis=1)
        mxB2 = jnp.max(upB3, axis=1)
        nA2 = (mxA2 < _THRESH).astype(jnp.float32)
        nB2 = (mxB2 < _THRESH).astype(jnp.float32)
        upA3 = upA3 * jnp.where(nA2 > 0.5, _RESCALE, 1.0)[:, None, :]
        upB3 = upB3 * jnp.where(nB2 > 0.5, _RESCALE, 1.0)[:, None, :]
        for g in range(G):
            for k, (upc, scE, nd2) in enumerate(
                    ((upA3, scEA, nA2), (upB3, scEB, nB2))):
                dst = sl_ref[s, g, k]

                @pl.when(dst >= 0)
                def _(g=g, k=k, upc=upc, scE=scE, nd2=nd2, dst=dst):
                    upring[pl.ds(pl.multiple_of(dst, 8), CSP), :] = upc[g]
                    upscr[pl.ds(pl.multiple_of(
                        sl_ref[s, g, 2 + k] * 8, 8), 8), :] = \
                        jnp.broadcast_to((scE[g] + nd2[g])[None, :],
                                         (8, pt))

    return kernel


@functools.partial(jax.jit, static_argnames=("CSP", "up_ring_blocks",
                                             "pt", "interpret"))
def stream_theta_pass(ms_up, sl_up, rhsA, rhsB, scA, scB,
                      opA, opB, topA, topB, tipA, tipB, pres0, rf_pad,
                      tip0, ut_op, vopA, vopB, vtipA, vtipB,
                      CSP: int, up_ring_blocks: int, pt: int,
                      interpret: bool = False):
    """Theta-mode streaming up pass.

    Returns (thetaA, thetaB [n_steps, R, Pp], tscA, tscB [n_steps, G, Pp])
    packed in the down-plan (step, side, slot) layout; edge 0 (root-leaf
    fold) is handled by the caller in XLA."""
    n_steps, G, _ = sl_up.shape
    R = G * CSP
    TSP = tipA.shape[1]
    SP = tip0.shape[0]
    Pp = tipA.shape[2]
    n_tiles = Pp // pt
    K = opA.shape[1]

    def rev4(i, s_rev, *_):
        return (n_steps - 1 - s_rev, 0, 0, 0)

    def rev_tile(i, s_rev, *_):
        return (n_steps - 1 - s_rev, 0, i)

    in_specs = [
        pl.BlockSpec((1, R, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TSP, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TSP, pt), rev_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, SP), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CSP, 1), lambda i, s, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, pt), lambda i, s, *_: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, R, R), lambda i, s, *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, R), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, R, TSP), rev4, memory_space=pltpu.VMEM),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, R, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, G, Pp), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, R, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, pt),
                     lambda i, s, *_: (n_steps - 1 - s, 0, i),
                     memory_space=pltpu.VMEM),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((up_ring_blocks * R, pt), jnp.float32),
            pltpu.VMEM((up_ring_blocks * G * 8, pt), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_theta_kernel(G, CSP, R, n_steps, pt),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ms_up, sl_up, rhsA, rhsB, scA, scB, opA, opB, topA, topB,
      tipA, tipB, pres0, rf_pad, tip0, ut_op, vopA, vopB, vtipA, vtipB)


def thetas_v2(P, tipP, pa, pack, CSP: int, ring_blocks: int,
              up_ring_blocks: int, pt: int, ptu: int,
              interpret: bool = False):
    """Packed per-edge theta buffers via the fused streaming kernels.

    Returns (thetaA, thetaB [n_steps, R, Pp], tscA, tscB [n_steps, G, Pp],
    theta0 [C, S, Pp], tsc0 [Pp]) where theta0/tsc0 cover edge 0.
    """
    meta_step = pa["p2_meta_step"]
    meta_slot = pa["p2_meta_slot"]
    edge, is_int, tip = pa["p2_edge"], pa["p2_int"], pa["p2_tip"]
    L, S, Pp = tipP.shape
    C = P.shape[1]
    CS = C * S
    n_steps, G, _ = edge.shape
    TSP = _round_up(G * S, 8)

    opA, opB, topA, topB, pres0 = build_ops(P, edge, is_int, tip, L, CSP)
    if "p2_tipA" in pa:
        tipA, tipB, tip0 = pa["p2_tipA"], pa["p2_tipB"], pa["p2_tip0"]
    else:
        tipA, tipB, tip0 = build_tip_streams(tipP, tip, TSP)
    wf_dummy = jnp.zeros((CSP, 1), jnp.float32)
    log_inv0 = jnp.full((1, Pp), -jnp.inf, jnp.float32)
    _, rhsA, rhsB, scA, scB, root_down, root_dsc = stream_pass(
        meta_step, meta_slot, tipA, tipB, opA, opB, topA, topB, pres0,
        wf_dummy, tip0, log_inv0, CSP=CSP, ring_blocks=ring_blocks,
        pt=pt, export=True, slim=True, interpret=interpret)
    root_freqs = pack["root_freqs"]
    rf = jnp.pad(root_freqs.reshape(CS), (0, CSP - CS))[:, None]

    ut_op, vopA, vopB, vtipA, vtipB = build_theta_ops(
        pack, edge, is_int, tip, L, G, CSP)
    thA, thB, tscA, tscB = stream_theta_pass(
        pa["p2u_meta_step"], pa["p2u_meta_slot"], rhsA, rhsB, scA, scB,
        opA, opB, topA, topB, tipA, tipB, pres0, rf, tip0,
        ut_op, vopA, vopB, vtipA, vtipB,
        CSP=CSP, up_ring_blocks=up_ring_blocks, pt=ptu,
        interpret=interpret)

    # edge 0: E0 = root_freqs * root_down; down0 = tip 0
    Uc = pack["U"][pack["cat_mix"]]
    Vc = pack["V"][pack["cat_mix"]]
    E0 = (rf[:CS] * root_down[:CS]).reshape(C, S, Pp)
    a0 = jnp.einsum("cxk,cxp->ckp", Uc, E0, precision=HI)
    b0 = jnp.einsum("cky,yp->ckp", Vc, tipP[0], precision=HI)
    return thA, thB, tscA, tscB, a0 * b0, root_dsc


def passes_v2(P, tipP, pa, root_freqs, CSP: int, ring_blocks: int,
              up_ring_blocks: int, pt: int, ptu: int,
              interpret: bool = False):
    """Full streaming down + up sweep; returns the standard unified
    buffers consumed by thetas / NNI / ASR:

      (DownPass(all [L+n_int, C, S, Pp], scale), UpPass(edge_E, edge_sc,
       up_in, up_sc))

    pa: dict of device plan arrays (p2_* and p2u_* keys from
    engine.schedule_arrays). The reassembly gathers are plain XLA takes
    over the kernel exports — bandwidth-bound but traversal-free.
    """
    from iqtree2_tpu.ops import pruning as _pr

    meta_step = pa["p2_meta_step"]
    meta_slot = pa["p2_meta_slot"]
    edge, is_int, tip = pa["p2_edge"], pa["p2_int"], pa["p2_tip"]
    L, S, Pp = tipP.shape
    C = P.shape[1]
    CS = C * S
    n_steps, G, _ = edge.shape
    R = G * CSP
    TSP = _round_up(G * S, 8)

    opA, opB, topA, topB, pres0 = build_ops(P, edge, is_int, tip, L, CSP)
    if "p2_tipA" in pa:
        tipA, tipB, tip0 = pa["p2_tipA"], pa["p2_tipB"], pa["p2_tip0"]
    else:
        tipA, tipB, tip0 = build_tip_streams(tipP, tip, TSP)
    wf_dummy = jnp.zeros((CSP, 1), jnp.float32)
    log_inv0 = jnp.full((1, Pp), -jnp.inf, jnp.float32)
    lp, parts, scs, rhsA, rhsB, scA, scB = stream_pass(
        meta_step, meta_slot, tipA, tipB, opA, opB, topA, topB, pres0,
        wf_dummy, tip0, log_inv0, CSP=CSP, ring_blocks=ring_blocks,
        pt=pt, export=True, interpret=interpret)

    node_step = pa["p2_node_step"]
    node_slot = pa["p2_node_slot"]
    n_int = node_step.shape[0]
    parts4 = parts.reshape(n_steps, G, CSP, Pp)
    all_int = parts4[node_step, node_slot, :CS].reshape(n_int, C, S, Pp)
    sc_int = scs[node_step, node_slot]
    tips_b = jnp.broadcast_to(tipP[:, None], (L, C, S, Pp))
    ALL = jnp.concatenate([tips_b.astype(jnp.float32), all_int], axis=0)
    SC = jnp.concatenate([jnp.zeros((L, Pp), jnp.int32),
                          sc_int.astype(jnp.int32)], axis=0)
    dp = _pr.DownPass(ALL, SC)

    # root's down partial + scale feed the up kernel's init and edge 0
    rstep, rslot = pa["p2u_root_step"], pa["p2u_root_slot"]
    root_down = parts4[rstep, rslot]                    # [CSP, Pp]
    root_dsc = scs[rstep, rslot][None, :]               # [1, Pp]
    rf = jnp.pad(root_freqs.reshape(CS), (0, CSP - CS))[:, None]

    E, Esc, UPx, UPsc = stream_up_pass(
        pa["p2u_meta_step"], pa["p2u_meta_slot"], rhsA, rhsB, scA, scB,
        opA, opB, topA, topB, tipA, tipB, pres0, rf, tip0,
        root_down, root_dsc, CSP=CSP, up_ring_blocks=up_ring_blocks,
        pt=ptu, interpret=interpret)

    # per-edge outside partials
    e_step, e_side, e_slot = (pa["p2_e_step"], pa["p2_e_side"],
                              pa["p2_e_slot"])
    E5 = E.reshape(n_steps, 2, G, CSP, Pp)
    eE = E5[jnp.maximum(e_step, 0), e_side, e_slot, :CS].reshape(
        -1, C, S, Pp)
    eSC = Esc[jnp.maximum(e_step, 0), e_side, e_slot]
    # edge 0: outside = root_freqs * root down partial
    e0 = (rf[:CS, :] * root_down[:CS]).reshape(C, S, Pp)
    eE = eE.at[0].set(e0)
    eSC = eSC.at[0].set(root_dsc[0])

    up_in = UPx.reshape(n_steps, G, CSP, Pp)[
        node_step, node_slot, :CS].reshape(n_int, C, S, Pp)
    up_sc = UPsc[node_step, node_slot]
    up = _pr.UpPass(eE, eSC.astype(jnp.int32), up_in,
                    up_sc.astype(jnp.int32))
    return dp, up
