"""Streaming execution plan for the v2 Pallas pruning kernel.

The v1 whole-traversal kernel (ops/pallas_pruning.py) keeps EVERY internal
partial in VMEM, which caps it at ~150 taxa on a 16 MB-VMEM chip. The v2
plan instead schedules the postorder as a sequence of *steps* of up to G
independent nodes and keeps only the LIVE partials in a VMEM ring buffer:

  - step = G nodes; each node's two children are "side A" (child 0) and
    "side B" (child 1).
  - All of a step's side-A internal-child partials live in ONE contiguous
    ring block of R = G*CSP rows (CSP = per-slot row pitch, state*category
    padded to a sublane multiple), written there by the producing steps.
    The side-A message matmul is then a single [R, R] block-diagonal x
    [R, pt] contraction (MXU-shaped), and likewise side B.
  - Tip children never enter the ring: their raw [S, pt] columns are
    streamed from HBM in consumption order and hit a [R, G*S]
    block-diagonal tip operator.
  - Ring blocks are recycled by interval coloring (a block lives from its
    first producer step to its consuming step), so VMEM holds O(live set)
    instead of O(n). Nodes are scheduled greedily in postorder(DFS)
    priority, which keeps the live set near the tree height rather than
    the tree width.

Reference analog: the traversal worklist + memory-saving slot machinery
(tree/phylokernelnew.h:1150 computeTraversalInfo, tree/memslot.h:44
MemSlotVector) redesigned for a static SPMD kernel.

All shapes are bucketed (n_steps to a multiple of 8, ring_blocks to a
multiple of 4) so NNI moves rarely recompile.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from iqtree2_tpu.tree.schedule import TreeSchedule


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket_steps(n: int) -> int:
    """Step-count bucket: power-of-two up to 64, then multiples of 16.
    Coarse buckets keep the kernel shape IDENTICAL across the many
    topologies a tree search visits — each new shape costs a 20-40 s
    remote compile, far more than the padded steps it saves."""
    # ONE bucket (16) for everything small: random 17-64-taxon
    # topologies straddle a height of 8, and an 8/16 flip doubles the
    # compiled program set — a full extra remote-compile pass costs far
    # more than 8 padded steps (round-5 search profiling)
    if n <= 16:
        return 16
    if n <= 64:
        b = 16
        while b < n:
            b *= 2
        return b
    return _round_up(n, 16)


def _bucket_ring(n: int) -> int:
    """Ring-block bucket (same rationale as _bucket_steps)."""
    n = max(n, 2)
    if n <= 8:
        return 8
    if n <= 32:
        b = 8
        while b < n:
            b *= 2
        return b
    return _round_up(n, 8)


@dataclasses.dataclass
class StreamPlan:
    """Host arrays driving the v2 streaming kernel (one topology)."""

    L: int                 # taxa
    n_int: int
    S: int                 # states
    C: int                 # categories
    CS: int                # C * S
    CSP: int               # per-slot row pitch (CS rounded to sublanes)
    G: int                 # nodes per step
    R: int                 # G * CSP ring-block rows
    TS: int                # G * S tip-stream rows per side
    n_steps: int           # bucketed
    n_steps_real: int
    ring_blocks: int       # bucketed

    # [n_steps, 2] int32: ring block id of the A/B RHS block
    src_blk: np.ndarray
    # [n_steps, G, 2] int32: edge id of the A/B child (0 when absent)
    edge: np.ndarray
    # [n_steps, G, 2] int32: 1 if the A/B child is an internal node
    is_int: np.ndarray
    # [n_steps, G, 2] int32: leaf id of the A/B child (L when absent)
    tip: np.ndarray
    # [n_steps, G] int32: ring ROW where this node's output goes
    #   >= 0 ring row; -2 root (goes to the root scratch); -1 padding
    dst_row: np.ndarray
    # [n_steps, G] int32: scale-count ring row (blk*G + slot); -1 pad/root
    dst_sc: np.ndarray
    # [n_steps, G] int32: 1 for a real node
    valid: np.ndarray
    # [n_steps, G] int32: postorder index of the node (n_int when padding)
    node_of: np.ndarray
    # [n_int] int32: (step, slot) of each postorder node — export addressing
    node_step: np.ndarray
    node_slot: np.ndarray
    # ---- up-pass (outside partials) extension; filled by plan_up() ----
    # [n_steps] int32 ring block holding UP values of this step's nodes
    up_blk: np.ndarray | None = None
    up_ring_blocks: int = 0
    # [n_steps, G, 2] int32 up-ring ROW where side-k child's UP goes
    # (-1 = tip child / padding)
    up_dst_row: np.ndarray | None = None
    # [n_steps, G, 2] int32 up sc sidecar slot index (-1 = none)
    up_dst_sc: np.ndarray | None = None

    @property
    def export_rows(self) -> int:
        return self.n_steps * self.R

    def node_export_row(self, i: int) -> int:
        """First row of node i's partial in the export array."""
        return int(self.node_step[i]) * self.R + \
            int(self.node_slot[i]) * self.CSP

    def scalar_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(meta_step [n_steps, 2], meta_slot [n_steps, G, 8]) int32 for
        scalar prefetch."""
        meta_step = self.src_blk.astype(np.int32)
        meta_slot = np.stack([
            self.is_int[:, :, 0], self.is_int[:, :, 1],
            self.dst_row, self.dst_sc, self.valid,
            self.node_of, np.zeros_like(self.valid),
            np.zeros_like(self.valid)], axis=-1).astype(np.int32)
        return meta_step, meta_slot


def slot_pitch(CS: int) -> int:
    """Row pitch per slot: CS rounded up to the fp32 sublane count (8)."""
    return _round_up(max(CS, 8), 8)


def pick_group(CSP: int) -> int:
    """Nodes per step: fill ~128 rows, at least 1, at most 16."""
    return max(1, min(128 // CSP, 16))


def build_stream_plan(sched: TreeSchedule, S: int, C: int,
                      group: int | None = None) -> StreamPlan:
    L = sched.ntaxa
    n_int = sched.n_int
    CS = C * S
    CSP = slot_pitch(CS)
    child_src = sched.child_src          # [n_int, 2] unified (tip<L)
    child_edge = sched.child_edge
    import os
    if group is None and os.environ.get("IQTREE2_TPU_AUTO_GROUP"):
        # Step count is lower-bounded by the internal critical path H, so
        # a G beyond ceil(n_int / H) only pads slots: an unbalanced
        # (caterpillar-ish) tree has ~2 ready nodes per step and G=8
        # would waste 3/4 of every matmul, export row, and ring block.
        # OPT-IN: G then depends on the topology's shape, and tree search
        # visits many topologies — the per-G kernel recompiles through
        # the remote-compile tunnel cost far more than the padding saved
        # (measured round 4: flagship search 277 s vs ~130 s).
        depth = np.zeros(n_int, dtype=np.int64)
        for i in range(n_int):           # postorder: children first
            for k in range(2):
                s = child_src[i, k]
                if s >= L:
                    depth[i] = max(depth[i], depth[s - L] + 1)
        H = int(depth.max()) + 1 if n_int else 1
        g_need = -(-n_int // max(H, 1))
        G = 1
        while G < g_need:
            G *= 2
        G = min(G, pick_group(CSP))
    elif group is None:
        G = pick_group(CSP)
    else:
        G = group
    R = G * CSP
    TS = G * S

    # native planner (native/iqtree2_native.cpp it2_plan_stream) covers
    # phases 1+2 with identical tie-breaking; fall back to Python below
    from iqtree2_tpu import native as _native
    nat = _native.plan_stream(child_src, L, G)
    if nat is not None:
        step_of_n, slot_of_n, src_blk_n, dst_blk_n, dst_slot_n, \
            n_steps_real, ring_raw = nat
        return _assemble_plan(
            sched, L, n_int, S, C, CS, CSP, G, R, TS,
            step_of_n.astype(np.int64), slot_of_n.astype(np.int64),
            src_blk_n.astype(np.int64), dst_blk_n.astype(np.int64),
            dst_slot_n.astype(np.int64), n_steps_real,
            _bucket_ring(int(ring_raw)))

    # --- phase 1: greedy step schedule, postorder(DFS)-priority ----------
    n_children_left = np.zeros(n_int, dtype=np.int64)
    parents = np.full(n_int, -1, dtype=np.int64)     # postorder idx parent
    parent_side = np.zeros(n_int, dtype=np.int64)
    for i in range(n_int):
        for k in range(2):
            s = child_src[i, k]
            if s >= L:
                n_children_left[i] += 1
                parents[s - L] = i
                parent_side[s - L] = k

    # Priority: ready nodes that CONSUME live ring slots first (they shrink
    # the live set and unlock their parents), cherries (which open new
    # chains) last; postorder index as tiebreak. This fills steps close to
    # n_int/G while keeping the live set near G * height instead of the
    # tree width.
    import heapq
    has_int_child = (child_src >= L).any(axis=1)

    def prio(i):
        return (0 if has_int_child[i] else 1, i)

    ready = [prio(i) for i in range(n_int) if n_children_left[i] == 0]
    heapq.heapify(ready)
    steps: list[list[int]] = []
    step_of = np.full(n_int, -1, dtype=np.int64)
    slot_of = np.full(n_int, -1, dtype=np.int64)
    done = 0
    while done < n_int:
        cur: list[int] = []
        while ready and len(cur) < G:
            cur.append(heapq.heappop(ready)[1])
        if not cur:
            raise RuntimeError("stream scheduling stalled")
        s_idx = len(steps)
        for g, i in enumerate(cur):
            step_of[i] = s_idx
            slot_of[i] = g
        steps.append(cur)
        done += len(cur)
        for i in cur:
            p = parents[i]
            if p >= 0:
                n_children_left[p] -= 1
                if n_children_left[p] == 0:
                    heapq.heappush(ready, prio(p))

    n_steps_real = len(steps)
    n_steps = _bucket_steps(n_steps_real)

    # --- phase 2: ring-block assignment (interval coloring) --------------
    # Block (s, side) is live from its first producer's step to step s.
    first_write = np.full((n_steps_real, 2), -1, dtype=np.int64)
    for i in range(n_int):
        p = parents[i]
        if p < 0:
            continue
        ps, side = step_of[p], parent_side[i]
        w = step_of[i]
        if first_write[ps, side] < 0 or w < first_write[ps, side]:
            first_write[ps, side] = w

    # intervals sorted by start; greedy reuse of freed blocks
    intervals = []   # (start, end, s, side)
    for s in range(n_steps_real):
        for side in range(2):
            if first_write[s, side] >= 0:
                intervals.append((first_write[s, side], s, s, side))
    intervals.sort()
    blk_of = np.zeros((n_steps_real, 2), dtype=np.int64)   # default 0
    free: list[int] = []
    frees_at: dict[int, list[int]] = {}
    next_blk = 1   # block 0 = permanent dummy (for step-sides with no
    #                internal children; the matmul operator there is zero)
    import heapq as hq
    active: list[tuple[int, int]] = []   # (end, blk)
    # end == start reuse is safe: within a grid step the kernel reads all
    # RHS blocks before issuing any writes.
    for start, end, s, side in intervals:
        while active and active[0][0] <= start:
            _, b = hq.heappop(active)
            free.append(b)
        if free:
            b = free.pop()
        else:
            b = next_blk
            next_blk += 1
        blk_of[s, side] = b
        hq.heappush(active, (end, b))
    ring_blocks = _bucket_ring(next_blk)

    # --- phase 3: flat arrays --------------------------------------------
    src_blk_flat = np.zeros((n_steps_real, 2), dtype=np.int64)
    src_blk_flat[:, :] = blk_of
    dst_blk_arr = np.full(n_int, -2, dtype=np.int64)
    dst_slot_arr = np.full(n_int, -1, dtype=np.int64)
    for i in range(n_int):
        p = parents[i]
        if p >= 0:
            dst_blk_arr[i] = blk_of[step_of[p], parent_side[i]]
            dst_slot_arr[i] = slot_of[p]
    return _assemble_plan(sched, L, n_int, S, C, CS, CSP, G, R, TS,
                          step_of, slot_of, src_blk_flat, dst_blk_arr,
                          dst_slot_arr, n_steps_real, ring_blocks)


def _assemble_plan(sched, L, n_int, S, C, CS, CSP, G, R, TS,
                   step_of, slot_of, blk_of_steps, dst_blk_arr,
                   dst_slot_arr, n_steps_real, ring_blocks) -> StreamPlan:
    """Phase 3: flat bucketed arrays from the schedule + block assignment
    (shared by the Python and native planners)."""
    child_src = sched.child_src
    child_edge = sched.child_edge
    n_steps = _bucket_steps(n_steps_real)

    src_blk = np.zeros((n_steps, 2), dtype=np.int32)
    src_blk[:n_steps_real] = blk_of_steps[:n_steps_real]
    edge = np.zeros((n_steps, G, 2), dtype=np.int32)
    is_int = np.zeros((n_steps, G, 2), dtype=np.int32)
    tip = np.full((n_steps, G, 2), L, dtype=np.int32)
    dst_row = np.full((n_steps, G), -1, dtype=np.int32)
    dst_sc = np.full((n_steps, G), -1, dtype=np.int32)
    valid = np.zeros((n_steps, G), dtype=np.int32)
    node_of = np.full((n_steps, G), n_int, dtype=np.int32)
    node_step = np.asarray(step_of, dtype=np.int32).copy()
    node_slot = np.asarray(slot_of, dtype=np.int32).copy()

    for i in range(n_int):
        s, g = int(step_of[i]), int(slot_of[i])
        valid[s, g] = 1
        node_of[s, g] = i
        for k in range(2):
            cs_ = child_src[i, k]
            edge[s, g, k] = child_edge[i, k]
            if cs_ >= L:
                is_int[s, g, k] = 1
            else:
                tip[s, g, k] = cs_
        if dst_blk_arr[i] == -2:
            dst_row[s, g] = -2     # root
        else:
            b = int(dst_blk_arr[i])
            dst_row[s, g] = b * R + int(dst_slot_arr[i]) * CSP
            dst_sc[s, g] = b * G + int(dst_slot_arr[i])

    return StreamPlan(
        L=L, n_int=n_int, S=S, C=C, CS=CS, CSP=CSP, G=G, R=R, TS=TS,
        n_steps=n_steps, n_steps_real=n_steps_real, ring_blocks=ring_blocks,
        src_blk=src_blk, edge=edge, is_int=is_int, tip=tip,
        dst_row=dst_row, dst_sc=dst_sc, valid=valid, node_of=node_of,
        node_step=node_step, node_slot=node_slot)


def plan_up(plan: StreamPlan) -> StreamPlan:
    """Fill the up-pass fields: UP-ring block per step (interval coloring
    in REVERSE time — a step's UP block is written by its nodes' parents,
    which run earlier in the up sweep) and per-(step, slot, side) child
    UP destination rows. Mirrors the down-pass phase-2 logic."""
    if plan.up_blk is not None:
        return plan
    n_real = plan.n_steps_real
    n_steps = plan.n_steps
    G, R, CSP = plan.G, plan.R, plan.CSP
    L = plan.L

    def ut(s):   # up-time of down-step s
        return n_real - 1 - s

    # first writer (in up-time) of each step's UP block = the smallest
    # up-time among its nodes' parents; the root's block is written at
    # up-time 0 (kernel init). Parent of an internal child is recovered
    # from the edge ids (internal child edge id = L + child postorder).
    first_w = np.full(n_real, -1, dtype=np.int64)
    parents = np.full(plan.n_int, -1, dtype=np.int64)
    for s in range(n_real):
        for g in range(G):
            if not plan.valid[s, g]:
                continue
            for k in range(2):
                if plan.is_int[s, g, k]:
                    child = int(plan.edge[s, g, k]) - L
                    parents[child] = plan.node_of[s, g]
    for i in range(plan.n_int):
        p = parents[i]
        s = int(plan.node_step[i])
        w = 0 if p < 0 else ut(int(plan.node_step[p]))
        if first_w[s] < 0 or w < first_w[s]:
            first_w[s] = w

    intervals = []
    for s in range(n_real):
        if first_w[s] >= 0:
            intervals.append((int(first_w[s]), ut(s), s))
    intervals.sort()
    import heapq as hq
    blk = np.zeros(n_steps, dtype=np.int32)
    free: list[int] = []
    active: list[tuple[int, int]] = []
    next_blk = 1
    for start, end, s in intervals:
        while active and active[0][0] <= start:
            free.append(hq.heappop(active)[1])
        b = free.pop() if free else next_blk
        if b == next_blk:
            next_blk += 1
        blk[s] = b
        hq.heappush(active, (end, b))
    up_ring_blocks = _bucket_ring(next_blk)

    up_dst_row = np.full((n_steps, G, 2), -1, dtype=np.int32)
    up_dst_sc = np.full((n_steps, G, 2), -1, dtype=np.int32)
    for s in range(n_real):
        for g in range(G):
            if not plan.valid[s, g]:
                continue
            for k in range(2):
                if plan.is_int[s, g, k]:
                    child = int(plan.edge[s, g, k]) - L
                    cs = int(plan.node_step[child])
                    cg = int(plan.node_slot[child])
                    up_dst_row[s, g, k] = blk[cs] * R + cg * CSP
                    up_dst_sc[s, g, k] = blk[cs] * G + cg

    plan.up_blk = blk
    plan.up_ring_blocks = up_ring_blocks
    plan.up_dst_row = up_dst_row
    plan.up_dst_sc = up_dst_sc
    return plan


def up_scalar_arrays(plan: StreamPlan):
    """(meta_step_up [n_steps, 4], meta_slot_up [n_steps, G, 8]) int32:
    per-step up-ring block + root bookkeeping, per-slot UP destinations.

    meta_step_up: [up_blk, root_flag?, root_row, 0]
    meta_slot_up: [updstA_row, updstB_row, updstA_sc, updstB_sc,
                   valid, is_intA, is_intB, 0]"""
    plan = plan_up(plan)
    n_steps, G = plan.n_steps, plan.G
    ms = np.zeros((n_steps, 4), dtype=np.int32)
    ms[:, 0] = plan.up_blk
    # root row in the up ring
    root_i = None
    for i in range(plan.n_int):
        s, g = int(plan.node_step[i]), int(plan.node_slot[i])
        if plan.dst_row[s, g] == -2:
            root_i = i
    rs, rg = int(plan.node_step[root_i]), int(plan.node_slot[root_i])
    ms[:, 1] = plan.up_blk[rs] * plan.R + rg * plan.CSP
    ms[:, 2] = plan.up_blk[rs] * plan.G + rg
    sl = np.zeros((n_steps, G, 8), dtype=np.int32)
    sl[:, :, 0] = plan.up_dst_row[:, :, 0]
    sl[:, :, 1] = plan.up_dst_row[:, :, 1]
    sl[:, :, 2] = plan.up_dst_sc[:, :, 0]
    sl[:, :, 3] = plan.up_dst_sc[:, :, 1]
    sl[:, :, 4] = plan.valid
    sl[:, :, 5] = plan.is_int[:, :, 0]
    sl[:, :, 6] = plan.is_int[:, :, 1]
    return ms, sl


def plan_vmem_bytes(plan: StreamPlan, pt: int, export: bool) -> int:
    """Estimated VMEM bytes for the kernel at pattern tile pt."""
    ring = plan.ring_blocks * plan.R * pt * 4
    sc = plan.ring_blocks * plan.G * 8 * pt * 4 if export else 0
    # double-buffered streamed ins: tips x2 sides, ops, tipops (+ tiny)
    ins = 2 * (2 * plan.TS * pt * 4
               + 2 * plan.R * plan.R * 4
               + 2 * plan.R * plan.TS * 4
               + plan.S * pt * 4 + pt * 4)
    outs = 2 * pt * 4
    if export:
        outs += 2 * (plan.R + plan.G) * pt * 4
    scratch = (plan.CSP + 8) * pt * 4
    return ring + sc + ins + outs + scratch


def pick_tile(plan: StreamPlan, Pp: int,
              budget: int = 13 * 1024 * 1024, export: bool = False
              ) -> int | None:
    for pt in (2048, 1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        if plan_vmem_bytes(plan, pt, export) <= budget:
            return pt
    return None


def edge_maps(plan: StreamPlan, sched: TreeSchedule):
    """Host maps from edge ids into the streaming exports.

    Returns int32 arrays:
      e_step/e_side/e_slot [n_edges]: where edge e's outside partial E
        lives in the up-kernel export (edge 0 = root-leaf fold -> -1);
      d_istip/d_tip/d_step/d_slot [n_edges]: where edge e's child-side
        (down) partial lives (tip id, or node export (step, slot))."""
    n_edges = sched.n_edges
    L = plan.L
    e_step = np.full(n_edges, -1, dtype=np.int32)
    e_side = np.zeros(n_edges, dtype=np.int32)
    e_slot = np.zeros(n_edges, dtype=np.int32)
    for s in range(plan.n_steps_real):
        for g in range(plan.G):
            if not plan.valid[s, g]:
                continue
            for k in range(2):
                e = int(plan.edge[s, g, k])
                e_step[e] = s
                e_side[e] = k
                e_slot[e] = g
    d_istip = np.zeros(n_edges, dtype=np.int32)
    d_tip = np.zeros(n_edges, dtype=np.int32)
    d_step = np.zeros(n_edges, dtype=np.int32)
    d_slot = np.zeros(n_edges, dtype=np.int32)
    for e in range(n_edges):
        src = int(sched.edge_src[e])
        if src < L:
            d_istip[e] = 1
            d_tip[e] = src
        else:
            i = src - L
            d_step[e] = int(plan.node_step[i])
            d_slot[e] = int(plan.node_slot[i])
    return (e_step, e_side, e_slot, d_istip, d_tip, d_step, d_slot)


def pick_tile_up(plan: StreamPlan, Pp: int,
                 budget: int = 13 * 1024 * 1024) -> int | None:
    """Pattern tile for the streaming up kernel."""
    plan_up(plan)
    for pt in (1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        ring = plan.up_ring_blocks * plan.R * pt * 4
        sc = plan.up_ring_blocks * plan.G * 8 * pt * 4
        ins = 2 * ((2 * plan.R + 2 * plan.G + 2 * plan.TS) * pt * 4
                   + 2 * plan.R * plan.R * 4
                   + 2 * plan.R * plan.TS * 4
                   + (plan.S + plan.CSP + 1) * pt * 4)
        outs = 2 * (3 * plan.R + 3 * plan.G) * pt * 4
        if ring + sc + ins + outs <= budget:
            return pt
    return None


def pick_tile_theta(plan: StreamPlan, Pp: int,
                    budget: int = 6 * 1024 * 1024) -> int | None:
    # budget is ~half the 13 MB used elsewhere: the measured VMEM of this
    # kernel (Mosaic scoped allocation) runs ~2x this estimate due to
    # pipeline multi-buffering of the wide in/out streams
    """Pattern tile for the theta-mode up kernel (extra V/U^T operator
    streams in, packed theta buffers out)."""
    plan_up(plan)
    for pt in (1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        ring = plan.up_ring_blocks * plan.R * pt * 4
        sc = plan.up_ring_blocks * plan.G * 8 * pt * 4
        ins = 2 * ((2 * plan.R + 2 * plan.G + 2 * plan.TS) * pt * 4
                   + 4 * plan.R * plan.R * 4
                   + 4 * plan.R * plan.TS * 4
                   + (plan.S + plan.CSP + 1) * pt * 4) \
            + plan.R * plan.R * 4
        outs = 2 * (2 * plan.R + 2 * plan.G) * pt * 4
        if ring + sc + ins + outs <= budget:
            return pt
    return None


def pick_tile_export(plan: StreamPlan, Pp: int,
                     budget: int = 13 * 1024 * 1024) -> int | None:
    """Pattern tile for the down kernel in export mode (extra outputs)."""
    for pt in (1024, 512, 256, 128):
        if Pp % pt != 0:
            continue
        base = plan_vmem_bytes(plan, pt, export=True)
        extra = 2 * (2 * plan.R + 2 * plan.G) * pt * 4
        if base + extra <= budget:
            return pt
    return None
