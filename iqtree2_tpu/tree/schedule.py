"""Topology -> static index arrays driving the jitted likelihood kernels.

The tree is rooted (for computation only) at the internal node adjacent to
leaf 0; internal nodes are laid out in postorder. All arrays have shapes that
depend only on the number of taxa, never on the topology, so NNI/SPR moves
never trigger XLA recompilation (SURVEY §7 "index-array-driven pruning").

Edge numbering: every non-root node owns the edge to its parent.
  leaf v           -> edge id v                  (0..L-1)
  internal node i  -> edge id L + postorder(i)   (root excluded)
Total edges = 2L-3 for an unrooted binary tree with L leaves.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from iqtree2_tpu.tree.topology import Tree


@dataclasses.dataclass
class TreeSchedule:
    """Flat arrays describing one rooted traversal of a topology.

    n_int internal nodes, slots padded to 3 children each (root uses 3,
    other internal nodes 2).
    """

    ntaxa: int
    n_int: int
    n_edges: int
    # [n_int, 3]: child pointer — leaf id if leaf, postorder idx if internal
    child_ptr: np.ndarray
    # [n_int, 3]: 1 if child is a leaf
    child_is_leaf: np.ndarray
    # [n_int, 3]: edge id of the child edge
    child_edge: np.ndarray
    # [n_int, 3]: 1 if slot used
    child_valid: np.ndarray
    # [n_edges] branch lengths
    blens: np.ndarray
    # host bookkeeping: edge id -> (child_node, parent_node) original ids
    edge_nodes: list[tuple[int, int]]
    # host: postorder idx -> original node id
    postorder_nodes: list[int]
    root: int

    def to_device_arrays(self) -> dict:
        return dict(
            child_ptr=self.child_ptr, child_is_leaf=self.child_is_leaf,
            child_edge=self.child_edge, child_valid=self.child_valid)


def build_schedule(tree: Tree, root: int | None = None) -> TreeSchedule:
    L = tree.ntaxa
    if root is None:
        root = tree._default_root()
    post = [(v, p) for (v, p) in tree.postorder(root)
            if not tree.is_leaf(v)]
    n_int = len(post)
    order_idx = {v: i for i, (v, p) in enumerate(post)}

    child_ptr = np.zeros((n_int, 3), dtype=np.int32)
    child_is_leaf = np.zeros((n_int, 3), dtype=np.int32)
    child_edge = np.zeros((n_int, 3), dtype=np.int32)
    child_valid = np.zeros((n_int, 3), dtype=np.float32)

    # assign edge ids
    edge_nodes: list[tuple[int, int]] = [None] * (2 * L - 3) \
        if L >= 3 else []
    n_edges = L + n_int - 1
    edge_nodes = [None] * n_edges
    blens = np.zeros(n_edges, dtype=np.float64)

    def edge_id(child: int, parent: int) -> int:
        if tree.is_leaf(child):
            return child
        return L + order_idx[child]

    for i, (v, p) in enumerate(post):
        kids = [u for u in tree.adj[v] if u != p]
        if len(kids) > 3:
            raise ValueError(
                f"node {v} has {len(kids)} children; tree must be binary "
                "(unrooted, rooted at a trifurcating internal node)")
        for k, u in enumerate(kids):
            e = edge_id(u, v)
            child_ptr[i, k] = u if tree.is_leaf(u) else order_idx[u]
            child_is_leaf[i, k] = 1 if tree.is_leaf(u) else 0
            child_edge[i, k] = e
            child_valid[i, k] = 1.0
            edge_nodes[e] = (u, v)
            blens[e] = tree.get_blen(u, v)

    return TreeSchedule(
        ntaxa=L, n_int=n_int, n_edges=n_edges,
        child_ptr=child_ptr, child_is_leaf=child_is_leaf,
        child_edge=child_edge, child_valid=child_valid,
        blens=blens, edge_nodes=edge_nodes,
        postorder_nodes=[v for (v, _) in post], root=root)


def write_blens_to_tree(tree: Tree, sched: TreeSchedule,
                        blens: np.ndarray) -> None:
    """Copy optimized branch lengths back onto the host tree."""
    for e, pair in enumerate(sched.edge_nodes):
        if pair is None:
            continue
        a, b = pair
        tree.set_blen(a, b, float(blens[e]))
