"""Phylogenetic diversity (PD) analysis.

Reference analog: the PDA feature set (pda/, runPDTree main/main.cpp:353):
find the k-taxon subset maximizing total spanned branch length. On trees
the GREEDY algorithm is exact (Steel 2005; the reference's pda greedy
mode), so PD optimization is a host loop:
  start from the two taxa with the largest pairwise path length; then
  repeatedly add the taxon with the largest distance to the current
  Steiner subtree.
"""

from __future__ import annotations

import numpy as np

from iqtree2_tpu.tree.topology import Tree


def pd_score(tree: Tree, taxa: list[int]) -> float:
    """Total branch length of the Steiner subtree spanning `taxa`."""
    taxa = set(taxa)
    if len(taxa) < 2:
        return 0.0
    root = next(iter(taxa))
    # count, per edge, whether it separates two nonempty parts of taxa
    total = 0.0
    for (a, b), ln in tree.blen.items():
        side = set(tree.leaves_under(a, b)) & taxa
        if side and (taxa - side):
            total += ln
    return total


def greedy_pd(tree: Tree, k: int) -> tuple[list[int], float, list[float]]:
    """(taxa, PD, PD-per-step) of the exact greedy k-taxon PD set."""
    L = tree.ntaxa
    k = min(k, L)
    # all-pairs path lengths via per-leaf Dijkstra-free tree walk
    dist = np.zeros((L, L))
    for s in range(L):
        # BFS with accumulated branch lengths
        seen = {s: 0.0}
        stack = [s]
        while stack:
            v = stack.pop()
            for u in tree.adj[v]:
                if u not in seen:
                    seen[u] = seen[v] + tree.get_blen(v, u)
                    stack.append(u)
        for t in range(L):
            dist[s, t] = seen.get(t, 0.0)
    i, j = np.unravel_index(np.argmax(dist[:L, :L]), (L, L))
    chosen = [int(i), int(j)]
    # distance of each leaf to the current Steiner subtree: maintained as
    # min over "attachment paths"; recompute exactly per step (host, small)
    pds = [float(dist[i, j])]
    while len(chosen) < k:
        base = pd_score(tree, chosen)
        best_gain, best_t = -1.0, None
        for t in range(L):
            if t in chosen:
                continue
            g = pd_score(tree, chosen + [t]) - base
            if g > best_gain:
                best_gain, best_t = g, t
        chosen.append(int(best_t))
        pds.append(base + best_gain)
    return chosen, pds[-1], pds


def write_pda_report(path: str, tree: Tree, taxa: list[int], pd: float,
                     steps: list[float]) -> None:
    with open(path, "w") as f:
        f.write(f"Phylogenetic diversity (greedy, exact on trees)\n")
        f.write(f"k = {len(taxa)}  PD = {pd:.6f}\n")
        f.write("Taxa:\n")
        for t in taxa:
            f.write(f"  {tree.taxon_names[t]}\n")
        f.write("PD by subset size:\n")
        for n, v in enumerate(steps, start=2):
            f.write(f"  {n}\t{v:.6f}\n")
