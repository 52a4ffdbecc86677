"""Phylogenetic terrace analysis.

Reference analog: runterraceanalysis (main/terraceanalysis.cpp:18) over
terrace/ + the vendored terraphast library: a TERRACE is a set of trees
with identical per-partition induced subtrees (Sanderson et al. 2011) —
they all have exactly the same likelihood under edge-unlinked partition
models, so the search cannot distinguish them.

This module provides:
  - induced split fingerprints per partition (the terrace invariant)
  - check_terrace: is the tree on a non-trivial terrace? (finds an NNI
    neighbor with identical fingerprints)
  - enumerate_terrace: BFS over fingerprint-preserving NNIs (capped) —
    a lower bound on the terrace size, like terraphast's enumeration with
    a budget.
"""

from __future__ import annotations

import numpy as np

from iqtree2_tpu.tree.topology import Tree


def induced_fingerprint(tree: Tree, taxa_sets: list[set]) -> tuple:
    """Tuple of per-partition canonical induced split sets."""
    prints = []
    for taxa in taxa_sets:
        eff = frozenset(taxa)
        cur = set()
        if len(eff) >= 4:
            for s in tree.splits().keys():
                r = frozenset(set(s) & eff)
                o = frozenset(eff - r)
                if len(r) >= 2 and len(o) >= 2:
                    cur.add(min(r, o, key=lambda x: tuple(sorted(x))))
        prints.append(frozenset(cur))
    return tuple(prints)


def _nni_neighbors(tree: Tree):
    """Yield (neighbor tree, move description) over all NNIs."""
    for (a, b) in tree.internal_edges():
        for var in range(2):
            t2 = tree.copy()
            t2.apply_nni(a, b, var)
            yield t2


def check_terrace(tree: Tree, taxa_sets: list[set],
                  max_neighbors: int | None = None) -> bool:
    """True iff some NNI neighbor has identical induced subtrees
    (=> the terrace containing `tree` has size > 1)."""
    fp = induced_fingerprint(tree, taxa_sets)
    n = 0
    for t2 in _nni_neighbors(tree):
        if induced_fingerprint(t2, taxa_sets) == fp:
            return True
        n += 1
        if max_neighbors and n >= max_neighbors:
            break
    return False


def enumerate_terrace(tree: Tree, taxa_sets: list[set],
                      cap: int = 1000) -> int:
    """Number of distinct topologies reachable by fingerprint-preserving
    NNIs (capped): a lower bound on the terrace size."""
    fp = induced_fingerprint(tree, taxa_sets)
    seen = {tree.topology_id()}
    frontier = [tree]
    while frontier and len(seen) < cap:
        cur = frontier.pop()
        for t2 in _nni_neighbors(cur):
            tid = t2.topology_id()
            if tid in seen:
                continue
            if induced_fingerprint(t2, taxa_sets) == fp:
                seen.add(tid)
                frontier.append(t2)
                if len(seen) >= cap:
                    break
    return len(seen)


def coverage_taxa_sets(super_aln) -> list[set]:
    """Per-partition sets of taxa with any non-missing data (the
    presence/absence matrix of terrace/PresenceAbsenceMatrix)."""
    return [{int(i) for i in np.nonzero(pres)[0]}
            for pres in super_aln.part_presence]



def write_terrace_report(path: str, on_terrace: bool, size_lb: int,
                         cap: int, taxa_sets: list[set]) -> None:
    with open(path, "w") as f:
        f.write("Terrace analysis (Sanderson et al. 2011)\n")
        f.write(f"Partitions: {len(taxa_sets)}\n")
        for i, s in enumerate(taxa_sets):
            f.write(f"  partition {i + 1}: {len(s)} taxa with data\n")
        if on_terrace:
            f.write(f"Tree IS on a terrace: >= {size_lb} trees"
                    f"{' (enumeration capped)' if size_lb >= cap else ''}"
                    "\n")
        else:
            f.write("Tree is NOT on a non-trivial terrace (terrace size "
                    "1)\n")
