"""Time trees: least-squares molecular dating (LSD2 analog).

Reference analog: doTimeTree (main/timetree.cpp:335) -> lsd::buildTimeTree
(:297) — the LSD2 submodule implements To et al. (2016) "Fast dating using
least-squares criteria and algorithms". This module implements the same
WLS criterion:

  minimize  sum_e w_e * (b_e - omega * (t_child - t_parent))^2

over internal-node dates t and the clock rate omega, subject to temporal
ordering t_parent <= t_child - eps. With z := omega * t the objective is
LINEAR least squares in (z_internal, omega) given tip dates; ordering
constraints are enforced by an active-set loop that collapses violated
edges (t_parent = t_child) and re-solves — the same projection LSD uses.

Input: tip dates from a file of "name date" lines (reference --date
format); outgroup or midpoint rooting of the unrooted ML tree.
"""

from __future__ import annotations

import numpy as np

from iqtree2_tpu.tree.topology import Tree


def parse_date_file(text: str, names: list[str]) -> dict[int, float]:
    """'name date' per line (the reference's --date TAXFILE format; a
    leading count line is tolerated)."""
    name_to_id = {n: i for i, n in enumerate(names)}
    out: dict[int, float] = {}
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        if len(parts) == 1 and parts[0].isdigit():
            continue
        if parts[0] in name_to_id:
            out[name_to_id[parts[0]]] = float(parts[1])
    if not out:
        raise ValueError("no tip dates parsed from date file")
    return out


def midpoint_root(tree: Tree) -> tuple[int, int, float]:
    """(a, b, frac) of the midpoint edge: root at frac along edge (a, b)."""
    L = tree.ntaxa
    # farthest pair by path length
    def far(from_v):
        seen = {from_v: 0.0}
        stack = [from_v]
        best = (from_v, 0.0)
        while stack:
            v = stack.pop()
            for u in tree.adj[v]:
                if u not in seen:
                    seen[u] = seen[v] + tree.get_blen(v, u)
                    stack.append(u)
                    if u < L and seen[u] > best[1]:
                        best = (u, seen[u])
        return best, seen

    (x, _), _ = far(0)
    (y, dxy), dist_x = far(x)
    # walk back from y toward x accumulating half the distance
    target = dxy / 2.0
    # path y -> x
    parent = {x: None}
    stack = [x]
    while stack:
        v = stack.pop()
        for u in tree.adj[v]:
            if u not in parent:
                parent[u] = v
                stack.append(u)
    path = [y]
    while path[-1] != x:
        path.append(parent[path[-1]])
    acc = 0.0
    for i in range(len(path) - 1):
        a, b = path[i], path[i + 1]
        ln = tree.get_blen(a, b)
        if acc + ln >= target:
            return a, b, (target - acc) / max(ln, 1e-12)
        acc += ln
    return path[-2], path[-1], 0.5


def date_tree(tree: Tree, tip_dates: dict[int, float],
              root_edge: tuple[int, int] | None = None,
              min_rate: float = 1e-10, eps: float = 1e-9,
              max_iter: int = 30):
    """WLS dating. Returns (node_dates dict, rate, rooted_parent map).

    Tips without a date are dated too (relaxed tips). When all tip dates
    are equal an ultrametric tree is produced and the rate is
    unidentifiable (set so root age = 1)."""
    t = tree.copy()
    L = t.ntaxa
    if root_edge is None:
        a, b, frac = midpoint_root(t)
    else:
        a, b = root_edge
        frac = 0.5
    # insert root node on edge (a, b)
    root = t.new_node()
    ln = t.get_blen(a, b)
    t.remove_edge(a, b)
    t.add_edge(a, root, ln * frac)
    t.add_edge(root, b, ln * (1 - frac))

    # rooted orientation
    parent: dict[int, int | None] = {root: None}
    order = [root]
    stack = [root]
    while stack:
        v = stack.pop()
        for u in t.adj[v]:
            if u not in parent:
                parent[u] = v
                order.append(u)
                stack.append(u)

    nodes = order
    free = [v for v in nodes if v not in tip_dates]   # undated nodes
    col = {v: k for k, v in enumerate(free)}
    n_free = len(free)

    # one LS row per edge: b_e = z_child - z_parent, z_v = omega * t_v for
    # dated tips (omega is the last column)
    rows, rhs = [], []
    for v in nodes:
        p = parent[v]
        if p is None:
            continue
        row = np.zeros(n_free + 1)
        if v in tip_dates:
            row[-1] += tip_dates[v]
        else:
            row[col[v]] += 1.0
        if p in tip_dates:
            row[-1] -= tip_dates[p]
        else:
            row[col[p]] -= 1.0
        rows.append(row)
        rhs.append(t.get_blen(v, p))
    A = np.stack(rows)
    y = np.asarray(rhs)

    dates_all_equal = len(set(tip_dates.values())) <= 1
    if dates_all_equal:
        # the rate is unidentifiable: fix omega = 1 conceptually and pin
        # the root one time unit before the (common) tip date
        d0 = next(iter(tip_dates.values()))
        prior = np.zeros(n_free + 1)
        prior[col[root]] = 1e3
        A = np.vstack([A, prior])
        y = np.concatenate([y, [1e3 * (d0 - 1.0)]])

    x, *_ = np.linalg.lstsq(A, y, rcond=None)
    omega = max(x[-1], min_rate) if not dates_all_equal else 1.0

    def z_of(v):
        return x[col[v]] if v in col else omega * tip_dates[v]

    # active-set projection: children may not predate parents
    for _ in range(max_iter):
        viol = [(v, parent[v]) for v in nodes
                if parent[v] is not None and
                z_of(v) < z_of(parent[v]) - 1e-12]
        if not viol:
            break
        # collapse each violated edge: force z_child = z_parent by adding
        # a heavy tie row, then re-solve
        extra = []
        for v, p in viol:
            row = np.zeros(n_free + 1)
            if v in col:
                row[col[v]] += 1e4
            else:
                continue
            if p in col:
                row[col[p]] -= 1e4
            A = np.vstack([A, row])
            y = np.concatenate([y, [0.0]])
        x, *_ = np.linalg.lstsq(A, y, rcond=None)
        omega = max(x[-1], min_rate) if not dates_all_equal else 1.0

    dates = {v: z_of(v) / omega for v in nodes}
    # final sanity clamp
    for v in order:
        p = parent[v]
        if p is not None and dates[v] < dates[p]:
            dates[v] = dates[p]
    return dates, float(omega), parent, t, root


def timetree_newick(t: Tree, dates: dict[int, float],
                    parent: dict, root: int) -> str:
    """Newick with branch lengths in TIME units (child - parent dates)."""
    for v, p in parent.items():
        if p is not None:
            t.set_blen(v, p, max(dates[v] - dates[p], 0.0))
    return t.to_newick(root=root)
