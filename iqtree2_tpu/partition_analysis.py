"""Partitioned-analysis orchestrator (-p/-q/-Q runs).

Reference analogs: runPhyloAnalysis on a SuperAlignment
(main/phyloanalysis.cpp:4103), PartitionFinder (testPartitionModel,
main/phylotesting.cpp:515,1958: per-partition best models + greedy pair
merging with the relaxed-cluster heuristic).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from iqtree2_tpu.analysis import Logger, _merge_support
from iqtree2_tpu.data.superalignment import (SuperAlignment,
                                             read_partition_spec)
from iqtree2_tpu.io import report as report_io
from iqtree2_tpu.model.factory import build_model
from iqtree2_tpu.params import Params
from iqtree2_tpu.partition.engine import PartitionEngine
from iqtree2_tpu.partition.optimize import optimize_partition_parameters
from iqtree2_tpu.search.search import SearchParams, TreeSearch
from iqtree2_tpu.search.ufboot import UFBoot
from iqtree2_tpu.tree.topology import Tree
from iqtree2_tpu.utils.checkpoint import Checkpoint


def select_partition_models(sa: SuperAlignment, params: Params, log,
                            ckp=None, merge: bool = False) -> dict:
    """Per-partition ModelFinder (+ optional greedy merging).

    Returns {"models": [str per partition], "aln": possibly-merged
    SuperAlignment, "table": per-partition rows}.
    """
    from iqtree2_tpu.modelfinder import run_modelfinder
    from iqtree2_tpu.ops.pars import random_stepwise_addition

    rng = np.random.default_rng(params.seed)
    tree = random_stepwise_addition(sa, rng)
    mode = params.model if params.model.upper() in ("MFP", "MF", "TEST",
                                                    "TESTONLY") else "TEST"

    def best_for(aln, name):
        if ckp is not None:
            ckp.start_struct(f"Partition_{name}")
        try:
            res = run_modelfinder(aln, params, log=lambda s: None, ckp=ckp,
                                  tree=tree, mode=mode)
        finally:
            if ckp is not None:
                ckp.end_struct()
        row = res["table"][0]
        log(f"  partition {name:<20} -> {res['best']} "
            f"(BIC {row['BIC']:.2f})")
        return res["best"], row

    models, rows = [], []
    for p, name in zip(sa.partitions, sa.part_names):
        best, row = best_for(p, name)
        models.append(best)
        rows.append(dict(row, partition=name, nsites=p.nsites))

    if merge and sa.n_partitions > 1:
        if getattr(params, "merge_algorithm", "greedy") == "kmeans":
            log("PartitionFinder: k-means partition merging "
                "(cluster by partition tree length)...")
            sa, models, rows = _kmeans_merge(sa, models, rows, params, log,
                                             best_for, tree)
        else:
            log("PartitionFinder: greedy partition merging...")
            sa, models, rows = _greedy_merge(sa, models, rows, params, log,
                                             best_for)
    return {"models": models, "aln": sa, "table": rows}


def _kmeans_1d(x: np.ndarray, w: np.ndarray, k: int) -> list[list[int]]:
    """Exact weighted 1-D k-means by interval DP (clusters of a sorted
    sequence are contiguous). Returns index groups."""
    order = np.argsort(x)
    xs, ws = x[order], w[order]
    cw = np.concatenate([[0.0], np.cumsum(ws)])
    cwx = np.concatenate([[0.0], np.cumsum(ws * xs)])
    cwx2 = np.concatenate([[0.0], np.cumsum(ws * xs * xs)])

    def cost(i, j):  # weighted SSE of xs[i:j]
        W = cw[j] - cw[i]
        if W <= 0:
            return 0.0
        m = (cwx[j] - cwx[i]) / W
        return cwx2[j] - cwx2[i] - W * m * m

    n = len(xs)
    D = np.full((k + 1, n + 1), np.inf)
    D[0, 0] = 0.0
    back = np.zeros((k + 1, n + 1), np.int64)
    for c in range(1, k + 1):
        for j in range(1, n + 1):
            for i in range(c - 1, j):
                v = D[c - 1, i] + cost(i, j)
                if v < D[c, j]:
                    D[c, j] = v
                    back[c, j] = i
    groups, j = [], n
    for c in range(k, 0, -1):
        i = int(back[c, j])
        if j > i:
            groups.append(sorted(order[i:j].tolist()))
        j = i
    return groups[::-1]


def _pooled_score(rows, total_sites: int, crit: str) -> float:
    """One information score from pooled logL/df over the whole supermatrix
    (reference: computeInformationScore over lhsum/dfsum,
    main/phylotesting.cpp:1793-1890). Per-partition score sums use each
    partition's own ln(n) and cannot express AIC/AICc correctly."""
    from iqtree2_tpu.modelfinder import information_scores
    lh = sum(r["logL"] for r in rows)
    df = sum(r["df"] for r in rows)
    return information_scores(lh, df, total_sites)[crit]


def _kmeans_merge(sa, models, rows, params, log, best_for, tree):
    """k-means merge mode: cluster partitions by their ML tree length
    (proportional-rate proxy), try every cluster count, keep the best
    total criterion. Reference: doKmeansClustering
    (main/phylotesting.cpp:1793-1890, MERGE_KMEANS :2114)."""
    import jax.numpy as jnp

    from iqtree2_tpu.engine import LikelihoodEngine
    from iqtree2_tpu.model.factory import build_model

    # per-partition tree length under the selected model (lenvec analog)
    lenvec = np.zeros(sa.n_partitions)
    for i, (p, m) in enumerate(zip(sa.partitions, models)):
        mo, ra, _ = build_model(m, p)
        eng = LikelihoodEngine(p, mo, ra, dtype=jnp.float32)
        t = tree.copy()
        eng.optimize_branches(t, n_rounds=4)
        lenvec[i] = t.total_length()
    nsites = np.array([p.nsites for p in sa.partitions], float)
    log("  partition tree lengths: " +
        ", ".join(f"{sa.part_names[i]}={lenvec[i]:.3f}"
                  for i in range(sa.n_partitions)))

    # cluster within each seqtype class (cross-type merges are invalid)
    classes: dict[str, list[int]] = {}
    for i, p in enumerate(sa.partitions):
        classes.setdefault(p.seqtype.name, []).append(i)

    part_rows = {(i,): rows[i] for i in range(sa.n_partitions)}

    def group_row(g: list[int]):
        key = tuple(sorted(g))
        if key not in part_rows:
            name = "+".join(sa.part_names[i] for i in g)
            merged = sa.merged_partition(list(key), name)
            best, row = best_for(merged, name)
            part_rows[key] = dict(row, partition=name,
                                  nsites=merged.nsites, model=best)
        return part_rows[key]

    crit = getattr(params, "merit", "") or "BIC"
    N_total = sa.nsites
    groups: list[list[int]] = []
    # global pooled score: the class being re-clustered varies while the
    # other classes keep singleton rows (they are clustered afterwards in
    # turn; logL/df are additive so the argmin per class is exact)
    other_rows: dict[str, list] = {
        c: [part_rows[(i,)] for i in ix] for c, ix in classes.items()}
    for cname, idx in classes.items():
        rest = [r for c, rs in other_rows.items() if c != cname for r in rs]
        best_groups = [[i] for i in idx]
        best_score = _pooled_score(
            rest + [part_rows[(i,)] for i in idx], N_total, crit)
        for k in range(len(idx) - 1, 0, -1):
            cl = _kmeans_1d(lenvec[idx], nsites[idx], k)
            gk = [[idx[j] for j in g] for g in cl]
            score = _pooled_score(rest + [group_row(g) for g in gk],
                                  N_total, crit)
            log(f"  [{cname}] k={k}: total {crit} {score:.2f}")
            if score < best_score:
                best_score, best_groups = score, gk
        groups.extend(best_groups)
        other_rows[cname] = [group_row(g) for g in best_groups]

    # materialize (same as the greedy path)
    from iqtree2_tpu.data.superalignment import build_superalignment
    parts, names, mods, new_rows = [], [], [], []
    for g in groups:
        key = tuple(sorted(g))
        row = part_rows.get(key) or group_row(g)
        if len(g) == 1:
            parts.append(sa.partitions[g[0]])
            names.append(sa.part_names[g[0]])
        else:
            name = "+".join(sa.part_names[i] for i in g)
            parts.append(sa.merged_partition(sorted(g), name))
            names.append(name)
        mods.append(row.get("model", row["name"]))
        new_rows.append(row)
    for p, n in zip(parts, names):
        p.name = n
    sa2 = build_superalignment(parts, mods)
    sa2.part_names = names
    log(f"k-means merge: {sa.n_partitions} -> {len(parts)} partitions")
    return sa2, mods, new_rows


def _greedy_merge(sa, models, rows, params, log, best_for):
    """Greedy pairwise merging judged by total BIC (rcluster-style: only the
    closest pairs by model similarity are tried each round — here all
    same-seqtype pairs, capped). Reference: mergePartitions
    (main/phylotesting.cpp:1478)."""
    cur = list(range(sa.n_partitions))
    groups = [[i] for i in cur]
    part_rows = {tuple([i]): rows[i] for i in cur}
    max_pairs = 10
    crit = getattr(params, "merit", "") or "BIC"
    N_total = sa.nsites

    def total_score(gs):
        return _pooled_score([part_rows[tuple(sorted(g))] for g in gs],
                             N_total, crit)

    improved = True
    while improved and len(groups) > 1:
        improved = False
        base_bic = total_score(groups)
        cands = []
        for a in range(len(groups)):
            for b in range(a + 1, len(groups)):
                ia, ib = groups[a][0], groups[b][0]
                if sa.partitions[ia].seqtype.name != \
                        sa.partitions[ib].seqtype.name:
                    continue
                cands.append((a, b))
        # rcluster-style cap: rank pairs by closeness of per-site logL
        def dist(ab):
            a, b = ab
            ra = part_rows[tuple(sorted(groups[a]))]
            rb = part_rows[tuple(sorted(groups[b]))]
            return abs(ra["logL"] / max(ra["nsites"], 1)
                       - rb["logL"] / max(rb["nsites"], 1))
        cands.sort(key=dist)
        best_gain, best_pair, best_entry = 0.0, None, None
        for (a, b) in cands[:max_pairs]:
            g = sorted(groups[a] + groups[b])
            key = tuple(g)
            if key not in part_rows:
                name = "+".join(sa.part_names[i] for i in g)
                merged = sa.merged_partition(g, name)
                best, row = best_for(merged, name)
                part_rows[key] = dict(row, partition=name,
                                      nsites=merged.nsites, model=best)
            merged_groups = [gr for i, gr in enumerate(groups)
                             if i not in (a, b)] + [g]
            gain = base_bic - total_score(merged_groups)
            if gain > best_gain:
                best_gain, best_pair, best_entry = gain, (a, b), key
        if best_pair is not None:
            a, b = best_pair
            g = sorted(groups[a] + groups[b])
            groups = [gr for i, gr in enumerate(groups)
                      if i not in (a, b)] + [g]
            log(f"  merged -> {part_rows[best_entry]['partition']} "
                f"(d{crit} {best_gain:.2f}; "
                f"total {base_bic - best_gain:.2f})")
            improved = True

    # materialize merged SuperAlignment
    parts, names, mods, new_rows = [], [], [], []
    from iqtree2_tpu.data.superalignment import build_superalignment
    for g in groups:
        key = tuple(sorted(g))
        row = part_rows[key]
        if len(g) == 1:
            parts.append(sa.partitions[g[0]])
            names.append(sa.part_names[g[0]])
        else:
            name = "+".join(sa.part_names[i] for i in g)
            parts.append(sa.merged_partition(g, name))
            names.append(name)
        mods.append(row.get("model", row["name"]))
        new_rows.append(row)
    for p, n in zip(parts, names):
        p.name = n
    sa2 = build_superalignment(parts, mods)
    sa2.part_names = names
    return sa2, mods, new_rows


def write_best_scheme(path, sa: SuperAlignment, models: list[str],
                      peng: PartitionEngine | None = None) -> None:
    """Write the .best_scheme.nex partition scheme (reference analog:
    PartitionFinder output, main/phylotesting.cpp)."""
    lines = ["#nexus", "begin sets;"]
    off = 1
    for p, name in zip(sa.partitions, sa.part_names):
        lines.append(f"  charset {name} = {off}-{off + p.nsites - 1};")
        off += p.nsites
    pairs = ", ".join(f"{m}: {n}" for m, n in zip(models, sa.part_names))
    lines.append(f"  charpartition mymerge = {pairs};")
    lines.append("end;")
    Path(path).write_text("\n".join(lines) + "\n")


def run_unlinked_topology_analysis(params: Params) -> dict:
    """-S: topology-UNLINKED partitions — an independent tree inferred for
    every partition (reference: PhyloSuperTreeUnlinked,
    tree/phylosupertreeunlinked.h; SuperAlignmentUnlinked,
    alignment/superalignment.h:41). Each locus runs the full
    single-alignment pipeline (ModelFinder / search / fixed topology) and
    the per-locus trees are concatenated into <prefix>.treefile (plus
    per-locus <prefix>.<part> outputs)."""
    import dataclasses
    import tempfile

    from iqtree2_tpu.analysis import run_analysis
    from iqtree2_tpu.io.alignment_io import write_phylip

    t_start = time.time()
    prefix = params.prefix
    log = Logger(f"{prefix}.log", params.verbose)
    log(f"Reading partition definition {params.partition_file} ...")
    sa = read_partition_spec(params.partition_file, params.aln_file,
                             params.seqtype)
    log(f"Topology-unlinked analysis (-S): {sa.n_partitions} loci, "
        f"{sa.ntaxa} taxa")
    if params.boot_spec:
        # -bsam GENE/GENESITE resamples ACROSS loci — meaningless inside
        # a single-locus sub-run (round-4 ADVICE.md item 3)
        raise SystemExit("ERROR: -bsam cannot be combined with -S "
                         "(each locus is analyzed as a single "
                         "alignment); use -p for partition-resampled "
                         "bootstrap")
    trees, rows = [], []
    total = 0.0
    for p, name, pmodel in zip(sa.partitions, sa.part_names,
                               sa.part_models):
        with tempfile.TemporaryDirectory() as td:
            pf = f"{td}/{name}.phy"
            write_phylip(p, pf)
            sub = dataclasses.replace(
                params, aln_file=pf, partition_file="",
                out_prefix=f"{prefix}.{name}",
                model=(pmodel or params.model), verbose=0,
                no_checkpoint=True)
            log(f"===> locus {name}: {p.nsites} sites, model "
                f"{sub.model}")
            res = run_analysis(sub)
        if "tree" not in res:
            raise SystemExit(
                f"ERROR: model '{sub.model}' is not supported with -S "
                f"(locus {name}: the analysis mode returns no single "
                "tree)")
        logL = res["logL"]
        total += logL
        trees.append((name, res["tree"]))
        rows.append({"partition": name, "logL": logL,
                     "nsites": p.nsites})
        log(f"  locus {name}: logL {logL:.4f}")
    with open(f"{prefix}.treefile", "w") as f:
        for name, t in trees:
            f.write(t.to_newick() + "\n")
    with open(f"{prefix}.partlh", "w") as f:
        for r in rows:
            f.write(f"{r['partition']}\t{r['nsites']}\t{r['logL']:.6f}\n")
    elapsed = time.time() - t_start
    log(f"Topology-unlinked analysis done in {elapsed:.2f}s; total logL "
        f"{total:.4f}")
    log(f"Per-locus trees -> {prefix}.treefile; per-locus logL -> "
        f"{prefix}.partlh")
    log.close()
    return {"logL": total, "trees": [t for _, t in trees], "table": rows,
            "elapsed": elapsed}


def run_partition_analysis(params: Params) -> dict:
    t_start = time.time()
    prefix = params.prefix
    log = Logger(f"{prefix}.log", params.verbose)
    ckp = Checkpoint(None if params.no_checkpoint else f"{prefix}.ckp.gz")
    if not params.redo:
        ckp.load()

    import jax.numpy as jnp
    dtype = jnp.float64 if params.use_f64 else jnp.float32

    log(f"Reading partition definition {params.partition_file} ...")
    sa = read_partition_spec(params.partition_file, params.aln_file,
                             params.seqtype)
    log(f"Supermatrix: {sa.ntaxa} taxa, {sa.nsites} sites, "
        f"{sa.n_partitions} partitions "
        f"({', '.join(sa.part_names)})")

    if params.symtest or params.symtest_remove_bad:
        from iqtree2_tpu.symtest import run_symtest, write_symtest_csv
        results = [(name, run_symtest(p))
                   for p, name in zip(sa.partitions, sa.part_names)]
        write_symtest_csv(f"{prefix}.symtest.csv", results)
        log(f"Symmetry tests written to {prefix}.symtest.csv")
        if params.symtest_remove_bad:
            # reference: --symtest-remove-bad drops partitions whose
            # (max-divergence) Bowker test rejects stationarity
            # (main/phyloanalysis.cpp:3920)
            keep = [i for i, (_, r) in enumerate(results)
                    if r.p_bowker >= params.symtest_pval]
            dropped = [sa.part_names[i] for i in range(sa.n_partitions)
                       if i not in set(keep)]
            if dropped:
                if not keep:
                    raise SystemExit("--symtest-remove-bad would drop "
                                     "every partition")
                log(f"--symtest-remove-bad: dropping "
                    f"{len(dropped)} partition(s): {', '.join(dropped)}")
                sa = sa.subset_partitions(keep)

    # ------------------ per-partition models ------------------------------
    mup = params.model.upper()
    mf_table = None
    if mup in ("MFP", "MF", "TEST", "TESTONLY", "MF+MERGE", "MFP+MERGE",
               "TESTMERGE", "TESTNEWMERGE"):
        sel = select_partition_models(
            sa, params, log, ckp=ckp, merge="MERGE" in mup)
        sa = sel["aln"]
        model_strs = sel["models"]
        mf_table = sel["table"]
        if mup in ("MF", "TESTONLY", "MF+MERGE"):
            write_best_scheme(f"{prefix}.best_scheme.nex", sa, model_strs)
            log(f"Best partition scheme written to {prefix}.best_scheme.nex")
            return {"models": model_strs, "table": mf_table}
    else:
        model_strs = [m if m else params.model
                      for m in sa.part_models]

    models, rates, asc_flags = [], [], []
    for p, m in zip(sa.partitions, model_strs):
        mo, ra, ex = build_model(m, p)
        models.append(mo)
        rates.append(ra)
        asc_flags.append(ex.get("asc", False))
    peng = PartitionEngine(sa, models, rates,
                           partition_type=params.partition_type,
                           dtype=dtype, asc_flags=asc_flags)
    rng = np.random.default_rng(params.seed)

    ufboot = None
    if params.ufboot_replicates > 0:
        ufboot = UFBoot(sa, n_replicates=params.ufboot_replicates,
                        seed=params.seed, spec=params.boot_spec)

    search_info = {}
    if params.user_tree:
        log(f"Reading fixed topology from {params.user_tree}")
        tree = Tree.from_newick(Path(params.user_tree).read_text(), sa.names)
        logL = optimize_partition_parameters(peng, tree,
                                             epsilon=params.model_eps,
                                             log=log)
    else:
        sp = SearchParams(
            n_init_trees=params.n_init_trees,
            n_nni_trees=params.n_nni_trees,
            pop_size=params.pop_size,
            pertub_strength=params.pertub_strength,
            loglh_epsilon=params.loglh_epsilon,
            seed=params.seed,
            min_iterations=(params.min_iterations
                            if params.n_iterations is None
                            else params.n_iterations),
            max_iterations=params.max_iterations,
            unsuccess_iteration=params.unsuccess_iteration,
            fixed_iterations=params.n_iterations)
        search = TreeSearch(peng, sa, sp, ufboot=ufboot, log=log)
        log("Quick initial partition-model optimization...")
        from iqtree2_tpu.ops.pars import random_stepwise_addition
        t0 = random_stepwise_addition(sa, rng)
        optimize_partition_parameters(peng, t0,
                                      epsilon=max(params.model_eps, 1.0),
                                      max_rounds=2, log=log)
        res = search.run()
        tree = res.best_tree
        search_info["Number of iterations"] = res.n_iterations
        logL = optimize_partition_parameters(peng, tree,
                                             epsilon=params.model_eps,
                                             log=log)

    support = None
    if ufboot is not None:
        support = ufboot.supports_for(tree)
        contree = ufboot.consensus_tree()
        report_io.write_treefile(f"{prefix}.contree", contree)
        search_info["UFBoot replicates"] = params.ufboot_replicates
    if params.alrt_replicates > 0 or params.abayes:
        from iqtree2_tpu.tests_branch import test_all_branches
        br = test_all_branches(peng, tree,
                               n_rell=max(params.alrt_replicates, 1000),
                               rng=rng, do_abayes=params.abayes)
        support = _merge_support(tree, support, br)

    report_io.write_treefile(f"{prefix}.treefile", tree, support=support)
    write_best_scheme(f"{prefix}.best_scheme.nex", sa, model_strs, peng)

    # terrace analysis: partition coverage can make the ML tree one of
    # many likelihood-identical trees (reference: runterraceanalysis,
    # main/terraceanalysis.cpp:18)
    from iqtree2_tpu.terrace import (check_terrace, count_terrace_exact,
                                     coverage_taxa_sets,
                                     enumerate_terrace,
                                     write_terrace_report)
    tsets = coverage_taxa_sets(sa)
    if any(len(s) < sa.ntaxa for s in tsets):
        exact = count_terrace_exact(tree, tsets)
        if exact is not None:
            on_t = exact > 1
            write_terrace_report(f"{prefix}.terrace", on_t, exact, 0,
                                 tsets, exact=True)
            if on_t:
                log(f"WARNING: the ML tree lies on a terrace of exactly "
                    f"{exact} equally-scoring trees (partition coverage "
                    f"gaps); see {prefix}.terrace")
        else:
            on_t = check_terrace(tree, tsets)
            size_lb = (enumerate_terrace(tree, tsets, cap=200)
                       if on_t else 1)
            write_terrace_report(f"{prefix}.terrace", on_t, size_lb, 200,
                                 tsets)
            if on_t:
                log(f"WARNING: the ML tree lies on a terrace of >= "
                    f"{size_lb} equally-scoring trees (partition "
                    f"coverage gaps); see {prefix}.terrace")
    elapsed = time.time() - t_start
    report_io.write_partition_report(
        f"{prefix}.iqtree", params=params, sa=sa, peng=peng,
        model_strs=model_strs, tree=tree, logL=logL,
        search_info=search_info, mf_table=mf_table, support=support,
        elapsed=elapsed)
    ckp.put("finished", True)
    ckp.dump(force=True)
    log(f"Partitioned analysis done in {elapsed:.2f}s; logL {logL:.4f}")
    log.close()
    return {"logL": logL, "tree": tree, "models": model_strs,
            "part_rates": peng.part_rates.tolist(), "elapsed": elapsed}
