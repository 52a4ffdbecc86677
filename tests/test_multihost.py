"""Distributed search control plane: an n-process run must produce the
IDENTICAL final tree as a 1-process run (deterministic BSP rounds;
reference analog: MPI search parallelism, tree/iqtree.cpp:4337-4479).
"""
import json
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent

WORKER = textwrap.dedent("""
    import sys, json
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {repo!r} + "/tests")
    from tests.test_pallas2 import _setup
    from iqtree2_tpu.parallel.multihost import DistributedSearch, FileGossip

    rank, nranks, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    eng, _ = _setup(8, npat=64, seed=2)
    g = FileGossip(root, rank, nranks)
    ds = DistributedSearch(eng, eng.aln, g, rank, nranks, seed=5,
                           n_init_trees=6, n_rounds=2, round_size=4)
    tree, logL = ds.run()
    print("RESULT", json.dumps({{"tid": tree.topology_id(),
                                 "logL": logL}}))
""")


def _run_rank(rank, nranks, root):
    script = WORKER.format(repo=str(REPO))
    return subprocess.Popen(
        [sys.executable, "-c", script, str(rank), str(nranks), str(root)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _result(proc):
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, err[-2000:]
    for ln in out.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    raise AssertionError(f"no RESULT line in: {out[-500:]}")


def test_two_process_equals_one_process(tmp_path):
    p1 = _run_rank(0, 1, tmp_path / "g1")
    r1 = _result(p1)

    pa = _run_rank(0, 2, tmp_path / "g2")
    pb = _run_rank(1, 2, tmp_path / "g2")
    ra, rb = _result(pa), _result(pb)

    assert ra["tid"] == rb["tid"] == r1["tid"]
    assert abs(ra["logL"] - r1["logL"]) < 1e-9
    assert abs(rb["logL"] - r1["logL"]) < 1e-9
