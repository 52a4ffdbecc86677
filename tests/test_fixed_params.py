"""Brace-fixed parameter semantics, end-to-end through the CLI.

Reference contract: "{...}" in the model string FIXES the parameter
(model/modelfactory.cpp:151 grammar). A `-blfix -te ref_tree.nwk` run with a
fully braced model must reproduce the reference binary's logL exactly — if
any brace-pinned parameter were silently re-optimized, logL would come out
higher than golden (the round-1 bug: VERDICT.md "What's weak" #2).
"""

import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def golden():
    return json.loads((GOLDEN / "golden.json").read_text())


def _run_cli(tmp_path, model):
    from iqtree2_tpu.cli import main
    prefix = str(tmp_path / "run")
    rc = main(["-s", str(GOLDEN / "example.phy"),
               "-te", str(GOLDEN / "ref_tree.nwk"),
               "-m", model, "-blfix", "-pre", prefix, "--f64", "--quiet",
               "-redo"])
    assert rc == 0
    report = Path(prefix + ".iqtree").read_text()
    for line in report.splitlines():
        if line.startswith("Log-likelihood of the tree:"):
            return float(line.split(":")[1].split()[0])
    raise AssertionError("no logL in report")


@pytest.mark.parametrize("cfg", ["g2_gtrg_fix", "g3_hkyi_fix", "g6_r3_fix"])
def test_blfix_braced_model_matches_golden(tmp_path, golden, cfg):
    model = golden["configs"][cfg]["model"]
    logL = _run_cli(tmp_path, model)
    assert logL == pytest.approx(golden["logL"][cfg], abs=2e-3)


def test_rate_objects_honor_fixes():
    from iqtree2_tpu.model.factory import build_model
    from iqtree2_tpu.data.alignment import Alignment

    rng = np.random.default_rng(0)
    chars = np.array(list("ACGT"))
    mat = rng.integers(0, 4, size=(4, 50))
    aln = Alignment.from_sequences(
        ["a", "b", "c", "d"], ["".join(chars[r]) for r in mat],
        seqtype="DNA")

    _, r1, _ = build_model("GTR+G{0.6}", aln)
    assert len(r1.get_params()) == 0           # alpha pinned
    _, r2, _ = build_model("GTR+G", aln)
    assert len(r2.get_params()) == 1           # alpha free
    _, r3, _ = build_model("GTR+I{0.2}+G{0.6}", aln)
    assert len(r3.get_params()) == 0
    _, r4, _ = build_model("GTR+I+G{0.6}", aln)
    assert len(r4.get_params()) == 1           # only p_inv free
    x = r4.get_params()
    r4.set_params(np.array([0.33]))
    assert r4.p_invar == pytest.approx(0.33)
    assert r4.alpha == pytest.approx(0.6)      # untouched
    del x
    _, r5, _ = build_model("HKY+R3{0.2,0.3,0.3,0.5,0.5,2.0}", aln)
    assert len(r5.get_params()) == 0
    _, r6, _ = build_model("HKY+R3", aln)
    assert len(r6.get_params()) == 2 * 3 - 1
