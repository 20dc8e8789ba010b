"""The fast-profile quality dossier harness (examples/
quality_fast_profile.py) runs end-to-end in --tiny mode and emits sane
rows: VERDICT r3 item 2's measurement tool must not rot between the
sessions that use it."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tiny_dossier_end_to_end(tmp_path):
    out = tmp_path / "rows.jsonl"
    env = dict(os.environ, VRT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "quality_fast_profile.py"),
         "--tiny", "--possessions", "2", "--frames-per", "16",
         "--stage2-epochs", "2", "--out", str(out),
         "--root", str(tmp_path / "world")],
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["metric"] == "quality_fast_profile"
    rows = [json.loads(line) for line in open(out)]
    by_name = {row["variant"]: row for row in rows}
    assert set(by_name) == {"parity", "tome2", "strided2",
                            "strided2_refined", "tome2_strided2",
                            "int8static"}
    ref = by_name["strided2_refined"]
    assert ref["stride_refine"] == "auto"
    assert 0.0 <= ref["refined_frame_frac"] <= 1.0
    assert ref["exact_embed_frac"] <= 1.0
    # refinement only swaps interpolations for exact embeddings, so
    # fidelity can't drop below the plain strided run's
    assert (ref["fidelity_cos_mean"]
            >= by_name["strided2"]["fidelity_cos_mean"] - 1e-6)
    par = by_name["parity"]
    # parity vs itself is exact by construction
    assert par["fidelity_cos_mean"] == 1.0
    assert par["retrieval_top8_overlap"] == 1.0
    for row in rows:
        assert 0.0 <= row["clip_f1"] <= 1.0
        assert 0.0 <= row["retrieval_top8_overlap"] <= 1.0
        assert row["scored_clips"] >= 1
        # every variant scored the same truth world
        assert row["n_true"] == par["n_true"]
