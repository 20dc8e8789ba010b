"""CPU smokes for the example bench harnesses (--tiny paths).

The on-chip numbers live in BENCH_NOTES.md; these tests only pin that the
harnesses run end-to-end and emit well-formed JSON, so a refactor can't
silently break the measurement scripts between (rare) tunnel windows.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, VRT_PLATFORM="cpu")
    # Keep the axon plugin's sitecustomize on the path but route to CPU
    # (the scripts honor VRT_PLATFORM before any backend init).
    out = subprocess.run([sys.executable, *args], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


@pytest.mark.slow
def test_bench_e2e_segment_tiny():
    rec = _run(["examples/bench_e2e_segment.py", "--tiny", "--mode", "parity",
                "--frames", "1024", "--batch", "128", "--k", "8"])
    assert rec["metric"] == "e2e_embed_segment_10min_video"
    assert rec["frames"] == 1024
    assert set(rec["phases"]) == {"embed_s", "knn_fuse_s", "viterbi_clips_s"}
    assert rec["value"] > 0 and rec["fps_effective"] > 0


@pytest.mark.slow
def test_bench_e2e_segment_tiny_strided():
    rec = _run(["examples/bench_e2e_segment.py", "--tiny", "--mode",
                "strided", "--frames", "1024", "--batch", "128", "--k", "8"])
    assert rec["mode"] == "strided"
    assert rec["frames"] == 1024


@pytest.mark.slow
def test_bench_e2e_segment_tiny_stride1():
    # stride=1 uses a different key layout (n keys, no tail key) than
    # stride>1 — regression for the off-by-one that crashed after the
    # embed phase (round-2 review finding).
    rec = _run(["examples/bench_e2e_segment.py", "--tiny", "--mode",
                "strided", "--stride", "1", "--frames", "1024",
                "--batch", "128", "--k", "8"])
    assert rec["mode"] == "strided" and rec["frames"] == 1024


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["parity", "strided"])
def test_bench_e2e_segment_tiny_decode(mode, tmp_path):
    rec = _run(["examples/bench_e2e_segment.py", "--tiny", "--decode",
                "--mode", mode, "--frames", "512", "--batch", "128",
                "--k", "8", "--frames-dir", str(tmp_path / "frames")])
    assert rec["metric"] == "e2e_embed_segment_10min_video_decode_included"
    assert rec["frames"] == 512 and rec["decode_fps_per_core"] > 0
    expected = 512 if mode == "parity" else 512 // 4 + 1
    assert rec["frames_decoded"] == expected
    assert rec["phases"]["decode_embed_s"] > 0


@pytest.mark.slow
def test_bench_daemon_tiny():
    rec = _run(["examples/bench_daemon.py", "--tiny", "--games", "2",
                "--requests-per-game", "5", "--batch-size", "16",
                "--frames-per-req", "4"])
    assert rec["metric"] == "daemon_embed_serving"
    assert rec["requests"] == 10
    assert rec["rps"] > 0 and rec["p99_ms"] >= rec["p50_ms"]
    # the daemon's stats op must have reported real device batches
    assert rec["device_batches"] > 0
    assert rec["frames_embedded"] >= rec["requests"] * 4


@pytest.mark.slow
@pytest.mark.parametrize("transport", ["binary-jpeg", "binary-raw"])
def test_bench_daemon_tiny_binary_transport(transport):
    rec = _run(["examples/bench_daemon.py", "--tiny", "--games", "2",
                "--requests-per-game", "3", "--batch-size", "16",
                "--frames-per-req", "4", "--transport", transport])
    assert rec["transport"] == transport
    assert rec["requests"] == 6 and rec["rps"] > 0
    assert rec["frames_embedded"] >= rec["requests"] * 4


@pytest.mark.slow
def test_trace_embed_tiny():
    rec = _run(["examples/trace_embed.py", "--tiny", "--batch", "64",
                "--trace-batches", "2", "--top", "5"])
    assert rec["metric"] == "embed_device_trace"
    assert rec["untraced_wall_ms_per_batch"] > 0
    # The XPlane parse must surface real HLO ops (CPU plane on the smoke)
    assert rec["top_ops_ms_per_batch"], rec
    assert rec["device_total_ms_per_batch"] > 0


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["bf16", "int8-qk", "int8-full"])
def test_bench_int8_scores_tiny(variant):
    rec = _run(["examples/bench_int8_scores.py", "--tiny", "--variant",
                variant, "--iters", "2"])
    assert rec["metric"] == "attention_scores_dtype"
    assert rec["ms_per_layer"] > 0
    if variant == "bf16":
        assert rec["max_rel_err_vs_bf16"] == 0
    else:  # quantization error present but bounded
        assert 0 < rec["max_rel_err_vs_bf16"] < 0.05


@pytest.mark.slow
def test_bench_capacity_tiny():
    rec = _run(["examples/bench_capacity_10m.py", "--tiny", "--iters", "2"])
    assert rec["metric"] == "device_capacity_int8_topk"
    assert rec["rows"] == 1 << 16 and rec["k"] == 16
    assert rec["warm_p50_ms"] > 0 and rec["qps"] > 0


@pytest.mark.slow
def test_bench_rebuild_chunk_tiny():
    rec = _run(["examples/bench_rebuild_chunk.py", "--tiny"])
    assert rec["metric"] == "chunk_db_rebuild_wall"
    assert rec["chunks"] == 48
    assert rec["frame_embeds"] == 48 * 8
    assert rec["vs_reference_s"] == 421.17
    assert rec["value"] > 0


@pytest.mark.parametrize("script,phase", [
    (["examples/bench_int8_scores.py", "--tiny"], "post-init"),
    (["examples/bench_capacity_10m.py", "--tiny"], "post-init"),
    (["bench.py"], "post-init"),
])
def test_window_guard_aborts_cleanly(script, phase):
    # VRT_WINDOW_S exhausted -> exit 3 with a one-line JSON verdict
    # naming the drained checkpoint (examples/_window.py; the guard is
    # what keeps a tool-timeout SIGTERM from landing mid-flight on the
    # real tunnel). The bench.py case pays a full-size CPU model build
    # before its post-init barrier (bench.py has no tiny knob) — ~15 s,
    # accepted: it guards THE script the driver runs.
    env = dict(os.environ, VRT_PLATFORM="cpu", VRT_WINDOW_S="0.001")
    out = subprocess.run([sys.executable, *script], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 3, (out.returncode, out.stderr[-2000:])
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["aborted_at"] == phase
    assert rec["window_left_s"] < rec["estimated_need_s"]


@pytest.mark.slow
def test_bench_int8_scores_all_variants_one_process():
    env = dict(os.environ, VRT_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "examples/bench_int8_scores.py", "--tiny",
         "--variant", "all"], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert [r["variant"] for r in recs] == ["bf16", "int8-qk", "int8-full"]


@pytest.mark.slow
def test_bench_e2e_segment_decode_both_modes_one_process(tmp_path):
    env = dict(os.environ, VRT_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "examples/bench_e2e_segment.py", "--decode",
         "--tiny", "--mode", "both", "--frames", "256", "--batch", "64",
         "--frames-dir", str(tmp_path / "fr")], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert [r["mode"] for r in recs] == ["parity", "strided"]
    assert recs[0]["frames_decoded"] == 256
    assert recs[1]["frames_decoded"] == 65  # stride 4 keys + tail
