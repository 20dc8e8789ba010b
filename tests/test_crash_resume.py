"""Process-level fault injection: SIGKILL a training CLI mid-run, rerun
with --resume, and require the continued run to complete.

The reference's recovery story was manual epoch-offset surgery
("stopped at epoch 39 ... start it at epoch 40",
reference: nba_proj/train/training.py:438-439) with the optimizer
restarted from scratch (SURVEY.md section 5.3/5.4). Here resume is a
first-class contract (Orbax params+opt_state+step, train/common.py
``maybe_resume``) — and this test exercises it the way real failures
happen: a hard kill of the whole process, possibly mid-async-save,
followed by a plain rerun of the same command. Orbax's atomic step
commits must leave the run dir restorable no matter where the kill
landed. In-process resume equivalence is covered by tests/test_resume.py;
this is the end-to-end surface.
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pytest

from vit_research_tpu import cli
from vit_research_tpu.data import labels as labels_mod
from vit_research_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    """A tiny frame store: synthetic frames arranged into clip dirs
    (skipping the segment step — clip layout is the contract), then
    `cli build-frame-store` with the tiny engine."""
    os.environ.setdefault("VRT_TINY", "1")
    tmp = tmp_path_factory.mktemp("crashworld")
    frames_dir = str(tmp / "frames")
    paths = synthetic.write_video_frames(
        frames_dir, 1, [("left", 18), ("right", 18)], size=(32, 32))
    clips_root = tmp / "clips_hmm_smooth_1_smart"
    clip_labels = {}
    for k, (side, lo) in enumerate([("left", 0), ("right", 18)]):
        d = clips_root / f"vid1_clip_{k + 1}_{side}"
        d.mkdir(parents=True)
        for p in paths[lo:lo + 18]:
            shutil.copy(p, d)
        clip_labels[str(d)] = 1 if side == "left" else 0
    labels_mod.save_clip_labels(clip_labels, str(tmp / "labels.csv"))
    store = str(tmp / "store")
    cli.main(["build-frame-store", "--clip-root",
              str(tmp / "clips_hmm_smooth_{vid}_smart"), "--vids", "1",
              "--clip-labels", str(tmp / "labels.csv"), "--out", store,
              "--chunk-size", "6", "--chunk-stride", "3",
              "--batch-size", "16"])
    return store


def _stage1_cmd(store, ckpt, epochs):
    return [sys.executable, "-m", "vit_research_tpu.cli", "train-stage1",
            "--store", store, "--ckpt", ckpt, "--run-id", "crashrun",
            "--resume", "--epochs", str(epochs), "--batch-size", "4"]


def _env():
    env = dict(os.environ)
    env["VRT_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _completed_steps(run_dir):
    mngr_steps = []
    if os.path.isdir(run_dir):
        for d in os.listdir(run_dir):
            p = os.path.join(run_dir, d)
            # Orbax commits a step dir atomically; in-progress writes
            # live under *.orbax-checkpoint-tmp-* names.
            if d.isdigit() and os.path.isdir(p):
                mngr_steps.append(int(d))
    return sorted(mngr_steps)


@pytest.mark.slow
def test_sigkill_mid_training_then_resume(store_dir, tmp_path):
    ckpt = str(tmp_path / "ckpts")
    run_dir = os.path.join(ckpt, "crashrun")
    epochs = 12

    proc = subprocess.Popen(_stage1_cmd(store_dir, ckpt, epochs),
                            env=_env(), stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    try:
        # Kill as soon as the first epoch checkpoint lands — async saves
        # for later steps may be mid-write, which is the point.
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if _completed_steps(run_dir):
                break
            if proc.poll() is not None:
                out = proc.stdout.read().decode()
                raise AssertionError(
                    f"training exited before first checkpoint:\n{out}")
            time.sleep(0.2)
        else:
            raise AssertionError("no checkpoint appeared within 300 s")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:  # pragma: no cover
            proc.kill()

    killed_at = _completed_steps(run_dir)
    assert killed_at, "kill landed before any committed step"
    assert max(killed_at) < epochs - 1, (
        "training finished before the kill; make it slower")

    # Plain rerun of the same command resumes and completes.
    res = subprocess.run(_stage1_cmd(store_dir, ckpt, epochs), env=_env(),
                         capture_output=True, timeout=600)
    out = res.stdout.decode() + res.stderr.decode()
    assert res.returncode == 0, out
    assert "best val acc" in out

    # The run dir holds the full trajectory. Nuance: the metrics line
    # for an epoch is written synchronously but its Orbax commit is
    # async, so the epoch in flight AT the kill may legitimately be
    # re-run (and re-logged) by the resume. The resume contract is:
    # every epoch covered, nothing run more than twice, and the epochs
    # committed BEFORE the kill (step 0 at minimum) never re-run.
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        steps = [json.loads(line)["step"] for line in f if line.strip()]
    assert set(steps) == set(range(epochs)), steps
    assert steps.count(0) == 1, f"resume restarted from scratch: {steps}"
    assert all(steps.count(s) <= 2 for s in set(steps)), steps
    assert os.path.exists(os.path.join(run_dir, "best.json"))
    # And the final state is restorable (restore_best parses).
    from vit_research_tpu.train.checkpoint import CheckpointManager

    restored = CheckpointManager(ckpt, "crashrun").restore_best()
    assert restored is not None
