"""Structured metrics ledger (utils/metrics.py) and its checkpoint-manager
wiring — the rebuild's replacement for the reference's epoch logs pasted
as source comments (nba_proj/train/training.py:481-760)."""

import json

import numpy as np

from vit_research_tpu.utils.metrics import MetricsLogger, read_metrics


def test_log_read_roundtrip(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(0, train_loss=0.9, val_acc=0.5)
    log.log(1, train_loss=0.7, val_acc=0.6)
    rows = read_metrics(path)
    assert [r["step"] for r in rows] == [0, 1]
    assert rows[1]["train_loss"] == 0.7
    assert all("ts" in r for r in rows)


def test_resume_rerun_supersedes(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(0, loss=1.0)
    log.log(1, loss=0.8)
    log.log(1, loss=0.75)  # resumed run re-trains epoch 1
    rows = read_metrics(path)
    assert [r["step"] for r in rows] == [0, 1]
    assert rows[1]["loss"] == 0.75
    assert len(read_metrics(path, latest_per_step=False)) == 3


def test_torn_tail_skipped(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    MetricsLogger(path).log(0, loss=1.0)
    with open(path, "a") as f:
        f.write('{"step": 1, "loss": 0.')  # crash mid-append
    rows = read_metrics(path)
    assert [r["step"] for r in rows] == [0]


def test_missing_file_is_empty():
    assert read_metrics("/nonexistent/metrics.jsonl") == []


def test_checkpoint_manager_writes_ledger(tmp_path):
    from vit_research_tpu.train.checkpoint import CheckpointManager

    mngr = CheckpointManager(str(tmp_path), "run", max_to_keep=2)
    state = {"w": np.zeros(3, np.float32)}
    for step in range(5):
        mngr.save(step, {"w": state["w"] + step},
                  metrics={"val_acc": 0.1 * step})
    mngr.wait()
    # Retention swept old steps, but the ledger keeps the whole curve.
    assert sorted(mngr._mngr.all_steps()) == [3, 4]
    rows = read_metrics(str(tmp_path / "run" / "metrics.jsonl"))
    assert [r["step"] for r in rows] == [0, 1, 2, 3, 4]
    assert abs(rows[4]["val_acc"] - 0.4) < 1e-9
    # Rows are plain JSON (one object per line).
    with open(tmp_path / "run" / "metrics.jsonl") as f:
        for line in f:
            json.loads(line)


def test_resume_after_torn_tail_recovers(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    MetricsLogger(path).log(0, loss=1.0)
    with open(path, "a") as f:
        f.write('{"step": 1, "loss": 0.')  # crash mid-append
    # New process resumes and re-logs epoch 1: must not merge into the
    # torn line.
    MetricsLogger(path).log(1, loss=0.8)
    rows = read_metrics(path)
    assert [r["step"] for r in rows] == [0, 1]
    assert rows[1]["loss"] == 0.8


def test_log_accepts_arbitrary_dict(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    # 'step'/'ts' keys inside the dict must not collide with the
    # positional step / wall clock.
    log.log(3, {"step": 999, "ts": 1.0, "val_acc": 0.5}, extra=2.0)
    (row,) = read_metrics(path)
    assert row["step"] == 3
    assert row["val_acc"] == 0.5 and row["extra"] == 2.0
