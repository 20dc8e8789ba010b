"""CLI smoke: the pipeline subcommands run end-to-end with VRT_TINY."""

import os
import re

import numpy as np
import pytest

from vit_research_tpu import cli
from vit_research_tpu.data import labels as labels_mod
from vit_research_tpu.data import synthetic


@pytest.fixture(autouse=True)
def tiny_engine(monkeypatch):
    monkeypatch.setenv("VRT_TINY", "1")


def test_segment_build_store_train_write(tmp_path, capsys):
    # frames + manual intervals
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    mi.intervals["none"].append((1, 1, 4))
    mi.intervals["left"].append((1, 5, 34))
    mi.intervals["none"].append((1, 35, 38))
    mi.intervals["right"].append((1, 39, 68))
    mi.intervals["none"].append((1, 69, 72))
    csv_path = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(csv_path)

    # segment
    clips_root = str(tmp_path / "clips_hmm_smooth_1_smart")
    cli.main(["segment", frames_dir, "--manual-csv", csv_path,
              "--out", clips_root, "--vid", "1", "--epochs", "150",
              "--batch-size", "16", "--min-len", "20", "--pad", "2"])
    out = capsys.readouterr().out
    assert "clips" in out
    clip_dirs = os.listdir(clips_root)
    assert any(d.startswith("vid1_clip") for d in clip_dirs)

    # labels for the produced clips
    clip_labels = {}
    for d in sorted(clip_dirs):
        if not d.startswith("vid1_clip"):
            continue
        clip_labels[os.path.join(clips_root, d)] = 1 if "left" in d else 0
    labels_mod.save_clip_labels(clip_labels, str(tmp_path / "labels.csv"))

    # build-frame-store
    store_dir = str(tmp_path / "store")
    cli.main(["build-frame-store", "--clip-root",
              str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
              "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
              "--out", store_dir, "--chunk-size", "6", "--chunk-stride", "3",
              "--batch-size", "16"])
    assert os.path.exists(os.path.join(store_dir, "embeddings.dat"))
    assert os.path.exists(os.path.join(store_dir, "chunk_index.npz"))

    # train-stage1
    ckpt_dir = str(tmp_path / "ckpts")
    cli.main(["train-stage1", "--store", store_dir, "--ckpt", ckpt_dir,
              "--epochs", "1", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "best val acc" in out

    # write-ratt-db (fresh params path)
    db_dir = str(tmp_path / "db")
    cli.main(["write-ratt-db", "--store", store_dir, "--ckpt", ckpt_dir,
              "--db", db_dir, "--collection", "ratt_db"])
    out = capsys.readouterr().out
    assert "chunk embeddings" in out
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(db_dir, autoflush=False)
    col = client.get_or_create_collection("ratt_db")
    assert col.count() > 0

    # eval-clips end to end (fresh params, live retrieval).
    out_dir = str(tmp_path / "results")
    os.makedirs(out_dir, exist_ok=True)
    cli.main(["eval-clips", "--store", store_dir, "--ckpt", ckpt_dir,
              "--db", db_dir, "--collection", "ratt_db", "--vids", "1",
              "--out", out_dir, "--k-sim", "3", "--k-contrast", "3",
              "--k-temporal", "2", "--future-step", "1"])
    out = capsys.readouterr().out
    assert "clip rows" in out
    assert os.path.exists(os.path.join(out_dir, "logit_sequences.json"))

    # write-rag-db (frame-level collection from the store)
    cli.main(["write-rag-db", "--clip-root",
              str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
              "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
              "--store", store_dir, "--db", db_dir,
              "--collection", "ragdb", "--chunk-size", "6",
              "--chunk-stride", "3"])
    out = capsys.readouterr().out
    assert "frame embeddings" in out

    # train-rag (one epoch over the tiny world, live frame retrieval)
    cli.main(["train-rag", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ragdb",
              "--train-vids", "1", "--val-vids", "1",
              "--epochs", "1", "--batch-size", "4", "--top-k", "3"])
    out = capsys.readouterr().out
    assert "best val acc" in out

    # train-ratt (live chunk retrieval + per-epoch sync rebuild of the
    # chunk rows with the live 2304->768 projection)
    cli.main(["train-ratt", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--train-vids", "1", "--val-vids", "1",
              "--epochs", "1", "--batch-size", "4", "--top-k", "3",
              "--attention-losses", "--rebuild", "sync",
              "--rebuild-every", "1"])
    out = capsys.readouterr().out
    assert "best val acc" in out
    assert "rebuilt" in out and "live" in out

    # train-cached (builds + saves the bin cache, then trains)
    cache_path = str(tmp_path / "bin_cache.pkl")
    cli.main(["train-cached", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--cache", cache_path, "--train-vids", "1", "--val-vids", "1",
              "--epochs", "1", "--batch-size", "4", "--top-k", "3",
              "--delta-t", "0.5"])
    out = capsys.readouterr().out
    assert "best val acc" in out
    assert os.path.exists(cache_path)

    # train-stage2 (builds + saves the stage-2 cache, live validation)
    s2_cache = str(tmp_path / "s2_cache.pkl")
    cli.main(["train-stage2", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--cache", s2_cache, "--train-vids", "1", "--val-vids", "1",
              "--epochs", "1", "--batch-size", "4", "--k-sim", "3",
              "--k-contrast", "3", "--k-temporal", "2"])
    out = capsys.readouterr().out
    assert "best val acc" in out
    assert os.path.exists(s2_cache)

    # train-stage2 --preset stage3 --init-run-id continues the saved run
    run_id = [l for l in out.splitlines() if l.startswith("run ")][0]
    run_id = run_id.split()[1].rstrip(":")
    cli.main(["train-stage2", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--cache", s2_cache, "--train-vids", "1", "--val-vids", "1",
              "--epochs", "1", "--batch-size", "4", "--k-sim", "3",
              "--k-contrast", "3", "--k-temporal", "2",
              "--preset", "stage3", "--init-run-id", run_id,
              "--cached-val"])
    out = capsys.readouterr().out
    assert "best val acc" in out

    # segment --score-events (offline): every written clip gets a live
    # make/miss row from the TRAINED stage-1/stage-2 stack, saved as
    # events.json
    import json as json_mod
    import shutil

    run1 = [d for d in sorted(os.listdir(ckpt_dir))
            if d.startswith("stage1_")][0]
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db_dir, "--collection", "corpus",
              "--batch-size", "16"])
    capsys.readouterr()
    score_args = ["--score-events", "--score-ckpt", ckpt_dir,
                  "--stage1-run-id", run1, "--stage2-run-id", run_id,
                  "--score-db", db_dir, "--score-collection", "ratt_db",
                  "--chunk-size", "6", "--chunk-stride", "3",
                  "--k-sim", "3", "--k-contrast", "3", "--k-temporal", "2",
                  "--future-step", "1"]
    scored_root = str(tmp_path / "clips_scored")
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db_dir,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", scored_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16"] + score_args)
    out = capsys.readouterr().out
    assert "top event chunk" in out and "events.json" in out
    with open(os.path.join(scored_root, "events.json")) as fh:
        offline_events = json_mod.load(fh)
    assert offline_events and all(r["topk_chunks"] for r in offline_events)
    # live clips are unlabeled by construction
    assert all(r["label"] == -1 for r in offline_events)

    # a missing stage-2 run id must fail up front (random weights would
    # silently produce plausible-looking garbage rows)
    i = score_args.index("--stage2-run-id")
    with pytest.raises(SystemExit, match="stage2-run-id"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm",
                  "--db", db_dir, "--corpus-collection", "corpus",
                  "--out", str(tmp_path / "clips_bad"), "--vid", "1",
                  "--batch-size", "16"]
                 + score_args[:i] + score_args[i + 2:])
    capsys.readouterr()
    # ... and a TYPO'D run id must fail before any embedding happens
    typo = list(score_args)
    typo[typo.index("--stage2-run-id") + 1] = "no_such_run"
    with pytest.raises(SystemExit, match="no run directory"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm",
                  "--db", db_dir, "--corpus-collection", "corpus",
                  "--out", str(tmp_path / "clips_bad"), "--vid", "1",
                  "--batch-size", "16"] + typo)
    capsys.readouterr()

    # --follow --score-events: the same rows stream out mid-game as
    # events.jsonl, identical to the offline scoring of the same clips
    live_dir = str(tmp_path / "live")
    os.makedirs(live_dir)
    for f in os.listdir(frames_dir):
        shutil.copy(os.path.join(frames_dir, f), os.path.join(live_dir, f))
    (tmp_path / "live" / "STOP").write_text("")
    live_root = str(tmp_path / "clips_live_scored")
    cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db_dir,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", live_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16", "--follow",
              "--idle-timeout", "20", "--poll-interval", "0.05",
              "--max-lag", "64"] + score_args)
    out = capsys.readouterr().out
    assert "scored" in out and "clips live" in out
    events_jsonl = os.path.join(live_root, "events.jsonl")
    with open(events_jsonl) as fh:
        live_events = [json_mod.loads(l) for l in fh if l.strip()]
    assert live_events == offline_events

    # the JSONL stream feeds score-events directly (unlabeled rows ->
    # clean skip accounting, status_id fallback)
    cli.main(["score-events", events_jsonl, "--ks", "1"])
    out = capsys.readouterr().out
    assert "ground truth: status_id" in out


def test_multivid_training_has_live_retrieval(tmp_path, capsys):
    """With multiple train videos the retrievers' same-vid masks leave
    real cross-video candidates — the training subcommands must show
    non-trivial retrieval (ret_valid_frac > 0) and split train/val by
    vid. Needs >=3 train vids: pools hold one clip per (side, bin, vid),
    so with 2 train vids the cross-vid candidate always has the opposite
    label and positives/negatives cannot coexist after same-vid
    masking."""
    from vit_research_tpu.data.labels import save_clip_labels

    template, clip_labels, _ = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1, 2, 3, 4), clips_per_vid=4, frames_per_clip=16,
        size=(32, 32))

    # Relabel so each (side, vid) has BOTH labels: label = (clip//2 + vid)%2.
    # make_mini_dataset's default (label = clip%2 = side) makes label a
    # function of side, and any per-vid flip makes it a function of
    # (side, vid) — in both degenerate worlds cross-video positives or
    # hard negatives cannot exist once same-vid rows are masked.
    def relabel(d):
        vid = int(d.split("clips_hmm_smooth_")[1][0])
        c = int(d.rsplit("_clip_", 1)[1].split("_")[0])
        return (c // 2 + vid) % 2

    clip_labels = {d: relabel(d) for d in clip_labels}
    save_clip_labels(clip_labels, str(tmp_path / "labels.csv"))

    store_dir, ckpt_dir, db_dir = (str(tmp_path / d)
                                   for d in ("store", "ckpts", "db"))
    cli.main(["build-frame-store", "--clip-root", template,
              "--vids", "1", "2", "3", "4", "--clip-labels",
              str(tmp_path / "labels.csv"), "--out", store_dir,
              "--chunk-size", "6", "--chunk-stride", "3",
              "--batch-size", "16"])
    cli.main(["train-stage1", "--store", store_dir, "--ckpt", ckpt_dir,
              "--epochs", "1", "--batch-size", "4"])
    cli.main(["write-ratt-db", "--store", store_dir, "--ckpt", ckpt_dir,
              "--db", db_dir, "--collection", "ratt_db"])
    capsys.readouterr()

    cache_path = str(tmp_path / "bin_cache.pkl")
    cli.main(["train-cached", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--cache", cache_path, "--train-vids", "1", "2", "3",
              "--val-vids", "4", "--epochs", "1", "--batch-size", "4",
              "--top-k", "3", "--delta-t", "0.5"])
    out = capsys.readouterr().out
    frac = [l for l in out.splitlines() if "ret_valid_frac=" in l][-1]
    frac = float(frac.split("ret_valid_frac=")[1].split()[0])
    assert frac > 0, out  # cross-video candidates actually retrieved

    s2_cache = str(tmp_path / "s2_cache.pkl")
    cli.main(["train-stage2", "--store", store_dir, "--db", db_dir,
              "--ckpt", ckpt_dir, "--collection", "ratt_db",
              "--cache", s2_cache, "--train-vids", "1", "2", "3",
              "--val-vids", "4",
              "--epochs", "1", "--batch-size", "4", "--k-sim", "3",
              "--k-contrast", "3", "--k-temporal", "2"])
    out = capsys.readouterr().out
    assert "best val acc" in out and "best f1" in out


def _labeled_world(tmp_path):
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    mi.intervals["none"].append((1, 1, 4))
    mi.intervals["left"].append((1, 5, 34))
    mi.intervals["none"].append((1, 35, 38))
    mi.intervals["right"].append((1, 39, 68))
    mi.intervals["none"].append((1, 69, 72))
    csv_path = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(csv_path)
    return frames_dir, csv_path


def test_labeling_and_knn_segmentation_cli_flow(tmp_path, capsys):
    """The script-parity verbs added around the labeled-corpus workflow:
    write-frame-db -> segment --method knn-hmm -> finalize-clips ->
    merge-clips -> clustering -> fresh-test -> self-label ->
    write-embeddings (reference scripts:
    write_per_vid_embeddings_chroma.py, generate_clips_hmm.py,
    finalize_clips.py, merge_clips.py, clustering.py, fresh_test.py,
    chroma.py, write_embeddings.py)."""
    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "db")

    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "1_p32_embeddings",
              "--batch-size", "16"])
    assert "labeled frame embeddings" in capsys.readouterr().out

    # kNN+HMM segmentation against the labeled corpus, with write-back
    clips_root = str(tmp_path / "clips_knn")
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "1_p32_embeddings", "--k", "5",
              "--out", clips_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16", "--write-back"])
    clip_dirs = [d for d in os.listdir(clips_root)
                 if d.startswith("vid1_clip")]
    assert clip_dirs, "knn-hmm segmentation produced no clips"
    sides = {d.rsplit("_", 1)[-1] for d in clip_dirs}
    assert sides <= {"left", "right"}

    # streaks method: same corpus, writes clip_intervals.csv
    streaks_root = str(tmp_path / "clips_streaks")
    cli.main(["segment", frames_dir, "--method", "streaks", "--db", db,
              "--corpus-collection", "1_p32_embeddings", "--k", "5",
              "--window", "10", "--out", streaks_root, "--vid", "1",
              "--min-len", "15", "--pad", "2", "--batch-size", "16"])
    with open(os.path.join(streaks_root, "clip_intervals.csv")) as f:
        iv_rows = f.read().strip().splitlines()
    assert iv_rows[0] == "side,start_frame,end_frame" and len(iv_rows) >= 3

    # per-clip refinement then merge
    fin_root = str(tmp_path / "clips_final")
    cli.main(["finalize-clips", "--clips", clips_root, "--db", db,
              "--collection", "1_p32_embeddings", "--out", fin_root,
              "--k", "3", "--batch-size", "16"])
    assert any(d.startswith("vid1_clip") for d in os.listdir(fin_root))
    merged_root = str(tmp_path / "clips_merged")
    cli.main(["merge-clips", "--clips", fin_root, "--frame-pool",
              frames_dir, "--out", merged_root, "--max-gap", "5"])
    merged = [d for d in os.listdir(merged_root)
              if d.startswith("vid1_clip")]
    assert merged and all(os.listdir(os.path.join(merged_root, d))
                          for d in merged)

    # clustering study + side classifier -> fresh-test with it
    side_npz = str(tmp_path / "side_nn.npz")
    cli.main(["clustering", "--db", db, "--collection", "1_p32_embeddings",
              "--out", side_npz, "--epochs", "30", "--batch-size", "16"])
    out = capsys.readouterr().out
    assert "class-mean L2" in out and os.path.exists(side_npz)
    ft_root = str(tmp_path / "fresh")
    cli.main(["fresh-test", frames_dir, "--params", side_npz,
              "--out", ft_root, "--batch-size", "16"])
    assert sorted(os.listdir(ft_root)) == ["left", "none", "right"]

    # two-pass self-labeling over the same frames
    labels_csv = str(tmp_path / "self_labels.csv")
    cli.main(["self-label", frames_dir, "--db", db, "--collection",
              "1_p32_embeddings", "--out", labels_csv, "--k", "5",
              "--min-votes", "4", "--batch-size", "16", "--upsert"])
    with open(labels_csv) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 1 + len(os.listdir(frames_dir))

    # per-class npz export
    cli.main(["write-embeddings", frames_dir, "--manual-csv", csv_path,
              "--out-template", str(tmp_path / "{cls}_embeddings.npz"),
              "--batch-size", "16"])
    left = np.load(str(tmp_path / "left_embeddings.npz"))
    assert left["embeddings"].ndim == 3  # (N, 1, D) reference layout
    assert len(left["frame_ids"]) == 30


def test_two_class_clustering_fresh_test_handoff(tmp_path, capsys):
    """clustering sizes the MLP by max(label)+1; fresh-test must size its
    restore template from the npz, not assume 3 classes."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("left", 20), ("right", 20)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    mi.intervals["left"].append((1, 1, 20))
    mi.intervals["right"].append((1, 21, 40))
    csv_path = str(tmp_path / "mi.csv")
    mi.to_csv(csv_path)
    db = str(tmp_path / "db")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "lr", "--batch-size", "16"])
    side_npz = str(tmp_path / "side_nn.npz")
    cli.main(["clustering", "--db", db, "--collection", "lr",
              "--out", side_npz, "--epochs", "20", "--batch-size", "8"])
    saved = np.load(side_npz)
    assert saved["params/out/kernel"].shape[1] == 2  # two classes saved
    ft_root = str(tmp_path / "fresh")
    cli.main(["fresh-test", frames_dir, "--params", side_npz,
              "--out", ft_root, "--batch-size", "16"])
    out = capsys.readouterr().out
    assert "classified 40 frames" in out


def test_self_label_upsert_preserves_seed_rows(tmp_path, capsys):
    """--upsert must only ADD new frames; ids colliding with the manually
    labeled seed corpus keep their original metadata."""
    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "db")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "seed", "--batch-size", "16"])
    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(db).get_collection("seed")
    n_before = col.count()
    seed_id = col.get()["ids"][0]
    meta_before = dict(col.get(ids=[seed_id])["metadatas"][0])
    cli.main(["self-label", frames_dir, "--db", db, "--collection", "seed",
              "--out", str(tmp_path / "sl.csv"), "--k", "5",
              "--min-votes", "4", "--batch-size", "16", "--upsert"])
    assert "kept" in capsys.readouterr().out  # collisions were skipped
    # Re-load from disk: the CLI ran its own client, so the pre-loaded
    # `col` object would not observe an overwrite.
    col2 = PersistentClient(db).get_collection("seed")
    assert col2.count() >= n_before
    assert col2.get(ids=[seed_id])["metadatas"][0] == meta_before


def test_search_and_rebuild_db_cli(tmp_path, capsys):
    """`search` prints JSON neighbor lines (frames and --npz inputs,
    --where filters); `rebuild-db` rewrites a collection standalone."""
    import json

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "db")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    some = sorted(os.listdir(frames_dir))[:3]
    cli.main(["search"] + [os.path.join(frames_dir, f) for f in some]
             + ["--db", db, "--collection", "corpus", "--k", "4"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert all(len(r["neighbors"]) == 4 for r in lines)
    # each frame is its own nearest neighbor (it is in the corpus)
    assert lines[0]["neighbors"][0]["id"] == some[0]

    # --where filter restricts the candidate set
    cli.main(["search", os.path.join(frames_dir, some[0]), "--db", db,
              "--collection", "corpus", "--k", "4", "--where",
              '{"label": "left"}'])
    row = json.loads(capsys.readouterr().out.strip())
    assert all(n["metadata"]["label"] == "left" for n in row["neighbors"])

    # --npz input: the (N, 1, D) class-npz layout round-trips
    cli.main(["write-embeddings", frames_dir, "--manual-csv", csv_path,
              "--out-template", str(tmp_path / "{cls}_embeddings.npz"),
              "--batch-size", "16"])
    capsys.readouterr()
    cli.main(["search", "--npz", str(tmp_path / "left_embeddings.npz"),
              "--npz-key", "embeddings", "--db", db,
              "--collection", "corpus", "--k", "2"])
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 30  # 30 left frames in the world

    # standalone rebuild-db: build clips world first (needs samples)
    clips_root = str(tmp_path / "clips_hmm_smooth_1_smart")
    cli.main(["segment", frames_dir, "--manual-csv", csv_path,
              "--out", clips_root, "--vid", "1", "--epochs", "80",
              "--batch-size", "16", "--min-len", "20", "--pad", "2"])
    clip_labels = {os.path.join(clips_root, d): 1 if "left" in d else 0
                   for d in sorted(os.listdir(clips_root))
                   if d.startswith("vid1_clip")}
    labels_mod.save_clip_labels(clip_labels, str(tmp_path / "labels.csv"))
    store_dir = str(tmp_path / "store")
    cli.main(["build-frame-store", "--clip-root",
              str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
              "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
              "--out", store_dir, "--chunk-size", "6", "--chunk-stride", "3",
              "--batch-size", "16"])
    capsys.readouterr()
    cli.main(["rebuild-db", "--clip-root",
              str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
              "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
              "--store", store_dir, "--db", db, "--collection", "ragdb",
              "--chunk-size", "6", "--chunk-stride", "3"])
    out = capsys.readouterr().out
    assert "rebuilt ragdb" in out
    from vit_research_tpu.store.vector_store import PersistentClient

    assert PersistentClient(db).get_collection("ragdb").count() > 0

    # --notify-socket: the rebuild hot-reloads a live serve daemon.
    # Reload never touches the engine, so a stub stands in for it
    # (serve's reload path is pure store work).
    import threading

    from vit_research_tpu.serve import EmbedServer

    rebuild_args = [
        "rebuild-db", "--clip-root",
        str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
        "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
        "--store", store_dir, "--db", db, "--collection", "ragdb",
        "--chunk-size", "6", "--chunk-stride", "3"]
    # dead socket: the rebuild itself succeeds, the notify fails loudly
    with pytest.raises(SystemExit, match="did not answer"):
        cli.main(rebuild_args
                 + ["--notify-socket", str(tmp_path / "gone.sock")])
    capsys.readouterr()

    class _StubEngine:
        batch_size, out_dim, spec = 4, 8, None

    stale = PersistentClient(db).get_collection("ragdb")
    srv = EmbedServer(_StubEngine(), coalesce_ms=0, collection=stale,
                      collection_source=(db, "ragdb"))
    sock = str(tmp_path / "notify.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        cli.main(rebuild_args + ["--notify-socket", sock])
        out = capsys.readouterr().out
        assert "rebuilt ragdb" in out and "daemon reloaded ragdb" in out
        # the daemon swapped onto the freshly-rebuilt generation
        assert srv.collection is not stale
        assert srv.collection.count() == stale.count()
    finally:
        srv.stop()
        t.join(timeout=10)


def test_db_info_command(tmp_path, capsys):
    import numpy as np_

    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(str(tmp_path / "db"))
    col = client.get_or_create_collection(
        "c1", metadata={"hnsw:space": "cosine"})
    col.upsert(["a", "b"], np_.ones((2, 4), np_.float32))
    client.flush()
    col.upsert(["c"], np_.ones((1, 4), np_.float32))
    client.flush()  # second flush appends a log segment
    cli.main(["db-info", str(tmp_path / "db")])
    out = capsys.readouterr().out
    assert "c1: 3 rows" in out and "space=cosine" in out
    assert "log_segments=1" in out
    cli.main(["db-info", str(tmp_path / "db"), "--compact"])
    out = capsys.readouterr().out
    assert "compacted 1 segments" in out
    cli.main(["db-info", str(tmp_path / "db")])
    assert "log_segments=0" in capsys.readouterr().out


def test_smoke_command(capsys):
    cli.main(["smoke"])
    out = capsys.readouterr().out
    assert "pre_logits" in out


def test_tome_env_engine(monkeypatch, tmp_path):
    # VRT_TOME_R threads token merging into the CLI's frame embedder; the
    # tiny 1-layer ViT (16 patch tokens + CLS = 17) drops r=2 -> 15.
    monkeypatch.setenv("VRT_TOME_R", "2")
    eng = cli._engine(batch_size=8)
    assert eng.model.config.tome_r == 2
    out = eng.embed_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_gemm_quant_env_engine(monkeypatch):
    # VRT_GEMM_QUANT=int8 swaps the encoder GEMMs for dynamic int8
    # (ops/quant.py) in the CLI's frame embedder; outputs stay unit-norm.
    monkeypatch.setenv("VRT_GEMM_QUANT", "int8")
    eng = cli._engine(batch_size=8)
    assert eng.model.config.gemm_quant == "int8"
    out = eng.embed_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    monkeypatch.setenv("VRT_GEMM_QUANT", "fp4")
    with pytest.raises(SystemExit, match="VRT_GEMM_QUANT"):
        cli._engine(batch_size=8)


def test_gemm_quant_static_env_engine(monkeypatch, tmp_path):
    """VRT_GEMM_QUANT=int8-static + VRT_GEMM_SCALES=<json> threads the
    calibrated static scales into the CLI engine; missing/empty scales
    are hard errors (silent dynamic fallback would re-add the abs-max
    cost the static path removes)."""
    import json

    # calibrate the tiny model the CLI builds (1 layer x 6 dense sites)
    # BEFORE setting the env toggles
    import dataclasses

    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.ops.quant import calibration_mode

    eng0 = cli._engine(batch_size=8)
    cfg = dataclasses.replace(eng0.model.config, gemm_quant="int8-static")
    model, params = init_vit(cfg, seed=0)
    rng = np.random.default_rng(0)
    with calibration_mode() as scales:
        model.apply(params, rng.uniform(size=(2, 32, 32, 3)).astype(
            np.float32))
    assert len(scales) == 6

    monkeypatch.setenv("VRT_GEMM_QUANT", "int8-static")
    with pytest.raises(SystemExit, match="VRT_GEMM_SCALES"):
        cli._engine(batch_size=8)
    scales_path = tmp_path / "scales.json"
    scales_path.write_text(json.dumps({"scales": list(scales)}))
    monkeypatch.setenv("VRT_GEMM_SCALES", str(scales_path))
    eng = cli._engine(batch_size=8)
    assert eng.model.config.gemm_quant == "int8-static"
    assert len(eng.model.config.gemm_quant_scales) == 6
    out = eng.embed_batch(rng.integers(0, 256, size=(3, 32, 32, 3))
                          .astype(np.uint8))
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    scales_path.write_text("[]")
    with pytest.raises(SystemExit, match="empty"):
        cli._engine(batch_size=8)


def test_tome_segmentation_boundaries_match_parity(monkeypatch, tmp_path):
    """Merged-token embeddings drift from parity, but the kNN+HMM
    segmentation consumers absorb the drift: on the synthetic world the
    decoded clips are identical with and without ToMe."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    mi.intervals["none"].append((1, 1, 4))
    mi.intervals["left"].append((1, 5, 34))
    mi.intervals["none"].append((1, 35, 38))
    mi.intervals["right"].append((1, 39, 68))
    mi.intervals["none"].append((1, 69, 72))
    csv_path = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(csv_path)

    def segment(out_dir):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", out_dir, "--vid", "1", "--epochs", "150",
                  "--batch-size", "16", "--min-len", "20", "--pad", "2"])
        return {d: sorted(os.listdir(os.path.join(out_dir, d)))
                for d in sorted(os.listdir(out_dir))
                if d.startswith("vid1_clip")}

    monkeypatch.delenv("VRT_TOME_R", raising=False)
    parity = segment(str(tmp_path / "clips_parity"))
    monkeypatch.setenv("VRT_TOME_R", "2")
    tome = segment(str(tmp_path / "clips_tome"))
    assert parity and tome == parity


def test_frame_stride_segmentation_matches_parity(tmp_path, capsys):
    """--frame-stride N (the fast profile's strided embed + interpolate)
    through the real CLI surface: on the decisive synthetic world the
    decoded clips match the parity run; --follow combination is refused
    rather than silently ignored."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    for side, a, b in (("none", 1, 4), ("left", 5, 34), ("none", 35, 38),
                       ("right", 39, 68), ("none", 69, 72)):
        mi.intervals[side].append((1, a, b))
    csv_path = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(csv_path)

    def segment(out_dir, *extra):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", out_dir, "--vid", "1", "--epochs", "150",
                  "--batch-size", "16", "--min-len", "20", "--pad", "2",
                  *extra])
        return {d: sorted(os.listdir(os.path.join(out_dir, d)))
                for d in sorted(os.listdir(out_dir))
                if d.startswith("vid1_clip")}

    parity = segment(str(tmp_path / "clips_parity"))
    strided = segment(str(tmp_path / "clips_strided"),
                      "--frame-stride", "2")
    assert parity and strided == parity
    # --stride-refine: same decisive world through the refined path;
    # side cuts make hot gaps, so SOME frames re-embed exactly and the
    # cost line is printed
    capsys.readouterr()
    refined = segment(str(tmp_path / "clips_refined"),
                      "--frame-stride", "2", "--stride-refine", "auto")
    assert refined == parity
    out = capsys.readouterr().out
    # the side cuts MUST register as hot gaps — a zero count means the
    # novelty gate is dead at the CLI surface (vacuous-test guard)
    m = re.search(r"stride-refine: (\d+)/(\d+) gaps hot", out)
    assert m, out
    assert int(m.group(1)) > 0
    with pytest.raises(SystemExit, match="frame-stride"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm",
                  "--out", str(tmp_path / "x"), "--vid", "1", "--follow",
                  "--frame-stride", "2", "--db", "nope",
                  "--corpus-collection", "c"])
    with pytest.raises(SystemExit, match="frame-stride"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--frame-stride", "0"])
    # --stride-refine validation fails BEFORE the engine spins up
    with pytest.raises(SystemExit, match="stride-refine"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--stride-refine", "auto"])  # needs --frame-stride > 1
    with pytest.raises(SystemExit, match="stride-refine"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--frame-stride", "2", "--stride-refine", "bogus"])
    with pytest.raises(SystemExit, match="stride-refine"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--frame-stride", "2", "--stride-refine", "3.5"])
    with pytest.raises(SystemExit, match="stride-refine-radius"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--frame-stride", "2", "--stride-refine", "auto",
                  "--stride-refine-radius", "-1"])
    with pytest.raises(SystemExit, match="stride-refine-radius"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "y"), "--vid", "1",
                  "--frame-stride", "2", "--stride-refine-radius", "1"])


def test_stride_refine_full_rate_advisory(tmp_path, capsys):
    """When the novelty gate ends up re-embedding most frames exactly,
    the CLI says so — measured on-chip, past ~50-60% exact-embed the
    two-pass refined stride costs more than full-rate (BENCH_NOTES
    'Refined fast stack measured ON-CHIP'). Threshold 0.0 refines every
    gap, so the advisory must fire."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    for side, a, b in (("none", 1, 4), ("left", 5, 34), ("none", 35, 38),
                       ("right", 39, 68), ("none", 69, 72)):
        mi.intervals[side].append((1, a, b))
    csv_path = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(csv_path)
    capsys.readouterr()
    cli.main(["segment", frames_dir, "--manual-csv", csv_path,
              "--out", str(tmp_path / "clips"), "--vid", "1",
              "--epochs", "150", "--batch-size", "16", "--min-len", "20",
              "--pad", "2", "--frame-stride", "2",
              "--stride-refine", "0.0"])
    captured = capsys.readouterr()
    assert "gaps hot" in captured.out
    assert "drop --frame-stride" in captured.err


def test_frame_stride_event_template_guard(tmp_path, capsys):
    """--event-template cross-checks --frame-stride against the shortest
    labeled event (sub-stride events are invisible to strided embedding
    AND to --stride-refine): blind strides are refused before the engine
    spins up, --force-stride downgrades to a warning, compliant strides
    pass through silently."""
    import json as _json

    tmpl_path = str(tmp_path / "events.json")
    with open(tmpl_path, "w") as f:
        _json.dump({"clips/vid1_clip2_left": {"event_make": [[10, 12]]}},
                   f)  # shortest event: 3 frames
    base = ["segment", str(tmp_path / "frames"), "--out",
            str(tmp_path / "o"), "--vid", "1", "--method", "knn-hmm"]
    # stride 4 > 3-frame event: refused with the deployment rule
    with pytest.raises(SystemExit,
                       match="shortest labeled event"):
        cli.main(base + ["--frame-stride", "4",
                         "--event-template", tmpl_path])
    # --force-stride: warns, then proceeds (proven by hitting the LATER
    # knn-hmm db validation instead of the stride guard)
    capsys.readouterr()
    with pytest.raises(SystemExit, match="corpus-collection"):
        cli.main(base + ["--frame-stride", "4", "--force-stride",
                         "--event-template", tmpl_path])
    assert "sub-stride events WILL be missed" in capsys.readouterr().err
    # compliant stride: passes the guard silently, hits the db check
    capsys.readouterr()
    with pytest.raises(SystemExit, match="corpus-collection"):
        cli.main(base + ["--frame-stride", "3",
                         "--event-template", tmpl_path])
    assert "WARNING" not in capsys.readouterr().err
    # a typo'd template path must fail loudly, not skip the guard
    with pytest.raises(SystemExit, match="file not found"):
        cli.main(base + ["--frame-stride", "4",
                         "--event-template", str(tmp_path / "nope.json")])


def test_metrics_command(tmp_path, capsys):
    from vit_research_tpu.utils.metrics import MetricsLogger

    run = tmp_path / "ckpts" / "stage1_runA"
    log = MetricsLogger(str(run / "metrics.jsonl"))
    log.log(0, train_loss=0.9, val_acc=0.50)
    log.log(1, train_loss=0.7, val_acc=0.75)

    # Run dir: full curve.
    cli.main(["metrics", str(run)])
    out = capsys.readouterr().out
    assert "epoch 0" in out and "epoch 1" in out
    assert "val_acc=0.7500" in out

    # Checkpoint root: per-run summary.
    cli.main(["metrics", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "stage1_runA: 2 epochs, best val_acc 0.7500" in out

    # CSV export.
    csv_path = tmp_path / "curve.csv"
    cli.main(["metrics", str(run), "--csv", str(csv_path)])
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("step,")
    assert len(lines) == 3

    # No ledgers anywhere -> clean error.
    with pytest.raises(SystemExit):
        cli.main(["metrics", str(tmp_path / "empty")])


def test_metrics_csv_rejected_on_root(tmp_path):
    from vit_research_tpu.utils.metrics import MetricsLogger

    MetricsLogger(str(tmp_path / "ckpts" / "run" / "metrics.jsonl")).log(
        0, loss=1.0)
    with pytest.raises(SystemExit, match="single run dir"):
        cli.main(["metrics", str(tmp_path / "ckpts"),
                  "--csv", str(tmp_path / "c.csv")])


def test_segment_follow_live_mode(tmp_path, capsys):
    """--follow tails a growing frames dir and emits clips mid-game: a
    producer thread drips the frames in; the clip dirs and console
    lines must match the offline knn-hmm run's clip extents."""
    import shutil
    import threading
    import time

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "fdb")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    live_dir = str(tmp_path / "live")
    os.makedirs(live_dir)
    frames = sorted(os.listdir(frames_dir),
                    key=lambda f: int(f.split("_")[2].split(".")[0]))

    def producer():
        for i in range(0, len(frames), 12):
            for f in frames[i: i + 12]:
                # atomic arrival: write then rename into place
                tmp = os.path.join(live_dir, f + ".part")
                shutil.copy(os.path.join(frames_dir, f), tmp)
                os.replace(tmp, os.path.join(live_dir, f))
            time.sleep(0.15)
        (tmp_path / "live" / "STOP").write_text("")

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    out_root = str(tmp_path / "clips_live")
    cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", out_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16", "--follow",
              "--idle-timeout", "20", "--poll-interval", "0.05",
              "--max-lag", "64"])
    t.join(timeout=20)
    out = capsys.readouterr().out
    assert "followed 72 frames" in out
    assert "clip 1: left" in out and "clip 2: right" in out

    live_dirs = sorted(d for d in os.listdir(out_root)
                       if d.startswith("vid1_clip"))
    assert live_dirs == ["vid1_clip_1_left", "vid1_clip_2_right"]

    # parity with the offline run on the same world
    off_root = str(tmp_path / "clips_off")
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", off_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16"])
    for d in live_dirs:
        assert (sorted(os.listdir(os.path.join(out_root, d)))
                == sorted(os.listdir(os.path.join(off_root, d))))


def test_segment_follow_requires_knn_hmm(tmp_path):
    frames_dir, csv_path = _labeled_world(tmp_path)
    with pytest.raises(SystemExit, match="knn-hmm"):
        cli.main(["segment", frames_dir, "--method", "temporal",
                  "--manual-csv", csv_path, "--out",
                  str(tmp_path / "x"), "--vid", "1", "--follow"])


def test_segment_follow_tolerates_partial_frames(tmp_path, capsys):
    """A truncated/undecodable frame (non-atomic writer) must be retried
    and eventually skipped with a warning — never crash the session or
    corrupt the stream order."""
    import shutil
    import threading
    import time

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "fdb2")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    live_dir = str(tmp_path / "live2")
    os.makedirs(live_dir)
    frames = sorted(os.listdir(frames_dir),
                    key=lambda f: int(f.split("_")[2].split(".")[0]))

    def producer():
        for i, f in enumerate(frames):
            if i == 20:  # a permanently broken frame mid-stream
                with open(os.path.join(live_dir, f), "wb") as fh:
                    fh.write(b"\xff\xd8garbage")
            else:
                shutil.copy(os.path.join(frames_dir, f),
                            os.path.join(live_dir, f))
            if i % 12 == 0:
                time.sleep(0.1)
        (tmp_path / "live2" / "STOP").write_text("")

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    out_root = str(tmp_path / "clips_live2")
    cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", out_root, "--vid", "1", "--min-len", "20",
              "--pad", "2", "--batch-size", "16", "--follow",
              "--idle-timeout", "20", "--poll-interval", "0.05",
              "--max-lag", "64"])
    t.join(timeout=20)
    out = capsys.readouterr().out
    assert "skipping undecodable frame" in out
    assert "followed 71 frames" in out  # 72 minus the broken one
    assert "clip 1: left" in out and "clip 2: right" in out


def test_segment_follow_idle_flushes_held_back_frame(tmp_path, capsys):
    """Without a STOP sentinel the newest frame is held back as
    possibly-mid-write; idle expiry must consume it, not strand it."""
    import shutil

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "fdb3")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()
    live_dir = str(tmp_path / "live3")
    shutil.copytree(frames_dir, live_dir)  # all frames, no STOP ever
    cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", str(tmp_path / "clips_live3"), "--vid", "1",
              "--min-len", "20", "--pad", "2", "--batch-size", "16",
              "--follow", "--idle-timeout", "1.0",
              "--poll-interval", "0.05", "--max-lag", "64"])
    out = capsys.readouterr().out
    assert "followed 72 frames" in out


def test_segment_follow_ignores_partial_and_foreign_vid_files(tmp_path,
                                                              capsys):
    """Strays an atomic copy-then-rename writer (or a shared dump dir)
    leaves visible must never enter the stream: a '.jpg.part' temp name
    — which the TOLERANT frame parser accepts — and another video's
    frames. Consuming the .part (frame #200) would poison every real
    frame (<200) as 'out-of-order'; consuming vid2's frame would corrupt
    the single-vid clip indices."""
    import shutil

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "fdb4")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    live_dir = str(tmp_path / "live4")
    shutil.copytree(frames_dir, live_dir)
    a_frame = os.path.join(frames_dir, "vid1_frame_1.jpg")
    # both strays hold perfectly decodable bytes — only the NAME is off
    shutil.copy(a_frame, os.path.join(live_dir, "vid1_frame_200.jpg.part"))
    shutil.copy(a_frame, os.path.join(live_dir, "vid2_frame_5.jpg"))
    (tmp_path / "live4" / "STOP").write_text("")

    cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", str(tmp_path / "clips_live4"), "--vid", "1",
              "--min-len", "20", "--pad", "2", "--batch-size", "16",
              "--follow", "--idle-timeout", "20",
              "--poll-interval", "0.05", "--max-lag", "64"])
    out = capsys.readouterr().out
    assert "followed 72 frames" in out  # exactly the real vid1 frames
    assert "out-of-order" not in out
    assert "clip 1: left" in out and "clip 2: right" in out


def test_segment_follow_raises_on_systemic_engine_failure(tmp_path,
                                                          capsys,
                                                          monkeypatch):
    """When the EMBEDDER is broken (device/tunnel down) rather than a
    frame, --follow must fail loudly — not skip every frame and exit 0
    with 'followed 0 frames -> 0 clips'."""
    import shutil

    from vit_research_tpu.parallel.embed import EmbeddingEngine

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "fdb5")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    live_dir = str(tmp_path / "live5")
    shutil.copytree(frames_dir, live_dir)
    (tmp_path / "live5" / "STOP").write_text("")

    def broken(self, paths, **kw):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(EmbeddingEngine, "embed_paths", broken)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        cli.main(["segment", live_dir, "--method", "knn-hmm", "--db", db,
                  "--corpus-collection", "corpus", "--k", "5",
                  "--out", str(tmp_path / "clips_live5"), "--vid", "1",
                  "--min-len", "20", "--pad", "2", "--batch-size", "16",
                  "--follow", "--idle-timeout", "20",
                  "--poll-interval", "0.05", "--max-lag", "64"])
    out = capsys.readouterr().out
    assert "skipping undecodable frame" not in out


def test_tune_segment_then_apply_transitions(tmp_path, capsys):
    """tune-segment sweeps the kNN+HMM grid against the manual labels,
    reports a perfect combo on the synthetic world, and its JSON output
    plugs back in via segment --transitions."""
    import json

    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "tdb")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()

    report = str(tmp_path / "tune.json")
    cli.main(["tune-segment", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--corpus-collection", "corpus",
              "--k-grid", "3,5,10", "--min-len-grid", "10,20",
              "--pad-grid", "0,2", "--batch-size", "16",
              "--out", report])
    out = capsys.readouterr().out
    assert "swept" in out and "write-back" in out
    data = json.loads((tmp_path / "tune.json").read_text())
    best = data["best"]
    assert best["f1"] == 1.0 and best["n_true"] == 2
    assert best["frame_accuracy"] > 0.9
    m = np.asarray(data["best_transition_matrix"])
    assert m.shape == (3, 3)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
    assert "fitted" in data["transition_matrices"]
    # the threshold suggestion is actionable on this separable world
    assert data["writeback"]["threshold"] is not None
    assert data["writeback"]["precision"] >= 0.99

    # apply the tuned parameters through the segment surface
    out_root = str(tmp_path / "clips_tuned")
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus",
              "--k", str(best["params"]["k"]),
              "--min-len", str(best["params"]["min_len"]),
              "--pad", str(best["params"]["pad"]),
              "--transitions", report,
              "--out", out_root, "--vid", "1", "--batch-size", "16"])
    out = capsys.readouterr().out
    assert "-> 2 clips" in out
    dirs = sorted(d for d in os.listdir(out_root)
                  if d.startswith("vid1_clip"))
    assert dirs == ["vid1_clip_1_left", "vid1_clip_2_right"]


def test_segment_transitions_flag_validation(tmp_path):
    """--transitions: bare-list JSON accepted; wrong shapes and
    non-knn-hmm methods rejected cleanly."""
    import json

    frames_dir, csv_path = _labeled_world(tmp_path)
    good = tmp_path / "trans.json"
    good.write_text(json.dumps([[0.9, 0.0, 0.1], [0.0, 0.9, 0.1],
                                [0.2, 0.2, 0.6]]))
    with pytest.raises(SystemExit, match="knn-hmm only"):
        cli.main(["segment", frames_dir, "--method", "temporal",
                  "--manual-csv", csv_path, "--out", str(tmp_path / "x"),
                  "--vid", "1", "--transitions", str(good)])
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([[1.0, 0.0], [0.0, 1.0]]))
    db = str(tmp_path / "tdb2")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    with pytest.raises(SystemExit, match="3x3"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
                  "--corpus-collection", "corpus", "--out",
                  str(tmp_path / "y"), "--vid", "1",
                  "--transitions", str(bad)])
    nodict = tmp_path / "nodict.json"
    nodict.write_text(json.dumps({"something": 1}))
    with pytest.raises(SystemExit, match="best_transition_matrix"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
                  "--corpus-collection", "corpus", "--out",
                  str(tmp_path / "z"), "--vid", "1",
                  "--transitions", str(nodict)])
    # raw counts (rows not summing to 1) would silently corrupt the
    # decode — rejected with a pointer at the actual problem
    counts = tmp_path / "counts.json"
    counts.write_text(json.dumps([[90, 0, 10], [0, 90, 10],
                                  [20, 20, 60]]))
    with pytest.raises(SystemExit, match="sum to 1"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
                  "--corpus-collection", "corpus", "--out",
                  str(tmp_path / "w"), "--vid", "1",
                  "--transitions", str(counts)])


def test_score_events_flag_validated_before_engine(tmp_path, monkeypatch):
    """--score-events without its collection/ckpt args must fail up
    front, before the engine spins up and embeds the frames dir."""
    frames_dir, csv_path = _labeled_world(tmp_path)

    def boom(*a, **kw):
        raise AssertionError("engine spun up despite invalid --score-events")

    monkeypatch.setattr(cli.common, "_engine", boom)
    with pytest.raises(SystemExit, match="score-events needs"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "x"), "--vid", "1",
                  "--score-events"])


def test_tune_segment_rejects_empty_grid_before_embedding(tmp_path,
                                                          monkeypatch):
    """An empty --k-grid must fail up front — NOT after the engine has
    spun up and embedded every frame (minutes of TPU compile)."""
    frames_dir, csv_path = _labeled_world(tmp_path)
    db = str(tmp_path / "tdb3")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])

    def boom(*a, **kw):  # the engine must never be constructed
        raise AssertionError("engine spun up despite an empty grid")

    monkeypatch.setattr(cli.common, "_engine", boom)
    with pytest.raises(SystemExit, match="--k-grid is empty"):
        cli.main(["tune-segment", frames_dir, "--manual-csv", csv_path,
                  "--db", db, "--corpus-collection", "corpus",
                  "--k-grid", ",", "--out", str(tmp_path / "t.json")])


def test_score_events_rejects_nonpositive_chunking_before_engine(
        tmp_path, monkeypatch):
    """A zero --chunk-stride must fail up front: build_chunks would only
    raise AFTER the full game embed (offline) or mid-game at the first
    clip commit (--follow)."""
    frames_dir, csv_path = _labeled_world(tmp_path)

    def boom(*a, **kw):
        raise AssertionError("engine spun up despite zero --chunk-stride")

    monkeypatch.setattr(cli.common, "_engine", boom)
    with pytest.raises(SystemExit, match="positive --chunk-size"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "x"), "--vid", "1",
                  "--score-events", "--score-ckpt", str(tmp_path / "ck"),
                  "--stage1-run-id", "r1", "--stage2-run-id", "r2",
                  "--score-db", str(tmp_path / "sdb"),
                  "--score-collection", "ratt_db", "--chunk-stride", "0"])


def test_score_events_typod_db_not_materialized(tmp_path, monkeypatch):
    """A typo'd --score-db must fail cleanly and must NOT be left behind
    on disk as an empty store root (PersistentClient creates its path
    eagerly) — nor embed anything first."""
    frames_dir, csv_path = _labeled_world(tmp_path)

    class _Eng:
        out_dim = 16

        def embed_paths(self, paths):
            raise AssertionError("embedded before the store probe failed")

    monkeypatch.setattr(cli.common, "_engine", lambda *a, **kw: _Eng())
    missing = str(tmp_path / "vecstoer")
    with pytest.raises(SystemExit, match="no vector store"):
        cli.main(["segment", frames_dir, "--manual-csv", csv_path,
                  "--out", str(tmp_path / "x"), "--vid", "1",
                  "--score-events", "--score-ckpt", str(tmp_path / "ck"),
                  "--stage1-run-id", "r1", "--stage2-run-id", "r2",
                  "--score-db", missing, "--score-collection", "ratt_db"])
    assert not os.path.exists(missing)


def test_stage1_checkpoint_chunk_size_mismatch(monkeypatch, tmp_path):
    """A restored stage-1 pos_embedding that disagrees with the
    requested chunk size must be a hard error: ChunkEncoder's
    pos[:, :t+1] slice would silently accept a SMALLER window and score
    out-of-distribution chunks against a store built at the trained
    size."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    from vit_research_tpu.evaluate import scoring

    cfg = ChunkEncoderConfig(embed_dim=16, mlp_dim=64, max_len=8)
    trained = ChunkEncoder(cfg).init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 8, 16)))
    monkeypatch.setattr(scoring, "restore_best",
                        lambda *a, **kw: {"params": trained})
    with pytest.raises(SystemExit, match="chunk_size 8"):
        cli._stage1_encode_batch(16, 4, str(tmp_path), "run", strict=True)
    # the matching size loads fine
    cli._stage1_encode_batch(16, 8, str(tmp_path), "run", strict=True)


def test_restore_failure_is_fatal_even_nonstrict(tmp_path, monkeypatch):
    """A named run that EXISTS but fails to restore must never fall back
    to fresh params — eval-clips would write plausible-looking garbage
    rows from a random-weight head."""
    run_dir = tmp_path / "ck" / "stage1_x"
    run_dir.mkdir(parents=True)

    class _Boom:
        def __init__(self, *a, **kw):
            pass

        def restore_best(self):
            raise RuntimeError("corrupt step")

    import vit_research_tpu.train.checkpoint as ckpt_mod
    from vit_research_tpu.evaluate import scoring
    monkeypatch.setattr(ckpt_mod, "CheckpointManager", _Boom)
    with pytest.raises(scoring.ScoringUnavailable, match="failed"):
        scoring.restore_best("stage-1", str(tmp_path / "ck"), "stage1_x",
                             strict=False)


def test_frame_stride_write_back_refused(tmp_path):
    """--frame-stride + --write-back would persist interpolated rows
    into the corpus — refused before any work (review r4)."""
    with pytest.raises(SystemExit, match="write-back"):
        cli.main(["segment", str(tmp_path), "--method", "knn-hmm",
                  "--db", "d", "--corpus-collection", "c",
                  "--out", str(tmp_path / "o"), "--vid", "1",
                  "--frame-stride", "4", "--write-back"])


def test_calibrate_int8_cli(tmp_path, capsys):
    """cli calibrate-int8: representative frames -> scales.json that the
    int8-static engine env accepts end-to-end."""
    import json

    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(frames_dir, 1, [("left", 12)],
                                 size=(32, 32))
    out = str(tmp_path / "scales.json")
    cli.main(["calibrate-int8", frames_dir, "--out", out, "--n-frames", "4"])
    blob = json.loads(open(out).read())
    assert len(blob["scales"]) == 6  # tiny 1-layer model: 6 dense sites
    assert blob["n_frames"] == 4
    assert "VRT_GEMM_SCALES" in capsys.readouterr().out
    # the produced file drives the engine env (the round-trip the help
    # text advertises)
    os.environ["VRT_GEMM_QUANT"] = "int8-static"
    os.environ["VRT_GEMM_SCALES"] = out
    try:
        eng = cli._engine(batch_size=8)
        e = eng.embed_batch(np.zeros((2, 32, 32, 3), np.uint8))
        assert e.shape == (2, 32) and np.isfinite(e).all()
    finally:
        del os.environ["VRT_GEMM_QUANT"], os.environ["VRT_GEMM_SCALES"]



# ---- embedding-profile fencing (fast-profile guard) ------------------------


def test_embedding_profile_roundtrip_and_stamp(tmp_path):
    from vit_research_tpu.store.vector_store import PersistentClient

    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine",
                       "vrt:embedding_profile": "tome0|quant-none|gray0"})
    col.upsert(["a"], np.ones((1, 4), np.float32))
    client.flush()
    col2 = PersistentClient(db, autoflush=False).get_collection("c")
    assert col2.embedding_profile == "tome0|quant-none|gray0"
    col2.stamp_embedding_profile("tome0|quant-none|gray0")  # equal: no-op
    with pytest.raises(ValueError, match="mixing embedding spaces"):
        col2.stamp_embedding_profile("tome16|quant-none|gray0")
    # unknown-profile collections stamp on first write
    col3 = PersistentClient(db, autoflush=False).get_or_create_collection("d")
    assert col3.embedding_profile is None
    col3.stamp_embedding_profile("p1")
    assert col3.embedding_profile == "p1"


def test_profile_fencing_cli(tmp_path, monkeypatch, capsys):
    """write-frame-db stamps the engine profile; a cross-profile segment
    warns; a cross-profile self-label --upsert refuses."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    for side, a, b in (("none", 1, 4), ("left", 5, 34), ("none", 35, 38),
                       ("right", 39, 68), ("none", 69, 72)):
        mi.intervals[side].append((1, a, b))
    csv_path = str(tmp_path / "manual.csv")
    mi.to_csv(csv_path)
    db = str(tmp_path / "db")

    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(db, autoflush=False).get_collection("corpus")
    assert col.embedding_profile == "tiny|tome0|quant-none|gray0"
    capsys.readouterr()

    # same profile: no warning
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", str(tmp_path / "c0"), "--vid", "1",
              "--min-len", "20", "--pad", "2", "--batch-size", "16"])
    assert "WARNING" not in capsys.readouterr().err

    # cross-profile read: loud warning, still runs
    monkeypatch.setenv("VRT_TOME_R", "2")
    cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
              "--corpus-collection", "corpus", "--k", "5",
              "--out", str(tmp_path / "c1"), "--vid", "1",
              "--min-len", "20", "--pad", "2", "--batch-size", "16"])
    err = capsys.readouterr().err
    assert "embedding profile" in err and "tome2" in err

    # cross-profile WRITE: refused outright
    with pytest.raises(SystemExit, match="mixing embedding spaces"):
        cli.main(["self-label", frames_dir, "--db", db,
                  "--collection", "corpus", "--out",
                  str(tmp_path / "sl.csv"), "--k", "5", "--min-votes", "4",
                  "--batch-size", "16", "--upsert"])


def test_profile_inherited_by_store_derived_collections(tmp_path, capsys):
    """build-frame-store records the profile; write-ratt-db /
    write-rag-db collections inherit the STORE's profile (the frames
    were embedded at store-build time)."""
    template, clip_labels, _ = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1,), clips_per_vid=2, frames_per_clip=8,
        size=(32, 32))
    labels_mod.save_clip_labels(clip_labels, str(tmp_path / "labels.csv"))
    store_dir = str(tmp_path / "store")
    cli.main(["build-frame-store", "--clip-root", template,
              "--vids", "1", "--clip-labels", str(tmp_path / "labels.csv"),
              "--out", store_dir, "--chunk-size", "6", "--chunk-stride",
              "3", "--batch-size", "16"])
    from vit_research_tpu.db.frame_store import FrameStore

    store = FrameStore(store_dir).open()
    assert store.embedding_profile == "tiny|tome0|quant-none|gray0"
    db = str(tmp_path / "db")
    ckpt = str(tmp_path / "ckpts")
    cli.main(["write-ratt-db", "--store", store_dir, "--ckpt", ckpt,
              "--db", db, "--collection", "ratt_db"])
    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(db, autoflush=False).get_collection("ratt_db")
    assert col.embedding_profile == "tiny|tome0|quant-none|gray0"


def test_write_back_refused_cross_profile(tmp_path, monkeypatch, capsys):
    """segment --write-back (offline and --follow construction) refuses
    a cross-profile corpus exactly like self-label --upsert: a warning
    is not enough when engine embeddings are PERSISTED (review r4)."""
    frames_dir = str(tmp_path / "frames")
    synthetic.write_video_frames(
        frames_dir, 1, [("none", 4), ("left", 30), ("none", 4),
                        ("right", 30), ("none", 4)], size=(32, 32))
    mi = labels_mod.ManualIntervals()
    for side, a, b in (("none", 1, 4), ("left", 5, 34), ("none", 35, 38),
                       ("right", 39, 68), ("none", 69, 72)):
        mi.intervals[side].append((1, a, b))
    csv_path = str(tmp_path / "manual.csv")
    mi.to_csv(csv_path)
    db = str(tmp_path / "db")
    cli.main(["write-frame-db", frames_dir, "--manual-csv", csv_path,
              "--db", db, "--collection", "corpus", "--batch-size", "16"])
    capsys.readouterr()
    monkeypatch.setenv("VRT_TOME_R", "2")
    with pytest.raises(SystemExit, match="mixing embedding spaces"):
        cli.main(["segment", frames_dir, "--method", "knn-hmm", "--db", db,
                  "--corpus-collection", "corpus", "--k", "5",
                  "--out", str(tmp_path / "wb"), "--vid", "1",
                  "--min-len", "20", "--pad", "2", "--batch-size", "16",
                  "--write-back"])


def test_stamp_only_flush_appends_no_segment(tmp_path):
    """A profile stamp alone persists via config.json without growing
    the append log (review r4)."""
    import os as os_mod

    from vit_research_tpu.store.vector_store import PersistentClient

    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection("c")
    col.upsert(["a"], np.ones((1, 4), np.float32))
    client.flush()  # snapshot exists, log empty
    before = sorted(os_mod.listdir(os_mod.path.join(db, "c")))
    col.stamp_embedding_profile("p1")
    client.flush()
    after = sorted(os_mod.listdir(os_mod.path.join(db, "c")))
    assert before == after  # no new segment file
    col2 = PersistentClient(db, autoflush=False).get_collection("c")
    assert col2.embedding_profile == "p1"  # but the stamp persisted
