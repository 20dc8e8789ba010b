"""Evaluation harness + clustering + qualitative dumps."""

import json
import os

import jax.numpy as jnp
import numpy as np

from vit_research_tpu.evaluate.clip_sequences import (
    get_topk_chunks_for_sequence,
    infer_clip_sequences,
    save_results,
    z_normalize,
)
from vit_research_tpu.evaluate.fresh_test import dump_classified_frames
from vit_research_tpu.evaluate.smoke import smoke_test
from vit_research_tpu.segment.clustering import (
    class_mean_separation,
    classify_sides,
    kmeans_with_class_means,
    train_side_classifier,
)
from vit_research_tpu.utils.configs import ViTConfig

D = 16


def test_z_normalize():
    z = z_normalize([1.0, 2.0, 3.0])
    np.testing.assert_allclose(z.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(z.std(), 1.0, atol=1e-3)
    # Short sequences pass through.
    np.testing.assert_array_equal(z_normalize([5.0]), [5.0])


def test_topk_chunks():
    seq = [{"logit": float(i), "prob": 0.5, "pred": 1, "vid": 1, "clip": 0,
            "side": "left", "label": 1, "start_idx": i * 4,
            "end_idx": i * 4 + 7, "start_frame": i * 4 + 100,
            "end_frame": i * 4 + 107} for i in range(6)]
    rows = get_topk_chunks_for_sequence(seq, k=3)
    assert [r["logit"] for r in rows] == [5.0, 4.0, 3.0]
    assert rows[0]["rank"] == 1
    assert rows[0]["center_frame"] == (rows[0]["start_frame"]
                                       + rows[0]["end_frame"]) // 2


def test_infer_clip_sequences_and_save(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_training_loops import HEAD, chunk_world, chunk_embed_fn, \
        fill_collection

    chunks = chunk_world(n_vids=2, clips=1, per_clip=6)
    col = fill_collection(chunks)
    encode = lambda ch: chunk_embed_fn([ch])[0]  # noqa: E731

    def head_apply(query, sim, con, tmp):
        # Stand-in head: logit = projection of the query (deterministic).
        return jnp.sum(query[:, :2], axis=1, keepdims=True)

    rows = infer_clip_sequences(
        chunks, head_apply, encode, col, k_sim=HEAD.k_sim,
        k_contrast=HEAD.k_contrast, k_temporal=HEAD.k_temporal,
        future_step=1, batch_size=4)
    assert len(rows) == 2  # one row per clip
    r = rows[0]
    assert r["num_chunks"] == 6
    assert len(r["raw_sequence"]) == 6 and len(r["z_sequence"]) == 6
    assert r["topk_chunks"][0]["rank"] == 1
    # start_idx ordering.
    assert r["start_idxs"] == sorted(r["start_idxs"])

    # Zero-query ablation changes logits.
    rows0 = infer_clip_sequences(
        chunks, head_apply, encode, col, k_sim=HEAD.k_sim,
        k_contrast=HEAD.k_contrast, k_temporal=HEAD.k_temporal,
        future_step=1, batch_size=4, zeros_query=True)
    assert rows0[0]["raw_sequence"] != r["raw_sequence"]

    out_json = str(tmp_path / "rows.json")
    out_csv = str(tmp_path / "rows.csv")
    save_results(rows, out_json, out_csv)
    with open(out_json) as f:
        assert len(json.load(f)) == 2
    assert os.path.getsize(out_csv) > 0


def test_clustering_and_side_classifier():
    rng = np.random.default_rng(0)
    centers = np.eye(3, D) * 5
    embs, labels = [], []
    for c in range(3):
        embs.append(centers[c] + 0.3 * rng.normal(size=(40, D)))
        labels += [c] * 40
    embs = np.concatenate(embs).astype(np.float32)
    labels = np.asarray(labels)

    sep = class_mean_separation(embs, labels)
    assert all(v > 3.0 for v in sep.values())

    cents, assign = kmeans_with_class_means(embs, labels)
    # Clusters align with labels (same init ordering).
    acc = (assign == labels).mean()
    assert acc > 0.95

    model, params, history = train_side_classifier(
        embs, labels, num_epochs=20, batch_size=32)
    preds = classify_sides(model, params, embs)
    assert (preds == labels).mean() > 0.95


def test_fresh_test_dump(tmp_path):
    from vit_research_tpu.data import synthetic

    paths = synthetic.write_video_frames(
        str(tmp_path / "frames"), 1, [("left", 4), ("right", 4)],
        size=(16, 16))

    def embed(ps):
        from vit_research_tpu.data.preprocess import load_frames, PreprocessSpec

        batch = load_frames(ps, PreprocessSpec(size=(16, 16)), num_workers=1)
        # brightness asymmetry as the "embedding"
        left = batch[:, :, :8].mean(axis=(1, 2, 3))
        right = batch[:, :, 8:].mean(axis=(1, 2, 3))
        return np.stack([left, right], axis=1)

    def classify(embs):
        return (embs[:, 1] > embs[:, 0]).astype(int)  # 0=left, 1=right

    buckets = dump_classified_frames(paths, embed, classify,
                                     str(tmp_path / "out"))
    assert len(buckets["left"]) == 4 and len(buckets["right"]) == 4
    assert len(os.listdir(tmp_path / "out" / "left")) == 4


def test_smoke_endpoints():
    cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                    num_layers=1, num_heads=2, mlp_dim=64)
    shapes = smoke_test(cfg, verbose=False)
    assert shapes["pre_logits"] == (1, 32)
    assert shapes["encoded_tokens"] == (1, 17, 32)
