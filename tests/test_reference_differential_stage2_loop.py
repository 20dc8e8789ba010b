"""LOOP-level trajectory differential for STAGE 2 — the flagship
RATTHeadV2 trainer. Extends the RAG-stage loop differential (VERDICT r2
item 6) to the most complex reference loop: the reference's OWN
``run_train_epoch`` / ``run_val_epoch`` — its train_step/eval_step,
keras Adam(5e-4), Mean/BinaryAccuracy metrics, cached train fetch and
LIVE validation retrieval over our vector store — run for 3 epochs
against ``train/train_stage2.py`` with transplanted initial weights and
identical batch order (reference: nba_proj/train/training_stage2.py:
868-892 fetch_cache_batch, 997-1074 train_step, 1076-1135 eval_step,
1138-1156 run_train_epoch, 1192-1238 run_val_epoch, 1370-1395 loop).

Step-level differentials pin the head transplant
(test_reference_differential.py::test_ratt_v2...), the live retrieval
entry (test_reference_differential_ext.py::test_build_live_entry...),
and the sqrt pos-weight; only a loop run can catch optimizer-state
carry, metric accumulation semantics, train(cache)/val(live) interplay,
or batch-order drift.

Determinism: dropout zeroed on both sides (the reference hardcodes
0.1/0.2 — _transplants.zero_ratt_v2_dropout vs HeadConfig rates);
retrieval worlds are identical by construction; TF oneDNN is off
(conftest) so trajectories differ only by deterministic f32 op order.
"""

import numpy as np
import pytest

from _ref_oracle import REF_ROOT, load_module as _load_module, \
    stub_set as _stub_set
from _transplants import ratt_v2_flax_params, zero_ratt_v2_dropout

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_ROOT),
    reason="reference tree not available")

D = 32
HEADS, LAYERS, MLP_DIM = 4, 2, 16
K_SIM, K_CONTRAST, K_TEMPORAL = 4, 3, 2
SEARCH_KC, SEARCH_KT = 24, 16
FUTURE_STEP = 2
BATCH, EPOCHS = 6, 3
LR = 5e-4  # reference: training_stage2.py:1352
SEED = 712


@pytest.fixture(scope="module")
def heavy_deps():
    for name in ("tensorflow", "tf_keras"):
        pytest.importorskip(name)
    import tensorflow as tf
    return tf


@pytest.fixture(scope="module")
def ref_stage2(heavy_deps):
    mod = _load_module("ref_stage2_loop", "train/training_stage2.py",
                       _stub_set("chroma", "hf", "official", "reranker",
                                 "dbm"))
    yield mod
    try:
        heavy_deps.config.experimental.disable_op_determinism()
    except Exception:
        pass


def _world(rng):
    """Reuse the ext differential's fully-labeled chunk world: 3 vids x
    2 clips x 6 chunks over OUR cosine Collection."""
    from test_reference_differential_ext import _stage2_world

    chunks, col, emb_of = _stage2_world(rng, d=D)
    train_chunks = [c for c in chunks if c["vid"] in (1, 2)]
    val_chunks = [c for c in chunks if c["vid"] == 3]
    assert len(train_chunks) == 24 and len(val_chunks) == 12
    labels = [c["label"] for c in train_chunks]
    assert 0 < sum(labels) < len(labels), "need both classes for pos_weight"
    return train_chunks, val_chunks, col, emb_of


def _our_key(ch):
    from vit_research_tpu.retrieval.cache_stage2 import make_chunk_key
    return make_chunk_key(ch)


def _build_caches(ref, train_chunks, col, emb_of):
    """Per-side caches over the SAME world, each built by its own
    build_live_entry (their equality is step-level-pinned)."""
    from vit_research_tpu.retrieval import cache_stage2 as CS

    ref.encode_chunk = lambda ch, *a: emb_of[_our_key(ch)]
    ref_future = ref.build_future_key_lookup(train_chunks,
                                             future_step=FUTURE_STEP)
    ref_lookup = {ref.make_chunk_key(c): c for c in train_chunks}
    ref_cache = {}
    for ch in train_chunks:
        fut_ch = ref_lookup[ref_future[ref.make_chunk_key(ch)]]
        ref_cache[ref.make_chunk_key(ch)] = ref.build_live_entry(
            ch, fut_ch, col, None, None, None,
            search_k_content=SEARCH_KC, search_k_temporal=SEARCH_KT,
            k_sim=K_SIM, k_contrast=K_CONTRAST, k_temporal=K_TEMPORAL)

    our_future = CS.build_future_lookup(train_chunks,
                                        future_step=FUTURE_STEP)
    our_cache = {}
    for ch in train_chunks:
        key = _our_key(ch)
        nxt = our_future.get(key)
        fut_emb = (emb_of[nxt] if nxt in emb_of
                   else np.zeros_like(emb_of[key]))
        our_cache[key] = CS.build_live_entry(
            ch, emb_of[key], fut_emb, col,
            k_sim=K_SIM, k_contrast=K_CONTRAST, k_temporal=K_TEMPORAL,
            search_k_content=SEARCH_KC, search_k_temporal=SEARCH_KT)
    return ref_cache, our_cache


def _ref_batches(tf, chunks_in_order):
    """(frames=None, metadata tensors, labels) triples the reference
    dataset would yield (dataset.py batches carry these metadata keys)."""
    out = []
    for batch in chunks_in_order:
        md = {
            "vid": tf.constant([int(c["vid"]) for c in batch]),
            "side": tf.constant([c["side"] for c in batch]),
            "clip": tf.constant([int(c["clip"]) for c in batch]),
            "t_center": tf.constant([float(c["t_center"]) for c in batch]),
            "start_idx": tf.constant([int(c["start_idx"]) for c in batch]),
            "end_idx": tf.constant([int(c["end_idx"]) for c in batch]),
        }
        labels = tf.constant([float(c["label"]) for c in batch])
        out.append((None, md, labels))
    return out


def _run_reference_loop(ref, tf, train_chunks, val_chunks, col, emb_of,
                        ref_cache):
    from vit_research_tpu.train.common import batch_iterator

    # __main__-scope globals the epoch functions read
    # (training_stage2.py:1330-1334); constructed exactly as there.
    ref.train_loss_metric = tf.keras.metrics.Mean(name="train_loss")
    ref.train_acc_metric = tf.keras.metrics.BinaryAccuracy(
        threshold=0.5, name="train_acc")
    ref.val_loss_metric = tf.keras.metrics.Mean(name="val_loss")
    ref.val_acc_metric = tf.keras.metrics.BinaryAccuracy(
        threshold=0.5, name="val_acc")
    # eval_step -> fetch_live_batch reads config.* (:926-932)
    ref.config.K_SIM, ref.config.K_CONTRAST = K_SIM, K_CONTRAST
    ref.config.K_TEMPORAL = K_TEMPORAL
    ref.config.SEARCH_K_CONTENT = SEARCH_KC
    ref.config.SEARCH_K_TEMPORAL = SEARCH_KT

    head = ref.RATTHeadV2(hidden_size=D, num_heads=HEADS,
                          num_layers=LAYERS, mlp_dim=MLP_DIM)
    sample = ref_cache[ref.make_chunk_key(train_chunks[0])]
    head(
        chunk_embs=tf.constant(sample["query_emb"][None]),
        support_tokens=tf.constant(sample["sim_embs"][None]),
        contrast_tokens=tf.constant(sample["contrast_embs"][None]),
        temporal_tokens=tf.constant(sample["temporal_embs"][None]),
        training=False)
    zero_ratt_v2_dropout(head)
    init = ratt_v2_flax_params(head)

    optimizer = tf.keras.optimizers.Adam(learning_rate=LR)
    pos_weight = ref.compute_pos_weight(train_chunks)

    val_lookup = {ref.make_chunk_key(c): c for c in val_chunks}
    val_future = ref.build_future_key_lookup(val_chunks,
                                             future_step=FUTURE_STEP)
    val_ds = _ref_batches(tf, batch_iterator(
        val_chunks, BATCH, shuffle=False, drop_remainder=False))

    history = []
    for epoch in range(EPOCHS):
        train_ds = _ref_batches(tf, batch_iterator(
            train_chunks, BATCH, seed=SEED + epoch))
        train_loss, train_acc = ref.run_train_epoch(
            train_ds=train_ds, cache=ref_cache, ratt_head=head,
            optimizer=optimizer, pos_weight=pos_weight)
        val_loss, val_acc = ref.run_val_epoch(
            val_ds=val_ds, ratt_head=head,
            val_chunk_lookup=val_lookup,
            val_future_key_lookup=val_future,
            collection=col, chunk_encoder=None, frame_emb_mm=None,
            path_to_idx=None, pos_weight=pos_weight)
        history.append({"train_loss": train_loss, "train_acc": train_acc,
                        "val_loss": val_loss, "val_acc": val_acc})
    return init, pos_weight, history


def test_stage2_loop_trajectory_matches_reference(ref_stage2, heavy_deps):
    tf = heavy_deps

    from vit_research_tpu.train.train_stage2 import train_stage2
    from vit_research_tpu.utils.configs import (ExperimentConfig,
                                                HeadConfig,
                                                RetrievalConfig,
                                                TrainConfig)

    rng = np.random.default_rng(SEED)
    train_chunks, val_chunks, col, emb_of = _world(rng)
    ref_cache, our_cache = _build_caches(ref_stage2, train_chunks, col,
                                         emb_of)

    init, ref_pw, ref_hist = _run_reference_loop(
        ref_stage2, tf, train_chunks, val_chunks, col, emb_of, ref_cache)

    cfg = ExperimentConfig(
        name="stage2_traj",
        head=HeadConfig(embed_dim=D, num_layers=LAYERS, num_heads=HEADS,
                        mlp_dim=MLP_DIM, dropout_rate=0.0,
                        classifier_dropout=0.0, k_sim=K_SIM,
                        k_contrast=K_CONTRAST, k_temporal=K_TEMPORAL),
        retrieval=RetrievalConfig(search_k_content=SEARCH_KC,
                                  search_k_temporal=SEARCH_KT,
                                  future_chunk_step=FUTURE_STEP),
        train=TrainConfig(batch_size=BATCH, num_epochs=EPOCHS,
                          lr_phase1=LR, lr_phase2=LR, accum_steps=1,
                          weight_decay=0.0, grad_clip_norm=0.0))
    _, our_hist = train_stage2(
        train_chunks, val_chunks, our_cache,
        encode_fn=lambda ch: emb_of[_our_key(ch)], collection=col,
        cfg=cfg, seed=SEED, init_params={"params": init})

    # Our sqrt pos-weight equals the reference's (:1177-1189).
    from vit_research_tpu.train import losses as L
    import jax.numpy as jnp
    our_pw = float(L.sqrt_pos_weight(jnp.asarray(
        [float(c["label"]) for c in train_chunks])))
    np.testing.assert_allclose(our_pw, ref_pw, rtol=1e-6)

    assert len(ref_hist) == len(our_hist) == EPOCHS
    ref_tl = [h["train_loss"] for h in ref_hist]
    our_tl = [h["train_loss"] for h in our_hist]
    ref_vl = [h["val_loss"] for h in ref_hist]
    our_vl = [h["val_loss"] for h in our_hist]
    # The trajectory must MOVE (a flat pair would compare vacuously).
    assert abs(ref_tl[0] - ref_tl[-1]) > 1e-3, ref_tl
    # Epoch 1 pins transplant + step math + cache fetch + Adam epsilon
    # nearly exactly; later epochs compound deterministic f32 op-order
    # noise through Adam + live retrieval ties. A metric-semantics,
    # optimizer-carry, or fetch-path bug shifts whole epochs by >>0.1.
    np.testing.assert_allclose(our_tl[0], ref_tl[0], atol=2e-3)
    np.testing.assert_allclose(our_vl[0], ref_vl[0], atol=2e-3)
    np.testing.assert_allclose(our_tl, ref_tl, atol=2.5e-2,
                               err_msg=f"train {our_tl} vs {ref_tl}")
    np.testing.assert_allclose(our_vl, ref_vl, atol=2.5e-2,
                               err_msg=f"val {our_vl} vs {ref_vl}")
    np.testing.assert_allclose(
        [h["train_acc"] for h in our_hist],
        [h["train_acc"] for h in ref_hist], atol=1 / 8, err_msg="train acc")
    np.testing.assert_allclose(
        [h["val_acc"] for h in our_hist],
        [h["val_acc"] for h in ref_hist], atol=1 / 8, err_msg="val acc")
