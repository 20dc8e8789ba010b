"""LOOP-level trajectory differential for the RAG stage (VERDICT r2
item 6): the reference's epoch loop — its own train_step, Accumulator,
two-phase LR/contrastive switch, FrameRetriever, and per-epoch DB
rebuild (reference: nba_proj/train/training.py:144-201,443-480) — run
for 4 epochs against ``train/train_rag.py`` on one tiny synthetic
corpus, with transplanted initial weights and identical batch order.

Step-level differentials pin each piece; only a loop run can catch
two-phase boundary placement, accumulation carry, retrieval-feedback
ordering (train -> val -> rebuild), or rebuild cadence drift.

Determinism notes:
- the frozen HF embedder is replaced on BOTH sides by a lookup table
  (frames carry their table id in pixel [0,0,0]; the reference side
  goes through its real ``tf.numpy_function`` wiring);
- dropout is zeroed on both sides (the reference hardcodes 0.1/0.2 —
  rates are zeroed on the built keras layers; ours via
  HeadConfig.dropout_rate/classifier_dropout) so trajectories are
  RNG-free;
- the reference's PHASE_*_CONTRASTIVE_LOSS constants are commented out
  in its config (nba_proj/config.py:19-20) — the intended 0.0 -> 0.1
  switch is used here on both sides
  (TrainConfig.contrastive_weight_phase2).
"""

import numpy as np
import pytest

from _ref_oracle import REF_ROOT, load_module as _load_module, \
    stub_set as _stub_set

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_ROOT),
    reason="reference tree not available")

D = 768  # reference train_step hardcodes the 768-d reshape (training.py:154)
T = 2    # frames per chunk
TOP_K, SEARCH_K = 4, 50
EPOCHS, BATCH, ACCUM = 4, 4, 2
LR1, LR2 = 1e-4, 1e-5
CW1, CW2 = 0.0, 0.1
SEED = 1234


@pytest.fixture(scope="module")
def heavy_deps():
    for name in ("tensorflow", "tf_keras"):
        pytest.importorskip(name)
    import tensorflow as tf
    return tf


@pytest.fixture(scope="module")
def ref_training(heavy_deps):
    # "garden" (faithful nn_blocks stand-ins), not "official": this
    # differential RUNS the reference RAGHead, not just imports it.
    return _load_module("ref_training_loop", "train/training.py",
                        _stub_set("chroma", "hf", "garden", "dbm"))


def _make_world(rng):
    """Frame-embedding table, chunk dicts, and the raw retrieval corpus."""
    n_train, n_val = 16, 8
    n_frames = (n_train + n_val) * T
    emb_table = rng.normal(size=(n_frames, D)).astype(np.float32)

    def mk_chunks(lo, n):
        out = []
        for i in range(n):
            out.append({
                "vid": 1 + (lo + i) % 3,
                "clip": i % 4,
                "side": ["left", "right"][i % 2],
                "t_center": 0.5,
                "t_width": 1.0,  # wide window: retrieval always fills k
                "label": (lo + i) % 2,
                "status_id": 0,
                "start_idx": i,
                "frame_ids": [(lo + i) * T + j for j in range(T)],
            })
        return out

    train_chunks = mk_chunks(0, n_train)
    val_chunks = mk_chunks(n_train, n_val)

    m = 60
    raw_corpus = rng.normal(size=(m, D)).astype(np.float32)
    corpus_ids = [f"c{i}" for i in range(m)]
    corpus_meta = [{"vid_num": 1 + i % 3,
                    "side": ["left", "right"][(i // 3) % 2],
                    "t_norm": round((i % 20) / 20, 5)} for i in range(m)]
    return emb_table, train_chunks, val_chunks, \
        (corpus_ids, raw_corpus, corpus_meta)


def _fresh_collection(name, corpus):
    from vit_research_tpu.store.vector_store import Collection

    ids, raw, meta = corpus
    col = Collection(name, space="cosine")
    init = raw / (np.linalg.norm(raw, axis=1, keepdims=True) + 1e-8)
    col.upsert(ids, init, meta)
    return col


def _chunk_embed(emb_table):
    def fn(batch_chunks):
        idx = np.asarray([c["frame_ids"] for c in batch_chunks])
        emb = emb_table[idx].mean(axis=1)
        return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
    return fn


def _batches(chunks, epoch):
    """The SAME batch order train_rag uses internally."""
    from vit_research_tpu.train.common import batch_iterator

    return list(batch_iterator(chunks, BATCH, seed=SEED + epoch))


def _zero_ref_dropout(rag_head):
    for block in rag_head.transformer_blocks:
        block._attention_dropout.rate = 0.0
        block._output_dropout.rate = 0.0
        mha = block._attention_layer
        if hasattr(mha, "_dropout_layer"):
            mha._dropout_layer.rate = 0.0
    rag_head.classifier.layers[1].rate = 0.0


class _Tracked:
    """keras-2/3 tracking shim (see tests/_tf_garden.py docstring)."""

    def __init__(self, model):
        self._model = model

    def __call__(self, *a, **k):
        return self._model(*a, **k)

    def __getattr__(self, name):
        return getattr(self._model, name)

    @property
    def trainable_variables(self):
        from _tf_garden import tracked_variables
        return tracked_variables(self._model)


def _transplant(ref_rag, ref_proj):
    from test_reference_differential_garden import _blocks_params, _dense, _ln

    head = {
        "pooler": {"retrieval_queries": ref_rag.pooler.query.numpy()},
        "cls_type": ref_rag.cls_type.numpy(),
        "ret_type": ref_rag.ret_type.numpy(),
        "pos_embedding": ref_rag.pos_embedding.numpy(),
        "norm": _ln(ref_rag.norm),
        "classifier": {"fc": _dense(ref_rag.classifier.layers[0]),
                       "logit": _dense(ref_rag.classifier.layers[2])},
        **_blocks_params(ref_rag.transformer_blocks),
    }
    proj = {name: {"kernel": layer.kernel.numpy(),
                   "bias": layer.bias.numpy()}
            for name, layer in (("d1", ref_proj.d1), ("d2", ref_proj.d2),
                                ("out", ref_proj.out))}
    return {"proj": {"params": proj}, "head": {"params": head}}


def _shim_metadata(md, tf):
    from test_reference_differential import _shim_metadata as shim
    return shim({"vid": md["vid"], "side": list(md["side"]),
                 "t_center": md["t_center"], "t_width": md["t_width"]})


def _frames_for(batch, tf):
    """(B, T, 432, 768, 3) float32, frame id stamped into pixel [0,0,0]
    (what the patched hf_vit_embed_batch reads back)."""
    b = len(batch)
    frames = np.zeros((b, T, 432, 768, 3), np.float32)
    for i, ch in enumerate(batch):
        for j, fid in enumerate(ch["frame_ids"]):
            frames[i, j, 0, 0, 0] = float(fid)
    return tf.constant(frames)


def _run_reference_loop(ref_training, tf, emb_table, train_chunks,
                        val_chunks, corpus):
    from vit_research_tpu.train.common import chunk_metadata_batch

    col = _fresh_collection("ref_loop", corpus)
    ids, raw, meta = corpus

    # Patch the frozen embedder with the id->table lookup; the call still
    # rides the reference's tf.numpy_function + (-1,432,768,3) reshape.
    ref_training.hf_vit_embed_batch = \
        lambda frames_np: emb_table[
            np.rint(np.asarray(frames_np)[:, 0, 0, 0]).astype(int)]

    # Deterministic keras init: the reference models draw from TF's
    # GLOBAL rng, so without this each run compares a different
    # transplanted init (different noise-amplification margins).
    tf.keras.utils.set_random_seed(123)
    rag_head = ref_training.RAGHead(hidden_size=D, num_queries=4,
                                    num_layers=2, num_heads=4)
    proj_head = ref_training.ProjectionHead(input_dim=D, hidden_dim=D,
                                            proj_dim=D)
    retriever = ref_training.FrameRetriever(col, top_k=TOP_K,
                                            search_k=SEARCH_K)
    # dummy builds (the reference's own shape-assert pattern,
    # training.py:409-417)
    rag_head(tf.zeros((1, D)), tf.zeros((1, TOP_K, D)), training=False)
    proj_head(tf.zeros((1, D)))
    _zero_ref_dropout(rag_head)

    tracked = _Tracked(rag_head)
    optimizer = tf.keras.optimizers.Adam(LR1)
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
    accum = ref_training.Accumulator(tracked, proj_head, ACCUM)

    init = _transplant(rag_head, proj_head)
    history = []
    for epoch in range(1, EPOCHS + 1):  # the reference loop is 1-indexed
        if epoch >= int(EPOCHS / 2) + 1:  # training.py:453-458
            optimizer.learning_rate.assign(LR2)
            cc = CW2
        else:
            optimizer.learning_rate.assign(LR1)
            cc = CW1
        losses, accs = [], []
        for batch in _batches(train_chunks, epoch - 1):
            md = chunk_metadata_batch(batch)
            loss, acc = ref_training.train_step(
                tracked, proj_head, retriever, optimizer, bce,
                _frames_for(batch, tf), _shim_metadata(md, tf),
                tf.constant(np.asarray(md["label"], np.float32)),
                accum, cc)
            losses.append(loss)
            accs.append(acc)
        ep = {"train_loss": float(np.mean(losses)),
              "train_acc": float(np.mean(accs))}

        # validation: the evaluate() math inline (training.py:206-354 —
        # the reference function only prints; same ops, collected)
        v_losses, v_accs = [], []
        from vit_research_tpu.train.common import batch_iterator
        for batch in batch_iterator(val_chunks, BATCH, shuffle=False,
                                    drop_remainder=False):
            md = chunk_metadata_batch(batch)
            raw_chunk = _chunk_embed(emb_table)(batch)
            chunk_embs = proj_head(tf.constant(raw_chunk), training=False)
            chunk_embs = tf.nn.l2_normalize(chunk_embs, axis=-1)
            retrieved = tf.nn.l2_normalize(tf.convert_to_tensor(
                retriever(chunk_embs, _shim_metadata(md, tf)), tf.float32),
                axis=2)
            logits, _ = rag_head(chunk_embs, retrieved, training=False)
            labels_t = tf.constant(np.asarray(md["label"], np.float32))
            v_losses.append(float(bce(labels_t, logits)))
            v_accs.append(float(ref_training.compute_accuracy(
                labels_t, logits)))
        ep["val_loss"] = float(np.mean(v_losses))
        ep["val_acc"] = float(np.mean(v_accs))
        history.append(ep)

        # rebuild cadence 1 (training.py:479-480): re-project the raw
        # corpus with the CURRENT projection, replace the rows.
        new = proj_head(tf.constant(raw), training=False).numpy()
        col.upsert(ids, new, meta)
    return init, history


def test_rag_loop_trajectory_matches_reference(ref_training, heavy_deps):
    tf = heavy_deps
    import dataclasses

    from vit_research_tpu.retrieval.retrievers import FrameRetriever
    from vit_research_tpu.train.train_rag import train_rag
    from vit_research_tpu.utils.configs import (ExperimentConfig,
                                                HeadConfig,
                                                RetrievalConfig,
                                                TrainConfig)

    rng = np.random.default_rng(7)
    emb_table, train_chunks, val_chunks, corpus = _make_world(rng)

    init, ref_hist = _run_reference_loop(
        ref_training, tf, emb_table, train_chunks, val_chunks, corpus)

    col = _fresh_collection("our_loop", corpus)
    ids, raw, meta = corpus

    def rebuild_fn(project_np):
        col.upsert(ids, project_np(raw), meta)

    cfg = ExperimentConfig(
        name="rag_traj",
        head=HeadConfig(embed_dim=D, num_layers=2, num_heads=4,
                        num_queries=4, dropout_rate=0.0,
                        classifier_dropout=0.0),
        retrieval=RetrievalConfig(top_k=TOP_K, search_k=SEARCH_K),
        train=TrainConfig(batch_size=BATCH, num_epochs=EPOCHS,
                          lr_phase1=LR1, lr_phase2=LR2,
                          accum_steps=ACCUM, grad_clip_norm=0.0,
                          contrastive_weight=CW1,
                          contrastive_weight_phase2=CW2,
                          rebuild_every=1))
    _, our_hist = train_rag(
        train_chunks, val_chunks, _chunk_embed(emb_table),
        FrameRetriever(col, top_k=TOP_K, search_k=SEARCH_K),
        cfg=cfg, rebuild_fn=rebuild_fn, seed=SEED, init_params=init)

    assert len(ref_hist) == len(our_hist) == EPOCHS
    ref_tl = [h["train_loss"] for h in ref_hist]
    our_tl = [h["train_loss"] for h in our_hist]
    ref_vl = [h["val_loss"] for h in ref_hist]
    our_vl = [h["val_loss"] for h in our_hist]
    # The trajectory must MOVE (a flat pair would compare vacuously) ...
    assert abs(ref_tl[0] - ref_tl[-1]) > 1e-3, ref_tl
    # Epoch 1 is pre-divergence: it pins transplant + step math +
    # retrieval + accumulation almost exactly (measured 3e-5 with the
    # pinned seeds).
    np.testing.assert_allclose(our_tl[0], ref_tl[0], atol=2e-3)
    np.testing.assert_allclose(our_vl[0], ref_vl[0], atol=2e-3)
    # Later epochs compound deterministic f32 op-order noise through
    # adam + discrete retrieval (measured max 0.013 by epoch 3 with the
    # pinned seeds — everything is seeded, so these ARE the permanent
    # values). A boundary/cadence/rebuild-ordering bug shifts whole
    # epochs by ~0.1+ (10x LR / different corpus) and blows far past
    # this bound.
    np.testing.assert_allclose(our_tl, ref_tl, atol=2.5e-2,
                               err_msg=f"train {our_tl} vs {ref_tl}")
    np.testing.assert_allclose(our_vl, ref_vl, atol=2.5e-2,
                               err_msg=f"val {our_vl} vs {ref_vl}")
    np.testing.assert_allclose(
        [h["train_acc"] for h in our_hist],
        [h["train_acc"] for h in ref_hist], atol=1 / 8,
        err_msg="train acc")  # one near-tie logit flip allowed per epoch
    np.testing.assert_allclose(
        [h["val_acc"] for h in our_hist],
        [h["val_acc"] for h in ref_hist], atol=1 / 8, err_msg="val acc")
