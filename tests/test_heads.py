"""Model heads: shapes, semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.models.heads import (
    ChunkEncoder,
    ProjectionHead,
    RAGHead,
    RATTHead,
    RetrievalMultiQueryPooler,
    cls_retrieval_importance,
)
from vit_research_tpu.models.ratt_v2 import (
    RATTHeadV2,
    branch_attention_diagnostics,
)
from vit_research_tpu.models.temporal_head import (
    TemporalHead,
    masked_cross_entropy,
)
from vit_research_tpu.utils.configs import ChunkEncoderConfig, HeadConfig

D = 64
HEAD_CFG = HeadConfig(embed_dim=D, num_layers=2, num_heads=2, mlp_dim=32,
                      num_queries=3, max_tokens=32, dtype="float32")
CE_CFG = ChunkEncoderConfig(embed_dim=D, num_layers=2, num_heads=2,
                            mlp_dim=4 * D, max_len=12)


def rng_data(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_pooler_shapes_and_weights():
    pooler = RetrievalMultiQueryPooler(D, 3)
    x = rng_data(2, 7, D)
    params = pooler.init(jax.random.PRNGKey(0), x)
    out = pooler.apply(params, x)
    assert out.shape == (2, 3, D)
    # Pooled tokens are convex combinations of retrieved rows.
    big = 1000 * jnp.ones((1, 4, D))
    params2 = pooler.init(jax.random.PRNGKey(0), big)
    out2 = pooler.apply(params2, big)
    np.testing.assert_allclose(np.asarray(out2), 1000.0, rtol=1e-5)


def test_projection_head_l2_normalized():
    ph = ProjectionHead(input_dim=2304, proj_dim=D)
    x = rng_data(5, 2304)
    params = ph.init(jax.random.PRNGKey(0), x)
    out = ph.apply(params, x)
    assert out.shape == (5, D)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)


def test_chunk_encoder():
    enc = ChunkEncoder(CE_CFG)
    x = rng_data(3, 8, D)
    params = enc.init(jax.random.PRNGKey(0), x)
    emb, logit = enc.apply(params, x)
    assert emb.shape == (3, D) and logit.shape == (3, 1)
    # Per-block params addressable (block pickle capability).
    assert "block_0" in params["params"] and "block_1" in params["params"]
    # Attention request works and is length num_layers.
    emb2, logit2, attn = enc.apply(params, x, return_attention=True)
    assert len(attn) == 2
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-6)
    # Variable T within max_len works.
    emb3, _ = enc.apply(params, rng_data(3, 12, D))
    assert emb3.shape == (3, D)


def test_rag_head():
    head = RAGHead(HEAD_CFG)
    cls = rng_data(4, D, seed=1)
    ret = rng_data(4, 9, D, seed=2)
    params = head.init(jax.random.PRNGKey(0), cls, ret)
    logits, fused = head.apply(params, cls, ret)
    assert logits.shape == (4, 1) and fused.shape == (4, D)
    # Differentiable end to end.
    def loss(p):
        lg, _ = head.apply(p, cls, ret)
        return jnp.mean(lg ** 2)
    g = jax.grad(loss)(params)
    assert np.isfinite(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))


def test_ratt_head_contract():
    head = RATTHead(HEAD_CFG)
    cls = rng_data(2, D, seed=1)
    ret = rng_data(2, 10, D, seed=2)
    params = head.init(jax.random.PRNGKey(0), cls, ret)
    logit, rel, fused, scores = head.apply(params, cls, ret)
    assert logit.shape == (2, 1)
    assert rel is None  # dead relevance head, reference parity
    assert fused.shape == (2, D)
    assert len(scores) == 2 and scores[0].shape == (2, 2, 11, 11)
    imp = cls_retrieval_importance(scores)
    assert imp.shape == (2, 10)
    # no-retrieval ablation path (train_cls_only capability)
    logit2, _, fused2, scores2 = head.apply(params, cls, ret,
                                            use_retrieval=False)
    assert logit2.shape == (2, 1) and scores2[0].shape == (2, 2, 1, 1)


def test_ratt_v2_contract():
    head = RATTHeadV2(HEAD_CFG)
    chunk = rng_data(2, D, seed=1)
    sup = rng_data(2, 4, D, seed=2)
    con = rng_data(2, 3, D, seed=3)
    tmp = rng_data(2, 2, D, seed=4)
    params = head.init(jax.random.PRNGKey(0), chunk, sup, con, tmp)
    logit, cls_out, aux = head.apply(params, chunk, sup, con, tmp)
    assert logit.shape == (2, 1) and cls_out.shape == (2, D)
    seq = 1 + 1 + 4 + 1 + 3 + 1 + 2 + 1
    assert aux["attn_scores"][0].shape == (2, 2, seq, seq)
    for k in ("support_summary", "contrast_summary", "temporal_summary",
              "local_out"):
        assert aux[k].shape == (2, D)
    diag = branch_attention_diagnostics(aux["attn_scores"], 4, 3, 2)
    assert all(0.0 <= float(v) <= 1.0 for v in diag.values())
    # Full CLS row partitions to 1: singles + token-group means * K.
    total = (float(diag["cls_self"]) + float(diag["support_summary"])
             + float(diag["contrast_summary"]) + float(diag["temporal_summary"])
             + float(diag["local"]) + 4 * float(diag["support_tokens"])
             + 3 * float(diag["contrast_tokens"])
             + 2 * float(diag["temporal_tokens"]))
    assert 0.98 < total < 1.02


def test_temporal_head_and_masked_ce():
    th = TemporalHead(embed_dim=D)
    x = rng_data(1, 20, D)
    params = th.init(jax.random.PRNGKey(0), x)
    logits = th.apply(params, x)
    assert logits.shape == (1, 20, 3)
    labels = np.zeros((1, 20), np.int32)
    labels[0, :5] = -1  # ignored
    loss = masked_cross_entropy(logits, jnp.asarray(labels))
    assert np.isfinite(float(loss))
    # All-ignored is finite (no NaN division).
    loss2 = masked_cross_entropy(logits, -jnp.ones((1, 20), jnp.int32))
    assert float(loss2) == 0.0


def test_chunk_encoder_rejects_over_length_chunks():
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    cfg = ChunkEncoderConfig(embed_dim=16, mlp_dim=32, max_len=4,
                             num_layers=1, num_heads=2)
    model = ChunkEncoder(cfg)
    import pytest

    with pytest.raises(ValueError, match="max_len"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 16)))


def test_attention_dropout_applies_even_with_pallas_enabled():
    """use_pallas routes to a kernel without dropout support; training
    with attention dropout must fall back to the XLA path so the
    regularization is actually applied (outputs vary across rng keys)."""
    from vit_research_tpu.models.vit import MultiHeadSelfAttention

    m = MultiHeadSelfAttention(num_heads=2, dropout_rate=0.9,
                               use_pallas=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 16)),
                    jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, train=True)
    outs = []
    for i in (1, 2):
        o, _ = m.apply(params, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(i)})
        outs.append(np.asarray(o))
    assert np.abs(outs[0] - outs[1]).max() > 1e-4
    # Inference stays deterministic and dropout-free.
    o1, _ = m.apply(params, x, train=False)
    o2, _ = m.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
