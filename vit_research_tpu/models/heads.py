"""Retrieval-augmented head family: pooler, projection, ChunkEncoder,
RAGHead, RATTHead.

Flax re-designs of the reference's tf_keras heads with identical
computation contracts:

- ``RetrievalMultiQueryPooler`` — M learned queries cross-attend (QK^T
  softmax, intentionally unscaled) over the retrieved set
  (reference: nba_proj/models/rag_pooler.py:6-42).
- ``ProjectionHead`` — Dense(in,relu) -> Dense(hidden,relu) -> Dense(out)
  -> L2 normalize (reference: nba_proj/models/projection_head.py:4-18);
  used at 768->768 and 2304->768.
- ``ChunkEncoder`` — learned CLS + pos-emb over a chunk's T frame
  embeddings -> pre-norm transformer -> chunk embedding (CLS) + proxy
  binary class head (reference: nba_proj/models/chunk_encoder.py:9-97).
  Blocks are addressable as ``block_0..block_{n-1}`` — the reference's
  per-block pickle checkpointing crashed on missing attributes
  (reference: nba_proj/train/train_chunk_encoder.py:553-558); here the
  param tree makes per-block save/restore trivial.
- ``RAGHead`` — CLS token + pooled retrieval tokens + type embeddings +
  pos-emb -> transformer -> Dense(256)->Dense(1) make/miss logit
  (reference: nba_proj/models/rag_head.py:9-96).
- ``RATTHead`` — like RAGHead but attends over the raw retrieved tokens
  (no pooler) with a max_tokens=128 pos-emb budget, returning
  ``(class_logit, relevance_logit=None, fused, attention_scores)``
  (reference: nba_proj/models/ratt_head.py:56-156; the relevance head is
  dead there and stays optional here).

All attention runs through the shared EncoderBlock (pre-norm, Pallas
fused attention on TPU unless scores are requested).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vit_research_tpu.ops.topk import l2_normalize

from vit_research_tpu.models.vit import EncoderBlock
from vit_research_tpu.utils.configs import ChunkEncoderConfig, HeadConfig



class RetrievalMultiQueryPooler(nn.Module):
    hidden_size: int
    num_queries: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, retrieved):
        """(B, R, D) -> (B, M, D) pooled retrieval tokens. Scores are
        deliberately unscaled QK^T, matching the reference."""
        q = self.param("retrieval_queries", nn.initializers.xavier_uniform(),
                       (self.num_queries, self.hidden_size), jnp.float32)
        scores = jnp.einsum("md,brd->bmr", q.astype(retrieved.dtype), retrieved)
        weights = nn.softmax(scores, axis=-1)
        return jnp.einsum("bmr,brd->bmd", weights, retrieved)


class ProjectionHead(nn.Module):
    input_dim: int
    hidden_dim: int = 768
    proj_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.input_dim, dtype=self.dtype, name="d1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="d2")(x))
        x = nn.Dense(self.proj_dim, dtype=self.dtype, name="out")(x)
        return l2_normalize(x)


class ClassifierMLP(nn.Module):
    """Dense(hidden, relu) -> Dropout -> Dense(1)."""

    hidden_dim: int = 256
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(1, dtype=self.dtype, name="logit")(x)


class ChunkEncoder(nn.Module):
    config: ChunkEncoderConfig
    interpret_pallas: bool = False

    @nn.compact
    def __call__(self, frame_embeddings, *, train: bool = False,
                 return_attention: bool = False):
        """(B, T, D) frame embeddings -> (chunk_emb (B, D), class_logit
        (B, 1)[, attention scores])."""
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        b, t, d = frame_embeddings.shape
        if d != c.embed_dim:
            raise ValueError(f"expected dim {c.embed_dim}, got {d}")
        x = frame_embeddings.astype(dtype)

        if t > c.max_len:
            raise ValueError(
                f"chunk has {t} frames but ChunkEncoderConfig.max_len is "
                f"{c.max_len}; raise max_len (the pos table is sized to it)")
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.embed_dim), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, 1 + c.max_len, c.embed_dim), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(dtype), (b, 1, 1)), x], axis=1)
        x = x + pos[:, : t + 1].astype(dtype)

        scores_all = []
        for i in range(c.num_layers):
            x, scores = EncoderBlock(
                num_heads=c.num_heads, mlp_dim=c.mlp_dim,
                dropout_rate=c.dropout_rate,
                attention_dropout_rate=c.dropout_rate,
                # tanh-approx GELU: the reference blocks are TF-Model-Garden
                # nn_blocks, whose official.modeling.activations.gelu is
                # approximate=True (reference: nba_proj/models/chunk_encoder.py:18)
                gelu_approximate=True,
                dtype=dtype, interpret_pallas=self.interpret_pallas,
                name=f"block_{i}",
            )(x, train=train, output_scores=return_attention)
            if scores is not None:
                scores_all.append(scores)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        chunk_emb = x[:, 0]
        class_logit = ClassifierMLP(dtype=dtype, name="class_head")(
            chunk_emb, train=train)
        if return_attention:
            return chunk_emb, class_logit, scores_all
        return chunk_emb, class_logit


class RAGHead(nn.Module):
    config: HeadConfig
    interpret_pallas: bool = False

    @nn.compact
    def __call__(self, cls_embeddings, retrieved_embeddings, *,
                 train: bool = False):
        """cls (B, D) + retrieved (B, R, D) -> (logits (B, 1), fused (B, D))."""
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        b, d = cls_embeddings.shape

        pooled = RetrievalMultiQueryPooler(
            c.embed_dim, c.num_queries, dtype=dtype, name="pooler",
        )(retrieved_embeddings.astype(dtype))

        cls_type = self.param("cls_type", nn.initializers.zeros,
                              (1, 1, c.embed_dim), jnp.float32)
        ret_type = self.param("ret_type", nn.initializers.zeros,
                              (1, 1, c.embed_dim), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, 1 + c.num_queries, c.embed_dim), jnp.float32)

        cls_tok = cls_embeddings[:, None].astype(dtype) + cls_type.astype(dtype)
        ret_tok = pooled + ret_type.astype(dtype)
        x = jnp.concatenate([cls_tok, ret_tok], axis=1) + pos.astype(dtype)

        for i in range(c.num_layers):
            x, _ = EncoderBlock(
                num_heads=c.num_heads, mlp_dim=c.embed_dim * 4,
                dropout_rate=c.dropout_rate,
                attention_dropout_rate=c.dropout_rate,
                gelu_approximate=True,  # nn_blocks GELU, see ChunkEncoder
                dtype=dtype, interpret_pallas=self.interpret_pallas,
                name=f"block_{i}",
            )(x, train=train)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        fused_cls = x[:, 0]
        logits = ClassifierMLP(hidden_dim=c.hidden_dim,
                               dropout_rate=c.classifier_dropout,
                               dtype=dtype,
                               name="classifier")(fused_cls, train=train)
        return logits, fused_cls


class RATTHead(nn.Module):
    config: HeadConfig
    use_relevance_head: bool = False  # dead in the reference; optional here
    interpret_pallas: bool = False

    @nn.compact
    def __call__(self, cls_embeddings, retrieved_embeddings, *,
                 train: bool = False, use_retrieval: bool = True):
        """cls (B, D) + raw retrieved (B, K, D) ->
        (class_logit, relevance_logit | None, fused, attention_scores)."""
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32

        cls_type = self.param("cls_type", nn.initializers.zeros,
                              (1, 1, c.embed_dim), jnp.float32)
        ret_type = self.param("ret_type", nn.initializers.zeros,
                              (1, 1, c.embed_dim), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, c.max_tokens, c.embed_dim), jnp.float32)

        cls_tok = cls_embeddings[:, None].astype(dtype) + cls_type.astype(dtype)
        if use_retrieval:
            ret_tok = retrieved_embeddings.astype(dtype) + ret_type.astype(dtype)
            x = jnp.concatenate([cls_tok, ret_tok], axis=1)
        else:
            x = cls_tok
        seq = x.shape[1]
        if seq > c.max_tokens:
            raise ValueError(f"sequence {seq} exceeds max_tokens {c.max_tokens}")
        x = x + pos[:, :seq].astype(dtype)

        scores_all = []
        for i in range(c.num_layers):
            x, scores = EncoderBlock(
                num_heads=c.num_heads, mlp_dim=c.embed_dim * 4,
                dropout_rate=c.dropout_rate,
                attention_dropout_rate=c.dropout_rate,
                gelu_approximate=True,  # nn_blocks GELU, see ChunkEncoder
                dtype=dtype, interpret_pallas=self.interpret_pallas,
                name=f"block_{i}",
            )(x, train=train, output_scores=True)
            scores_all.append(scores)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        fused = x[:, 0]
        class_logit = ClassifierMLP(hidden_dim=c.hidden_dim,
                                    dropout_rate=c.classifier_dropout,
                                    dtype=dtype,
                                    name="class_head")(fused, train=train)
        relevance_logit = None
        if self.use_relevance_head:
            relevance_logit = ClassifierMLP(
                hidden_dim=c.hidden_dim, dropout_rate=c.classifier_dropout,
                dtype=dtype, name="relevance_head",
            )(fused, train=train)
        return class_logit, relevance_logit, fused, scores_all


def cls_retrieval_importance(attention_scores):
    """CLS -> retrieved-token importance from the last attention layer,
    head-averaged (the consumer-side computation of the reference:
    nba_proj/models/ratt_head.py:126-127,
    nba_proj/train/training_chunk_works.py:100-135)."""
    attn = attention_scores[-1]  # (B, H, T, T)
    cls_attn = jnp.mean(attn[:, :, 0, :], axis=1)  # (B, T)
    return cls_attn[:, 1:]  # drop CLS->CLS
