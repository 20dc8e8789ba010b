"""Fused RAG-ViT: retrieval tokens injected before the ViT encoder.

Equivalent of the reference's fused variant
(reference: nba_proj/rag_vit.py:259-328,474-519): a ``RetrievalModule``
queries the vector store per sample (side + t_norm window filters,
same-clip exclusion) and a ``RAGVisionTransformer`` concatenates the
pooled retrieval tokens with the patch tokens *before* the transformer
encoder, so retrieval context participates in every attention layer.

The reference's version was never exercised (its ``RetrievalModule.call``
references ``np`` without importing it, nba_proj/rag_vit.py:300-304);
this one works: retrieval runs on the host between steps (store queries
are data-dependent) and the fused forward is jitted with fixed-K padded
retrieval tokens.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.models.heads import RetrievalMultiQueryPooler
from vit_research_tpu.models.vit import interpolate_pos_embedding
from vit_research_tpu.utils.configs import ViTConfig


class RetrievalModule:
    """Host-side per-sample retrieval with side/t_norm filters and
    same-clip exclusion (reference: nba_proj/rag_vit.py:259-304)."""

    def __init__(self, collection, top_k: int = 8, time_window: float = 0.1):
        self.collection = collection
        self.top_k = top_k
        self.time_window = time_window

    def __call__(self, query_embs, sides, t_norms, clip_nums,
                 vid_nums) -> np.ndarray:
        q = np.asarray(query_embs, np.float32)
        b, d = q.shape
        out = np.zeros((b, self.top_k, d), np.float32)
        for i in range(b):
            res = self.collection.query(
                query_embeddings=q[i], n_results=self.top_k,
                where={"$and": [
                    {"side": str(sides[i])},
                    {"t_norm": {"$gte": float(t_norms[i]) - self.time_window}},
                    {"t_norm": {"$lte": float(t_norms[i]) + self.time_window}},
                    {"$or": [
                        {"clip_num": {"$ne": int(clip_nums[i])}},
                        {"vid_num": {"$ne": int(vid_nums[i])}},
                    ]},
                ]},
                include=("embeddings",))
            embs = res.get("embeddings", [[]])[0]
            for j, e in enumerate(embs[: self.top_k]):
                out[i, j] = e
        return out


class RAGVisionTransformer(nn.Module):
    """ViT whose token sequence is [CLS, patches..., retrieval tokens...]
    (reference: nba_proj/rag_vit.py:306-328)."""

    config: ViTConfig
    num_retrieval_tokens: int = 4
    interpret_pallas: bool = False

    @nn.compact
    def __call__(self, images, retrieved, *, train: bool = False):
        """images (B, H, W, 3); retrieved (B, K, D) host-fetched tokens."""
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        p = c.patch_size
        b, h, w, _ = images.shape
        grid = (h // p, w // p)

        x = nn.Conv(features=c.hidden_size, kernel_size=(p, p),
                    strides=(p, p), padding="VALID", dtype=dtype,
                    name="patch_embed")(images.astype(dtype))
        x = x.reshape(b, grid[0] * grid[1], c.hidden_size)

        pooled_ret = RetrievalMultiQueryPooler(
            c.hidden_size, self.num_retrieval_tokens, dtype=dtype,
            name="retrieval_pooler")(retrieved.astype(dtype))
        ret_type = self.param("ret_type", nn.initializers.zeros,
                              (1, 1, c.hidden_size), jnp.float32)
        pooled_ret = pooled_ret + ret_type.astype(dtype)

        cls = self.param("cls", nn.initializers.zeros,
                         (1, 1, c.hidden_size), jnp.float32)
        pos = self.param("pos_embedding",
                         nn.initializers.truncated_normal(stddev=0.02),
                         (1, c.num_patches + 1, c.hidden_size), jnp.float32)
        pos = interpolate_pos_embedding(pos, c.grid, grid, has_cls=True)
        x = jnp.concatenate(
            [jnp.tile(cls.astype(dtype), (b, 1, 1)), x], axis=1)
        x = x + pos.astype(dtype)
        # Retrieval tokens join after position embedding (they carry no
        # spatial position), before the encoder.
        x = jnp.concatenate([x, pooled_ret], axis=1)

        from vit_research_tpu.models.vit import EncoderBlock

        for i in range(c.num_layers):
            x, _ = EncoderBlock(
                num_heads=c.num_heads, mlp_dim=c.mlp_dim,
                dropout_rate=c.dropout_rate,
                attention_dropout_rate=c.attention_dropout_rate,
                layer_norm_eps=c.layer_norm_eps, dtype=dtype,
                gelu_approximate=c.gelu_approximate,
                use_pallas=c.use_flash_attention,
                interpret_pallas=self.interpret_pallas,
                name=f"block_{i}")(x, train=train)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_norm")(x)
        endpoints = {
            "encoded_tokens": x,
            "pooled": x[:, 0],
            "pre_logits": x[:, 0],
            "retrieval_tokens": x[:, -self.num_retrieval_tokens:],
        }
        return endpoints


def build_rag_vit(config: ViTConfig | None = None, num_retrieval_tokens: int = 4,
                  seed: int = 0):
    """Registered-builder analog of the reference's 'rag_vit' backbone
    (reference: nba_proj/rag_vit.py:474-519)."""
    import jax

    config = config or ViTConfig()
    model = RAGVisionTransformer(config,
                                 num_retrieval_tokens=num_retrieval_tokens)
    dummy_img = jnp.zeros((1, *config.image_size, 3), jnp.float32)
    dummy_ret = jnp.zeros((1, num_retrieval_tokens, config.hidden_size),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy_img, dummy_ret)
    return model, params
