"""RATTHeadV2: three-branch (support / contrast / temporal) retrieval head.

Flax re-design of the reference's most recent head
(reference: nba_proj/models/ratt_v2.py:629-771):

- per-branch 2-layer MLP projections (Dense(2D, relu) -> Dense(D)),
- single-Dense query projection with residual local token
  ``local = q + Dense(q)`` (reference: nba_proj/models/ratt_v2.py:693-695),
- learned per-branch summary tokens and type embeddings,
- sequence ``[CLS, supSum, sup..., conSum, con..., tmpSum, tmp..., local]``,
- pre-norm transformer blocks (reference TransformerBlock,
  nba_proj/models/ratt_v2.py:598-626),
- classifier on CLS (Dense(2*mlp_dim, relu) -> Dropout -> Dense(1)),
- aux outputs: branch summaries + attention scores; the reference's
  ``tf.print`` routing diagnostics (nba_proj/models/ratt_v2.py:762-769)
  are returned as data by :func:`branch_attention_diagnostics` instead of
  printed from inside the graph.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vit_research_tpu.models.vit import EncoderBlock
from vit_research_tpu.utils.configs import HeadConfig


class BranchProjection(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_size * 2, dtype=self.dtype,
                             name="fc1")(x))
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


class RATTHeadV2(nn.Module):
    config: HeadConfig
    interpret_pallas: bool = False

    @nn.compact
    def __call__(self, chunk_embs, support_tokens, contrast_tokens,
                 temporal_tokens, *, train: bool = False):
        """chunk (B, D); support (B, Ks, D); contrast (B, Kc, D);
        temporal (B, Kt, D) -> (class_logit (B, 1), cls_out (B, D), aux)."""
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        d = c.embed_dim
        b = chunk_embs.shape[0]
        ks, kc, kt = (support_tokens.shape[1], contrast_tokens.shape[1],
                      temporal_tokens.shape[1])

        q_raw = chunk_embs[:, None].astype(dtype)
        q_proj = nn.Dense(d, dtype=dtype, name="query_proj")(q_raw)
        local = q_raw + q_proj

        sup = BranchProjection(d, dtype=dtype, name="support_proj")(
            support_tokens.astype(dtype))
        con = BranchProjection(d, dtype=dtype, name="contrast_proj")(
            contrast_tokens.astype(dtype))
        tmp = BranchProjection(d, dtype=dtype, name="temporal_proj")(
            temporal_tokens.astype(dtype))

        def tok(name, init=nn.initializers.normal(0.02)):
            return self.param(name, init, (1, 1, d), jnp.float32).astype(dtype)

        cls = jnp.tile(tok("cls_token"), (b, 1, 1))
        sup_sum = jnp.tile(tok("support_token"), (b, 1, 1))
        con_sum = jnp.tile(tok("contrast_token"), (b, 1, 1))
        tmp_sum = jnp.tile(tok("temporal_token"), (b, 1, 1))

        x = jnp.concatenate(
            [cls, sup_sum, sup, con_sum, con, tmp_sum, tmp, local], axis=1)

        types = jnp.concatenate([
            jnp.tile(tok("type_cls"), (b, 1, 1)),
            jnp.tile(tok("type_support_summary"), (b, 1, 1)),
            jnp.tile(tok("type_support"), (b, ks, 1)),
            jnp.tile(tok("type_contrast_summary"), (b, 1, 1)),
            jnp.tile(tok("type_contrast"), (b, kc, 1)),
            jnp.tile(tok("type_temporal_summary"), (b, 1, 1)),
            jnp.tile(tok("type_temporal"), (b, kt, 1)),
            jnp.tile(tok("type_local"), (b, 1, 1)),
        ], axis=1)
        x = x + types

        scores_all = []
        for i in range(c.num_layers):
            x, scores = EncoderBlock(
                num_heads=c.num_heads, mlp_dim=d * 4,
                dropout_rate=c.dropout_rate,
                attention_dropout_rate=c.dropout_rate,
                dtype=dtype, interpret_pallas=self.interpret_pallas,
                name=f"transformer_block_{i}",
            )(x, train=train, output_scores=True)
            scores_all.append(scores)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)

        idx_cls = 0
        idx_sup_sum = 1
        idx_con_sum = 2 + ks
        idx_tmp_sum = 3 + ks + kc
        idx_local = 4 + ks + kc + kt

        cls_out = x[:, idx_cls]
        h = nn.relu(nn.Dense(c.mlp_dim * 2, dtype=dtype,
                             name="classifier_fc")(cls_out))
        # Rate from config (reference hardcodes 0.2, ratt_v2.py:678;
        # HeadConfig.classifier_dropout defaults to 0.2 and lets
        # deterministic differentials zero it — found by the stage-2
        # loop differential: the hardcoded rate ignored the config).
        h = nn.Dropout(c.classifier_dropout, deterministic=not train)(h)
        class_logit = nn.Dense(1, dtype=dtype, name="classifier_logit")(h)

        aux = {
            "support_summary": x[:, idx_sup_sum],
            "contrast_summary": x[:, idx_con_sum],
            "temporal_summary": x[:, idx_tmp_sum],
            "local_out": x[:, idx_local],
            "attn_scores": scores_all,
        }
        return class_logit, cls_out, aux


def branch_attention_diagnostics(scores_all, ks: int, kc: int, kt: int) -> dict:
    """CLS-attention routing per branch, as data (the reference printed
    these from inside the graph, nba_proj/models/ratt_v2.py:762-769)."""
    last = scores_all[-1]  # (B, H, T, T)
    attn = jnp.mean(last, axis=1)  # (B, T, T)
    cls_attn = attn[:, 0, :]  # (B, T)
    idx_sup_sum = 1
    idx_con_sum = 2 + ks
    idx_tmp_sum = 3 + ks + kc
    idx_local = 4 + ks + kc + kt
    return {
        "cls_self": jnp.mean(cls_attn[:, 0]),
        "support_summary": jnp.mean(cls_attn[:, idx_sup_sum]),
        "support_tokens": jnp.mean(cls_attn[:, 2:2 + ks]),
        "contrast_summary": jnp.mean(cls_attn[:, idx_con_sum]),
        "contrast_tokens": jnp.mean(cls_attn[:, 3 + ks:3 + ks + kc]),
        "temporal_summary": jnp.mean(cls_attn[:, idx_tmp_sum]),
        "temporal_tokens": jnp.mean(cls_attn[:, 4 + ks + kc:4 + ks + kc + kt]),
        "local": jnp.mean(cls_attn[:, idx_local]),
    }
