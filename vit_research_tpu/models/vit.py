"""Vision Transformer backbone in Flax, TPU-first.

One module covers both reference backbones:
- the vendored TF-Model-Garden ViT used with *random* weights at
  patch 32 / 432x768 input (reference: nba_proj/models/vit_backbone.py:220-366,
  instantiated at nba_proj/generate_clips_hmm.py:48-56), and
- the frozen pretrained ``google/vit-base-patch16-224`` embedder
  (reference: nba_proj/train/training.py:37-60) via HF weight import
  (models/hf_import.py).

Endpoint parity with the reference's ``VisionTransformer`` endpoints dict
(reference: nba_proj/models/vit_backbone.py:255-349):
``tokens_before_encoder``, ``encoded_tokens``, ``pooled``, ``pre_logits``,
and optional ``attention_scores``.

TPU-first choices:
- attention runs through the fused Pallas kernel (ops/attention.py) unless
  attention scores are requested (diagnostics path) or we're off-TPU;
- the patch embedding is a reshape+matmul (MXU) — optionally the fully
  fused normalize+patchify+project kernel (ops/patch_embed.py) via
  ``embed_images`` in parallel/embed.py;
- learned position embeddings bilinearly interpolate when the input grid
  differs from the trained grid (reference: nba_proj/models/vit_backbone.py:70-78).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_research_tpu.ops import attention as attn_ops
from vit_research_tpu.utils.configs import ViTConfig


def interpolate_pos_embedding(pos: jax.Array, grid_from: tuple,
                              grid_to: tuple, *, has_cls: bool = True) -> jax.Array:
    """Bilinearly resample a learned (1, N[+1], D) position table to a new
    patch grid (reference semantics: nba_proj/models/vit_backbone.py:70-78)."""
    if grid_from == grid_to:
        return pos
    cls_part = pos[:, :1] if has_cls else None
    grid_part = pos[:, 1:] if has_cls else pos
    d = grid_part.shape[-1]
    grid_part = grid_part.reshape(1, grid_from[0], grid_from[1], d)
    # antialias=False: tf.image.resize (the reference) and torch
    # F.interpolate (HF's pos-emb path) don't antialias on downsampling;
    # jax.image.resize does by default.
    grid_part = jax.image.resize(
        grid_part, (1, grid_to[0], grid_to[1], d), method="bilinear",
        antialias=False)
    grid_part = grid_part.reshape(1, grid_to[0] * grid_to[1], d)
    if cls_part is not None:
        return jnp.concatenate([cls_part, grid_part], axis=1)
    return grid_part


class MlpBlock(nn.Module):
    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    gelu_approximate: bool = False
    # Optional lax.dot_general replacement (ops/quant.py int8 path);
    # None = stock. Injecting here keeps the module structure/param tree
    # identical — the property BENCH_NOTES.md shows XLA rewards.
    dot_general: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype,
                     dot_general=self.dot_general, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype,
                     dot_general=self.dot_general, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class MultiHeadSelfAttention(nn.Module):
    """MHA with separate q/k/v projections (eases HF weight transplant)."""

    num_heads: int
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    # Default False: XLA measured faster than the Pallas kernel family at
    # every sequence length this repo uses (CLAUDE.md / BENCH_NOTES.md);
    # the backbone plumbs ViTConfig.use_flash_attention explicitly.
    use_pallas: bool = False
    interpret_pallas: bool = False
    dot_general: Any = None  # see MlpBlock
    # Softmax compute dtype (ViTConfig.softmax_dtype): f32 is the parity
    # default; bf16 halves VPU/HBM traffic on the (B,H,T,T) scores.
    softmax_dtype: Any = jnp.float32
    # 'bhtd' (default): transpose q/k/v to (B, H, T, dh) before the
    # einsums; 'bthd': transpose-free einsums straight off the
    # projection layout (ViTConfig.attn_layout) — see __call__.
    attn_layout: str = "bhtd"

    @nn.compact
    def __call__(self, x, *, train: bool = False, output_scores: bool = False,
                 log_size=None, output_metric: bool = False):
        """``log_size``: optional (B, T) key bias (ToMe proportional
        attention — merged tokens keep their constituents' attention
        mass). ``output_metric`` additionally returns the head-averaged
        keys (B, T, dh), ToMe's matching features; the return becomes a
        3-tuple."""
        d = x.shape[-1]
        h = self.num_heads
        dh = d // h
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (h, dh), axis=-1, dtype=self.dtype,
            dot_general=self.dot_general, name=name)
        # attn_layout 'bthd' keeps q/k/v in projection order (B, T, H, dh)
        # and lets the einsums carry the head batch dim from position 2 —
        # no explicit transposes. The 2026-08-21 device trace pinned
        # 29.5 ms/batch of the B=512 schedule as layout copies around the
        # transpose form; measured on-chip the two forms TIE (XLA
        # re-inserts the copies for its dot layouts — BENCH_NOTES.md).
        if self.attn_layout not in ("bhtd", "bthd"):
            raise ValueError(
                f"attn_layout must be 'bhtd' or 'bthd', got "
                f"{self.attn_layout!r}")
        bthd = self.attn_layout == "bthd"
        if bthd:
            q = dense("query")(x)  # (B, T, H, dh)
            k = dense("key")(x)
            v = dense("value")(x)
        else:
            q = dense("query")(x).transpose(0, 2, 1, 3)  # (B, H, T, dh)
            k = dense("key")(x).transpose(0, 2, 1, 3)
            v = dense("value")(x).transpose(0, 2, 1, 3)

        scores = None
        # The Pallas kernel has no dropout support — training with
        # attention dropout must take the XLA path or the regularization
        # is silently skipped. Likewise it computes its softmax in f32
        # internally, so a non-default softmax_dtype routes to XLA rather
        # than silently reporting f32-softmax behavior as bf16. And the
        # kernel consumes (B, H, T, dh), so attn_layout='bthd' (projection
        # order, transpose-free) also takes the XLA path even when
        # use_pallas=True — the two flags don't compose.
        needs_xla = (output_scores or log_size is not None
                     or not self.use_pallas or bthd
                     or self.softmax_dtype != jnp.float32
                     or (train and self.dropout_rate > 0.0))
        if needs_xla:
            s = jnp.einsum("bqhd,bkhd->bhqk" if bthd else "bhqd,bhkd->bhqk",
                           q, k) * (dh ** -0.5)
            if log_size is not None:
                s = s + log_size[:, None, None, :].astype(s.dtype)
            probs = jax.nn.softmax(s.astype(self.softmax_dtype), axis=-1)
            if output_scores:
                scores = probs.astype(jnp.float32)
            probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
            o = jnp.einsum("bhqk,bkhd->bqhd" if bthd else "bhqk,bhkd->bhqd",
                           probs.astype(q.dtype), v)
        else:
            o = attn_ops.multi_head_attention(
                q, k, v, use_pallas=True, interpret=self.interpret_pallas)
        if not bthd:
            o = o.transpose(0, 2, 1, 3)  # (B, T, H, dh)
        out = nn.DenseGeneral(d, axis=(-2, -1), dtype=self.dtype,
                              dot_general=self.dot_general, name="out")(o)
        if output_metric:
            return out, scores, k.mean(axis=2 if bthd else 1)
        return out, scores


class EncoderBlock(nn.Module):
    """Pre-norm transformer block (reference: TransformerEncoderBlock usage,
    nba_proj/models/vit_backbone.py:159-175)."""

    num_heads: int
    mlp_dim: int
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    gelu_approximate: bool = False
    use_pallas: bool = False  # see MultiHeadSelfAttention
    interpret_pallas: bool = False
    dot_general: Any = None  # see MlpBlock
    softmax_dtype: Any = jnp.float32  # see MultiHeadSelfAttention
    attn_layout: str = "bhtd"  # see MultiHeadSelfAttention

    @nn.compact
    def __call__(self, x, train: bool = False, output_scores: bool = False):
        # (train/output_scores are positional so nn.remat can mark them
        # static — see VisionTransformer.setup.)
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln1")(x)
        y, scores = MultiHeadSelfAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.attention_dropout_rate,
            use_pallas=self.use_pallas,
            interpret_pallas=self.interpret_pallas,
            dot_general=self.dot_general,
            softmax_dtype=self.softmax_dtype,
            attn_layout=self.attn_layout,
            name="attn",
        )(y, train=train, output_scores=output_scores)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        x = x + y
        z = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln2")(x)
        z = MlpBlock(
            mlp_dim=self.mlp_dim, dropout_rate=self.dropout_rate,
            dtype=self.dtype, gelu_approximate=self.gelu_approximate,
            dot_general=self.dot_general,
            name="mlp",
        )(z, train=train)
        return x + z, scores


class ToMeEncoderBlock(nn.Module):
    """EncoderBlock variant that merges ``r`` tokens per layer (ToMe,
    ops/tome.py). Parameter tree is identical to EncoderBlock (same
    submodule names), so weights — seeded-contract or HF-imported — load
    into either; only the forward differs. Off the parity path: enable
    via ``ViTConfig(tome_r=r)`` as a speed/accuracy trade."""

    num_heads: int
    mlp_dim: int
    r: int
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    gelu_approximate: bool = False
    dot_general: Any = None  # see MlpBlock
    softmax_dtype: Any = jnp.float32  # see MultiHeadSelfAttention

    @nn.compact
    def __call__(self, x, sizes, *, train: bool = False):
        from vit_research_tpu.ops.tome import bipartite_merge

        y = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln1")(x)
        y, _, metric = MultiHeadSelfAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.attention_dropout_rate,
            use_pallas=False, dot_general=self.dot_general,
            softmax_dtype=self.softmax_dtype, name="attn",
        )(y, train=train, log_size=jnp.log(sizes), output_metric=True)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        x = x + y
        x, sizes = bipartite_merge(x, metric, sizes, self.r)
        z = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln2")(x)
        z = MlpBlock(
            mlp_dim=self.mlp_dim, dropout_rate=self.dropout_rate,
            dtype=self.dtype, gelu_approximate=self.gelu_approximate,
            dot_general=self.dot_general,
            name="mlp",
        )(z, train=train)
        return x + z, sizes


class VisionTransformer(nn.Module):
    config: ViTConfig
    interpret_pallas: bool = False  # CPU testing of the Pallas paths

    def setup(self):
        c = self.config
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        if c.softmax_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown softmax_dtype {c.softmax_dtype!r}")
        sm_dtype = (jnp.bfloat16 if c.softmax_dtype == "bfloat16"
                    else jnp.float32)
        if c.gemm_quant not in (None, "int8", "int8-static"):
            raise ValueError(f"unknown gemm_quant {c.gemm_quant!r}")
        if c.gemm_quant == "int8":
            from vit_research_tpu.ops.quant import int8_dot_general
            qdg = int8_dot_general
        elif c.gemm_quant == "int8-static":
            # Static per-site activation scales (ops/quant.py): setup
            # runs per apply, so the instance's site cursor starts at 0
            # for every forward / jit trace. Empty scales are only valid
            # inside quant.calibration_mode() — except during param INIT,
            # which must run before any calibration is possible (shapes
            # don't depend on scale values): route init through the
            # dynamic dot.
            from vit_research_tpu.ops.quant import (StaticInt8DotGeneral,
                                                    int8_dot_general)
            expected = 6 * c.num_layers  # qkv(3) + out + fc1 + fc2 per block
            if c.gemm_quant_scales and len(c.gemm_quant_scales) != expected:
                # Exhaustion catches too FEW scales; too MANY would
                # silently apply a different architecture's calibration
                # (e.g. a 72-site ViT-B file against the 6-site tiny
                # model) — both directions must be hard errors.
                raise ValueError(
                    f"gemm_quant_scales has {len(c.gemm_quant_scales)} "
                    f"entries but this {c.num_layers}-layer model has "
                    f"{expected} dense dot sites — the calibration came "
                    "from a different architecture; re-calibrate with "
                    "the same flags")
            if not c.gemm_quant_scales and self.is_initializing():
                qdg = int8_dot_general
            else:
                qdg = StaticInt8DotGeneral(c.gemm_quant_scales)
        else:
            qdg = None
        self._quant_dot_general = qdg
        self.patch_embed = nn.Conv(
            features=c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=dtype, name="patch_embed")
        self.cls = self.param(
            "cls", nn.initializers.zeros, (1, 1, c.hidden_size), jnp.float32)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.truncated_normal(stddev=0.02),
            (1, c.num_patches + 1, c.hidden_size), jnp.float32)
        if c.tome_r:
            if c.remat or c.output_attention_scores:
                raise ValueError(
                    "tome_r is incompatible with remat (an inference-speed "
                    "knob) and with output_attention_scores (per-layer "
                    "score shapes differ once tokens merge)")
            self.blocks = [
                ToMeEncoderBlock(
                    num_heads=c.num_heads, mlp_dim=c.mlp_dim, r=c.tome_r,
                    dropout_rate=c.dropout_rate,
                    attention_dropout_rate=c.attention_dropout_rate,
                    layer_norm_eps=c.layer_norm_eps, dtype=dtype,
                    gelu_approximate=c.gelu_approximate,
                    dot_general=qdg, softmax_dtype=sm_dtype,
                    name=f"block_{i}")
                for i in range(c.num_layers)
            ]
        else:
            # Remat: recompute block activations in backward (static
            # argnums offset by 1 for the module scope — train /
            # output_scores).
            block_cls = (nn.remat(EncoderBlock, static_argnums=(2, 3))
                         if c.remat else EncoderBlock)
            self.blocks = [
                block_cls(
                    num_heads=c.num_heads, mlp_dim=c.mlp_dim,
                    dropout_rate=c.dropout_rate,
                    attention_dropout_rate=c.attention_dropout_rate,
                    layer_norm_eps=c.layer_norm_eps, dtype=dtype,
                    gelu_approximate=c.gelu_approximate,
                    use_pallas=c.use_flash_attention,
                    interpret_pallas=self.interpret_pallas,
                    dot_general=qdg, softmax_dtype=sm_dtype,
                    attn_layout=c.attn_layout,
                    name=f"block_{i}")
                for i in range(c.num_layers)
            ]
        self.encoder_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="encoder_norm")
        if c.representation_size is not None:
            self.pre_logits_dense = nn.Dense(
                c.representation_size, dtype=dtype, name="pre_logits")
        self.input_dropout = nn.Dropout(c.dropout_rate)

    def __call__(self, images, *, train: bool = False):
        c = self.config
        p = c.patch_size
        b, h, w, _ = images.shape
        grid = (h // p, w // p)
        x = self.patch_embed(images.astype(self._dtype))
        x = x.reshape(b, grid[0] * grid[1], c.hidden_size)
        return self.encode_patch_tokens(x, grid, train=train)

    def encode_patch_tokens(self, x, grid, *, train: bool = False):
        """Everything after the patch projection. Direct entry point for
        the fused normalize+patchify+project kernel (ops/patch_embed.py),
        which replaces the conv in the embedding engine's hot path."""
        c = self.config
        dtype = self._dtype
        b = x.shape[0]
        x = x.astype(dtype)

        x = jnp.concatenate(
            [jnp.tile(self.cls.astype(dtype), (b, 1, 1)), x], axis=1)
        pos = interpolate_pos_embedding(
            self.pos_embedding, c.grid, tuple(grid), has_cls=True)
        x = x + pos.astype(dtype)
        x = self.input_dropout(x, deterministic=not train)

        endpoints = {"tokens_before_encoder": x}
        all_scores = []
        sizes = None
        if c.tome_r:
            sizes = jnp.ones(x.shape[:2], jnp.float32)
            for block in self.blocks:
                x, sizes = block(x, sizes, train=train)
        else:
            for block in self.blocks:
                x, scores = block(x, train, c.output_attention_scores)
                if scores is not None:
                    all_scores.append(scores)

        x = self.encoder_norm(x)
        endpoints["encoded_tokens"] = x
        if sizes is not None:
            endpoints["token_sizes"] = sizes

        if c.pooler == "token":
            pooled = x[:, 0]
        elif c.pooler == "gap":
            if sizes is None:
                pooled = jnp.mean(x[:, 1:], axis=1)
            else:  # merged tokens stand for several originals — weight them
                w = sizes[:, 1:, None].astype(x.dtype)
                pooled = (x[:, 1:] * w).sum(axis=1) / w.sum(axis=1)
        elif c.pooler == "none":
            pooled = x
        else:
            raise ValueError(f"unknown pooler {c.pooler!r}")
        endpoints["pooled"] = pooled

        if c.representation_size is not None and c.pooler != "none":
            pre_logits = nn.tanh(self.pre_logits_dense(pooled))
        else:
            pre_logits = pooled
        endpoints["pre_logits"] = pre_logits

        if all_scores:
            endpoints["attention_scores"] = jnp.stack(all_scores, axis=1)
        return endpoints


def init_vit(config: ViTConfig, seed: int = 0, interpret_pallas: bool = False):
    """Seeded-init contract for the random-feature backbone.

    The reference's whole kNN/HMM stack is calibrated to one specific
    random init saved as ``vit_random_weights.h5``
    (reference: nba_proj/write_embeddings.py:243). Here the contract is
    (config, seed) -> deterministic params; thresholds recalibrate against
    this space (SURVEY.md section 7, hard parts)."""
    model = VisionTransformer(config, interpret_pallas=interpret_pallas)
    dummy = jnp.zeros((1, *config.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy)
    return model, params
