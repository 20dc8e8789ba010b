"""Transplant HuggingFace ViT weights into the Flax backbone.

The reference's frozen frame embedder is the torch
``google/vit-base-patch16-224`` (reference: nba_proj/train/training.py:37-39,
nba_proj/db_maintainence/build_embeddings_store.py:32-35). This module maps
a ``transformers.ViTModel`` state dict onto ``models/vit.py`` parameters so
the TPU framework reproduces that embedding space exactly (parity target:
<=1e-3 cosine drift, BASELINE.md). Weight download is gated — in an
offline image, pass a locally-instantiated ``ViTModel`` instead.
"""

from __future__ import annotations

import numpy as np

from vit_research_tpu.utils.configs import ViTConfig

# HF google/vit-base-patch16-224 equivalent config for this backbone.
HF_VIT_B16_224 = ViTConfig(
    image_size=(224, 224), patch_size=16, hidden_size=768, num_layers=12,
    num_heads=12, mlp_dim=3072, layer_norm_eps=1e-12, gelu_approximate=False,
    pooler="token",
)


def hf_config_to_vit_config(hf_cfg) -> ViTConfig:
    return ViTConfig(
        image_size=(hf_cfg.image_size, hf_cfg.image_size),
        patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        mlp_dim=hf_cfg.intermediate_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        gelu_approximate=False,
        pooler="token",
    )


def hf_state_dict_to_params(state_dict, config: ViTConfig) -> dict:
    """torch ViTModel state dict -> flax params dict for VisionTransformer."""

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy()
                          if hasattr(state_dict[name], "detach")
                          else state_dict[name])

    d = config.hidden_size
    h = config.num_heads
    dh = d // h
    p = config.patch_size

    params = {
        "cls": t("embeddings.cls_token"),
        "pos_embedding": t("embeddings.position_embeddings"),
        "patch_embed": {
            # torch conv (D, C, P, P) -> flax HWIO (P, P, C, D)
            "kernel": t("embeddings.patch_embeddings.projection.weight")
            .transpose(2, 3, 1, 0),
            "bias": t("embeddings.patch_embeddings.projection.bias"),
        },
        "encoder_norm": {
            "scale": t("layernorm.weight"),
            "bias": t("layernorm.bias"),
        },
    }

    for i in range(config.num_layers):
        pre = f"encoder.layer.{i}."
        blk = {
            "ln1": {"scale": t(pre + "layernorm_before.weight"),
                    "bias": t(pre + "layernorm_before.bias")},
            "ln2": {"scale": t(pre + "layernorm_after.weight"),
                    "bias": t(pre + "layernorm_after.bias")},
            "attn": {},
            "mlp": {
                "fc1": {"kernel": t(pre + "intermediate.dense.weight").T,
                        "bias": t(pre + "intermediate.dense.bias")},
                "fc2": {"kernel": t(pre + "output.dense.weight").T,
                        "bias": t(pre + "output.dense.bias")},
            },
        }
        for name in ("query", "key", "value"):
            wk = t(pre + f"attention.attention.{name}.weight")  # (D, D)
            bk = t(pre + f"attention.attention.{name}.bias")  # (D,)
            blk["attn"][name] = {
                "kernel": wk.T.reshape(d, h, dh),
                "bias": bk.reshape(h, dh),
            }
        wo = t(pre + "attention.output.dense.weight")  # (D, D): out x in
        blk["attn"]["out"] = {
            "kernel": wo.T.reshape(h, dh, d),
            "bias": t(pre + "attention.output.dense.bias"),
        }
        params[f"block_{i}"] = blk

    if config.representation_size is not None and \
            "pooler.dense.weight" in state_dict:
        params["pre_logits"] = {
            "kernel": t("pooler.dense.weight").T,
            "bias": t("pooler.dense.bias"),
        }

    _ = p  # patch size participates only via the conv kernel shape
    return {"params": params}


def load_hf_vit(model_name: str = "google/vit-base-patch16-224", **kwargs):
    """Build (model, params, config) from a HF checkpoint if available.

    Returns None when torch/transformers or the weights are unavailable
    (zero-egress images); callers fall back to the seeded-init contract.
    ``kwargs`` forward to ``from_pretrained`` (e.g.
    ``local_files_only=True`` to pin a cached/local checkpoint without a
    hub round-trip — tests/test_hf_golden_checkpoint.py)."""
    try:
        from transformers import ViTModel

        hf = ViTModel.from_pretrained(model_name, **kwargs)
    except Exception:
        return None
    return vit_from_torch_model(hf)


def vit_from_torch_model(hf_model):
    """Transplant an in-memory ``transformers.ViTModel`` (any size)."""
    from vit_research_tpu.models.vit import VisionTransformer

    import dataclasses

    config = hf_config_to_vit_config(hf_model.config)
    if getattr(hf_model, "pooler", None) is not None:
        config = dataclasses.replace(
            config, representation_size=config.hidden_size)
    params = hf_state_dict_to_params(hf_model.state_dict(), config)
    model = VisionTransformer(config)
    return model, params, config
