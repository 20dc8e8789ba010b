"""Keras -> Flax weight-transplant maps shared by the differentials.

Transplants let the reference model run with OUR parameters (or vice
versa) so outputs and training trajectories are comparable exactly.
Each function returns the params PyTree our Flax module expects from
``module.apply({"params": ...}, ...)``.
"""

import numpy as np


def _kd(layer):
    """keras Dense -> flax Dense param dict."""
    return {"kernel": layer.kernel.numpy(), "bias": layer.bias.numpy()}


def ratt_v2_flax_params(ref) -> dict:
    """Reference Keras ``RATTHeadV2`` (built) -> our Flax RATTHeadV2 tree
    (reference: nba_proj/models/ratt_v2.py:598-771; ours:
    vit_research_tpu/models/ratt_v2.py)."""
    params = {
        "query_proj": _kd(ref.query_proj.layers[0]),
        "norm": {"scale": ref.norm.gamma.numpy(),
                 "bias": ref.norm.beta.numpy()},
        "classifier_fc": _kd(ref.classifier.layers[0]),
        "classifier_logit": _kd(ref.classifier.layers[2]),
    }
    for name, seq in (("support_proj", ref.support_proj),
                      ("contrast_proj", ref.contrast_proj),
                      ("temporal_proj", ref.temporal_proj)):
        params[name] = {"fc1": _kd(seq.layers[0]), "fc2": _kd(seq.layers[1])}
    for tok in ("cls_token", "support_token", "contrast_token",
                "temporal_token", "type_cls", "type_support_summary",
                "type_support", "type_contrast_summary", "type_contrast",
                "type_temporal_summary", "type_temporal", "type_local"):
        params[tok] = getattr(ref, tok).numpy()
    for i, block in enumerate(ref.transformer_blocks):
        mha = block.attn
        params[f"transformer_block_{i}"] = {
            "ln1": {"scale": block.norm1.gamma.numpy(),
                    "bias": block.norm1.beta.numpy()},
            "ln2": {"scale": block.norm2.gamma.numpy(),
                    "bias": block.norm2.beta.numpy()},
            "attn": {
                "query": {"kernel": mha._query_dense.kernel.numpy(),
                          "bias": mha._query_dense.bias.numpy()},
                "key": {"kernel": mha._key_dense.kernel.numpy(),
                        "bias": mha._key_dense.bias.numpy()},
                "value": {"kernel": mha._value_dense.kernel.numpy(),
                          "bias": mha._value_dense.bias.numpy()},
                "out": {"kernel": mha._output_dense.kernel.numpy(),
                        "bias": mha._output_dense.bias.numpy()},
            },
            "mlp": {"fc1": _kd(block.ffn.layers[0]),
                    "fc2": _kd(block.ffn.layers[2])},
        }
    return params


def zero_ratt_v2_dropout(ref) -> None:
    """Zero every dropout rate on a BUILT reference RATTHeadV2 so
    train-mode trajectories are RNG-free (the reference hardcodes
    0.1/0.2 — ratt_v2.py:600,676-680)."""
    for block in ref.transformer_blocks:
        if hasattr(block.attn, "_dropout_layer"):
            block.attn._dropout_layer.rate = 0.0
        block.ffn.layers[1].rate = 0.0
        block.ffn.layers[3].rate = 0.0
    ref.classifier.layers[1].rate = 0.0


def assert_tree_allclose(ours, ref_tree, atol, path=""):
    """Recursive np allclose over two nested param dicts."""
    if isinstance(ref_tree, dict):
        assert set(ours) == set(ref_tree), (path, set(ours), set(ref_tree))
        for k in ref_tree:
            assert_tree_allclose(ours[k], ref_tree[k], atol, f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_tree),
                                   atol=atol, err_msg=path)
