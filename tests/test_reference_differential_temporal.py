"""Differential tests: the reference's TEMPORAL-HEAD TRAINER as the
oracle — ``train_model`` / ``predict_probs`` from
smarter_generate_clips.py (PyTorch 1-D CNN, Adam lr=1e-5, full-sequence
batch, CrossEntropyLoss(ignore_index=-1))
(reference: nba_proj/smarter_generate_clips.py:22-24,189-283).

Pinned here:

- the masked cross-entropy normalizes by the count of NON-ignored
  frames (torch ignore_index semantics), not the sequence length;
- a short warm-started training run: the reference's own train_model
  (EPOCHS patched down, same Adam defaults — torch eps 1e-8 ==
  optax.adam's) vs our lax.scan trainer from the SAME transplanted
  initial weights, compared on the post-training softmax probabilities.

Skipped when no reference tree is present.
"""

import os

import numpy as np
import pytest

from _ref_oracle import (REF_ROOT, load_module, permissive_module,
                         stub_set)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_smarter(torch):
    stubs = stub_set("official", "tf")
    stubs["hmm"] = permissive_module("hmm")
    return load_module("ref_smarter_train", "smarter_generate_clips.py",
                       stubs)


def _torch_to_flax(ref, torch):
    convs = [m for m in ref.net if isinstance(m, torch.nn.Conv1d)]
    names = ["conv_0", "conv_1", "conv_2", "conv_3", "conv_out"]
    return {name: {
        # torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out)
        "kernel": conv.weight.detach().numpy().transpose(2, 1, 0),
        "bias": conv.bias.detach().numpy(),
    } for name, conv in zip(names, convs)}


def _world(seed=25, t=40, d=768):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(t, d)).astype(np.float32)
    labels = rng.integers(0, 3, size=t).astype(np.int64)
    labels[::5] = -1  # ignored frames interleaved
    return emb, labels


def test_masked_cross_entropy_matches_torch_ignore_index(ref_smarter,
                                                         torch):
    """Loss-only differential on transplanted logits: mean over valid
    frames exactly as CrossEntropyLoss(ignore_index=-1)
    (reference: nba_proj/smarter_generate_clips.py:251-258)."""
    import jax.numpy as jnp

    from vit_research_tpu.models.temporal_head import masked_cross_entropy

    emb, labels = _world()
    torch.manual_seed(3)
    ref = ref_smarter.TemporalHead().eval()
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(emb).unsqueeze(0))
    loss_fn = torch.nn.CrossEntropyLoss(ignore_index=-1)
    ref_loss = float(loss_fn(logits_t.view(-1, 3),
                             torch.from_numpy(labels).view(-1)))
    ours = float(masked_cross_entropy(jnp.asarray(logits_t.numpy()),
                                      jnp.asarray(labels.astype(np.int32))))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_train_model_matches_reference_short_run(ref_smarter, torch,
                                                 monkeypatch):
    """The reference's own train_model for 5 epochs vs our trainer
    warm-started from the identical torch init, compared on
    predict_probs over the training sequence
    (reference: nba_proj/smarter_generate_clips.py:244-283)."""
    from vit_research_tpu.train.train_temporal import (predict_probs,
                                                       train_temporal_head)

    emb, labels = _world(seed=26)
    monkeypatch.setattr(ref_smarter, "EPOCHS", 5)
    assert ref_smarter.LR == 1e-5

    # capture the exact init train_model will draw, then replay it
    torch.manual_seed(11)
    probe = ref_smarter.TemporalHead()
    init = _torch_to_flax(probe, torch)
    torch.manual_seed(11)
    ref_model = ref_smarter.train_model(emb, labels)
    ref_probs = ref_smarter.predict_probs(ref_model, emb)

    model, params, final_loss = train_temporal_head(
        emb, labels.astype(np.int32), epochs=5, lr=1e-5,
        init_params={"params": init})
    ours_probs = predict_probs(model, params, emb)

    assert np.isfinite(final_loss)
    np.testing.assert_allclose(ours_probs, ref_probs, atol=5e-4)
