"""Differential tests round 4: the reference EVALUATION harness
(test/get_clip_sequences.py) as oracle for our inference output layer.

The harness's retrieval plumbing (build_live_entry / fetch_live_batch /
future lookup / pad_or_trim) is a near-copy of training_stage2's, which
test_reference_differential_ext.py already oracles; what is distinctive
here — and what these tests pin — is the OUTPUT-ASSEMBLY layer our
evaluate/clip_sequences.py re-designs:

- ``z_normalize`` (the 1e-6-epsilon z-score of a clip's logit sequence,
  including the degenerate constant-sequence and len<2 behaviors),
- ``sigmoid`` vs the jax.nn.sigmoid our harness applies,
- ``get_topk_chunks_for_sequence`` (event localization: row schema,
  descending-logit order, stable tie order, None-frame center handling,
  k > len clamp) (reference: nba_proj/test/get_clip_sequences.py:94-101,
  555-598),
- ``frame_name_to_int`` vs our data.naming.frame_num on the formats the
  reference documents.

Skipped when no reference tree is present.
"""

import os

import numpy as np
import pytest

from _ref_oracle import REF_ROOT, load_module, stub_set

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


@pytest.fixture(scope="module")
def ref_eval():
    pytest.importorskip("tf_keras")
    # module scope seeds the GLOBAL numpy RNG (reference :40-46); restore
    # it so unrelated tests keep their entropy.
    state = np.random.get_state()
    try:
        return load_module("ref_get_clip_sequences",
                           "test/get_clip_sequences.py",
                           stub_set("chroma", "hf", "garden"))
    finally:
        np.random.set_state(state)


def test_z_normalize_matches_reference(ref_eval):
    from vit_research_tpu.evaluate.clip_sequences import z_normalize

    rng = np.random.default_rng(40)
    cases = [
        rng.normal(size=7).astype(np.float32) * 3.0,
        rng.normal(size=100),
        np.array([0.25, 0.25, 0.25], np.float32),  # std=0: epsilon path
        [1.5, -2.0, 0.0, 0.0, 7.25],               # plain-list input
    ]
    for x in cases:
        np.testing.assert_allclose(z_normalize(x), ref_eval.z_normalize(x),
                                   rtol=1e-6)
    # len < 2: returned unchanged, NOT normalized (reference :96-97)
    for x in ([], [3.25]):
        ours, ref = z_normalize(x), ref_eval.z_normalize(x)
        np.testing.assert_array_equal(ours, ref)
        assert ours.dtype == ref.dtype == np.float32


def test_sigmoid_matches_reference(ref_eval):
    import jax
    import jax.numpy as jnp

    x = np.linspace(-12, 12, 31)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(jnp.asarray(x))),
                               ref_eval.sigmoid(x), atol=1e-7)


def _seq(rows):
    """Synthetic per-chunk dicts in the shape both harnesses consume."""
    out = []
    for i, (logit, start_frame, end_frame) in enumerate(rows):
        out.append({
            "vid": 3, "clip": 5, "side": "left", "label": 1,
            "start_idx": 10 + 2 * i, "end_idx": 18 + 2 * i,
            "t_center": 0.1 * i,
            "start_frame": start_frame, "end_frame": end_frame,
            "logit": logit, "prob": 1.0 / (1.0 + np.exp(-logit)),
            "pred": int(logit > 0.0),
        })
    return out


def test_topk_chunks_match_reference(ref_eval):
    """Row-for-row equality incl. descending sort, stable tie order
    (Python sorted), the (start+end)//2 center, and None frames
    (reference: nba_proj/test/get_clip_sequences.py:569-598)."""
    from vit_research_tpu.evaluate.clip_sequences import (
        get_topk_chunks_for_sequence)

    seq = _seq([(0.5, 100, 140), (2.0, 200, 240), (0.5, 300, 340),
                (-1.25, None, None), (2.0, 401, 440), (0.0, 500, 540)])
    for k in (1, 3, 5, 6, 50):
        ours = get_topk_chunks_for_sequence(list(seq), k=k)
        ref = ref_eval.get_topk_chunks_for_sequence(list(seq), k=k)
        assert ours == ref
    # every row is fully populated with the reference's schema
    ref = ref_eval.get_topk_chunks_for_sequence(list(seq), k=6)
    assert [r["rank"] for r in ref] == list(range(1, 7))
    assert ref[0]["logit"] == ref[1]["logit"] == 2.0
    assert ref[0]["chunk_start_idx"] < ref[1]["chunk_start_idx"]  # stable
    none_row = next(r for r in ref if r["start_frame"] is None)
    assert none_row["center_frame"] is None


def test_frame_name_to_int_matches_ours(ref_eval):
    """Our naming.frame_num on the formats the reference's parser
    documents; plus the reference's None/garbage fallbacks our stricter
    parser refuses (reference: nba_proj/test/get_clip_sequences.py:555-567)."""
    from vit_research_tpu.data.naming import frame_num

    for name in ("vid2_frame_23117", "23117", "vid11_frame_0"):
        assert frame_num(name) == ref_eval.frame_name_to_int(name)
    assert ref_eval.frame_name_to_int(None) is None
    assert ref_eval.frame_name_to_int("not_a_frame") is None
