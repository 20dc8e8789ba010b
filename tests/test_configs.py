"""Config system: serialization roundtrip, presets, run-IDs."""

import json

from vit_research_tpu.utils.configs import (
    ExperimentConfig,
    RetrievalConfig,
    TrainConfig,
    ViTConfig,
    load_config,
    make_run_id,
    preset,
    save_config,
)


def test_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        name="custom",
        vit=ViTConfig(image_size=(432, 768), patch_size=32),
        train=TrainConfig(batch_size=16, chunk_size=8),
        retrieval=RetrievalConfig(collection="xyz", top_k=7),
        train_vids=(1, 2, 3), test_vids=(9,))
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    got = load_config(path)
    assert got.name == "custom"
    assert tuple(got.vit.image_size) == (432, 768)
    assert got.train.batch_size == 16
    assert got.retrieval.collection == "xyz" and got.retrieval.top_k == 7
    assert tuple(got.test_vids) == (9,)
    # JSON is valid and nested.
    with open(path) as f:
        raw = json.load(f)
    assert raw["vit"]["patch_size"] == 32


def test_presets_exist_and_differ():
    names = ["rag", "cls_only", "ratt", "chunks_cached", "stage2", "stage3"]
    cfgs = {n: preset(n) for n in names}
    assert cfgs["rag"].retrieval.collection == "ragdb"
    assert cfgs["stage2"].train.chunk_size == 8
    assert cfgs["ratt"].retrieval.collection != cfgs["rag"].retrieval.collection
    # stage3 pins a prior run's weights (reference config_stage3 pattern).
    assert cfgs["stage3"].pinned_run_id
    assert not cfgs["stage2"].pinned_run_id


def test_run_id_encodes_hyperparameters():
    cfg = preset("stage2")
    rid = make_run_id(cfg)
    assert "stage2" in rid
    assert f"k{cfg.retrieval.top_k}" in rid
    assert f"cs{cfg.train.chunk_size}x{cfg.train.chunk_stride}" in rid
    # Unique per call (uuid suffix).
    assert rid != make_run_id(cfg)


def test_vit_grid_properties():
    v = ViTConfig(image_size=(432, 768), patch_size=32)
    assert v.grid == (13, 24)
    assert v.num_patches == 312
