"""Structured, serializable experiment configuration.

The reference uses one Python constant-module per experiment
(reference: nba_proj/config.py, config_stage2.py:1-102, ...) plus a RUN_ID
string that encodes every hyperparameter into the weight filename
(reference: nba_proj/config_stage2.py:65-81). We keep the ergonomics —
one named preset per experiment line, a run-ID stamped into artifact
names — but make configs dataclasses that serialize to/from JSON so runs
are reproducible from their artifacts alone.
"""

from __future__ import annotations

import dataclasses
import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any


def _asdict(obj: Any) -> Any:
    # dataclasses.asdict already recurses into nested dataclasses; the
    # only extra normalization needed is tuple -> list for JSON.
    if dataclasses.is_dataclass(obj):
        obj = dataclasses.asdict(obj)
    if isinstance(obj, dict):
        return {k: _asdict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_asdict(v) for v in obj]
    return obj


class _Serializable:
    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in fields:
                continue
            ftype = fields[k].type
            # Nested dataclass reconstruction.
            sub = _CONFIG_TYPES.get(str(ftype).split(".")[-1].strip("'\" "))
            if sub is not None and isinstance(v, dict):
                v = sub.from_dict(v)
            if isinstance(v, list):
                v = tuple(v) if _is_tuple_field(fields[k]) else v
            kwargs[k] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))


def _is_tuple_field(f: dataclasses.Field) -> bool:
    t = str(f.type)
    return "tuple" in t or "Tuple" in t


@dataclass(frozen=True)
class ViTConfig(_Serializable):
    """Vision Transformer backbone hyperparameters.

    Covers both reference backbones with one module:
    - random-init patch-32 at 432x768 input
      (reference: nba_proj/generate_clips_hmm.py:48-56)
    - pretrained-import patch-16 at 224x224 (google/vit-base-patch16-224)
      (reference: nba_proj/train/training.py:37-39)
    """

    image_size: tuple = (224, 224)  # (H, W)
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    pooler: str = "token"  # 'token' | 'gap' | 'none'
    representation_size: int | None = None  # pre_logits dense, None = identity
    layer_norm_eps: float = 1e-6
    # 'exact' matches HF ViT (erf GELU); 'tanh' is the cheaper approximation.
    gelu_approximate: bool = False
    dtype: str = "float32"  # compute dtype: 'float32' | 'bfloat16'
    # Pallas fused attention. Default off: at ViT sequence lengths
    # (197-325 tokens) XLA's batched attention measured faster on v5e than
    # the current kernel (2243 vs 1744 fps on ViT-B/16 embed); the kernel
    # stays available for longer sequences and future tuning.
    use_flash_attention: bool = False
    # Attention-softmax compute dtype: 'float32' (default, reference
    # parity) or 'bfloat16'. The softmax over the (B,H,T,T) score tensor
    # is the embed path's VPU bottleneck (BENCH_NOTES.md: ~4 ms floor per
    # layer at B=512); bf16 halves the element traffic at the cost of
    # ~8 mantissa bits in the normalizer — a measured-accuracy speed
    # knob, NOT a parity setting.
    softmax_dtype: str = "float32"
    # Attention einsum layout: 'bhtd' (default) transposes q/k/v to
    # (B, H, T, dh) first; 'bthd' runs transpose-free einsums straight
    # off the (B, T, H, dh) projection output. Numerically identical
    # (same contractions; tests/test_attn_layout.py). MEASURED A TIE on
    # chip (2,358 vs 2,353 f/s, 2026-08-21): the 29.5 ms/batch of layout
    # copies the device trace attributed to the transpose form are XLA's
    # layout assignment, re-inserted either way (BENCH_NOTES.md) — kept
    # as the documented measurement, not a speed knob. NOTE: 'bthd' is
    # XLA-only — the Pallas kernel expects (B, H, T, dh), so combining it
    # with use_flash_attention=True routes to XLA (the kernel is skipped;
    # see MultiHeadSelfAttention.needs_xla).
    attn_layout: str = "bhtd"
    output_attention_scores: bool = False
    # Gradient rematerialization: recompute each encoder block's
    # activations in the backward pass instead of storing them — trades
    # ~33% more FLOPs for O(num_layers) less activation memory, the
    # standard lever for joint backbone training at large batch on one
    # chip (jax.checkpoint / nn.remat per block).
    remat: bool = False
    # Token merging (ToMe, ops/tome.py): merge this many token pairs per
    # encoder block by bipartite soft matching. 0 = off (the parity
    # default — merging changes outputs). Typical speed/accuracy trades
    # at ViT-B/16 @224 (197 tokens): r=8 keeps ~2/3 of tokens by the last
    # block, r=13 keeps ~1/3.
    tome_r: int = 0
    # Static-int8 calibration product (gemm_quant='int8-static'): one
    # activation scale per dense dot site in trace order, from
    # ops/quant.calibration_mode(). Empty = not yet calibrated.
    gemm_quant_scales: tuple = ()
    # Dynamic int8 quantization of the encoder-block GEMMs
    # (ops/quant.py): 'int8' runs qkv/out/mlp contractions as s8xs8->s32
    # on the MXU with per-token/per-channel scales and straight-through
    # gradients (QAT). None = off (the parity default — quantization
    # perturbs outputs). At ViT-B embed shapes throughput ties bf16
    # (BENCH_NOTES.md); use for QAT / GEMM-dominated configs. Composes
    # with tome_r. Parameter tree is unchanged.
    gemm_quant: str | None = None

    @property
    def grid(self) -> tuple:
        return (self.image_size[0] // self.patch_size,
                self.image_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


# Preset mirroring the reference's two backbones.
VIT_B16_224 = ViTConfig(image_size=(224, 224), patch_size=16)
VIT_P32_432x768 = ViTConfig(image_size=(432, 768), patch_size=32)


@dataclass(frozen=True)
class ChunkEncoderConfig(_Serializable):
    """Stage-1 temporal chunk encoder (reference: nba_proj/models/chunk_encoder.py:9-97:
    hidden 768, 3 layers, 8 heads, inner dim 4x, max_frames 24)."""

    embed_dim: int = 768
    num_layers: int = 3
    num_heads: int = 8
    mlp_dim: int = 3072  # transformer inner dim (reference: hidden * 4)
    max_len: int = 24  # >= chunk_size (reference max_frames)
    dropout_rate: float = 0.1
    dtype: str = "float32"


@dataclass(frozen=True)
class HeadConfig(_Serializable):
    """RAG/RATT head family (reference: nba_proj/models/rag_head.py, ratt_head.py, ratt_v2.py)."""

    embed_dim: int = 768
    num_layers: int = 2
    num_heads: int = 4
    # Classifier width for RATTHeadV2 (reference: ratt_v2.py mlp_dim=128
    # -> Dense(2*mlp_dim)); transformer blocks always use embed_dim * 4.
    mlp_dim: int = 128
    num_queries: int = 4  # RetrievalMultiQueryPooler learned queries
    max_tokens: int = 128  # RATTHead pos-emb budget (reference: ratt_head.py:71-77)
    hidden_dim: int = 256  # classifier hidden (Dense 256 -> 1)
    dropout_rate: float = 0.0
    # Classifier MLP dropout (reference hardcodes 0.2:
    # nba_proj/models/rag_head.py:36-39, ratt_head.py); exposed so
    # deterministic differentials/ablations can zero it.
    classifier_dropout: float = 0.2
    dtype: str = "float32"
    # RATTHeadV2 branch sizes (reference: config_stage2.py K_SIM/K_CONTRAST/K_TEMPORAL)
    k_sim: int = 6
    k_contrast: int = 6
    k_temporal: int = 4


@dataclass(frozen=True)
class RetrievalConfig(_Serializable):
    """Retriever + cache knobs (reference: nba_proj/config_stage2.py, config_chunks_cached.py)."""

    collection: str = "ragdb"
    top_k: int = 5
    search_k: int = 50
    search_k_content: int = 64
    search_k_temporal: int = 32
    future_chunk_step: int = 2  # reference: training_stage2.py:78-96
    hard_negative_ratio: float = 0.30  # reference: training_chunk_cached.py:341-343
    candidates_per_bin: int = 48
    query_mult: int = 4
    per_video_cap: int = 8
    global_cap: int = 24
    min_time_gap: float = 0.02
    lambda_global: float = 0.35
    time_window: float = 0.2  # t_norm window half-width fallback


@dataclass(frozen=True)
class TrainConfig(_Serializable):
    """Optimization knobs shared by the training loops
    (reference: nba_proj/train/training.py:125-141,453-458; config*.py)."""

    batch_size: int = 8
    num_epochs: int = 24
    lr_phase1: float = 1e-4
    lr_phase2: float = 1e-5
    phase_split: float = 0.5  # fraction of epochs on phase-1 LR
    accum_steps: int = 4  # gradient accumulation (reference Accumulator)
    weight_decay: float = 0.0
    grad_clip_norm: float = 1.0
    label_smoothing: float = 0.0
    contrastive_weight: float = 0.1
    # Phase-2 contrastive coefficient: the reference switches it with the
    # LR at half epochs (reference: nba_proj/train/training.py:453-458;
    # intended values 0.0 -> 0.1, nba_proj/config.py:19-20). None keeps
    # contrastive_weight constant for the whole run.
    contrastive_weight_phase2: float | None = None
    margin: float = 0.2
    pos_weight: str = "sqrt"  # 'sqrt' => sqrt(neg/pos) (reference: training_stage2.py:943-953)
    rebuild_every: int = 4  # epochs between vector-DB rebuilds
    seed: int = 1234
    chunk_size: int = 12
    chunk_stride: int = 4
    mesh_shape: tuple = (1,)  # data-parallel axis sizes
    mesh_axes: tuple = ("data",)


@dataclass(frozen=True)
class ExperimentConfig(_Serializable):
    """One named experiment line == one reference config module."""

    name: str = "rag"
    vit: ViTConfig = field(default_factory=lambda: VIT_B16_224)
    chunk_encoder: ChunkEncoderConfig = field(default_factory=ChunkEncoderConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    train_vids: tuple = (1, 2, 3, 4, 5, 6)
    test_vids: tuple = (7, 8)
    # Pin a previous run's weights (reference: nba_proj/config_stage3.py:82-88
    # hard-codes a historical RUN_ID weight file). Empty = fresh run.
    pinned_run_id: str = ""

    def run_id(self) -> str:
        return make_run_id(self)


_CONFIG_TYPES = {
    "ViTConfig": ViTConfig,
    "ChunkEncoderConfig": ChunkEncoderConfig,
    "HeadConfig": HeadConfig,
    "RetrievalConfig": RetrievalConfig,
    "TrainConfig": TrainConfig,
    "ExperimentConfig": ExperimentConfig,
}


def make_run_id(cfg: ExperimentConfig, now: float | None = None) -> str:
    """Hyperparameter-encoding run id, mirroring the reference's RUN_ID
    (reference: nba_proj/config_stage2.py:65-81)."""
    ts = time.strftime("%Y%m%d-%H%M%S", time.gmtime(now))
    short = uuid.uuid4().hex[:6]
    t = cfg.train
    h = cfg.head
    r = cfg.retrieval
    return (
        f"{cfg.name}_{ts}_{short}"
        f"_tv{'-'.join(map(str, cfg.test_vids))}"
        f"_col-{r.collection}_k{r.top_k}"
        f"_cs{t.chunk_size}x{t.chunk_stride}"
        f"_L{h.num_layers}H{h.num_heads}"
        f"_b{t.batch_size}_lr{t.lr_phase1:g}-{t.lr_phase2:g}"
        f"_rb{t.rebuild_every}"
    )


def save_config(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        f.write(cfg.to_json())


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return ExperimentConfig.from_json(f.read())


def preset(name: str) -> ExperimentConfig:
    """Named presets mirroring the reference's config modules."""
    presets: dict[str, ExperimentConfig] = {
        # reference: nba_proj/config.py (RAG stage)
        "rag": ExperimentConfig(name="rag"),
        # reference: nba_proj/configs_cls_only.py
        "cls_only": ExperimentConfig(name="cls_only"),
        # reference: nba_proj/config_ratt.py
        "ratt": ExperimentConfig(
            name="ratt",
            retrieval=RetrievalConfig(collection="ratt_db", top_k=8),
        ),
        # reference: nba_proj/config_chunks.py (the training_chunk_works
        # attention-losses line: TOP_K 12, 12 epochs, rebuild every 3,
        # LRs 1e-5 -> 1e-6, chunk size 12, 6 layers x 8 heads)
        "chunks": ExperimentConfig(
            name="chunks",
            head=HeadConfig(num_layers=6, num_heads=8, num_queries=12),
            train=TrainConfig(num_epochs=12, rebuild_every=3,
                              lr_phase1=1e-5, lr_phase2=1e-6,
                              chunk_size=12),
            retrieval=RetrievalConfig(collection="ratt_db", top_k=12,
                                      search_k=300),
        ),
        # reference: nba_proj/config_chunks_cached.py:1-80
        "chunks_cached": ExperimentConfig(
            name="chunks_cached",
            train=TrainConfig(chunk_size=8, chunk_stride=2),
            retrieval=RetrievalConfig(collection="ratt_db_chunks", top_k=8),
        ),
        # reference: nba_proj/config_stage2.py:1-102
        "stage2": ExperimentConfig(
            name="stage2",
            train=TrainConfig(chunk_size=8, chunk_stride=2, num_epochs=30),
            retrieval=RetrievalConfig(collection="ratt_db_s2", top_k=6),
        ),
        # FAST profile (no reference counterpart): the speed levers that
        # meet BASELINE.md's throughput targets, quality-scored on this
        # pipeline's own metrics (examples/quality_fast_profile.py,
        # BENCH_NOTES.md "fast-profile quality dossier"): ToMe r=16
        # (3,630 f/s embed, +54%) measured clip F1 1.0 / retrieval
        # top-8 overlap 1.0 / event hit@1 == parity on the dossier
        # world; pair with `cli segment --frame-stride 4` (5,992
        # effective f/s, F1 1.0, ~1 frame boundary drift, 0.95
        # retrieval overlap) — add `--stride-refine auto` when the run
        # scores events on fast-changing content (novelty-gated exact
        # re-embedding of hot gaps; BENCH_NOTES.md "Novelty-gated
        # strided refinement"). NON-PARITY: merged-token embeddings drift
        # from the reference outputs — every embedding one pipeline
        # compares must come from the same profile. NOTE the `vit` field
        # documents the profile (like every preset's — training flows
        # consume pre-embedded stores): the ENGINE reads the env, so
        # activate with VRT_TOME_R=16 (+ VRT_GEMM_QUANT=int8-static
        # VRT_GEMM_SCALES=... for the full stack); collections record
        # the active profile either way (cli db-info).
        "fast": ExperimentConfig(
            name="fast",
            vit=dataclasses.replace(VIT_B16_224, tome_r=16,
                                    dtype="bfloat16"),
        ),
        # reference: nba_proj/config_stage3.py:1-109 — stage-2 settings
        # evaluated/continued from a pinned historical run's weights.
        "stage3": ExperimentConfig(
            name="stage3",
            train=TrainConfig(chunk_size=8, chunk_stride=2, num_epochs=10),
            retrieval=RetrievalConfig(collection="ratt_db_s2", top_k=6),
            pinned_run_id="<set-to-a-stage2-run-id>",
        ),
    }
    return presets[name]
