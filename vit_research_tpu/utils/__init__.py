from vit_research_tpu.utils.configs import (  # noqa: F401
    ViTConfig,
    ChunkEncoderConfig,
    HeadConfig,
    RetrievalConfig,
    TrainConfig,
    ExperimentConfig,
    make_run_id,
)
