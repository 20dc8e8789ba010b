from vit_research_tpu.db import builders, enrich, frame_store  # noqa: F401
