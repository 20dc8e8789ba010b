from vit_research_tpu.retrieval.retrievers import (  # noqa: F401
    FrameRetriever,
    RattChunkRetriever,
)
