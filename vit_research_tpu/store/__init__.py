from vit_research_tpu.store.vector_store import (  # noqa: F401
    Collection,
    PersistentClient,
)
