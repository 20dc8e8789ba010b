from vit_research_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
)
