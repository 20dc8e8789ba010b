from vit_research_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
)
from vit_research_tpu.parallel.distributed import (  # noqa: F401
    all_gather_to_hosts,
    barrier,
    global_batch,
    initialize,
    pod_mesh,
    process_rows,
    shard_items,
)
