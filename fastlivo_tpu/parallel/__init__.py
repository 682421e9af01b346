from fastlivo_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    make_global_mesh,
)
from fastlivo_tpu.parallel.sharded import (  # noqa: F401
    HOSTS_AXIS,
    POINTS_AXIS,
    make_mesh,
    make_mesh_2d,
    make_sharded_bootstrap,
    make_sharded_lio_step,
    make_sharded_map,
    make_sharded_reanchor,
    shard_scan,
)
