"""Parallel execution: multi-LiDAR concatenation + SPMD sharding."""
from .concat import (
    ApproximateTimeSynchronizer,
    PointcloudConcatenatorNode,
    concatenate_buffers,
)
from .sharding import (
    build_sharded_pipeline,
    buffer_pspecs,
    make_local_run,
    make_mesh,
    shard_buffer,
    spatial_sort,
)
