from dicp_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    register_batch_sharded,
    register_map_sharded,
    register_ring_sharded,
    ring_nn,
    MapShardedResult,
)
from dicp_tpu.parallel.ift_sharded import register_map_sharded_ift
from dicp_tpu.parallel.pose_graph import (
    partition_graph,
    pose_graph_optimize_partitioned,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "register_batch_sharded",
    "register_map_sharded",
    "register_map_sharded_ift",
    "register_ring_sharded",
    "ring_nn",
    "MapShardedResult",
    "partition_graph",
    "pose_graph_optimize_partitioned",
]
