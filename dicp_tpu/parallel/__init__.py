from dicp_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    register_batch_sharded,
    register_map_sharded,
    MapShardedResult,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "register_batch_sharded",
    "register_map_sharded",
    "MapShardedResult",
]
