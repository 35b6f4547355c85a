from .sharding import (  # noqa: F401
    frame_row_sharding,
    frame_sharding,
    make_mesh,
    shard_batch,
)
