from pupiloptixlab_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_frame_sharded,
    shard_scene,
)
from pupiloptixlab_tpu.parallel.balance import (  # noqa: F401
    balanced_tile_perm,
    render_frame_balanced,
    tile_costs,
)
