"""Multi-device execution: sharded grid ops and the mesh engine."""

from .sharding import (  # noqa: F401
    distributed_mesh,
    make_mesh,
    shard_state,
    sharded_esdf_update,
    sharded_fused_tick,
    state_shardings,
)
