from .horizon import (  # noqa: F401
    ShardedStageQPData,
    pad_stages,
    shard_horizon,
    solve_horizon_sharded,
)
