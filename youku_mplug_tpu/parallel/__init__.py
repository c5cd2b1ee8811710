from youku_mplug_tpu.parallel.sharding import (
    ShardingRules,
    GPT3_SHARDING_RULES,
    sharding_for_params,
    shard_params,
    data_sharding,
)

__all__ = [
    "ShardingRules",
    "GPT3_SHARDING_RULES",
    "sharding_for_params",
    "shard_params",
    "data_sharding",
]
