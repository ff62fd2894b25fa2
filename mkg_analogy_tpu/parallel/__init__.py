from .shardings import (
    param_sharding_rules,
    shard_params_spec,
    batch_spec,
    make_shardings,
)

__all__ = [
    "param_sharding_rules",
    "shard_params_spec",
    "batch_spec",
    "make_shardings",
]
