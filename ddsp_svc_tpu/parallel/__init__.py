from .mesh import make_mesh, replicated, data_sharded, init_distributed
from .sharding import (
    TP_RULES,
    param_shardings,
    shard_params,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "make_mesh", "replicated", "data_sharded", "init_distributed",
    "TP_RULES", "param_shardings", "shard_params", "shard_batch",
    "shard_train_state",
]
