"""Device mesh construction.

The reference has no distributed support at all (SURVEY §2.3: single GPU via
torch.cuda.set_device). Here parallelism is first-class: a 2-D
(data, model) `jax.sharding.Mesh` spans all local/global devices; batch
dims shard over 'data' (gradient psum over ICI inserted by XLA), large
projection matrices shard over 'model' (tensor parallelism).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def init_distributed(coordinator: Optional[str] = None, num_processes: int = 1,
                     process_id: int = 0) -> None:
    """Multi-host initialization (replaces NCCL/MPI init; collectives then run
    over ICI within a slice and DCN across hosts, compiled by XLA)."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
