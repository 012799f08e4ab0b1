"""Worker process for tests/test_multiprocess.py.

Joins a 2-process jax.distributed cluster (4 virtual CPU devices per
process -> 8 global), runs ONE data-parallel train step on its local shard
of a deterministic batch, and writes the resulting (replicated) params +
loss for the parent to compare against single-process math.

Run: python mp_worker.py <coordinator> <num_processes> <process_id> <outdir>
"""
import os
import sys

# must be set before the backend initializes
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4",
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from ddsp_svc_tpu.models import CombSubFast, RSSLoss  # noqa: E402
from ddsp_svc_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402
from ddsp_svc_tpu.train import (  # noqa: E402
    create_optimizer, create_train_state, make_train_step,
)


def deterministic_batch(b=8, n_frames=8, block=256, n_unit=64):
    rng = np.random.default_rng(42)
    return {
        "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
        "f0": (120 + 300 * rng.random((b, n_frames, 1))).astype(np.float32),
        "volume": rng.random((b, n_frames)).astype(np.float32),
        "spk_id": (1 + (np.arange(b) % 4))[:, None].astype(np.int64),
        "audio": rng.standard_normal((b, n_frames * block)).astype(np.float32),
    }


def main():
    coordinator, num_processes, process_id, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    init_distributed(coordinator, num_processes=num_processes,
                     process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes, jax.device_count()

    model = CombSubFast(sampling_rate=16000, block_size=256, n_unit=64, n_spk=4)
    optimizer = create_optimizer(1e-3)
    batch = deterministic_batch()
    state = create_train_state(model, optimizer, batch, jax.random.key(0))

    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    # params/opt replicated across all devices; batch sharded over 'data'
    # (each process feeds only its addressable rows — the per-host data
    # shard pattern of a real multi-host run)
    state = jax.tree.map(lambda x: to_global(x, repl), state)
    batch_g = {k: to_global(v, data) for k, v in batch.items()}

    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    step = make_train_step(model, rss, optimizer)
    state, loss = step(state, batch_g, jax.random.key(0))

    flat = [np.asarray(x.addressable_data(0))
            for x in jax.tree.leaves(state.params)]
    np.savez(os.path.join(outdir, f"result_{process_id}.npz"),
             loss=np.asarray(loss.addressable_data(0)),
             *flat)
    print(f"[mp_worker {process_id}] ok loss={float(loss.addressable_data(0)):.6f}")


if __name__ == "__main__":
    main()
