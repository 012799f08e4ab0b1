#!/usr/bin/env python
"""Scaling-efficiency benchmark: data-parallel training throughput vs
device count (BASELINE.md deliverable: efficiency at 1 chip / 1 host /
multi-host; on this single-chip environment it measures the virtual-device
path and validates the sharded program, and on a pod slice it reports real
scaling).

Prints one JSON line per mesh size:
    {"devices": N, "steps_per_s": X, "efficiency_vs_1": Y}
"""
import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force 8 virtual CPU devices (validation mode)")
    p.add_argument("--batch-per-device", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    # multi-host mode (the ≥2-host BASELINE measurement): launch this script
    # once per host with the same --coordinator and distinct --process-id;
    # efficiency is steps_per_s here vs a single-host run of the same config
    p.add_argument("--coordinator", default="127.0.0.1:9911",
                   help="host:port of process 0 (multi-process mode)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    args = p.parse_args()

    import os

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.parallel import make_mesh, shard_batch, shard_train_state
    from ddsp_svc_tpu.parallel.mesh import init_distributed
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
    )

    if args.num_processes > 1:
        init_distributed(args.coordinator, num_processes=args.num_processes,
                         process_id=args.process_id)

    devices = jax.devices()
    n_dev = len(devices)
    block, n_frames, n_unit = 512, 86, 256  # ~1s crops

    def batch_for(n):
        b = args.batch_per_device * n
        rng = np.random.default_rng(time.time_ns() % (2**32))
        return {
            "audio": rng.standard_normal((b, n_frames * block)).astype(np.float32),
            "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
            "f0": (200 * rng.random((b, n_frames, 1))).astype(np.float32),
            "volume": rng.random((b, n_frames)).astype(np.float32),
            "spk_id": np.ones((b, 1), dtype=np.int64),
        }

    model = CombSubFast(sampling_rate=44100, block_size=block, n_unit=n_unit, n_spk=8)
    optimizer = create_optimizer(5e-4)
    rss = RSSLoss(256, 2048, n_scale=4, n_buckets=8)
    step = make_train_step(model, rss, optimizer)

    if args.num_processes > 1:
        # whole-cluster measurement only; per-process data shards enter via
        # make_array_from_callback (each host materializes only its rows)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sizes = [n_dev]

        def to_global(x, sharding):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
    else:
        sizes = sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    base = None
    for n in sizes:
        mesh = make_mesh(n_data=n, n_model=1, devices=devices[:n])
        batch = batch_for(n)
        state = create_train_state(model, optimizer, batch, jax.random.key(0))
        if args.num_processes > 1:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            state = jax.tree.map(lambda x: to_global(x, repl), state)
            sharded = {k: to_global(v, data) for k, v in batch.items()}
        else:
            state = shard_train_state(state, mesh)
            sharded = shard_batch(batch, mesh)
        rng = jax.random.key(1)
        state, loss = step(state, sharded, rng)  # compile + warmup
        jax.block_until_ready(loss)
        st = time.perf_counter()
        for _ in range(args.iters):
            state, loss = step(state, sharded, rng)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - st) / args.iters
        sps = 1.0 / dt
        if base is None:
            base = sps
        eff = sps / base  # per-step time constant => ideal weak scaling
        print(json.dumps({
            "devices": n,
            "global_batch": args.batch_per_device * n,
            "steps_per_s": round(sps, 3),
            "efficiency_vs_1dev": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
