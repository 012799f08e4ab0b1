#!/usr/bin/env python
"""Within-process, iteration-interleaved training-config A/B.

Process-level alternating runs drift ±3x through the relay minute-to-minute
(measured round 5: the identical b=24 bf16 config read 2.02 and 0.87
steps/s twenty minutes apart), so the only trustworthy comparison compiles
BOTH arms in one process and alternates them per iteration.

Default arms: production batch 24 vs throughput batch 96 (audio-sec/s is
the user metric). --arms k1,k4 compares steps_per_dispatch instead.

Run on TPU:  python tools/ab_train_configs.py [--bf16] [--iters 10]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--arms", default="b24,b96",
                   help="comma list: bN (batch N), kN (steps_per_dispatch N "
                        "at batch 24), dN (device-resident pool, batch N)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
        make_train_step_multi,
    )

    sr, block, n_unit = 44100, 512, 256
    f = int(2.0 * sr / block)
    rng = np.random.default_rng(time.time_ns() % (2**32))

    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=100, bf16=args.bf16)
    optimizer = create_optimizer(5e-4)
    rss = RSSLoss(256, 2048, n_scale=4, n_buckets=8)
    key = jax.random.key(1)

    def batch_of(b):
        return {
            "audio": rng.standard_normal((b, f * block)).astype(np.float32),
            "units": rng.standard_normal((b, f, n_unit)).astype(np.float32),
            "f0": (200 * rng.random((b, f, 1))).astype(np.float32),
            "volume": rng.random((b, f)).astype(np.float32),
            "spk_id": np.ones((b, 1), dtype=np.int64),
        }

    from ddsp_svc_tpu.train import make_train_step_pool

    arms = {}
    for spec in args.arms.split(","):
        spec = spec.strip()
        kind = spec[0]
        if kind == "b":
            b, k = int(spec[1:]), 1
        elif kind == "d":
            b, k = int(spec[1:]), 1
        else:
            b, k = 24, int(spec[1:])
        batch = batch_of(b)
        state = create_train_state(model, optimizer, batch,
                                   jax.random.key(0))
        if kind == "d":
            # device-resident pool: a synthetic ~40 s feature store staged
            # in HBM once; per-iter inputs are only the (B,) crop indices
            n_pool = 64 * f
            pool = {
                "units": jax.device_put(jnp.asarray(
                    rng.standard_normal((n_pool, n_unit)).astype(np.float16))),
                "f0": jax.device_put(jnp.asarray(
                    (200 * rng.random(n_pool)).astype(np.float32))),
                "volume": jax.device_put(jnp.asarray(
                    rng.random(n_pool).astype(np.float32))),
                "audio": jax.device_put(jnp.asarray(
                    rng.standard_normal(n_pool * block).astype(np.float16))),
            }
            step = make_train_step_pool(model, rss, optimizer, f, block)
            arms[spec] = {"step": step, "state": state, "pool": pool,
                          "b": b, "k": 1, "times": [], "n_pool": n_pool}
            idx = {
                "feat_start": np.zeros(b, np.int32),
                "unit_start": np.zeros(b, np.int32),
                "spk_id": np.ones((b, 1), np.int64),
            }
            a = arms[spec]
            a["state"], loss = step(a["state"], pool, idx, key)
            _ = float(jnp.sum(loss))
            print(f"compiled {spec}", flush=True)
            continue
        if k > 1:
            step = make_train_step_multi(model, rss, optimizer)
            run_batch = {kk: np.stack([v] * k) for kk, v in batch.items()}
        else:
            step = make_train_step(model, rss, optimizer)
            run_batch = batch
        arms[spec] = {"step": step, "state": state, "batch": run_batch,
                      "b": b, "k": k, "times": []}
        st = arms[spec]
        st["state"], loss = step(st["state"], run_batch, key)
        _ = float(jnp.sum(loss))
        print(f"compiled {spec}", flush=True)

    host_rng = np.random.default_rng(7)
    for i in range(1, args.iters + 1):
        for spec, a in arms.items():
            if "pool" in a:
                idx = {
                    "feat_start": host_rng.integers(
                        0, a["n_pool"] - f, a["b"]).astype(np.int32),
                    "unit_start": host_rng.integers(
                        0, a["n_pool"] - f, a["b"]).astype(np.int32),
                    "spk_id": np.ones((a["b"], 1), np.int64),
                }
                st = time.perf_counter()
                a["state"], loss = a["step"](a["state"], a["pool"], idx, key)
                _ = float(jnp.sum(loss))
                a["times"].append(time.perf_counter() - st)
                continue
            a["batch"]["volume"] = a["batch"]["volume"] + 1e-6
            st = time.perf_counter()
            a["state"], loss = a["step"](a["state"], a["batch"], key)
            _ = float(jnp.sum(loss))
            a["times"].append(time.perf_counter() - st)

    for spec, a in arms.items():
        per_step = float(np.median(a["times"])) / a["k"]
        sps = 1.0 / per_step
        audio = a["b"] * (f * block / sr) * sps
        print(f"{spec:6s}: {per_step * 1e3:8.1f} ms/step  "
              f"{sps:6.3f} steps/s  {audio:7.1f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
