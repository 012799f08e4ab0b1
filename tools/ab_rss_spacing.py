#!/usr/bin/env python
"""Alternating A/B: RSS train step with linear-spaced buckets (round-4
default — matches the reference's uniform n_fft draw in distribution,
tools/rss_bucket_experiment.py) vs the old log-spaced set. Linear spacing
raises the mean bucket size (~700 -> ~1150 at the 256..2048 production
range), and loss-transform work scales ~linearly with n_fft — this measures
what the parity fix costs in steps/s. Alternating within one process: relay
drift is far larger than any single-shot reading.

Run on TPU:  python tools/ab_rss_spacing.py [--bf16]
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
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
    )

    sr, block, n_unit, b = 44100, 512, 256, 24
    n_frames = int(2.0 * sr / block)
    rng = np.random.default_rng(time.time_ns() % (2**32))
    batch = {
        "audio": rng.standard_normal((b, n_frames * block)).astype(np.float32),
        "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
        "f0": (200 * rng.random((b, n_frames, 1))).astype(np.float32),
        "volume": rng.random((b, n_frames)).astype(np.float32),
        "spk_id": np.ones((b, 1), dtype=np.int64),
    }
    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=100, bf16=args.bf16)
    optimizer = create_optimizer(5e-4)

    log_buckets = tuple(int(s) for s in np.unique(np.round(
        np.exp(np.linspace(np.log(256), np.log(2047), 8))).astype(int)))
    linear = RSSLoss(256, 2048, n_scale=4, n_buckets=8)
    logsp = RSSLoss(256, 2048, n_scale=4, buckets=log_buckets)
    print(f"linear buckets: {linear.buckets}", flush=True)
    print(f"log buckets:    {logsp.buckets}", flush=True)

    arms = {}
    for name, rss in (("linear", linear), ("log", logsp)):
        step = make_train_step(model, rss, optimizer)
        state = create_train_state(model, optimizer, batch,
                                   jax.random.key(0))
        state, loss = step(state, batch, jax.random.key(1))
        float(loss)  # compile + warmup
        arms[name] = (step, state)

    times = {"linear": [], "log": []}
    key = jax.random.key(2)
    for _ in range(args.rounds):
        for name in ("linear", "log"):
            step, state = arms[name]
            st = time.perf_counter()
            for i in range(args.iters):
                batch["volume"] = batch["volume"] + 1e-6
                state, loss = step(state, batch, key)
                float(loss)
            times[name].append((time.perf_counter() - st) / args.iters)
            arms[name] = (step, state)
    ml = float(np.median(times["linear"]))
    mg = float(np.median(times["log"]))
    print(f"linear {1/ml:.3f} steps/s | log {1/mg:.3f} steps/s | "
          f"linear is {(ml - mg) / mg * 100:+.1f}% step time", flush=True)


if __name__ == "__main__":
    main()
