#!/usr/bin/env python
"""Training-throughput benchmark at the reference's production config
(CombSubFast, 44.1 kHz / hop 512, batch 24, 2 s crops, RSS loss — per
configs/combsub.yaml). Prints one JSON line with steps/s and
audio-hours/hour of training throughput.

(The reference publishes only a placeholder "x.x [iter/sec]" — README.md:144.)

--bf16 runs the PCmer decoder in bf16 (mixed precision; DSP/loss/params fp32).
"""
import argparse
import json
import time

import numpy as np


def main(bf16: bool = False, steps_per_dispatch: int = 1, batch: int = 24,
         data_on_device: bool = False):
    import jax

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
        make_train_step_multi, make_train_step_pool,
    )

    sr, block, n_unit, b = 44100, 512, 256, batch
    n_frames = int(2.0 * sr / block)  # 2 s crops -> 172 frames

    rng = np.random.default_rng(time.time_ns() % (2**32))
    batch = {
        "audio": rng.standard_normal((b, n_frames * block)).astype(np.float32),
        "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
        "f0": (200 * rng.random((b, n_frames, 1))).astype(np.float32),
        "volume": rng.random((b, n_frames)).astype(np.float32),
        "spk_id": np.ones((b, 1), dtype=np.int64),
    }
    model = CombSubFast(
        sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=100, bf16=bf16
    )
    optimizer = create_optimizer(5e-4)
    rss = RSSLoss(256, 2048, n_scale=4, n_buckets=8)
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rng_key = jax.random.key(1)

    k = max(1, steps_per_dispatch)
    if data_on_device:
        # train.data_on_device: the dataset lives in HBM, the step gathers
        # crops on device — per-step host traffic is the index bytes only.
        # This removes the measured hot-loop bottleneck (the ~13 MB batch
        # upload; docs/KERNELS.md round-5 training profile: 14.2x).
        import jax.numpy as jnp

        n_pool = 64 * n_frames
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
        def idx_at(i, shape):
            r = np.random.default_rng(i)
            return {
                "feat_start": r.integers(0, n_pool - n_frames, shape).astype(np.int32),
                "unit_start": r.integers(0, n_pool - n_frames, shape).astype(np.int32),
                "spk_id": np.ones(shape + (1,), np.int64),
            }

        if k > 1:
            from ddsp_svc_tpu.train import make_train_step_pool_multi

            step = make_train_step_pool_multi(model, rss, optimizer,
                                              n_frames, block)
            state, losses = step(state, pool, idx_at(0, (k, b)), rng_key)
            _ = float(losses[-1])
            n_iters = max(64 // k, 4)
            st = time.perf_counter()
            for i in range(1, n_iters + 1):
                state, losses = step(state, pool, idx_at(i, (k, b)), rng_key)
                _ = float(losses[-1])
            dt = (time.perf_counter() - st) / (n_iters * k)
        else:
            step = make_train_step_pool(model, rss, optimizer, n_frames, block)
            state, loss = step(state, pool, idx_at(0, (b,)), rng_key)
            _ = float(loss)
            n_iters = 30
            st = time.perf_counter()
            for i in range(1, n_iters + 1):
                state, loss = step(state, pool, idx_at(i, (b,)), rng_key)
                _ = float(loss)
            dt = (time.perf_counter() - st) / n_iters
    elif k > 1:
        # K optimizer steps per dispatch (train.steps_per_dispatch): scan
        # over K stacked microbatches — amortizes the relay's per-call floor
        step = make_train_step_multi(model, rss, optimizer)
        kbatch = {key: np.stack([v] * k) for key, v in batch.items()}
        state, losses = step(state, kbatch, rng_key)
        _ = float(losses[-1])  # compile + warmup with forced readback

        n_iters = max(20 // k, 3)
        st = time.perf_counter()
        for i in range(n_iters):
            kbatch["volume"] = kbatch["volume"] + 1e-6
            state, losses = step(state, kbatch, rng_key)
            _ = float(losses[-1])
        dt = (time.perf_counter() - st) / (n_iters * k)
    else:
        step = make_train_step(model, rss, optimizer)
        state, loss = step(state, batch, rng_key)
        _ = float(loss)  # compile + warmup with forced readback

        n_iters = 20
        st = time.perf_counter()
        for i in range(n_iters):
            # vary one input so the execution relay can't serve cached results
            batch["volume"] = batch["volume"] + 1e-6
            state, loss = step(state, batch, rng_key)
            _ = float(loss)
        dt = (time.perf_counter() - st) / n_iters

    steps_per_s = 1.0 / dt
    audio_hours_per_hour = b * (n_frames * block / sr) * steps_per_s * 3600 / 3600

    # roofline (SURVEY §5): analytic step cost — fwd + bwd + the multi-scale
    # loss at n_scale representative draw sizes across the RSS range
    from ddsp_svc_tpu.utils import flops as flops_mod
    from ddsp_svc_tpu.utils.profiling import (
        roofline, V5E_PEAK_BF16, V5E_PEAK_FP32,
    )

    cost = flops_mod.train_step_cost(
        b, n_frames, block, n_unit, rss.buckets, n_scale=rss.n_scale,
        bf16=bf16,
    )
    cost.bytes += 3 * flops_mod.params_bytes(state.params)  # grads + adam m,v
    rep = roofline(dt, cost.flops, cost.bytes,
                   peak_flops=V5E_PEAK_BF16 if bf16 else V5E_PEAK_FP32)
    print(
        json.dumps(
            {
                "metric": "train_steps_per_s" + ("_bf16" if bf16 else "")
                + (f"_k{k}" if k > 1 else "")
                + (f"_b{b}" if b != 24 else "")
                + ("_pool" if data_on_device else ""),
                "value": round(steps_per_s, 3),
                "unit": f"steps/s (batch {b} x 2s @ 44.1kHz)",
                "audio_sec_per_s": round(audio_hours_per_hour, 1),
                "mxu_util": round(rep.flops_util, 3),
                "hbm_util": round(rep.bw_util, 3),
                "mxu_peak": "bf16" if bf16 else "fp32",
            }
        )
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--steps-per-dispatch", type=int, default=1)
    p.add_argument("--batch", type=int, default=24,
                   help="throughput mode: larger batches raise audio-sec/s "
                        "per chip when the step is not MXU-bound")
    p.add_argument("--data-on-device", action="store_true",
                   help="device-resident data pool (train.data_on_device)")
    a = p.parse_args()
    main(bf16=a.bf16, steps_per_dispatch=a.steps_per_dispatch, batch=a.batch,
         data_on_device=a.data_on_device)
