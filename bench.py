#!/usr/bin/env python
"""Benchmark driver: audio-seconds synthesized per wall-second per chip.

Headline configuration per BASELINE.md: CombSubFast synthesis + NSF-HiFiGAN
enhancer (44.1 kHz, hop 512, 128-mel community-vocoder geometry), fused into
a single jit program. Weights are randomly initialized — FLOP/byte profile
is identical to pretrained weights. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = realtime_factor / 100 (the reference publishes no numbers; the
operative target is >100x realtime per chip, BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

H_NSF = {
    "sampling_rate": 44100,
    "num_mels": 128,
    "n_fft": 2048,
    "win_size": 2048,
    "hop_size": 512,
    "fmin": 40,
    "fmax": 16000,
    "upsample_rates": [8, 8, 2, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4, 4],
    "upsample_initial_channel": 512,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
}


def latency_main(batch: int, bf16: bool, iters: int = 24):
    """Latency mode (--latency): single-stream serving shape — batch 1-2,
    one window per dispatch, NO pipelining. Reports per-window latency
    percentiles and the single-stream realtime factor. Through the remote
    relay the number includes the relay round-trip (it is the deployable
    latency of this environment, not the chip's own)."""
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN

    sr, block, n_unit = 44100, 512, 256
    n_frames = int(os.environ.get("BENCH_FRAMES", 512))
    b = batch

    rng = np.random.default_rng(time.time_ns() % (2**32))
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32))
    rand_ini = jnp.zeros((b, 9))

    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=8, bf16=bf16)
    variables = jax.jit(
        lambda k, u, f, v, s, n: model.init({"params": k}, u, f, v, s, noise=n)
    )(jax.random.key(0), units, f0, volume, spk_id, noise)
    overrides = {}
    if os.environ.get("BENCH_FUSED", "1") == "0":
        overrides = {"fused_resblocks": False, "fused_inject": False}
    nsf = NsfHifiGAN(None, h=H_NSF,
                     bf16_min_channels=128 if bf16 else 0,
                     generator_overrides=overrides)

    def full(variables, nsf_vars, units, f0, volume, spk_id, noise, rand_ini):
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id, infer=True, noise=noise
        )
        out = nsf._forward_impl(nsf_vars, signal, f0[..., 0], rand_ini)
        return jnp.sum(out)

    fwd = jax.jit(full)

    def issue(i):
        return fwd(variables, nsf.variables, units + 0.01 * i, f0, volume,
                   spk_id, noise * (1.0 - 0.001 * i), rand_ini)

    float(issue(0))  # compile + warmup
    lat = []
    for i in range(1, iters + 1):
        st = time.perf_counter()
        float(issue(i))  # scalar readback = reliable barrier on the relay
        lat.append(time.perf_counter() - st)
    p50 = float(np.median(lat))
    p95 = float(np.quantile(lat, 0.95))
    window_sec = n_frames * block / sr

    from ddsp_svc_tpu.utils import flops as flops_mod
    from ddsp_svc_tpu.utils.profiling import (
        roofline, V5E_PEAK_BF16, V5E_PEAK_FP32,
    )

    cost = flops_mod.headline_window_cost(
        b, n_frames, block, sr, n_unit, H_NSF, bf16=bf16,
        bf16_min_channels=128 if bf16 else 0,
    )
    cost.bytes += flops_mod.params_bytes(variables) + flops_mod.params_bytes(
        nsf.variables
    )
    rep = roofline(p50, cost.flops, cost.bytes,
                   peak_flops=V5E_PEAK_BF16 if bf16 else V5E_PEAK_FP32)
    print(json.dumps({
        "metric": "latency_per_window",
        "batch": b,
        "bf16": bf16,
        "fused": not overrides,
        "window_s": round(window_sec, 3),
        "p50_ms": round(1e3 * p50, 1),
        "p95_ms": round(1e3 * p95, 1),
        "stream_realtime_factor": round(window_sec / p50, 1),
        "throughput_rtf": round(b * window_sec / p50, 1),
        "mxu_util": round(rep.flops_util, 3),
        "hbm_util": round(rep.bw_util, 3),
        "mxu_peak": "bf16" if bf16 else "fp32",
    }))


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN

    sr, block, n_unit = 44100, 512, 256
    n_frames = 512  # ~5.9 s of audio per item
    # throughput configuration: the metric is audio-seconds/s *per chip*
    # (BASELINE.md), so batch the offline/serving-style workload and keep
    # two dispatches in flight (hides the ~20 ms relay round-trip; standard
    # serving-style pipelining). Same-window sweep: b=32 786x, b=64 977x,
    # b=128 1204x, b=192 1163x (HBM pressure), b=256 OOM -> b=128; re-swept
    # with the fused spectral kernel: b=128 1298x, b=160 1188x, b=192 1234x.
    # (BENCH_BATCH overrides for sweeps.)
    b = int(os.environ.get("BENCH_BATCH", 128))

    # seed from wall clock: the execution relay content-addresses dispatches,
    # so repeated runs with identical inputs would measure cache hits
    rng = np.random.default_rng(time.time_ns() % (2**32))
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32))
    rand_ini = jnp.zeros((b, 9))

    # bf16 PCmer decoder (model.bf16, the user-facing config flag): synth
    # program 55 vs 88 ms at batch 32 (A/B medians), output rel-RMS vs fp32
    # ~1.3e-2 — same class as the staged-bf16 enhancer configuration
    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=8, bf16=True)
    variables = jax.jit(
        lambda k, u, f, v, s, n: model.init({"params": k}, u, f, v, s, noise=n)
    )(jax.random.key(0), units, f0, volume, spk_id, noise)

    # staged bf16 (wide early stages only) is the recommended inference
    # configuration: +29% on v5e, output tracks fp32 to ~0.4% RMS rel
    # (tests/test_nsf_hifigan.py::test_generator_staged_bf16_tracks_fp32)
    nsf = NsfHifiGAN(None, h=H_NSF, bf16_min_channels=128)

    def full(variables, nsf_vars, units, f0, volume, spk_id, noise, rand_ini):
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id, infer=True, noise=noise
        )
        f0_frames = f0[..., 0]
        out = nsf._forward_impl(nsf_vars, signal, f0_frames, rand_ini)
        # reduce on-device: a separate jnp.sum dispatch would add a full
        # relay round-trip (~10-25 ms) of pure measurement artifact per call
        return jnp.sum(out)

    fwd = jax.jit(full)

    def issue(u, n):
        return fwd(variables, nsf.variables, u, f0, volume, spk_id, n, rand_ini)

    # force real execution: block_until_ready alone is not a reliable
    # barrier on relayed/experimental backends — read the scalar back
    float(issue(units, noise))  # compile + warmup

    # Relay latency drifts minute-to-minute; time several small batches
    # (inputs varied per call — the relay content-addresses executions) and
    # take the median batch so one hiccup doesn't define the round's number.
    # Two dispatches stay in flight; each iteration blocks on the oldest.
    from collections import deque

    n_batches, per_batch = 5, 4
    acc, batch_dt = 0.0, []
    pending = deque()
    i = 0
    for _ in range(n_batches):
        st = time.perf_counter()
        for _ in range(per_batch):
            i += 1
            pending.append(issue(units + 0.01 * i, noise * (1.0 - 0.001 * i)))
            if len(pending) >= 2:
                acc += float(pending.popleft())
        while pending:
            acc += float(pending.popleft())
        batch_dt.append((time.perf_counter() - st) / per_batch)
    assert np.isfinite(acc)
    if os.environ.get("BENCH_DEBUG"):
        print("batch_dt ms:", [round(1e3 * d, 1) for d in batch_dt],
              file=sys.stderr, flush=True)
    dt = float(np.median(batch_dt))

    audio_seconds = b * n_frames * block / sr
    rtf = audio_seconds / dt

    # speed-of-light accounting (SURVEY §5): analytic FLOP/byte counters
    # for the executed program (XLA's own cost_analysis reports 0 flops for
    # Pallas custom calls — measured on this TPU — so the counters live in
    # utils/flops.py and are pinned by tests/test_flops.py). The program is
    # mixed-precision (bf16 MXU matmuls with fp32 accumulation + fp32 VPU
    # tails), so utilization is quoted against the bf16 MXU roof — the
    # conservative headroom number — with params+activations HBM traffic as
    # a lower-bound estimate.
    from ddsp_svc_tpu.utils import flops as flops_mod
    from ddsp_svc_tpu.utils.profiling import roofline, V5E_PEAK_BF16

    cost = flops_mod.headline_window_cost(
        b, n_frames, block, sr, n_unit, H_NSF, bf16=True,
        bf16_min_channels=128,
    )
    cost.bytes += flops_mod.params_bytes(variables) + flops_mod.params_bytes(
        nsf.variables
    )
    rep = roofline(dt, cost.flops, cost.bytes, peak_flops=V5E_PEAK_BF16)
    print(
        json.dumps(
            {
                "metric": "combsub_enhancer_realtime_factor",
                "value": round(rtf, 2),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(rtf / 100.0, 3),
                "mxu_util": round(rep.flops_util, 3),
                "hbm_util": round(rep.bw_util, 3),
                "tflops": round(cost.flops / dt / 1e12, 1),
                "mxu_peak": "bf16",
            }
        )
    )


if __name__ == "__main__":
    if "--latency" in sys.argv:
        import argparse

        p = argparse.ArgumentParser()
        p.add_argument("--latency", action="store_true")
        p.add_argument("--batch", type=int, default=2)
        p.add_argument("--fp32", action="store_true",
                       help="fp32 everywhere (default: bf16 PCmer + staged-"
                            "bf16 enhancer, the recommended serving config)")
        p.add_argument("--iters", type=int, default=24)
        a = p.parse_args()
        latency_main(a.batch, bf16=not a.fp32, iters=a.iters)
    else:
        main()
