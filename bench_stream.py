#!/usr/bin/env python
"""Streaming (real-time VC) latency benchmark on the current backend.

Measures per-block wall latency of the two streaming engines:
  - sola: the reference-architecture window engine (StreamingSession over
    SvcCore — recompute a sliding window per block, SOLA splice; what the
    reference GUI does, gui.py:367-433)
  - incremental: the exact state-carrying engine (IncrementalSession over a
    causal + frame_norm CombSubFast; O(block) work per block, no window
    recomputation)

The reference displays per-block inference ms in its GUI but publishes no
numbers (BASELINE.md); this records ours. Prints one JSON line:
p50/p95 block latency (ms), block duration, and the realtime margin
(block_duration / p95).

Run on TPU:  python bench_stream.py [--engine sola|incremental|both]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def _make_ckpt(tmpdir, sr, block, causal, frame_norm, bf16, n_frames=64):
    """Random-init CombSubFast checkpoint + sibling config.yaml."""
    import yaml
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models.factory import build_model
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import DotDict

    cfg = {
        "data": {
            "f0_extractor": "dio", "f0_min": 65, "f0_max": 800,
            "sampling_rate": sr, "block_size": block, "duration": 1.0,
            "encoder": "hubertsoft", "encoder_sample_rate": 16000,
            "encoder_hop_size": 320, "encoder_out_channels": 256,
            "encoder_ckpt": None, "n_aunit": 0, "use_vuv": False,
            "train_path": "data/train", "valid_path": "data/val",
        },
        "model": {"type": "CombSubFast", "n_spk": 2, "c": causal,
                  "frame_norm": frame_norm, "bf16": bf16},
        "enhancer": {"type": "nsf-hifigan", "ckpt": None},
        "env": {"expdir": tmpdir},
    }
    with open(os.path.join(tmpdir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    model = build_model(DotDict(cfg))
    units = jnp.zeros((1, n_frames, 256))
    f0 = jnp.ones((1, n_frames, 1)) * 220.0
    vol = jnp.ones((1, n_frames))
    spk = jnp.ones((1, 1), jnp.int64)
    noise = jnp.zeros((1, n_frames * block))
    variables = jax.jit(
        lambda k: model.init({"params": k}, units, f0, vol, spk, noise=noise)
    )(jax.random.key(0))
    path = os.path.join(tmpdir, "model_0.ckpt")
    save_checkpoint(path, 0, jax.tree.map(np.asarray, variables))
    return path


def _song(sr, seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f = 220 + 40 * np.sin(2 * np.pi * 0.7 * t)
    x = 0.3 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def bench_sola_ab_pipelined(sr, block, seconds, warmup_blocks):
    """Block-interleaved A/B: plain vs pipeline_depth=1 sessions fed the
    same blocks within the same minute — the only comparison that survives
    the relay's minute-scale drift (observed ±30% between back-to-back
    single-arm runs of the SAME config)."""
    import json as _json
    import shutil
    import tempfile

    from ddsp_svc_tpu.infer.streaming import SvcCore, StreamingSession

    tmpdir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        path = _make_ckpt(tmpdir, sr, block, causal=False, frame_norm=False,
                          bf16=True)
        core = SvcCore(path)
        kw = dict(samplerate=sr, block_time=0.3, crossfade_time=0.04,
                  buffer_num=2, use_enhancer=False,
                  pitch_extractor_type="dio")
        plain = StreamingSession(core, **kw)
        piped = StreamingSession(core, pipeline_depth=1, **kw)
        bf = plain.block_frame
        song = _song(sr, seconds)
        lat = {"plain": [], "pipelined": []}
        for i in range(len(song) // bf):
            blk = song[i * bf: (i + 1) * bf]
            for name, sess in (("plain", plain), ("pipelined", piped)):
                st = time.perf_counter()
                out = sess.process_block(blk)
                lat[name].append(time.perf_counter() - st)
                assert np.isfinite(out).all()
        res = {}
        for name in lat:
            arr = np.asarray(lat[name][warmup_blocks:])
            res[name] = {"p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 2),
                         "p95_ms": round(float(np.percentile(arr, 95)) * 1e3, 2)}
        print(_json.dumps({"metric": "streaming_pipelined_ab",
                           "block_ms": round(bf / sr * 1e3, 1), **res}))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_sola(sr, block, seconds, warmup_blocks, pipeline_depth=0):
    from ddsp_svc_tpu.infer.streaming import SvcCore, StreamingSession

    tmpdir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        path = _make_ckpt(tmpdir, sr, block, causal=False, frame_norm=False,
                          bf16=True)
        core = SvcCore(path)
        sess = StreamingSession(
            core, samplerate=sr, block_time=0.3, crossfade_time=0.04,
            buffer_num=2, use_enhancer=False, pitch_extractor_type="dio",
            pipeline_depth=pipeline_depth,
        )
        bf = sess.block_frame
        song = _song(sr, seconds)
        lat = []
        for i in range(len(song) // bf):
            blk = song[i * bf : (i + 1) * bf]
            st = time.perf_counter()
            out = sess.process_block(blk)
            lat.append(time.perf_counter() - st)
            assert np.isfinite(out).all()
        return np.asarray(lat[warmup_blocks:]), bf / sr
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_incremental(sr, block, seconds, warmup_blocks):
    from ddsp_svc_tpu.infer.realtime import IncrementalSession

    tmpdir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        path = _make_ckpt(tmpdir, sr, block, causal=True, frame_norm=True,
                          bf16=False)
        sess = IncrementalSession.from_checkpoint(
            path, frames_per_block=26, f0_extractor="dio"
        )
        bs = sess.block_samples
        song = _song(sr, seconds)
        lat = []
        for i in range(len(song) // bs):
            blk = song[i * bs : (i + 1) * bs]
            st = time.perf_counter()
            out = sess.process_block(blk)
            lat.append(time.perf_counter() - st)
            assert np.isfinite(out).all()
        return np.asarray(lat[warmup_blocks:]), bs / sr
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--engine", choices=("sola", "incremental", "both"),
                   default="both")
    p.add_argument("--seconds", type=float, default=18.0)
    p.add_argument("--warmup-blocks", type=int, default=6)
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--pipelined", action="store_true",
                   help="SOLA engine with pipeline_depth=1 (submit window N,"
                        " splice window N-1; device round-trip overlaps the"
                        " next block)")
    p.add_argument("--ab-pipelined", action="store_true",
                   help="block-interleaved plain-vs-pipelined A/B in one"
                        " process (drift-immune)")
    args = p.parse_args()
    if args.ab_pipelined:
        bench_sola_ab_pipelined(args.sr, args.block, args.seconds,
                                args.warmup_blocks)
        return

    results = {}
    engines = (
        ("sola", bench_sola), ("incremental", bench_incremental)
    ) if args.engine == "both" else (
        ((args.engine, bench_sola if args.engine == "sola"
          else bench_incremental),)
    )
    for name, fn in engines:
        kw = {"pipeline_depth": 1} if (args.pipelined and fn is bench_sola) else {}
        lat, block_dur = fn(args.sr, args.block, args.seconds,
                            args.warmup_blocks, **kw)
        p50 = float(np.percentile(lat, 50)) * 1e3
        p95 = float(np.percentile(lat, 95)) * 1e3
        results[name] = {
            "p50_ms": round(p50, 2),
            "p95_ms": round(p95, 2),
            "block_ms": round(block_dur * 1e3, 1),
            "realtime_margin_p95": round(block_dur * 1e3 / p95, 2),
            "n_blocks": int(len(lat)),
        }
        print(f"{name}: p50 {p50:.1f} ms  p95 {p95:.1f} ms  "
              f"block {block_dur*1e3:.0f} ms  "
              f"margin {block_dur*1e3/p95:.2f}x", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "streaming_block_latency", **results}))


if __name__ == "__main__":
    main()
