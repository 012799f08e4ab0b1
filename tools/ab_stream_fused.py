#!/usr/bin/env python
"""A/B: SOLA streaming per-block latency with the fused window program vs
the legacy multi-dispatch path, alternating passes in one process.

Run on TPU:  python tools/ab_stream_fused.py
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--passes", type=int, default=4)
    p.add_argument("--blocks", type=int, default=10)
    args = p.parse_args()

    import bench_stream
    from ddsp_svc_tpu.infer.streaming import SvcCore, StreamingSession

    tmpdir = tempfile.mkdtemp(prefix="ab_stream_")
    try:
        path = bench_stream._make_ckpt(tmpdir, args.sr, args.block,
                                       causal=False, frame_norm=False,
                                       bf16=True)
        core = SvcCore(path)
        song = bench_stream._song(args.sr, 40.0)

        sessions = {}
        for name, fused in (("legacy", False), ("fused", True)):
            core.fused_window = fused
            sess = StreamingSession(
                core, samplerate=args.sr, block_time=0.3,
                crossfade_time=0.04, buffer_num=2, use_enhancer=False,
                pitch_extractor_type="dio",
            )
            bf = sess.block_frame
            for i in range(3):  # compile + warmup
                sess.process_block(song[i * bf: (i + 1) * bf])
            sessions[name] = sess
            print(f"warmed {name}", flush=True)

        lat = {"legacy": [], "fused": []}
        idx = 3
        for _ in range(args.passes):
            for name, fused in (("legacy", False), ("fused", True)):
                core.fused_window = fused
                sess = sessions[name]
                bf = sess.block_frame
                for _ in range(args.blocks):
                    blk = song[idx * bf: (idx + 1) * bf]
                    idx += 1
                    st = time.perf_counter()
                    sess.process_block(blk)
                    lat[name].append(time.perf_counter() - st)
        for name in lat:
            v = np.asarray(lat[name]) * 1e3
            print(f"{name:6s}: p50 {np.percentile(v, 50):7.1f} ms  "
                  f"p95 {np.percentile(v, 95):7.1f} ms", flush=True)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
