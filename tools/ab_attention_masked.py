#!/usr/bin/env python
"""A/B: mask-aware fused FAVOR+ attention vs the XLA masked fallback at
bucketed offline-inference shapes (run_inference pads segments to
power-of-two frame buckets and passes valid_frames).

Before round 4 the fused Pallas kernel refused valid_frames, so every real
offline conversion silently fell back to the XLA formulation (VERDICT r03
Weak #3). The kernel now takes the mask as an SMEM scalar; this measures
what that recovers, alternating A/B within one process (relay drift is
±15%, so only alternating comparisons are meaningful).

Run on TPU:  python tools/ab_attention_masked.py [--batch 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.nn.pcmer import PCmer

    d = 256
    rng = np.random.default_rng(time.time_ns() % (2**32))

    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"bf16={args.bf16}", flush=True)
    for bucket, valid in ((256, 180), (512, 400)):
        x = jnp.asarray(
            rng.standard_normal((args.batch, bucket, d)).astype(np.float32)
        )
        vf = jnp.asarray(valid, jnp.int32)
        dt = jnp.bfloat16 if args.bf16 else None
        fused = PCmer(num_layers=3, num_heads=8, dim_model=d,
                      compute_dtype=dt, fused_attention=True)
        plain = PCmer(num_layers=3, num_heads=8, dim_model=d,
                      compute_dtype=dt, fused_attention=False)
        v = jax.jit(fused.init)(jax.random.key(0), x)

        f_fused = jax.jit(lambda v, x, n: jnp.sum(
            fused.apply(v, x, infer=True, valid_frames=n)))
        f_plain = jax.jit(lambda v, x, n: jnp.sum(
            plain.apply(v, x, infer=True, valid_frames=n)))
        float(f_fused(v, x, vf))
        float(f_plain(v, x, vf))

        times = {"fused": [], "plain": []}
        i = 0
        for _ in range(args.rounds):
            for name, fn in (("fused", f_fused), ("plain", f_plain)):
                st = time.perf_counter()
                for _ in range(args.iters):
                    i += 1
                    float(fn(v, x * (1 + 1e-4 * i), vf))
                times[name].append((time.perf_counter() - st) / args.iters)
        mf = float(np.median(times["fused"]) * 1e3)
        mp = float(np.median(times["plain"]) * 1e3)
        print(f"bucket={bucket} valid={valid}: fused {mf:.2f} ms | "
              f"xla {mp:.2f} ms | win {(mp - mf) / mp * 100:+.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
