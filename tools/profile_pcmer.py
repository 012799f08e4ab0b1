#!/usr/bin/env python
"""Wall-clock breakdown of the PCmer decoder at the headline geometry:
full Unit2Control, one SelfAttention, one ConformerConvModule, the FAVOR+
feature map alone, and the output head. Guides whether a fused
flash-performer kernel is worth building.

Run on TPU:  python tools/profile_pcmer.py [--batch 128]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=6):
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(g(*args(0)))
    st = time.perf_counter()
    for i in range(1, iters + 1):
        float(g(*args(i)))
    return (time.perf_counter() - st) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
               default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.nn.pcmer import (
        SelfAttention, ConformerConvModule, softmax_kernel,
        gaussian_orthogonal_random_matrix, linear_attention,
    )

    b, t, d = args.batch, args.frames, 256
    dt = jnp.bfloat16 if args.bf16 else None
    rng = np.random.default_rng(time.time_ns() % (2**32))
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))

    def report(name, ms):
        print(f"{name:26s} {ms*1e3:9.3f} ms", flush=True)

    attn = SelfAttention(dim=d, heads=8, compute_dtype=dt)
    va = jax.jit(attn.init)(jax.random.key(0), x)
    ta = timed(lambda xx: attn.apply(va, xx), lambda i: (x * (1 + 1e-3 * i),),
               args.iters)
    report("self_attention", ta)

    conv = ConformerConvModule(dim=d, compute_dtype=dt)
    vc = jax.jit(conv.init)(jax.random.key(1), x)
    tc = timed(lambda xx: conv.apply(vc, xx), lambda i: (x * (1 + 1e-3 * i),),
               args.iters)
    report("conformer_conv", tc)

    # FAVOR+ feature map alone (q features; the exp-heavy piece)
    proj = jnp.asarray(gaussian_orthogonal_random_matrix(266, 64, 0))
    q = jnp.asarray(
        rng.standard_normal((b, 8, t, 64)).astype(np.float32)
    ).astype(jnp.bfloat16 if args.bf16 else jnp.float32)
    tf_ = timed(lambda qq: softmax_kernel(qq, proj, True),
                lambda i: (q * (1 + 1e-3 * i),), args.iters)
    report("favor_features(q)", tf_)

    qf = jax.jit(lambda qq: softmax_kernel(qq, proj, True))(q)
    kf = jax.jit(lambda qq: softmax_kernel(qq, proj, False))(q)
    v = q
    tl = timed(linear_attention, lambda i: (qf * (1 + 1e-3 * i), kf, v),
               args.iters)
    report("linear_attention", tl)


if __name__ == "__main__":
    main()
