#!/usr/bin/env python
"""Per-component wall-clock breakdown of the headline inference program.

Times each piece of the fused combsub+enhancer program as its own jit
program on the real chip: DDSP synth, mel frontend, sine source, and each
NSF-HiFiGAN generator stage (upsample + noise conv + 3 resblocks) at its
true (T, C) geometry. Guides kernel work: which stages are worth a fused
Pallas implementation (ROADMAP.md "Enhancer conv throughput").

Run on TPU:  python tools/profile_stages.py [--batch 8] [--frames 512]
Each component is a separate jit program; first run pays ~1 compile/minute
through the remote-compile relay, cached afterwards.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=10):
    import jax
    import jax.numpy as jnp

    # reduce on-device (a separate jnp.sum dispatch adds a relay round-trip)
    g = jax.jit(lambda *a: jnp.sum(fn(*a)))
    # warmup/compile; relay content-addresses executions, so vary inputs
    float(g(*args(0)))
    st = time.perf_counter()
    for i in range(1, iters + 1):
        float(g(*args(i)))
    return (time.perf_counter() - st) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--bf16-min-channels", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from bench import H_NSF
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.nn import nsf_hifigan as nsf_mod
    from ddsp_svc_tpu.ops.spectral import log_mel_spectrogram

    b, n_frames, block, sr, n_unit = args.batch, args.frames, 512, 44100, 256
    rng = np.random.default_rng(time.time_ns() % (2**32))
    rows = []

    def report(name, ms, note=""):
        rows.append({"component": name, "ms": round(ms * 1e3, 3), "note": note})
        print(f"{name:28s} {ms*1e3:9.3f} ms  {note}", flush=True)

    # ---- DDSP synth (CombSubFast forward, jitted alone) ----
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32))
    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=8)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, units, f0, volume, spk_id, noise=noise
        )
    )(jax.random.key(0))
    synth = jax.jit(
        lambda u, n: model.apply(
            variables, u, f0, volume, spk_id, infer=True, noise=n
        )[0]
    )
    t = timed(synth, lambda i: (units + 0.01 * i, noise * (1 - 0.001 * i)),
              args.iters)
    report("combsub_synth", t)

    # ---- mel frontend ----
    T = n_frames * block
    audio = jnp.asarray(rng.standard_normal((b, T)).astype(np.float32) * 0.1)
    mel_fn = jax.jit(
        lambda a: log_mel_spectrogram(
            a, sr=H_NSF["sampling_rate"], n_fft=H_NSF["n_fft"],
            hop=H_NSF["hop_size"], win_length=H_NSF["win_size"],
            n_mels=H_NSF["num_mels"], fmin=H_NSF["fmin"], fmax=H_NSF["fmax"],
        )
    )
    t = timed(mel_fn, lambda i: (audio + 1e-4 * i,), args.iters)
    report("mel_frontend", t)

    # ---- sine source ----
    f0f = f0[..., 0]
    upp = int(np.prod(H_NSF["upsample_rates"]))
    rand_ini = jnp.zeros((b, 9))
    src_fn = jax.jit(
        lambda f: nsf_mod.sine_source(f, upp, sr, rand_ini)
    )
    t = timed(src_fn, lambda i: (f0f + 0.01 * i,), args.iters)
    report("sine_source", t)

    # ---- generator stages ----
    rates = H_NSF["upsample_rates"]
    kss = H_NSF["upsample_kernel_sizes"]
    c0 = H_NSF["upsample_initial_channel"]
    n_up = len(rates)
    har = jnp.asarray(rng.standard_normal((b, T, 1)).astype(np.float32) * 0.1)

    class Stage(nn.Module):
        """One generator stage: upsample + source injection + resblocks."""
        i: int
        dtype: object = None

        @nn.compact
        def __call__(self, x, har):
            i = self.i
            u, k = rates[i], kss[i]
            ch = c0 // (2 ** (i + 1))
            x = nsf_mod._leaky(x)
            x = nsf_mod.ConvTranspose1dTorch(
                ch, k, u, (k - u) // 2, name=f"up_{i}", dtype=self.dtype
            )(x)
            if i + 1 < n_up:
                stride_f0 = int(np.prod(rates[i + 1:]))
                xs_src = nn.Conv(
                    ch, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=((stride_f0 // 2, stride_f0 // 2),),
                    name=f"noise_conv_{i}", dtype=self.dtype,
                )(har)
            else:
                xs_src = nn.Conv(ch, (1,), name=f"noise_conv_{i}",
                                 dtype=self.dtype)(har)
            x = x + xs_src[:, : x.shape[1], :]
            xs = None
            for j, (rk, rd) in enumerate(zip(
                H_NSF["resblock_kernel_sizes"],
                H_NSF["resblock_dilation_sizes"],
            )):
                r = nsf_mod.ResBlock1(
                    ch, rk, tuple(rd), name=f"res_{j}", dtype=self.dtype
                )(x)
                xs = r if xs is None else xs + r
            return xs / len(H_NSF["resblock_kernel_sizes"])

    t_in = n_frames
    for i in range(n_up):
        ch_in = c0 // (2 ** i)
        ch_out = c0 // (2 ** (i + 1))
        dt_stage = (
            jnp.bfloat16
            if args.bf16_min_channels and ch_out >= args.bf16_min_channels
            else None
        )
        st_mod = Stage(i, dtype=dt_stage)
        x_in = jnp.asarray(
            rng.standard_normal((b, t_in, ch_in)).astype(np.float32) * 0.1
        )
        vs = jax.jit(st_mod.init)(jax.random.key(i), x_in, har)
        fn = jax.jit(lambda v, x, h, m=st_mod: m.apply(v, x, h))
        t = timed(fn, lambda it: (vs, x_in * (1 + 1e-3 * it), har), args.iters)
        t_out = t_in * rates[i]
        # HBM traffic if every conv round-trips (fp32), vs the roof
        n_convs = 2 + 2 * sum(len(d) for d in H_NSF["resblock_dilation_sizes"])
        nbytes = 4 if dt_stage is None else 2
        traffic = 2 * n_convs * b * t_out * ch_out * nbytes
        roof_ms = traffic / 819e9 * 1e3
        report(
            f"stage{i} T{t_in}->{t_out} C{ch_out}",
            t,
            f"dtype={'bf16' if dt_stage else 'fp32'} "
            f"naive-traffic {traffic/1e9:.2f} GB (roof {roof_ms:.2f} ms)",
        )
        t_in = t_out

    # ---- fused resblock trios at the same geometries ----
    from ddsp_svc_tpu.ops.pallas_kernels import fused_resblocks_pallas

    ks = tuple(H_NSF["resblock_kernel_sizes"])
    dils = tuple(H_NSF["resblock_dilation_sizes"][0])
    t_cum = n_frames
    for i in range(n_up):
        t_cum *= rates[i]
        ch = c0 // (2 ** (i + 1))
        if ch > 128 or ch % 8:
            continue
        x_in = jnp.asarray(
            rng.standard_normal((b, t_cum, ch)).astype(np.float32) * 0.1
        )
        ws, bs = [], []
        for k in ks:
            w = rng.standard_normal((3, 2, k, ch, ch)).astype(np.float32)
            ws.append(jnp.asarray(w * (2.0 / (k * ch)) ** 0.5))
            bs.append(jnp.asarray(
                (rng.standard_normal((3, 2, ch)) * 0.01).astype(np.float32)
            ))
        fn = jax.jit(lambda x, *wb: jnp.sum(fused_resblocks_pallas(
            x, *wb, kernel_sizes=ks, dilations=dils,
            tile=1024 if ch >= 64 else 2048, mxu_bf16=True,
        )))
        fns = fn  # bind
        float(fns(x_in, *ws, *bs))
        st = time.perf_counter()
        for it in range(1, args.iters + 1):
            float(fns(x_in * (1 + 1e-3 * it), *ws, *bs))
        t = (time.perf_counter() - st) / args.iters
        report(f"fused_trio{i} T{t_cum} C{ch}", t)

    print(json.dumps(rows))


if __name__ == "__main__":
    sys.exit(main())
