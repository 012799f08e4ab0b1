#!/usr/bin/env python
"""Wall-clock breakdown of the CombSubFast synthesizer internals.

Times each piece of the synth forward as its own jit program at the headline
geometry: the Unit2Control/PCmer decoder, phase + combtooth excitation,
framing+window, and the STFT-domain filtering chain (2x rfft -> complex
filter -> irfft -> window -> OLA). Guides the fused spectral kernel work
(ROADMAP.md: "the synth's STFT filtering is the largest remaining fp32 FFT
consumer").

Run on TPU:  python tools/profile_synth.py [--batch 128] [--frames 512]
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
    float(g(*args(0)))  # compile + warmup
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

    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.ops import (
        upsample_frames, f0_to_rot_upsampled, combtooth as combtooth_op,
        sqrt_hann_window, frame_signal, overlap_add_half,
    )
    from ddsp_svc_tpu.ops.spectral import rfft as _rfft, irfft as _irfft

    b, n_frames, bs, sr, n_unit = args.batch, args.frames, 512, 44100, 256
    rng = np.random.default_rng(time.time_ns() % (2**32))
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * bs)) * 2 - 1).astype(np.float32))

    model = CombSubFast(sampling_rate=sr, block_size=bs, n_unit=n_unit,
                        n_spk=8, bf16=args.bf16)
    variables = jax.jit(
        lambda k: model.init({"params": k}, units, f0, volume, spk_id,
                             noise=noise)
    )(jax.random.key(0))

    def report(name, ms, note=""):
        print(f"{name:26s} {ms*1e3:9.3f} ms  {note}", flush=True)

    # full synth forward
    t = timed(
        lambda u, n: model.apply(variables, u, f0, volume, spk_id,
                                 infer=True, noise=n)[0],
        lambda i: (units + 0.01 * i, noise * (1 - 0.001 * i)), args.iters,
    )
    report("synth_total", t)

    # unit2ctrl (decoder) alone
    def ctrl_only(u):
        rot = f0_to_rot_upsampled(f0[..., 0], bs, sr, None)
        phase_frames = 2.0 * np.pi * rot[:, ::bs]
        ctrls = model.apply(
            variables, u, f0, phase_frames, volume, spk_id,
            method=lambda m, *a, **k: m.unit2ctrl(*a, **k),
        )
        return ctrls["harmonic_magnitude"]

    t = timed(ctrl_only, lambda i: (units + 0.01 * i,), args.iters)
    report("unit2ctrl(pcmer)", t)

    # phase + combtooth
    def excite(fin):
        f0up = upsample_frames(fin, bs)[..., 0]
        rot = f0_to_rot_upsampled(fin[..., 0], bs, sr, None)
        return combtooth_op(rot, f0up, sr)

    t = timed(excite, lambda i: (f0 + 0.01 * i,), args.iters)
    report("phase+combtooth", t)

    # framing + window (both excitations)
    tooth = jax.jit(excite)(f0)  # never eager on the TPU (CLAUDE.md)
    window = sqrt_hann_window(2 * bs, dtype=jnp.float32)

    def framing(tth, nse):
        tf = frame_signal(jnp.pad(tth, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        nf = frame_signal(jnp.pad(nse, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        return tf + nf

    t = timed(framing, lambda i: (tooth * (1 + 1e-3 * i), noise), args.iters)
    report("frame+window x2", t)

    # spectral chain: rfft x2, filters (incl. exp/cos construction), irfft,
    # window, OLA — controls fixed, excitation varied
    nq = bs + 1
    hm = jnp.asarray(rng.standard_normal((b, n_frames, nq)).astype(np.float32) * 0.1)
    hp = jnp.asarray(rng.standard_normal((b, n_frames, nq)).astype(np.float32))
    nm = jnp.asarray(rng.standard_normal((b, n_frames, nq)).astype(np.float32) * 0.1 - 3)

    # controls passed as arguments: a closure would inline them as literal
    # HLO constants (3 x 135 MB at batch 128) and blow the remote-compile
    # relay's request-size limit (HTTP 413)
    def spectral(tth, nse, hm, hp, nm):
        tf = frame_signal(jnp.pad(tth, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        nf = frame_signal(jnp.pad(nse, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        src_filter = jnp.exp(hm + 1j * np.pi * hp)
        src_filter = jnp.concatenate([src_filter, src_filter[:, -1:, :]], 1)
        noise_filter = jnp.exp(nm) / 128.0
        noise_filter = jnp.concatenate([noise_filter, noise_filter[:, -1:, :]], 1)
        sig_fft = _rfft(tf, 2 * bs) * src_filter + _rfft(nf, 2 * bs) * noise_filter
        sig_frames = _irfft(sig_fft, 2 * bs) * window
        sig = overlap_add_half(sig_frames, bs)
        return sig[:, bs:-bs]

    t = timed(
        spectral,
        lambda i: (tooth * (1 + 1e-3 * i), noise, hm, hp, nm),
        args.iters,
    )
    report("frame+spectral+ola", t)


if __name__ == "__main__":
    main()
