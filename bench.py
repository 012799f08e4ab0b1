#!/usr/bin/env python
"""Benchmark driver: audio-seconds synthesized per wall-second per chip.

Runs the flagship CombSubFast inference path (44.1 kHz, hop 512) on the
available accelerator and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the operative
north star is >100x realtime per chip for the synthesis path, so
vs_baseline = realtime_factor / 100.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast

    sr, block, n_unit = 44100, 512, 256
    n_frames = 1024  # ~11.9 s of audio per call
    b = 4

    rng = np.random.default_rng(0)
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray(
        (rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32)
    )

    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=8)
    variables = jax.jit(
        lambda k, u, f, v, s, n: model.init({"params": k}, u, f, v, s, noise=n)
    )(jax.random.key(0), units, f0, volume, spk_id, noise)

    @jax.jit
    def forward(units, f0, volume, spk_id, noise):
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id, infer=True, noise=noise
        )
        return signal

    # warmup/compile
    out = forward(units, f0, volume, spk_id, noise)
    jax.block_until_ready(out)

    n_iters = 20
    st = time.perf_counter()
    for _ in range(n_iters):
        out = forward(units, f0, volume, spk_id, noise)
    jax.block_until_ready(out)
    dt = time.perf_counter() - st

    audio_seconds = n_iters * b * n_frames * block / sr
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "combsub_realtime_factor",
                "value": round(rtf, 2),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(rtf / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
