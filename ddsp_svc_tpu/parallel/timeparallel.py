"""Time-axis (sequence/context) parallelism for long-utterance inference.

The reference handles long sequences only algorithmically (linear-attention,
silence slicing, streaming blocks — SURVEY §2.3); multi-chip long-sequence
processing is new capability here. The TPU-idiomatic design: shard the
*time/frame axis* of every activation over the mesh and jit the unmodified
model — XLA's SPMD partitioner inserts exactly the communication the hand-
rolled ring would need:

  - conformer conv (k=31) / prenet conv (k=3): halo exchanges,
  - non-causal linear attention: psum of the per-shard (K^T V, sum K)
    moments (a d x m matrix per head — the cheap linear-attention property),
  - phase accumulation (wrapped associative scan): log-depth
    collective-permute prefix exchange,
  - STFT framing / overlap-add at shard boundaries: one-block halos.

The model code stays single-program; no manual collectives to maintain.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_time_parallel_forward(model, variables, mesh: Mesh,
                               axis: str = "data", fft_mode: str = "auto",
                               spk_mix_dict=None):
    """Jitted forward with all time/frame axes sharded over `axis`.

    Returns fn(units, f0, volume, spk_id, noise) -> signal, where
    units :: (B, F, C), f0 :: (B, F, 1), volume :: (B, F),
    noise :: (B, F*block). F and T must divide the axis size.

    fft_mode: 'fft' | 'dft' | 'auto'. XLA:CPU's fft thunk rejects the
    layouts SPMD partitioning produces, so on CPU backends the synthesizer
    FFTs are lowered as DFT matmuls instead ('auto' picks per backend).
    """
    from ..ops import spectral

    if fft_mode == "auto":
        fft_mode = "dft" if jax.default_backend() == "cpu" else "fft"
    spectral.set_fft_mode(fft_mode)
    t_shard = P(None, axis)

    def forward(units, f0, volume, spk_id, noise):
        units = jax.lax.with_sharding_constraint(
            units, NamedSharding(mesh, P(None, axis, None))
        )
        f0 = jax.lax.with_sharding_constraint(
            f0, NamedSharding(mesh, P(None, axis, None))
        )
        volume = jax.lax.with_sharding_constraint(
            volume, NamedSharding(mesh, t_shard)
        )
        noise = jax.lax.with_sharding_constraint(
            noise, NamedSharding(mesh, t_shard)
        )
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id,
            spk_mix_dict=spk_mix_dict, infer=True, noise=noise,
        )
        return signal

    return jax.jit(
        forward,
        out_shardings=NamedSharding(mesh, t_shard),
    )


def make_time_parallel_enhancer(nsf, mesh: Mesh, axis: str = "data",
                                fft_mode: str = "auto"):
    """Jitted NSF-HiFiGAN enhancer forward (log-mel frontend + generator,
    infer/enhancer.py::NsfHifiGAN._forward_impl) with the time axis sharded
    over `axis`.

    The generator is conv-only plus the sine source, so time sharding
    carries over from the synthesizer case (VERDICT r03 #2): XLA's SPMD
    partitioner inserts halo exchanges for the (transposed) convs and mel
    framing, and partitions the frame-rate compensated phase scan (an
    associative_scan) with a log-depth prefix exchange. The dominant-FLOPs
    component (models.py:257-276) therefore spreads one utterance across
    chips instead of running replicated.

    Returns fn(audio (B, T), f0_frames (B, F), rand_ini (B, 9)) -> (B, T');
    T and F must divide the axis size. fft_mode as in
    make_time_parallel_forward (XLA:CPU cannot partition its FFT thunk).
    """
    from ..ops import spectral

    if fft_mode == "auto":
        fft_mode = "dft" if jax.default_backend() == "cpu" else "fft"
    spectral.set_fft_mode(fft_mode)
    t_shard = P(None, axis)

    def forward(variables, audio, f0_frames, rand_ini):
        audio = jax.lax.with_sharding_constraint(
            audio, NamedSharding(mesh, t_shard)
        )
        f0_frames = jax.lax.with_sharding_constraint(
            f0_frames, NamedSharding(mesh, t_shard)
        )
        return nsf._forward_impl(variables, audio, f0_frames, rand_ini)

    # params ride as a (replicated) argument, not a closure: closing over
    # them would inline the tree as literal HLO constants (oversized
    # programs on remote-compile backends)
    jitted = jax.jit(forward, out_shardings=NamedSharding(mesh, t_shard))
    return lambda audio, f0_frames, rand_ini: jitted(
        nsf.variables, audio, f0_frames, rand_ini
    )
