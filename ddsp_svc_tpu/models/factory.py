"""Model factory: config -> synthesizer module (+ checkpoint loading).

Parity with /root/reference/ddsp/vocoder.py:343-369 (`load_model`) and
/root/reference/train.py:23-38: builds Sins / CombSub / CombSubFast from the
`model.type` field of a yaml config.
"""
from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn

from ..utils.config import DotDict, load_config
from .synths import Sins, CombSub, CombSubFast


def build_model(args: DotDict) -> nn.Module:
    mtype = args.model.type
    if mtype == "Sins":
        return Sins(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_harmonics=args.model.n_harmonics,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
            bf16=bool(args.model.bf16),
            fused_attention=(
                True if args.model.fused_attention is None
                else args.model.fused_attention
            ),
        )
    if mtype == "CombSub":
        return CombSub(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_harmonic=args.model.n_mag_harmonic,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
            bf16=bool(args.model.bf16),
            fused_attention=(
                True if args.model.fused_attention is None
                else args.model.fused_attention
            ),
        )
    if mtype == "CombSubFast":
        return CombSubFast(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
            frame_norm=bool(args.model.frame_norm),
            bf16=bool(args.model.bf16),
            # fused Pallas kernels (TPU): on unless explicitly disabled
            fused_spectral=(
                True if args.model.fused_spectral is None
                else args.model.fused_spectral
            ),
            fused_attention=(
                True if args.model.fused_attention is None
                else args.model.fused_attention
            ),
        )
    raise ValueError(f" [x] Unknown Model: {mtype}")


def make_jitted_synth(model, variables, spk_mix_dict=None, min_frames: int = 32,
                      mesh=None, mesh_axis: str = "data",
                      mask_padding: bool = False):
    """Jitted, shape-bucketed synthesizer forward for inference pipelines.

    Variable-length segments are padded to the next power-of-two frame count
    (>= min_frames) so repeated calls hit the XLA compile cache — essential
    on remote-compile backends where eager dispatch is pathologically slow.

    mask_padding: thread the segment's true length into the model as a
    traced `valid_frames` scalar, so a bucket-padded forward is *numerically
    identical* to an exact-length forward (masked GroupNorm stats, masked
    attention key sums, masked conv inputs, edge-replicated control tail,
    zeroed excitations). Shape-aligned calls (pad == 0) skip the masking
    program entirely. Required for output parity with the reference's
    main.py, which runs every segment at its exact length.

    mesh: optional jax.sharding.Mesh — shard the *time axis* over
    `mesh_axis` (parallel/timeparallel.py), so one utterance's synthesis
    spreads across chips (multi-chip streaming/offline inference). The mesh
    axis size must be a power of two (bucket sizes are powers of two).

    Returns fn(units (1,F,C), f0 (1,F,1), volume (1,F), spk_id (1,1), rng,
    noise=None) -> signal (1, F*block) numpy. `noise` optionally injects the
    exact uniform(-1,1) excitation (parity harnesses); otherwise it is drawn
    from `rng`.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    block = int(model.block_size)

    if mesh is not None:
        if mask_padding:
            raise NotImplementedError(
                "mask_padding is not supported on the time-parallel path"
            )
        from ..parallel.timeparallel import make_time_parallel_forward

        axis_size = mesh.shape[mesh_axis]
        if axis_size & (axis_size - 1):
            raise ValueError(
                f"mesh axis '{mesh_axis}' size {axis_size} must be a power "
                "of two to match the frame bucketing"
            )
        min_frames = max(min_frames, axis_size)
        tp_forward = make_time_parallel_forward(
            model, variables, mesh, axis=mesh_axis, spk_mix_dict=spk_mix_dict
        )

        @jax.jit
        def fwd(units, f0, volume, spk_id, rng):
            noise = jax.random.uniform(
                rng, (units.shape[0], units.shape[1] * block),
                minval=-1.0, maxval=1.0,
            )
            return tp_forward(units, f0, volume, spk_id, noise)

        def run(units, f0, volume, spk_id, rng, noise=None):
            if noise is not None:
                raise NotImplementedError(
                    "explicit noise injection is not supported on the "
                    "time-parallel path"
                )
            n = units.shape[1]
            bucket = max(min_frames, 1 << (int(n) - 1).bit_length())
            pad = bucket - n
            if pad:
                units = np.pad(units, ((0, 0), (0, pad), (0, 0)))
                f0 = np.pad(f0, ((0, 0), (0, pad), (0, 0)), mode="edge")
                volume = np.pad(volume, ((0, 0), (0, pad)))
            out = fwd(
                jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
                jnp.asarray(spk_id), rng,
            )
            return np.asarray(out)[:, : n * block]

        return run

    def apply(units, f0, volume, spk_id, valid, **noise_kw):
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id,
            spk_mix_dict=spk_mix_dict, infer=True, valid_frames=valid,
            **noise_kw,
        )
        return signal

    @jax.jit
    def fwd_rng(units, f0, volume, spk_id, rng):
        return apply(units, f0, volume, spk_id, None, rngs={"noise": rng})

    @jax.jit
    def fwd_rng_masked(units, f0, volume, spk_id, rng, valid):
        return apply(units, f0, volume, spk_id, valid, rngs={"noise": rng})

    @jax.jit
    def fwd_noise(units, f0, volume, spk_id, noise):
        return apply(units, f0, volume, spk_id, None, noise=noise)

    @jax.jit
    def fwd_noise_masked(units, f0, volume, spk_id, noise, valid):
        return apply(units, f0, volume, spk_id, valid, noise=noise)

    def run(units, f0, volume, spk_id, rng, noise=None, valid=None):
        """valid (optional np (B,) int array): per-item true frame counts
        for a pre-padded batch of mixed-length segments (the batched
        offline path, infer/batch.py). The inputs must already be padded
        to a common frame count; outputs beyond each item's valid length
        are masked garbage the caller crops. Requires mask_padding."""
        n = units.shape[1]
        if valid is not None:
            assert mask_padding, "per-item valid requires mask_padding"
            bucket = max(min_frames, 1 << (int(n) - 1).bit_length())
            pad = bucket - n
            if pad:
                units = np.pad(units, ((0, 0), (0, pad), (0, 0)))
                f0 = np.pad(f0, ((0, 0), (0, pad), (0, 0)), mode="edge")
                volume = np.pad(volume, ((0, 0), (0, pad)))
                if noise is not None:
                    noise = np.pad(noise, ((0, 0), (0, pad * block)))
            args = (
                jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
                jnp.asarray(spk_id),
            )
            excite = rng if noise is None else jnp.asarray(noise)
            f = fwd_rng_masked if noise is None else fwd_noise_masked
            out = f(*args, excite, jnp.asarray(valid, dtype=jnp.int32))
            return np.asarray(out)
        bucket = max(min_frames, 1 << (int(n) - 1).bit_length())
        pad = bucket - n
        if pad:
            units = np.pad(units, ((0, 0), (0, pad), (0, 0)))
            f0 = np.pad(f0, ((0, 0), (0, pad), (0, 0)), mode="edge")
            volume = np.pad(volume, ((0, 0), (0, pad)))
            if noise is not None:
                noise = np.pad(noise, ((0, 0), (0, pad * block)))
        args = (
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(spk_id),
        )
        excite = rng if noise is None else jnp.asarray(noise)
        if pad and mask_padding:
            valid = jnp.asarray(n, dtype=jnp.int32)
            f = fwd_rng_masked if noise is None else fwd_noise_masked
            out = f(*args, excite, valid)
        else:
            f = fwd_rng if noise is None else fwd_noise
            out = f(*args, excite)
        return np.asarray(out)[:, : n * block]

    return run


def load_model(model_path: str) -> Tuple[nn.Module, dict, DotDict]:
    """Load (module, variables, args) from a checkpoint; reads the sibling
    config.yaml as the reference does (vocoder.py:343-345).

    Accepts either this framework's flax msgpack `.ckpt` or a reference
    torch `.pt` (as written by /root/reference/logger/saver.py:83-87) —
    the latter is converted on the fly (utils/convert.py), matching the
    reference's `load_model(ckpt['model'])` entry point directly.
    """
    import jax.numpy as jnp
    import jax

    config_file = os.path.join(os.path.dirname(model_path), "config.yaml")
    args = load_config(config_file)
    model = build_model(args)
    if model_path.endswith(".pt"):
        from ..utils.convert import load_reference_torch_checkpoint

        _, variables = load_reference_torch_checkpoint(model_path)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        from ..train.checkpoint import restore_variables

        variables = restore_variables(model_path)
    return model, variables, args
