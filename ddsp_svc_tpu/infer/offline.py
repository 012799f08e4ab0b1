"""Offline voice-conversion pipeline.

Capability parity with /root/reference/main.py:60-174: f0 extraction with an
MD5-keyed cache, key change, volume extraction + response-threshold mask
(9-frame max dilation, upsampled to sample rate), silence-slicing into
segments, per-segment unit encoding + synthesis + optional enhancement, and
zero-gap/cross-fade stitching.

Documented fix vs reference: main.py applies the key change twice
(main.py:105 and :120 — '-k 12' shifts by 24 semitones). Here it is applied
once; pass compat_double_key=True to reproduce the reference behavior.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import load_model
from ..data.features import F0Extractor, VolumeExtractor, UnitsEncoder
from ..data.slicer import Slicer
from ..data.wavio import load_audio, write_wav
from ..ops import upsample_frames
from .enhancer import Enhancer


def split(audio: np.ndarray, sample_rate: int, hop_size: float,
          db_thresh: float = -40, min_len: int = 5000):
    """Silence segmentation into (start_frame, chunk) (main.py:34-47)."""
    slicer = Slicer(sr=sample_rate, threshold=db_thresh, min_length=min_len)
    chunks = slicer.slice(audio)
    result = []
    for v in chunks.values():
        tag = v["split_time"].split(",")
        if tag[0] != tag[1]:
            start_frame = int(int(tag[0]) // hop_size)
            end_frame = int(int(tag[1]) // hop_size)
            if end_frame > start_frame:
                result.append(
                    (start_frame,
                     audio[int(start_frame * hop_size): int(end_frame * hop_size)])
                )
    return result


def cross_fade(a: np.ndarray, b: np.ndarray, idx: int) -> np.ndarray:
    """Linear cross-fade concat at sample idx (main.py:50-57)."""
    result = np.zeros(idx + b.shape[0])
    fade_len = a.shape[0] - idx
    result[:idx] = a[:idx]
    k = np.linspace(0, 1.0, num=fade_len, endpoint=True)
    result[idx: a.shape[0]] = (1 - k) * a[idx:] + k * b[:fade_len]
    result[a.shape[0]:] = b[fade_len:]
    return result


def response_frame_mask(volume: np.ndarray, threshold_db: float) -> np.ndarray:
    """Volume-threshold mask with 9-frame max dilation, at frame rate
    (host part of main.py:112-116)."""
    mask = (volume > 10 ** (threshold_db / 20)).astype(np.float32)
    mask = np.pad(mask, (4, 4), constant_values=(mask[0], mask[-1]))
    return np.array([np.max(mask[n: n + 9]) for n in range(len(mask) - 8)])


def response_mask(volume: np.ndarray, threshold_db: float, block_size: int
                  ) -> np.ndarray:
    """Volume-threshold mask with 9-frame max dilation, upsampled to sample
    rate (main.py:112-116). Pure numpy — the device upsample cost a relay
    round-trip per call on remote backends."""
    mask = response_frame_mask(volume, threshold_db)
    nxt = np.concatenate([mask[1:], mask[-1:]])
    w = (np.arange(block_size) / block_size).astype(np.float32)
    up = mask[:, None] + (nxt - mask)[:, None] * w[None, :]
    return up.reshape(1, -1).astype(np.float32)  # (1, T)


def run_inference(
    model_path: str,
    input_path: str,
    output_path: str,
    spk_id: int = 1,
    spk_mix_dict: Optional[Dict[int, float]] = None,
    key: float = 0,
    enhance: bool = True,
    pitch_extractor: str = "crepe",
    f0_min: float = 50,
    f0_max: float = 1100,
    threshold_db: float = -60,
    enhancer_adaptive_key=0,
    sampling_rate: int = 44100,
    cache_dir: Optional[str] = None,
    compat_double_key: bool = False,
    seed: int = 0,
    noise_hook=None,
    enhancer_rand_hook=None,
    output_subtype: str = "PCM_16",
) -> str:
    """noise_hook(segment_index, (b, t_samples)) -> np.ndarray: optionally
    injects the exact uniform(-1,1) excitation per segment (used by the
    full-pipeline A/B harness to align randomness with the reference).
    enhancer_rand_hook(segment_index) -> (1, 9) np.ndarray: likewise injects
    the enhancer SineGen's initial rotations (models.py:150-152)."""
    model, variables, args = load_model(model_path)

    audio, sr_i = load_audio(input_path, sr=sampling_rate, mono=True)
    hop_size = args.data.block_size * sr_i / args.data.sampling_rate

    # f0 with MD5-keyed cache (main.py:74-101)
    with open(input_path, "rb") as f:
        md5_hash = hashlib.md5(f.read()).hexdigest()
    cache_dir = cache_dir or os.path.join(os.path.dirname(output_path) or ".", "cache")
    cache_file = os.path.join(
        cache_dir, f"{pitch_extractor}_{f0_min}_{f0_max}_{md5_hash}.npy"
    )
    if os.path.exists(cache_file):
        print("Loading pitch curves from cache...")
        f0 = np.load(cache_file, allow_pickle=False)
    else:
        print(f"Pitch extractor type: {pitch_extractor}")
        ext = F0Extractor(pitch_extractor, sr_i, hop_size, f0_min, f0_max)
        f0 = ext.extract(audio, uv_interp=True)
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_file, f0, allow_pickle=False)
    f0 = f0[None, :, None].astype(np.float32)

    # key change — once (twice only in reference-compat mode). The compat
    # path multiplies sequentially, as main.py:105+120 does: one fused
    # f0*(shift^2) differs by an ulp, which integrates into audible phase
    # drift over a segment.
    shift = np.float32(2.0 ** (float(key) / 12))
    f0 = f0 * shift
    if compat_double_key:
        f0 = f0 * shift

    volume = VolumeExtractor(hop_size).extract(audio)[None, :]
    mask = response_mask(volume[0], threshold_db, args.data.block_size)

    n_spk = int(args.model.n_spk or 1)
    if spk_mix_dict is not None:
        bad = [k for k in spk_mix_dict if not (1 <= int(k) <= n_spk)]
        if bad:
            raise ValueError(
                f" [x] spk_mix_dict ids {bad} out of range [1, {n_spk}]"
            )
    elif not (1 <= int(spk_id) <= n_spk):
        # out-of-range embedding lookups would silently produce NaN audio
        raise ValueError(f" [x] spk_id {spk_id} out of range [1, {n_spk}]")
    spk_id_arr = np.asarray([[int(spk_id)]], dtype=np.int64)
    units_encoder = UnitsEncoder(
        args.data.encoder, args.data.encoder_ckpt,
        args.data.encoder_sample_rate, args.data.encoder_hop_size,
    )
    enhancer = None
    if enhance:
        print("Enhancer type: " + str(args.enhancer.type))
        enhancer = Enhancer(
            args.enhancer.type, args.enhancer.ckpt,
            bf16_min_channels=int(args.enhancer.bf16_min_channels or 0),
        )

    from ..models.factory import make_jitted_synth

    synth = make_jitted_synth(
        model, variables, spk_mix_dict=spk_mix_dict, mask_padding=True
    )
    segments = split(audio, sr_i, hop_size)
    print(f"Cut the input audio into {len(segments)} slices")
    result = np.zeros(0)
    current_length = 0
    sr_o = args.data.sampling_rate
    rng = jax.random.key(seed)
    for i, (start_frame, seg_audio) in enumerate(segments):
        seg_units = units_encoder.encode(seg_audio[None, :], sr_i, hop_size)
        n_f = seg_units.shape[1]
        seg_f0 = f0[:, start_frame: start_frame + n_f, :]
        seg_volume = volume[:, start_frame: start_frame + n_f]
        seg_rng = jax.random.fold_in(rng, i)
        seg_noise = None
        if noise_hook is not None:
            seg_noise = np.asarray(
                noise_hook(i, (1, n_f * args.data.block_size)),
                dtype=np.float32,
            )
        seg_out = synth(seg_units, seg_f0, seg_volume, spk_id_arr, seg_rng,
                        noise=seg_noise)
        bs = args.data.block_size
        seg_out = seg_out * mask[:, start_frame * bs: (start_frame + n_f) * bs]

        if enhancer is not None:
            enh_rand = None
            if enhancer_rand_hook is not None:
                enh_rand = np.asarray(enhancer_rand_hook(i), dtype=np.float32)
            seg_out, sr_o = enhancer.enhance(
                seg_out, args.data.sampling_rate, seg_f0, bs,
                adaptive_key=enhancer_adaptive_key,
                rng=jax.random.fold_in(seg_rng, 1),
                rand_ini=enh_rand,
            )
        seg_out = np.asarray(seg_out).reshape(-1)

        silent_length = (
            round(start_frame * bs * sr_o / args.data.sampling_rate) - current_length
        )
        if silent_length >= 0:
            result = np.append(result, np.zeros(silent_length))
            result = np.append(result, seg_out)
        else:
            result = cross_fade(result, seg_out, current_length + silent_length)
        current_length = current_length + silent_length + len(seg_out)

    write_wav(output_path, result.astype(np.float32), int(sr_o),
              subtype=output_subtype)
    return output_path
