"""Batched offline conversion — the TPU-throughput path for many files.

The single-file path (offline.py::run_inference) converts segment by
segment at batch 1; the chip's measured throughput lives at large batch
(bench.py: batch-128 pipelined ≈ 1399x realtime vs ~120x single-stream).
This driver packs SEGMENTS FROM MANY FILES into device batches:

  1. per file (host): audio load, f0 (md5 cache), volume, response mask,
     slicer segmentation — identical to run_inference.
  2. per segment (device, exact length): unit encoding — bit-identical to
     the single path (HuBERT boundary behavior depends on true length).
  3. synthesis: segments grouped by power-of-two frame bucket, packed into
     batches of --batch, forwarded ONCE per batch with per-item
     `valid_frames` (ops/masking.py) — each item's valid prefix equals its
     own exact-length forward (tests/test_masked_bucketing.py,
     test_batch_inference.py).
  4. enhancement: segments grouped by (resolved adaptive key, bucket) and
     batched through Enhancer.enhance_batch — per-item reflect padding for
     the mel, per-item generator masking, exact (== single-call enhance).
  5. per file: crossfade stitching and output write — identical to
     run_inference.

Randomness: the synth noise excitation is drawn per segment from
np.random.default_rng((seed, file_idx, seg_idx)) and the enhancer SineGen
rotations exactly as the single path derives them — so conversions are
deterministic given --seed. (The single path's *internal* flax noise
stream is not reproducible outside the model, so batch and single default
outputs differ in noise; the equality tests inject identical noise into
both via the hooks.)
"""
from __future__ import annotations

import hashlib
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import jax

from ..data.wavio import load_audio, write_wav
from ..data.features import F0Extractor, VolumeExtractor, UnitsEncoder
from ..models.factory import load_model, make_jitted_synth
from .enhancer import Enhancer
from .offline import split, cross_fade, response_mask


def _next_bucket(n: int, min_frames: int = 32) -> int:
    return max(min_frames, 1 << (int(n) - 1).bit_length())


def run_inference_batch(
    model_path: str,
    input_paths: List[str],
    output_dir: str,
    batch_size: int = 16,
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
    noise_hook=None,           # (file_idx, seg_idx, shape) -> np.ndarray
    enhancer_rand_hook=None,   # (file_idx, seg_idx) -> (1, 9) np.ndarray
    output_subtype: str = "PCM_16",
) -> List[str]:
    """Convert many files with batched device work. Returns output paths
    (output_dir/<input stem>.wav, in input order)."""
    model, variables, args = load_model(model_path)
    block = int(args.data.block_size)
    sr_model = int(args.data.sampling_rate)

    n_spk = int(args.model.n_spk or 1)
    if spk_mix_dict is not None:
        bad = [k for k in spk_mix_dict if not (1 <= int(k) <= n_spk)]
        if bad:
            raise ValueError(f" [x] spk_mix ids {bad} out of range [1, {n_spk}]")
    elif not (1 <= int(spk_id) <= n_spk):
        raise ValueError(f" [x] spk_id {spk_id} out of range [1, {n_spk}]")

    units_encoder = UnitsEncoder(
        args.data.encoder, args.data.encoder_ckpt,
        args.data.encoder_sample_rate, args.data.encoder_hop_size,
    )
    enhancer = None
    if enhance:
        enhancer = Enhancer(
            args.enhancer.type, args.enhancer.ckpt,
            bf16_min_channels=int(args.enhancer.bf16_min_channels or 0),
        )
    synth = make_jitted_synth(
        model, variables, spk_mix_dict=spk_mix_dict, mask_padding=True
    )
    # default f0 cache lives under the output location — the same rule as
    # run_inference (dirname(output_path)/cache), so converting the same
    # files in single-file mode into output_dir hits this cache and vice
    # versa; pass cache_dir explicitly to share across output locations
    cache_dir = cache_dir or os.path.join(output_dir, "cache")

    # ---- per-file feature extraction + segmentation (host) ----
    files = []
    segs = []  # flat segment records
    for fi, path in enumerate(input_paths):
        audio, sr_i = load_audio(path, sr=sampling_rate, mono=True)
        hop = block * sr_i / sr_model
        with open(path, "rb") as f:
            md5 = hashlib.md5(f.read()).hexdigest()
        cache_file = os.path.join(
            cache_dir, f"{pitch_extractor}_{f0_min}_{f0_max}_{md5}.npy"
        )
        if os.path.exists(cache_file):
            f0 = np.load(cache_file, allow_pickle=False)
        else:
            ext = F0Extractor(pitch_extractor, sr_i, hop, f0_min, f0_max)
            f0 = ext.extract(audio, uv_interp=True)
            os.makedirs(cache_dir, exist_ok=True)
            np.save(cache_file, f0, allow_pickle=False)
        f0 = f0[None, :, None].astype(np.float32)
        shift = np.float32(2.0 ** (float(key) / 12))
        f0 = f0 * shift
        if compat_double_key:
            f0 = f0 * shift
        volume = VolumeExtractor(hop).extract(audio)[None, :]
        mask = response_mask(volume[0], threshold_db, block)
        segments = split(audio, sr_i, hop)
        files.append({
            "path": path, "sr": sr_i, "hop": hop, "f0": f0,
            "volume": volume, "mask": mask, "n_segs": len(segments),
        })
        for si, (start_frame, seg_audio) in enumerate(segments):
            segs.append({
                "file": fi, "seg": si, "start": start_frame,
                "audio": seg_audio,
            })
    print(f"[batch] {len(input_paths)} files -> {len(segs)} segments")

    # ---- per-segment unit encoding (exact length, as the single path) ----
    for rec in segs:
        fi = rec["file"]
        units = units_encoder.encode(
            rec["audio"][None, :], files[fi]["sr"], files[fi]["hop"]
        )
        n_f = units.shape[1]
        rec["units"] = np.asarray(units)
        rec["n_f"] = n_f
        rec["f0"] = files[fi]["f0"][:, rec["start"]: rec["start"] + n_f, :]
        rec["volume"] = files[fi]["volume"][:, rec["start"]: rec["start"] + n_f]

    spk_val = int(spk_id)

    # ---- batched synthesis (bucket groups, per-item valid_frames) ----
    groups = defaultdict(list)
    for rec in segs:
        groups[_next_bucket(rec["n_f"])].append(rec)
    for bucket, recs in sorted(groups.items()):
        for lo in range(0, len(recs), batch_size):
            chunk = recs[lo: lo + batch_size]
            # pad the batch axis up to batch_size (repeat the last row) so
            # every chunk of a bucket group reuses ONE compiled program —
            # a remainder-sized batch would otherwise compile a second
            # program per (bucket, remainder) shape, expensive through the
            # minutes-per-compile relay; outputs are cropped back below
            b = batch_size
            n_unit = chunk[0]["units"].shape[-1]
            units_b = np.zeros((b, bucket, n_unit), np.float32)
            f0_b = np.zeros((b, bucket, 1), np.float32)
            vol_b = np.zeros((b, bucket), np.float32)
            noise_b = np.zeros((b, bucket * block), np.float32)
            valid = np.zeros((b,), np.int64)
            pad_rows = [chunk[-1]] * (batch_size - len(chunk))
            for j, rec in enumerate(list(chunk) + pad_rows):
                n = rec["n_f"]
                units_b[j, :n] = rec["units"][0]
                f0_b[j, :n] = rec["f0"][0]
                f0_b[j, n:] = rec["f0"][0, -1]  # per-item edge padding
                vol_b[j, :n] = rec["volume"][0]
                valid[j] = n
                shape = (1, n * block)
                if noise_hook is not None:
                    nz = np.asarray(
                        noise_hook(rec["file"], rec["seg"], shape), np.float32
                    )
                else:
                    nz = (np.random.default_rng(
                        (seed, rec["file"], rec["seg"])
                    ).random(shape, np.float32) * 2 - 1)
                noise_b[j, : n * block] = nz[0]
            spk_b = np.full((b, 1), spk_val, np.int64)
            out = synth(units_b, f0_b, vol_b, spk_b, None,
                        noise=noise_b, valid=valid)
            for j, rec in enumerate(chunk):
                n = rec["n_f"]
                fi, bs = rec["file"], block
                seg_out = out[j: j + 1, : n * bs]
                m = files[fi]["mask"][
                    :, rec["start"] * bs: (rec["start"] + n) * bs
                ]
                rec["signal"] = np.asarray(seg_out) * m
                rec["sr_o"] = sr_model

    # ---- batched enhancement (grouped by resolved key + bucket) ----
    if enhancer is not None:
        egroups = defaultdict(list)
        for rec in segs:
            eak = enhancer_adaptive_key
            if eak == "auto":
                eak = 12.0 * np.log2(float(np.max(rec["f0"])) / 760.0)
                eak = max(0, np.ceil(eak))
            rec["eak"] = float(eak)
            egroups[(rec["eak"], _next_bucket(rec["n_f"]))].append(rec)
        for (eak, bucket), recs in sorted(egroups.items()):
            for lo in range(0, len(recs), batch_size):
                chunk = recs[lo: lo + batch_size]
                # same single-program-per-group batch padding as synthesis
                epad = [chunk[-1]] * (batch_size - len(chunk))
                rand = np.concatenate([
                    np.asarray(
                        enhancer_rand_hook(r["file"], r["seg"]), np.float32
                    ) if enhancer_rand_hook is not None
                    else np.asarray(
                        jax.random.uniform(
                            jax.random.fold_in(jax.random.fold_in(
                                jax.random.key(seed), r["seg"]), 1),
                            (1, 9),
                        ).at[:, 0].set(0.0)
                    )
                    for r in list(chunk) + epad
                ], axis=0)
                outs, sr_o = enhancer.enhance_batch(
                    [r["signal"] for r in list(chunk) + epad],
                    sr_model,
                    [r["f0"] for r in list(chunk) + epad],
                    block,
                    adaptive_key=eak,
                    rand_ini=rand,
                    pad_to=bucket * block,
                )
                for r, o in zip(chunk, outs):
                    r["signal"] = o
                    r["sr_o"] = sr_o

    # ---- per-file stitching + write (identical to run_inference) ----
    os.makedirs(output_dir, exist_ok=True)
    out_paths = []
    by_file = defaultdict(list)
    for rec in segs:
        by_file[rec["file"]].append(rec)
    for fi, meta in enumerate(files):
        recs = sorted(by_file[fi], key=lambda r: r["seg"])
        result = np.zeros(0)
        current_length = 0
        sr_o = recs[0]["sr_o"] if recs else sr_model
        for rec in recs:
            sr_o = rec["sr_o"]
            seg_out = np.asarray(rec["signal"]).reshape(-1)
            silent_length = (
                round(rec["start"] * block * sr_o / sr_model) - current_length
            )
            if silent_length >= 0:
                result = np.append(result, np.zeros(silent_length))
                result = np.append(result, seg_out)
            else:
                result = cross_fade(result, seg_out,
                                    current_length + silent_length)
            current_length = current_length + silent_length + len(seg_out)
        stem = os.path.splitext(os.path.basename(meta["path"]))[0]
        out_path = os.path.join(output_dir, f"{stem}.wav")
        write_wav(out_path, result.astype(np.float32), int(sr_o),
                  subtype=output_subtype)
        out_paths.append(out_path)
    return out_paths
