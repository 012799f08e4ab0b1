"""Device-resident training-data pool: the whole cached feature store lives
in HBM; per-step crops are gathered ON DEVICE by the jitted train step.

Why (measured, round 5): through a remote-execution backend the per-step
host->device upload of a fresh batch dominates training wall-clock — at the
production config the step itself computes in ~57 ms but the ~13 MB batch
upload costs ~300-700 ms (tools/profile_train.py isolates it; the K-step
dispatch and batch-96 experiments scale with upload, not compute, which is
how the bottleneck was identified). With the dataset resident in HBM the
only per-step upload is a few index scalars. This is also the right design
for local TPUs: an SVC dataset is small (fp16 units+audio ~240 MB/hour) and
HBM is 16 GB, so staging it once removes the host DMA from the hot loop
entirely.

Layout: every (long-enough) file's features are concatenated along frames —
  units  :: (F_total, C)  fp16/fp32     (one block per aunit variant)
  f0     :: (F_total,)    fp32
  volume :: (F_total,)    fp32
  audio  :: (F_total * block,) fp16/fp32, frame-aligned per file
with host-side numpy tables mapping (file, variant) -> base frame offsets.
Crop selection stays on host (same seeded-RNG semantics as
AudioDataset.get_item); the (B,) start indices ride to the device inside
the train-step call.

Reference contrast: data_loaders.py keeps the cache in host RAM and ships
a fresh tensor batch into the model every step (solver.py:105-108
`data[k].to(args.device)`) — exactly the transfer this removes.
"""
from __future__ import annotations

import random
from typing import Dict, Optional, Tuple

import numpy as np


class DevicePool:
    """Built from an AudioDataset that was loaded with load_all_data."""

    def __init__(self, dataset, block_size: int, device_put=None):
        import jax
        import jax.numpy as jnp

        self.block = int(block_size)
        self.crop_frames = int(
            dataset.waveform_sec * dataset.sample_rate / dataset.hop_size
        )
        self.n_aunit = dataset.n_aunit
        min_sec = dataset.waveform_sec + 0.1

        names, feat_base, unit_base, n_frames, spk = [], [], [], [], []
        units_parts, f0_parts, vol_parts, audio_parts = [], [], [], []
        f_total = 0
        u_total = 0
        for rel in dataset.paths:
            buf = dataset.data_buffer[rel]
            if buf["duration"] < min_sec:
                continue  # same skip rule as get_item (data_loaders.py:92-93)
            if "units" not in buf:
                raise ValueError(
                    "DevicePool requires cache_all_data (load_all_data=True)"
                )
            f0 = buf["f0"][:, 0]
            vol = buf["volume"]
            variants = buf["units"]
            nf = min(len(f0), len(vol), *(len(u) for u in variants))
            audio = buf["audio"]
            nf = min(nf, len(audio) // self.block)
            if nf <= self.crop_frames:
                continue
            names.append(rel)
            feat_base.append(f_total)
            unit_base.append(
                [u_total + i * nf for i in range(len(variants))]
            )
            n_frames.append(nf)
            spk.append(int(buf["spk_id"][0]))
            f0_parts.append(f0[:nf].astype(np.float32))
            vol_parts.append(vol[:nf].astype(np.float32))
            audio_parts.append(audio[: nf * self.block])
            for u in variants:
                units_parts.append(u[:nf])
            f_total += nf
            u_total += nf * len(variants)
        if not names:
            raise ValueError("DevicePool: no file long enough for the crop")

        self.names = names
        self.feat_base = np.asarray(feat_base, dtype=np.int32)
        self.unit_base = np.asarray(unit_base, dtype=np.int32)  # (N, 1+n_aunit)
        self.n_frames = np.asarray(n_frames, dtype=np.int32)
        self.spk = np.asarray(spk, dtype=np.int64)
        self.frame_resolution = dataset.hop_size / dataset.sample_rate

        put = device_put or jax.device_put
        self.arrays = {
            "units": put(jnp.asarray(np.concatenate(units_parts, axis=0))),
            "f0": put(jnp.asarray(np.concatenate(f0_parts))),
            "volume": put(jnp.asarray(np.concatenate(vol_parts))),
            "audio": put(jnp.asarray(np.concatenate(audio_parts))),
        }

    def __len__(self) -> int:
        return len(self.names)

    def nbytes(self) -> int:
        return int(sum(a.size * a.dtype.itemsize for a in self.arrays.values()))

    def sample(
        self, file_indices, rng: random.Random
    ) -> Dict[str, np.ndarray]:
        """Host-side crop selection for a batch of pool files; returns the
        tiny index arrays the jitted pool step consumes. Mirrors
        AudioDataset.get_item's randomization (uniform start in seconds,
        uniform aunit variant)."""
        feat_starts, unit_starts, spk = [], [], []
        for fi in file_indices:
            fi = int(fi) % len(self.names)
            max_from = (
                self.n_frames[fi] * self.frame_resolution
                - self.crop_frames * self.frame_resolution
                - 0.1
            )
            idx_from = rng.uniform(0, max(max_from, 0.0))
            start = int(idx_from / self.frame_resolution)
            start = min(start, int(self.n_frames[fi]) - self.crop_frames)
            variant = rng.randint(0, self.n_aunit)
            feat_starts.append(self.feat_base[fi] + start)
            unit_starts.append(self.unit_base[fi][variant] + start)
            spk.append(self.spk[fi])
        return {
            "feat_start": np.asarray(feat_starts, dtype=np.int32),
            "unit_start": np.asarray(unit_starts, dtype=np.int32),
            "spk_id": np.asarray(spk, dtype=np.int64)[:, None],
        }


def gather_batch(arrays: Dict, idx: Dict, crop_frames: int, block: int):
    """Jit-traceable: slice a (B,)-indexed crop batch out of the pool
    arrays. Returns the same batch dict the host loader would have built."""
    import jax
    import jax.numpy as jnp

    def one_feat(s):
        return (
            jax.lax.dynamic_slice(arrays["f0"], (s,), (crop_frames,)),
            jax.lax.dynamic_slice(arrays["volume"], (s,), (crop_frames,)),
            jax.lax.dynamic_slice(
                arrays["audio"], (s * block,), (crop_frames * block,)
            ),
        )

    f0, volume, audio = jax.vmap(one_feat)(idx["feat_start"])

    def one_units(s):
        return jax.lax.dynamic_slice(
            arrays["units"], (s, 0), (crop_frames, arrays["units"].shape[1])
        )

    units = jax.vmap(one_units)(idx["unit_start"])
    return {
        "audio": audio.astype(jnp.float32),
        "units": units.astype(jnp.float32),
        "f0": f0.astype(jnp.float32)[..., None],
        "volume": volume.astype(jnp.float32),
        "spk_id": idx["spk_id"],
    }
