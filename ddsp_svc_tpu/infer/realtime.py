"""Low-latency real-time VC driving the exact incremental engine.

The SOLA path (`infer/streaming.py`, reference gui.py:367-433 parity)
recomputes a full sliding window every block because the reference
architecture is acausal through its prenet GroupNorm (docs/PARITY.md). For
models trained with `causal: true, frame_norm: true` this module instead
wires the state-carrying `IncrementalCombSubFast` engine into a block
front-end:

  - synthesis is O(block) per block with carried state — no window
    recomputation, no SOLA splicing, no crossfade artifacts;
  - features are still computed on a sliding context window, because the
    acausal parts are inherent to the *features*: the autocorrelation F0
    window is centered (±win/2 lookahead), the response mask dilates 4
    frames both ways (main.py:112-114), and HuBERT attends bidirectionally
    over its input. Per block we extract the `frames_per_block` feature
    frames that sit `lookahead_frames` behind the newest audio, so every
    frame's F0/volume/mask window is fully inside the buffer; only the
    units keep a mild window dependence (same as the reference GUI).

Latency: block + (lookahead_frames + 2) synthesis frames. With the default
44.1 kHz / 512 hop and lookahead 4 that is block + ~70 ms — and unlike the
SOLA engine there is no `buffer_num` multiple-block safety margin and no
crossfade/sola-search tail.

The enhancer (NSF-HiFiGAN) is deliberately not part of this path: it is a
windowed, acausal vocoder; use the SOLA engine when enhancement is needed.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from ..data.features import F0Extractor, VolumeExtractor, UnitsEncoder
from ..models.incremental import IncrementalCombSubFast


def _dilated_frame_mask(volume: np.ndarray, threshold_db: float) -> np.ndarray:
    """Frame-level response mask with 9-frame max dilation (main.py:112-114
    before the sample-rate upsample)."""
    mask = (volume > 10 ** (threshold_db / 20)).astype(np.float32)
    mask = np.pad(mask, (4, 4), constant_values=(mask[0], mask[-1]))
    return np.array([np.max(mask[n: n + 9]) for n in range(len(mask) - 8)])


class IncrementalSession:
    """Block-by-block VC over a causal+frame_norm CombSubFast.

    Feed `process_block` blocks of ``frames_per_block * block_size`` samples
    at the model sample rate; each call returns the same number of samples
    (delayed by ``lookahead_frames + 2`` frames relative to the input).
    """

    def __init__(
        self,
        model,
        variables,
        units_encoder: UnitsEncoder,
        spk_id: int = 1,
        frames_per_block: int = 26,
        context_time: float = 1.0,
        pitch_adjust: float = 0.0,
        threshold_db: float = -45.0,
        f0_extractor: str = "dio",
        f0_min: float = 65,
        f0_max: float = 800,
        lookahead_frames: Optional[int] = None,
        seed: int = 0,
        record: bool = False,
    ):
        self.engine = IncrementalCombSubFast(model, variables)
        hop, sr = self.engine.bs, self.engine.sr
        self.hop, self.sr = hop, sr
        self.units_encoder = units_encoder
        self.f0_ext = F0Extractor(f0_extractor, sr, hop, f0_min, f0_max)
        self.vol_ext = VolumeExtractor(hop)
        self.pitch_factor = 2.0 ** (float(pitch_adjust) / 12.0)
        self.threshold_db = float(threshold_db)

        if lookahead_frames is None:
            # cover the centered F0 window and the 4-frame mask dilation
            lookahead_frames = max(4, -(-self.f0_ext.win // (2 * hop)) + 1)
        self.lookahead_frames = int(lookahead_frames)
        self.frames_per_block = int(frames_per_block)
        self.block_samples = self.frames_per_block * hop

        ctx_frames = max(
            int(round(context_time * sr / hop)),
            self.frames_per_block + self.lookahead_frames + 4,
        )
        self.ctx_frames = ctx_frames
        self.window = np.zeros(ctx_frames * hop, dtype=np.float32)

        self.state = self.engine.init_state(
            np.asarray([[int(spk_id)]]), batch=1
        )
        self._rng = np.random.default_rng(seed)
        self._block_idx = 0
        # mask values for output frames -2, -1 (engine pipeline fill)
        self._mask_queue = [0.0, 0.0]
        self.record = record
        self.recorded = {
            "units": [], "f0": [], "volume": [], "noise": [], "mask": [],
        }

    @classmethod
    def from_checkpoint(cls, model_path: str, **kwargs) -> "IncrementalSession":
        from ..models import load_model

        model, variables, args = load_model(model_path)
        enc = UnitsEncoder(
            args.data.encoder,
            args.data.encoder_ckpt,
            args.data.encoder_sample_rate,
            args.data.encoder_hop_size,
        )
        return cls(model, variables, enc, **kwargs)

    # ------------------------------------------------------------------

    def _window_features(self):
        """Fixed-shape feature extraction over the context window; shapes are
        constant so the jitted units/f0 paths hit the compile cache."""
        f0 = self.f0_ext.extract(self.window, uv_interp=True)
        volume = self.vol_ext.extract(self.window)
        units = self.units_encoder.encode(self.window[None], self.sr, self.hop)
        mask = _dilated_frame_mask(volume, self.threshold_db)
        return units[0], f0, volume, mask

    def process_block(self, block: np.ndarray) -> np.ndarray:
        """Feed `block_samples` input samples; returns `block_samples` of
        converted audio (lookahead+2 frames of algorithmic delay)."""
        assert block.shape[-1] == self.block_samples
        self.window = np.roll(self.window, -self.block_samples)
        self.window[-self.block_samples:] = block

        units, f0, volume, mask = self._window_features()

        # local frame index of the oldest feature frame fed this block
        start = self.ctx_frames - self.lookahead_frames - self.frames_per_block
        sl = slice(start, start + self.frames_per_block)
        u = units[None, sl, :]
        f = (f0[sl] * self.pitch_factor)[None, :].astype(np.float32)
        v = volume[sl][None, :].astype(np.float32)
        noise = self._rng.uniform(
            -1.0, 1.0, size=(1, self.block_samples)
        ).astype(np.float32)
        if self.record:
            self.recorded["units"].append(u)
            self.recorded["f0"].append(f)
            self.recorded["volume"].append(v)
            self.recorded["noise"].append(noise)

        audio, self.state = self.engine.process(
            self.state, u, f, v, noise
        )
        audio = np.asarray(audio)[0]

        # response mask, delayed 2 frames to match the engine pipeline;
        # linear interp between frame values (main.py:115's upsample)
        self._mask_queue.extend(mask[sl])
        mvals = np.asarray(self._mask_queue[: self.frames_per_block + 1])
        self._mask_queue = self._mask_queue[self.frames_per_block:]
        frac = np.arange(self.hop, dtype=np.float32) / self.hop
        mask_up = (
            mvals[:-1, None] * (1 - frac) + mvals[1:, None] * frac
        ).reshape(-1)

        self._block_idx += 1
        if self.record:
            self.recorded["mask"].append(mask_up)
        return audio * mask_up

    def flush(self) -> np.ndarray:
        """Drain the engine's 2-frame pipeline at end of stream."""
        tail, self.state = self.engine.flush(self.state)
        tail = np.asarray(tail)[0]
        mvals = np.asarray(self._mask_queue[:3])
        if len(mvals) < 3:
            mvals = np.pad(mvals, (0, 3 - len(mvals)), mode="edge")
        frac = np.arange(self.hop, dtype=np.float32) / self.hop
        mask_up = (
            mvals[:-1, None] * (1 - frac) + mvals[1:, None] * frac
        ).reshape(-1)
        return tail * mask_up[: tail.shape[-1]]
