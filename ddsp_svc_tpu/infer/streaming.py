"""Real-time streaming voice conversion with SOLA splicing.

Capability parity with /root/reference/gui.py minus the PySimpleGUI front-end
(sounddevice/PortAudio is host I/O and not available here; the engine is
pure-Python with a `process_block` API any audio front-end can drive):

  - SvcCore == SvcDDSP (gui.py:34-140): model/encoder/enhancer loading and a
    whole-window inference call (f0 with silence_front skipping, volume
    threshold mask, units, synth, optional enhancer).
  - StreamingSession == GUI streaming state (gui.py:319-433): sliding input
    window of `input_frames` samples, per-block inference on the window,
    SOLA alignment of the new chunk against the carried `sola_buffer`
    (normalized cross-correlation argmax), then sin^2 crossfade or
    phase-vocoder splicing.
  - phase_vocoder (gui.py:14-31): rFFT magnitude/phase interpolation splice.

All latency accounting (block/crossfade/sola-search/last-delay frames and
safe_prefix_pad) matches gui.py:319-327.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import load_model
from ..data.features import F0Extractor, VolumeExtractor, UnitsEncoder
from ..ops import resample
from .enhancer import Enhancer
from .offline import response_mask


def phase_vocoder(a: jnp.ndarray, b: jnp.ndarray, fade_out: jnp.ndarray,
                  fade_in: jnp.ndarray) -> jnp.ndarray:
    """Phase-coherent crossfade of equal-length windows (gui.py:14-31)."""
    fa = jnp.fft.rfft(a)
    fb = jnp.fft.rfft(b)
    absab = jnp.abs(fa) + jnp.abs(fb)
    n = a.shape[0]
    if n % 2 == 0:
        absab = absab.at[1:-1].multiply(2.0)
    else:
        absab = absab.at[1:].multiply(2.0)
    phia = jnp.angle(fa)
    phib = jnp.angle(fb)
    deltaphase = phib - phia
    deltaphase = deltaphase - 2 * np.pi * jnp.floor(deltaphase / (2 * np.pi) + 0.5)
    w = 2 * np.pi * jnp.arange(n // 2 + 1) + deltaphase
    t = jnp.arange(n)[:, None] / n
    return (
        a * fade_out**2
        + b * fade_in**2
        + jnp.sum(absab * jnp.cos(w * t + phia), -1) * fade_out * fade_in / n
    )


def sola_shift(temp_wav: np.ndarray, sola_buffer: np.ndarray,
               search_frames: int) -> int:
    """Normalized cross-correlation argmax (gui.py:409-414)."""
    cf = len(sola_buffer)
    nom = np.correlate(temp_wav[: cf + search_frames], sola_buffer, "valid")
    energy = np.convolve(
        temp_wav[: cf + search_frames] ** 2, np.ones(cf), "valid"
    )
    den = np.sqrt(energy + 1e-8)
    return int(np.argmax(nom / den))


class SvcCore:
    """Whole-window conversion (SvcDDSP parity, gui.py:34-140)."""

    def __init__(self, model_path: str, mesh=None, mesh_axis: str = "data"):
        """mesh: optional jax.sharding.Mesh — time-shard each window's
        synthesis over the mesh (multi-chip streaming; SURVEY §2.3)."""
        self.model, self.variables, self.args = load_model(model_path)
        self.mesh, self.mesh_axis = mesh, mesh_axis
        self.units_encoder = UnitsEncoder(
            self.args.data.encoder,
            self.args.data.encoder_ckpt,
            self.args.data.encoder_sample_rate,
            self.args.data.encoder_hop_size,
        )
        self.enhancer: Optional[Enhancer] = None
        if self.args.enhancer and self.args.enhancer.ckpt:
            try:
                self.enhancer = Enhancer(
                    self.args.enhancer.type, self.args.enhancer.ckpt,
                    bf16_min_channels=int(
                        self.args.enhancer.bf16_min_channels or 0
                    ),
                )
            except FileNotFoundError:
                self.enhancer = None
        self._step = 0
        self._synth_cache: Dict = {}

    def _synth(self, spk_mix_dict):
        """Bucketed jitted synth per spk-mix configuration (eager
        model.apply would dispatch op-by-op on remote backends)."""
        from ..models.factory import make_jitted_synth

        key = tuple(sorted(spk_mix_dict.items())) if spk_mix_dict else None
        if key not in self._synth_cache:
            self._synth_cache[key] = make_jitted_synth(
                self.model, self.variables, spk_mix_dict=spk_mix_dict,
                mesh=self.mesh, mesh_axis=self.mesh_axis,
            )
        return self._synth_cache[key]

    def infer(
        self,
        audio: np.ndarray,
        sample_rate: int,
        spk_id: int = 1,
        threshold_db: float = -45,
        pitch_adjust: float = 0,
        use_spk_mix: bool = False,
        spk_mix_dict: Optional[Dict[int, float]] = None,
        use_enhancer: bool = True,
        enhancer_adaptive_key="auto",
        pitch_extractor_type: str = "dio",
        f0_min: float = 50,
        f0_max: float = 1100,
        safe_prefix_pad_length: float = 0,
    ):
        hop_size = (
            self.args.data.block_size * sample_rate / self.args.data.sampling_rate
        )
        silence_front = (
            safe_prefix_pad_length - 0.03 if safe_prefix_pad_length > 0.03 else 0
        )
        ext = F0Extractor(pitch_extractor_type, sample_rate, hop_size, f0_min, f0_max)
        f0 = ext.extract(audio, uv_interp=True, silence_front=silence_front)
        f0 = f0[None, :, None] * 2 ** (float(pitch_adjust) / 12)

        volume = VolumeExtractor(hop_size).extract(audio)
        mask = response_mask(volume, threshold_db, self.args.data.block_size)
        units = self.units_encoder.encode(audio[None, :], sample_rate, hop_size)

        self._step += 1
        rng = jax.random.key(self._step)
        synth = self._synth(spk_mix_dict if use_spk_mix else None)
        out = synth(
            units,
            f0.astype(np.float32),
            volume[None, :].astype(np.float32),
            np.asarray([[int(spk_id)]], dtype=np.int64),
            rng,
        )
        out = out * mask[:, : out.shape[-1]]
        if use_enhancer and self.enhancer is not None:
            out, out_sr = self.enhancer.enhance(
                out, self.args.data.sampling_rate, f0, self.args.data.block_size,
                adaptive_key=enhancer_adaptive_key, silence_front=silence_front,
                rng=jax.random.fold_in(rng, 1),
            )
        else:
            out_sr = self.args.data.sampling_rate
        return np.asarray(out)[0], out_sr


class StreamingSession:
    """Block-by-block streaming engine with carried SOLA state."""

    def __init__(
        self,
        core: SvcCore,
        samplerate: int = 44100,
        block_time: float = 0.3,
        crossfade_time: float = 0.04,
        buffer_num: int = 2,
        use_phase_vocoder: bool = False,
        **infer_kwargs,
    ):
        self.core = core
        self.samplerate = samplerate
        self.use_phase_vocoder = use_phase_vocoder
        self.infer_kwargs = infer_kwargs

        # latency accounting (gui.py:319-327)
        self.block_frame = int(block_time * samplerate)
        self.crossfade_frame = int(crossfade_time * samplerate)
        self.sola_search_frame = int(0.01 * samplerate)
        self.last_delay_frame = int(0.02 * samplerate)
        self.input_frames = max(
            self.block_frame + self.crossfade_frame + self.sola_search_frame
            + 2 * self.last_delay_frame,
            (1 + buffer_num) * self.block_frame,
        )
        self.safe_prefix_pad_length = (
            block_time * buffer_num - crossfade_time - 0.01 - 0.02
        )

        self.input_wav = np.zeros(self.input_frames, dtype=np.float32)
        self.sola_buffer = np.zeros(self.crossfade_frame, dtype=np.float32)
        fade = np.sin(
            np.pi * np.arange(0, 1, 1 / self.crossfade_frame) / 2
        ) ** 2
        self.fade_in_window = fade.astype(np.float32)
        self.fade_out_window = (1.0 - fade).astype(np.float32)

    def process_block(self, block: np.ndarray) -> np.ndarray:
        """Feed one input block of `block_frame` samples; returns the output
        block (block_frame samples) — gui.py:367-433 parity."""
        assert block.shape[-1] == self.block_frame
        self.input_wav = np.roll(self.input_wav, -self.block_frame)
        self.input_wav[-self.block_frame:] = block

        audio, model_sr = self.core.infer(
            self.input_wav,
            self.samplerate,
            safe_prefix_pad_length=self.safe_prefix_pad_length,
            **self.infer_kwargs,
        )
        if model_sr != self.samplerate:
            audio = np.asarray(
                resample(jnp.asarray(audio)[None], model_sr, self.samplerate)
            )[0]

        tail = (
            self.block_frame + self.crossfade_frame + self.sola_search_frame
            + self.last_delay_frame
        )
        temp_wav = audio[-tail: -self.last_delay_frame].copy()

        shift = sola_shift(temp_wav, self.sola_buffer, self.sola_search_frame)
        temp_wav = temp_wav[shift: shift + self.block_frame + self.crossfade_frame]

        cf = self.crossfade_frame
        if self.use_phase_vocoder:
            temp_wav[:cf] = np.asarray(
                phase_vocoder(
                    jnp.asarray(self.sola_buffer),
                    jnp.asarray(temp_wav[:cf]),
                    jnp.asarray(self.fade_out_window),
                    jnp.asarray(self.fade_in_window),
                )
            )
        else:
            temp_wav[:cf] = (
                temp_wav[:cf] * self.fade_in_window
                + self.sola_buffer * self.fade_out_window
            )
        self.sola_buffer = temp_wav[-cf:].copy()
        return temp_wav[:-cf]
