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

    def __init__(self, model_path: str, mesh=None, mesh_axis: str = "data",
                 fused_window: bool = False):
        """mesh: optional jax.sharding.Mesh — time-shard each window's
        synthesis over the mesh (multi-chip streaming; SURVEY §2.3).
        fused_window: run resample -> units encoder -> alignment -> synth ->
        mask (-> enhancer with a numeric adaptive key) as ONE jit program
        per window shape. Built for local single-dispatch deployments;
        measured SLOWER through this environment's remote-execution relay
        (p50 447 vs 190 ms per 300 ms block, tools/ab_stream_fused.py) —
        the relay's per-call overhead grows with the single large program —
        so it defaults off. Numerically identical to the default path
        (tests/test_streaming.py::test_fused_window_matches_legacy_infer)."""
        self.model, self.variables, self.args = load_model(model_path)
        self.mesh, self.mesh_axis = mesh, mesh_axis
        # fused_window is mutually exclusive with mesh BY DESIGN: the fused
        # program contains the HuBERT units encoder, whose gather-based
        # nearest alignment and stride-320 feature extractor do not
        # time-partition (GSPMD falls back to all-gathers that serialize
        # the window), and its raison d'être — one dispatch per window on a
        # single local device — is defeated by multi-chip scheduling. With
        # a mesh, the synth AND the enhancer each run time-sharded instead
        # (make_jitted_synth(mesh=...), Enhancer(mesh=...)).
        self.fused_window = fused_window and mesh is None
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
                    mesh=mesh, mesh_axis=mesh_axis,
                )
            except FileNotFoundError:
                import warnings

                warnings.warn(
                    f" [!] enhancer checkpoint not found: "
                    f"{self.args.enhancer.ckpt} — continuing with RAW DDSP "
                    "output (no enhancement). Fix enhancer.ckpt in the "
                    "model's config.yaml for production conversions.",
                    RuntimeWarning, stacklevel=2,
                )
                self.enhancer = None
        self._step = 0
        self._synth_cache: Dict = {}
        self._window_cache: Dict = {}

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

    def _window_fn(self, sample_rate, spk_mix_dict, enh_cfg):
        """One jitted program for the whole window: resample -> units
        encoder -> nearest alignment -> synth -> mask multiply
        (-> enhancer chain when enh_cfg is set). jit caches per window
        shape — streaming windows are fixed-size, so this compiles once.

        enh_cfg: None, or (adaptive_sample_rate, start_frame) with a
        numeric adaptive key ('auto' changes the resample rates per window
        and must use the legacy path)."""
        from ..data.features import nearest_align
        from ..ops import upsample_frames

        mix_key = (
            tuple(sorted(spk_mix_dict.items())) if spk_mix_dict else None
        )
        key = (sample_rate, mix_key, enh_cfg)
        if key in self._window_cache:
            return self._window_cache[key]

        enc = self.units_encoder
        model = self.model
        model_sr = int(self.args.data.sampling_rate)
        block = int(self.args.data.block_size)
        enhancer = self.enhancer

        # parameter trees are passed as ARGUMENTS: closing over them would
        # inline hundreds of MB of literal constants into the HLO and
        # overflow the remote-compile relay's request limit (HTTP 413)
        def fn(enc_vars, variables, enh_vars, audio, f0, volume, frame_mask,
               spk_id, rng, f0_res, rand_ini):
            # units (UnitsEncoder.encode parity, on-device end to end)
            if sample_rate != enc.encoder_sample_rate:
                audio16 = resample(audio, sample_rate, enc.encoder_sample_rate)
            else:
                audio16 = audio
            units = enc.model.apply(enc_vars, audio16)
            n_frames = f0.shape[1]
            hop_size = block * sample_rate / model_sr
            ratio = (hop_size / sample_rate) / (
                enc.encoder_hop_size / enc.encoder_sample_rate
            )
            units = nearest_align(units, n_frames, ratio)

            # pad to the same power-of-two frame bucket as make_jitted_synth
            # (keeps jit cache buckets AND the model's internal noise-rng
            # draw shapes identical to the legacy path)
            bucket = max(32, 1 << (int(n_frames) - 1).bit_length())
            pad = bucket - n_frames
            if pad:
                units = jnp.pad(units, ((0, 0), (0, pad), (0, 0)))
                f0 = jnp.pad(f0, ((0, 0), (0, pad), (0, 0)), mode="edge")
                volume = jnp.pad(volume, ((0, 0), (0, pad)))
            signal, _, _ = model.apply(
                variables, units, f0, volume, spk_id,
                spk_mix_dict=spk_mix_dict, infer=True, rngs={"noise": rng},
            )
            signal = signal[:, : n_frames * block]
            mask = upsample_frames(frame_mask[..., None], block)[..., 0]
            signal = signal * mask[:, : signal.shape[-1]]
            if enh_cfg is None:
                return signal
            # Enhancer.enhance with static rates (numeric adaptive key)
            adaptive_sr, start_frame = enh_cfg
            enh = enhancer.enhancer
            real_silence_front = start_frame * block / model_sr
            sig = signal[:, int(np.round(real_silence_front * model_sr)):]
            if model_sr != adaptive_sr:
                sig = resample(sig, model_sr, adaptive_sr)
            enhanced = enh._forward_impl(enh_vars, sig, f0_res, rand_ini)
            if adaptive_sr != enh.sample_rate:
                enhanced = resample(enhanced, adaptive_sr, enh.sample_rate)
            if start_frame > 0:
                pad = int(np.round(enh.sample_rate * real_silence_front))
                enhanced = jnp.pad(enhanced, ((0, 0), (pad, 0)))
            return enhanced

        jitted = jax.jit(fn)
        enh_vars = (
            enhancer.enhancer.variables if enh_cfg is not None else {}
        )
        bound = lambda *a: jitted(
            enc.variables, self.variables, enh_vars, *a
        )
        self._window_cache[key] = bound
        return bound

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
        materialize: bool = True,
    ):
        """materialize=False returns the output as a DEVICE array without
        forcing the host transfer — the caller collects it later
        (StreamingSession pipeline_depth overlaps the device round-trip
        with the next window's host-side feature extraction)."""
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

        self._step += 1
        rng = jax.random.key(self._step)
        enh_on = use_enhancer and self.enhancer is not None
        if self.fused_window and (not enh_on or enhancer_adaptive_key != "auto"):
            return self._infer_fused(
                audio, sample_rate, f0, volume, spk_id, threshold_db,
                use_spk_mix, spk_mix_dict, enh_on, enhancer_adaptive_key,
                silence_front, rng, materialize=materialize,
            )

        mask = response_mask(volume, threshold_db, self.args.data.block_size)
        units = self.units_encoder.encode(audio[None, :], sample_rate, hop_size)
        synth = self._synth(spk_mix_dict if use_spk_mix else None)
        out = synth(
            units,
            f0.astype(np.float32),
            volume[None, :].astype(np.float32),
            np.asarray([[int(spk_id)]], dtype=np.int64),
            rng,
        )
        out = out * mask[:, : out.shape[-1]]
        if enh_on:
            out, out_sr = self.enhancer.enhance(
                out, self.args.data.sampling_rate, f0, self.args.data.block_size,
                adaptive_key=enhancer_adaptive_key, silence_front=silence_front,
                rng=jax.random.fold_in(rng, 1),
            )
        else:
            out_sr = self.args.data.sampling_rate
        if not materialize:
            return out[0], out_sr
        return np.asarray(out)[0], out_sr

    def _infer_fused(self, audio, sample_rate, f0, volume, spk_id,
                     threshold_db, use_spk_mix, spk_mix_dict, enh_on,
                     adaptive_key, silence_front, rng, materialize=True):
        """Single-dispatch window conversion (host feature extraction stays
        host-side; everything device lands in one jit program)."""
        from .offline import response_frame_mask

        model_sr = int(self.args.data.sampling_rate)
        block = int(self.args.data.block_size)
        frame_mask = response_frame_mask(volume, threshold_db)

        enh_cfg = None
        f0_res = np.zeros((1, 1), dtype=np.float32)
        rand_ini = np.zeros((1, 9), dtype=np.float32)
        out_sr = model_sr
        if enh_on:
            # host math of Enhancer.enhance (static rates: numeric key)
            enh = self.enhancer.enhancer
            start_frame = int(silence_front * model_sr / block)
            real_silence_front = start_frame * block / model_sr
            adaptive_factor = 2.0 ** (-float(adaptive_key) / 12.0)
            adaptive_sr = 100 * int(
                np.round(enh.sample_rate / adaptive_factor / 100)
            )
            real_factor = enh.sample_rate / adaptive_sr
            # the synth output has n_frames*block samples (f0's frame count)
            n_frames_synth = int(np.asarray(f0).shape[1])
            sig_len = n_frames_synth * block - int(
                np.round(real_silence_front * model_sr)
            )
            if model_sr != adaptive_sr:
                res_len = -(-sig_len * adaptive_sr // model_sr)  # ceil
            else:
                res_len = sig_len
            n_frames_enh = int(res_len // enh.hop_size + 1)
            f0_cut = np.asarray(f0)[0, start_frame:, 0] * real_factor
            time_org = (block / model_sr) * np.arange(len(f0_cut)) / real_factor
            time_frame = (enh.hop_size / enh.sample_rate) * np.arange(
                n_frames_enh
            )
            f0_res = np.interp(
                time_frame, time_org, f0_cut, left=f0_cut[0], right=f0_cut[-1]
            )[None, :].astype(np.float32)
            rand_ini = np.array(
                jax.random.uniform(jax.random.fold_in(rng, 1), (1, 9))
            )
            rand_ini[:, 0] = 0.0
            enh_cfg = (adaptive_sr, start_frame)
            out_sr = enh.sample_rate

        fn = self._window_fn(
            sample_rate, spk_mix_dict if use_spk_mix else None, enh_cfg
        )
        out = fn(
            jnp.asarray(audio, dtype=jnp.float32)[None, :],
            jnp.asarray(f0, dtype=jnp.float32),
            jnp.asarray(volume, dtype=jnp.float32)[None, :],
            jnp.asarray(frame_mask, dtype=jnp.float32)[None, :],
            jnp.asarray([[int(spk_id)]], dtype=jnp.int64),
            rng,
            jnp.asarray(f0_res),
            jnp.asarray(rand_ini),
        )
        if not materialize:
            return out[0], out_sr
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
        pipeline_depth: int = 0,
        **infer_kwargs,
    ):
        """pipeline_depth=1 double-buffers the device round-trip: each
        process_block SUBMITS window N (without forcing the host transfer)
        and splices window N-1's now-ready result — the device/relay
        round-trip overlaps the next block's host-side feature extraction
        and real-time wait. Legal because the SOLA splice only needs the
        *previous* output tail; costs pipeline_depth blocks of added
        latency (zeros while priming)."""
        self.core = core
        self.samplerate = samplerate
        self.use_phase_vocoder = use_phase_vocoder
        self.pipeline_depth = int(pipeline_depth)
        self._pending: list = []
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
        block (block_frame samples) — gui.py:367-433 parity. With
        pipeline_depth > 0 the returned block lags the input by that many
        blocks (zeros while priming)."""
        assert block.shape[-1] == self.block_frame
        self.input_wav = np.roll(self.input_wav, -self.block_frame)
        self.input_wav[-self.block_frame:] = block

        res = self.core.infer(
            self.input_wav,
            self.samplerate,
            safe_prefix_pad_length=self.safe_prefix_pad_length,
            materialize=self.pipeline_depth == 0,
            **self.infer_kwargs,
        )
        if self.pipeline_depth > 0:
            self._pending.append(res)
            if len(self._pending) <= self.pipeline_depth:
                return np.zeros(self.block_frame, dtype=np.float32)
            res = self._pending.pop(0)
        return self._splice(*res)

    def flush(self) -> list:
        """Drain pipelined windows still in flight (end-of-stream); returns
        the remaining output blocks in order."""
        outs = [self._splice(*res) for res in self._pending]
        self._pending = []
        return outs

    def _splice(self, audio, model_sr) -> np.ndarray:
        audio = np.asarray(audio)  # collect the (possibly async) device result
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
