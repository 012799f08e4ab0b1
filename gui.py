#!/usr/bin/env python
"""Real-time voice conversion front-end.

Capability parity with /root/reference/gui.py: the streaming engine
(sliding window + SOLA + crossfade/phase-vocoder splicing) lives in
ddsp_svc_tpu/infer/streaming.py; this entry point drives it either

  - live, with a full-duplex sounddevice stream (if PortAudio/sounddevice is
    installed — it is host I/O, identical role to the reference), or
  - offline, streaming a wav file block-by-block through the exact same
    real-time code path and writing the spliced output (also a latency
    harness: reports per-block inference time like gui.py:431-433).

Settings persistence matches the reference GUI's save/load-on-start
semantics (gui.py:160-171) as YAML named profiles instead of pickle
(ddsp_svc_tpu/infer/stream_config.py): `--config DIR[:NAME]` loads a
profile (explicit CLI flags override it), `--save-config DIR[:NAME]`
writes the effective settings back.
"""
import argparse
import time

import numpy as np

from gui_locale import I18nAuto
from ddsp_svc_tpu.infer.streaming import SvcCore, StreamingSession
from ddsp_svc_tpu.infer.stream_config import StreamConfig
from ddsp_svc_tpu.data.wavio import load_audio, write_wav

i18n = I18nAuto()


def parse_args():
    p = argparse.ArgumentParser(description="Streaming (real-time) VC")
    p.add_argument("-m", "--model_path", type=str, default=None)
    p.add_argument("-i", "--input", type=str, default=None,
                   help="input wav; omit for live sounddevice streaming")
    p.add_argument("-o", "--output", type=str, default=None)
    # tunables default to None so a loaded profile's values survive unless
    # the flag is given explicitly (reference load-on-start semantics)
    p.add_argument("-id", "--spk_id", type=int, default=None)
    p.add_argument("-k", "--pitch", type=float, default=None)
    p.add_argument("-th", "--threhold", type=float, default=None)
    p.add_argument("-sr", "--samplerate", type=int, default=None)
    p.add_argument("--block-time", type=float, default=None)
    p.add_argument("--crossfade-time", type=float, default=None)
    p.add_argument("--buffer-num", type=int, default=None)
    p.add_argument("-pe", "--pitch_extractor", type=str, default=None)
    p.add_argument("-e", "--enhance", type=str, default=None)
    p.add_argument("--phase-vocoder", action="store_true", default=None)
    p.add_argument("--pipeline-depth", type=int, default=None,
                   help="1 = double-buffer the device round-trip (one block "
                        "extra latency; overlaps device work with I/O)")
    p.add_argument("--config", type=str, default=None, metavar="DIR[:NAME]",
                   help="load a settings profile (YAML) before applying flags")
    p.add_argument("--save-config", type=str, default=None, metavar="DIR[:NAME]",
                   help="write the effective settings as a profile and exit "
                        "unless -i/-m are also given")
    return p.parse_args()


def _split_profile(spec: str):
    directory, _, name = spec.partition(":")
    return directory, (name or "default")


def effective_config(cmd) -> StreamConfig:
    """Profile (if any) overlaid with explicitly-passed CLI flags."""
    if cmd.config:
        cfg = StreamConfig.load(*_split_profile(cmd.config))
    else:
        cfg = StreamConfig(
            block_time=0.3, crossfade_time=0.04, threshold_db=-45.0,
            use_phase_vocoder=False, use_enhancer=True,
        )
    if cmd.model_path is not None:
        cfg.checkpoint_path = cmd.model_path
    if cmd.spk_id is not None:
        cfg.spk_id = cmd.spk_id
    if cmd.pitch is not None:
        cfg.pitch_adjust = cmd.pitch
    if cmd.threhold is not None:
        cfg.threshold_db = cmd.threhold
    if cmd.samplerate is not None:
        cfg.samplerate = cmd.samplerate
    if cmd.block_time is not None:
        cfg.block_time = cmd.block_time
    if cmd.crossfade_time is not None:
        cfg.crossfade_time = cmd.crossfade_time
    if cmd.buffer_num is not None:
        cfg.buffer_num = cmd.buffer_num
    if cmd.pitch_extractor is not None:
        cfg.pitch_extractor = cmd.pitch_extractor
    if cmd.enhance is not None:
        cfg.use_enhancer = cmd.enhance.lower() == "true"
    if cmd.phase_vocoder is not None:
        cfg.use_phase_vocoder = bool(cmd.phase_vocoder)
    if cmd.pipeline_depth is not None:
        cfg.pipeline_depth = cmd.pipeline_depth
    return cfg


def make_session(cfg: StreamConfig) -> StreamingSession:
    core = SvcCore(cfg.checkpoint_path)
    return StreamingSession(core, **cfg.session_kwargs())


def stream_file(cfg: StreamConfig, input_path: str, output_path: str) -> None:
    sess = make_session(cfg)
    audio, sr = load_audio(input_path, sr=cfg.samplerate, mono=True)
    bf = sess.block_frame
    n_blocks = len(audio) // bf
    outs = []
    for b in range(n_blocks):
        st = time.perf_counter()
        outs.append(sess.process_block(audio[b * bf : (b + 1) * bf]))
        dt = (time.perf_counter() - st) * 1000
        print(f"block {b + 1}/{n_blocks} | {i18n('Inference time (ms)')}: {dt:.1f}")
    outs.extend(sess.flush())  # drain pipelined windows still in flight
    write_wav(output_path, np.concatenate(outs).astype(np.float32), cfg.samplerate)
    print(f" [*] wrote {output_path}")


def stream_live(cfg: StreamConfig) -> None:
    try:
        import sounddevice as sd
    except ImportError:
        raise SystemExit(
            "sounddevice (PortAudio) not available — use -i/-o for file "
            "streaming through the same real-time path"
        )
    sess = make_session(cfg)

    def callback(indata, outdata, frames, times, status):
        block = indata.mean(axis=1) if indata.ndim > 1 else indata
        out = sess.process_block(block.astype(np.float32))
        outdata[:] = out[: len(outdata), None].repeat(outdata.shape[1], axis=1)

    kwargs = {}
    if any(cfg.sounddevices):
        kwargs["device"] = tuple(cfg.sounddevices)
    with sd.Stream(
        callback=callback, blocksize=sess.block_frame,
        samplerate=cfg.samplerate, dtype="float32", **kwargs,
    ):
        print(i18n("Start conversion"), "- Ctrl-C to stop")
        while True:
            time.sleep(cfg.block_time)


if __name__ == "__main__":
    cmd = parse_args()
    cfg = effective_config(cmd)
    if cmd.save_config:
        path = cfg.save(*_split_profile(cmd.save_config))
        print(f" [*] saved settings profile: {path}")
        if not (cmd.input or cmd.model_path):
            raise SystemExit(0)
    if not cfg.checkpoint_path:
        raise SystemExit("-m/--model_path required (or a profile with "
                         "checkpoint_path via --config)")
    if cmd.input:
        assert cmd.output, "-o required with -i"
        stream_file(cfg, cmd.input, cmd.output)
    else:
        stream_live(cfg)
