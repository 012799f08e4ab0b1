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

Config fields and latency accounting match the reference GUI settings
(gui.py:143-158,319-327); configs round-trip via YAML instead of pickle.
"""
import argparse
import time

import numpy as np

from gui_locale import I18nAuto
from ddsp_svc_tpu.infer.streaming import SvcCore, StreamingSession
from ddsp_svc_tpu.data.wavio import load_audio, write_wav

i18n = I18nAuto()


def parse_args():
    p = argparse.ArgumentParser(description="Streaming (real-time) VC")
    p.add_argument("-m", "--model_path", type=str, required=True)
    p.add_argument("-i", "--input", type=str, default=None,
                   help="input wav; omit for live sounddevice streaming")
    p.add_argument("-o", "--output", type=str, default=None)
    p.add_argument("-id", "--spk_id", type=int, default=1)
    p.add_argument("-k", "--pitch", type=float, default=0.0)
    p.add_argument("-th", "--threhold", type=float, default=-45)
    p.add_argument("-sr", "--samplerate", type=int, default=44100)
    p.add_argument("--block-time", type=float, default=0.3)
    p.add_argument("--crossfade-time", type=float, default=0.04)
    p.add_argument("--buffer-num", type=int, default=2)
    p.add_argument("-pe", "--pitch_extractor", type=str, default="dio")
    p.add_argument("-e", "--enhance", type=str, default="true")
    p.add_argument("--phase-vocoder", action="store_true")
    return p.parse_args()


def make_session(cmd) -> StreamingSession:
    core = SvcCore(cmd.model_path)
    return StreamingSession(
        core,
        samplerate=cmd.samplerate,
        block_time=cmd.block_time,
        crossfade_time=cmd.crossfade_time,
        buffer_num=cmd.buffer_num,
        use_phase_vocoder=cmd.phase_vocoder,
        spk_id=cmd.spk_id,
        threshold_db=cmd.threhold,
        pitch_adjust=cmd.pitch,
        use_enhancer=(cmd.enhance.lower() == "true"),
        pitch_extractor_type=cmd.pitch_extractor,
    )


def stream_file(cmd) -> None:
    sess = make_session(cmd)
    audio, sr = load_audio(cmd.input, sr=cmd.samplerate, mono=True)
    bf = sess.block_frame
    n_blocks = len(audio) // bf
    outs = []
    for b in range(n_blocks):
        st = time.perf_counter()
        outs.append(sess.process_block(audio[b * bf : (b + 1) * bf]))
        dt = (time.perf_counter() - st) * 1000
        print(f"block {b + 1}/{n_blocks} | {i18n('Inference time (ms)')}: {dt:.1f}")
    write_wav(cmd.output, np.concatenate(outs).astype(np.float32), cmd.samplerate)
    print(f" [*] wrote {cmd.output}")


def stream_live(cmd) -> None:
    try:
        import sounddevice as sd
    except ImportError:
        raise SystemExit(
            "sounddevice (PortAudio) not available — use -i/-o for file "
            "streaming through the same real-time path"
        )
    sess = make_session(cmd)

    def callback(indata, outdata, frames, times, status):
        block = indata.mean(axis=1) if indata.ndim > 1 else indata
        out = sess.process_block(block.astype(np.float32))
        outdata[:] = out[: len(outdata), None].repeat(outdata.shape[1], axis=1)

    with sd.Stream(
        callback=callback, blocksize=sess.block_frame,
        samplerate=cmd.samplerate, dtype="float32",
    ):
        print(i18n("Start conversion"), "- Ctrl-C to stop")
        while True:
            time.sleep(cmd.block_time)


if __name__ == "__main__":
    cmd = parse_args()
    if cmd.input:
        assert cmd.output, "-o required with -i"
        stream_file(cmd)
    else:
        stream_live(cmd)
