#!/usr/bin/env python
"""HTTP voice-conversion API.

The reference mentions a `flask_api.py` realtime client-server mode
(main.py:94,140 comments) but does not ship it; this provides that
capability on the stdlib http.server (flask is not required):

    python flask_api.py -m exp/model_best.ckpt --port 6842

    POST /voiceChangeModel
        body: WAV bytes
        query/form params: fSafePrefixPadLength (s), fPitchChange (semitones),
            sSpeakId (int), sampleRate (of the response, default input rate),
            enhance (true/false)
        response: WAV bytes (PCM16) of the converted audio

Processing path is SvcCore.infer — identical to the streaming GUI engine
(per-request whole-window conversion with silence_front support).
"""
import argparse
import io
import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

CORE = None


def _read_wav_bytes(data: bytes):
    from ddsp_svc_tpu.data.wavio import read_wav_bytes

    audio, sr = read_wav_bytes(data)
    if audio.ndim > 1:
        audio = audio.mean(axis=0)
    return audio.astype(np.float32), sr


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    from ddsp_svc_tpu.data.wavio import wav_bytes

    return wav_bytes(audio, sr)


class Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        if not self.path.startswith("/voiceChangeModel"):
            self.send_error(404)
            return
        query = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        get = lambda k, d: float(query.get(k, [d])[0])
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)

        audio, sr = _read_wav_bytes(body)
        out, out_sr = CORE.infer(
            audio,
            sr,
            spk_id=int(get("sSpeakId", 1)),
            pitch_adjust=get("fPitchChange", 0),
            threshold_db=get("threhold", -45),
            use_enhancer=str(query.get("enhance", ["true"])[0]).lower() == "true",
            safe_prefix_pad_length=get("fSafePrefixPadLength", 0),
            pitch_extractor_type=str(query.get("pe", ["dio"])[0]),
        )
        target_sr = int(get("sampleRate", out_sr))
        if target_sr != out_sr:
            import jax.numpy as jnp
            from ddsp_svc_tpu.ops import resample

            out = np.asarray(resample(jnp.asarray(out)[None], out_sr, target_sr))[0]
            out_sr = target_sr

        payload = _wav_bytes(out.astype(np.float32), out_sr)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):
        body = json.dumps({"status": "ok", "model": CORE is not None}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def main():
    global CORE
    from ddsp_svc_tpu.infer.streaming import SvcCore

    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", type=str, required=True)
    p.add_argument("--port", type=int, default=6842)
    p.add_argument("--host", type=str, default="127.0.0.1")
    args = p.parse_args()
    CORE = SvcCore(args.model_path)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"voice-change API at http://{args.host}:{args.port}/voiceChangeModel")
    server.serve_forever()


if __name__ == "__main__":
    main()
