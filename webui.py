#!/usr/bin/env python
"""Web control panel.

Capability parity with /root/reference/webui.py (which shells out to
preprocess.py / train.py / main.py via subprocess and generates a derived
config, webui.py:77-123) — implemented on the stdlib http.server instead of
gradio (not available in this environment; same subprocess orchestration).

    python webui.py --port 7860
"""
import argparse
import html
import json
import os
import subprocess
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ddsp_svc_tpu.utils.config import load_config, save_config, deep_update

JOBS = {}
JOB_LOCK = threading.Lock()
REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def _resolve(path):
    """Relative paths are relative to the repo root, wherever the server
    process was started from."""
    return path if os.path.isabs(path) else os.path.join(REPO_ROOT, path)


def launch_job(name, cmd_args):
    with JOB_LOCK:
        if name in JOBS and JOBS[name].poll() is None:
            return f"job '{name}' already running (pid {JOBS[name].pid})"
        log = open(_resolve(f"webui_{name}.log"), "w")
        proc = subprocess.Popen(
            cmd_args, stdout=log, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        JOBS[name] = proc
        return f"started '{name}' (pid {proc.pid}); log: webui_{name}.log"


def job_status():
    out = {}
    with JOB_LOCK:
        for name, proc in JOBS.items():
            rc = proc.poll()
            out[name] = "running" if rc is None else f"exited {rc}"
    return out


def generate_config(base_config, overrides, out_path="configs/opt.yaml"):
    """Derive a training config from a template (webui.py:77-91 parity)."""
    base = load_config(_resolve(base_config)).to_dict()
    cfg = deep_update(base, overrides)
    out_path = _resolve(out_path)
    save_config(out_path, cfg)
    return out_path


PAGE = """<!doctype html><html><head><title>DDSP-SVC-TPU</title></head><body>
<h2>DDSP-SVC-TPU control panel</h2>
<form method=post action=/run>
<h3>1. Generate config</h3>
base config: <input name=base value=configs/combsub.yaml><br>
train path: <input name=train_path value=data/train><br>
valid path: <input name=valid_path value=data/val><br>
expdir: <input name=expdir value=exp/webui><br>
batch size: <input name=batch_size value=24><br>
<button name=action value=genconfig>Generate configs/opt.yaml</button>
<h3>2. Pipeline</h3>
<button name=action value=preprocess>Run preprocessing</button>
<button name=action value=train>Start training</button>
<button name=action value=tensorboard>Launch TensorBoard</button>
<h3>3. Inference</h3>
model: <input name=model value=exp/webui/model_best.ckpt>
input: <input name=input value=samples/source.wav>
output: <input name=output value=out.wav>
key: <input name=key value=0 size=3>
spk: <input name=spk value=1 size=3>
<button name=action value=infer>Convert</button>
</form>
<h3>Status</h3><pre>{status}</pre>
<p>{msg}</p></body></html>"""


class Handler(BaseHTTPRequestHandler):
    def _respond(self, msg=""):
        body = PAGE.format(
            status=html.escape(json.dumps(job_status(), indent=2)),
            msg=html.escape(msg),
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._respond()

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        form = urllib.parse.parse_qs(self.rfile.read(length).decode())
        get = lambda k, d="": form.get(k, [d])[0]
        action = get("action")
        msg = ""
        try:
            msg = self._run_action(action, get)
        except Exception as exc:  # report, don't drop the connection
            msg = f"error: {exc!r}"
        self._respond(msg)

    def _run_action(self, action, get):
        msg = ""
        if action == "genconfig":
            path = generate_config(
                get("base", "configs/combsub.yaml"),
                {
                    "data": {"train_path": get("train_path"),
                             "valid_path": get("valid_path")},
                    "env": {"expdir": get("expdir")},
                    "train": {"batch_size": int(get("batch_size", "24"))},
                },
                out_path=get("out", "configs/opt.yaml"),
            )
            msg = f"wrote {path}"
        elif action == "preprocess":
            msg = launch_job(
                "preprocess",
                ["python", "preprocess.py", "-c",
                 _resolve(get("config", "configs/opt.yaml"))])
        elif action == "train":
            msg = launch_job(
                "train",
                ["python", "train.py", "-c",
                 _resolve(get("config", "configs/opt.yaml"))])
        elif action == "tensorboard":
            msg = launch_job(
                "tensorboard",
                ["tensorboard", "--logdir", get("expdir", "exp"), "--port", "6006"],
            )
        elif action == "infer":
            msg = launch_job(
                "infer",
                ["python", "main.py", "-m", get("model"), "-i", get("input"),
                 "-o", get("output"), "-k", get("key", "0"), "-id", get("spk", "1")],
            )
        return msg

    def log_message(self, *a):
        pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", type=str, default="127.0.0.1")
    args = p.parse_args()
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"DDSP-SVC-TPU webui at http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
