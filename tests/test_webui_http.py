"""webui HTTP surface: boot the real ThreadingHTTPServer on an ephemeral
port and drive the orchestration endpoints (GET panel, POST genconfig, job
launch + status polling + duplicate-launch guard) — the semantics of the
reference's gradio panel (webui.py:94-123)."""
import os
import threading
import time
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import pytest
import yaml

import webui

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def server(tmp_path, monkeypatch):
    # route repo-root-relative artifacts (opt.yaml, job logs) into tmp
    monkeypatch.setattr(webui, "REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(webui, "JOBS", {})
    (tmp_path / "configs").mkdir()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webui.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, tmp_path
    srv.shutdown()
    srv.server_close()


def _get(srv):
    import html

    port = srv.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
        return r.status, html.unescape(r.read().decode())


def _post(srv, **form):
    import html

    port = srv.server_address[1]
    data = urllib.parse.urlencode(form).encode()
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/run", data=data, timeout=30
    ) as r:
        return r.status, html.unescape(r.read().decode())


def test_panel_and_genconfig(server):
    srv, tmp = server
    status, body = _get(srv)
    assert status == 200 and "control panel" in body

    status, body = _post(
        srv, action="genconfig",
        base=os.path.join(REPO, "configs", "combsub.yaml"),
        train_path="/data/train", valid_path="/data/val",
        expdir="exp/web-test", batch_size="8",
        out="configs/opt.yaml",
    )
    assert status == 200 and "wrote" in body
    cfg = yaml.safe_load((tmp / "configs" / "opt.yaml").read_text())
    assert cfg["data"]["train_path"] == "/data/train"
    assert cfg["train"]["batch_size"] == 8
    assert cfg["env"]["expdir"] == "exp/web-test"
    # untouched template fields survive the deep update
    assert cfg["model"]["type"] == "CombSubFast"


def test_job_launch_status_and_dedup(server):
    srv, tmp = server
    # a real subprocess launch through the panel; the bogus model path makes
    # it exit quickly, which is what lets status polling observe a finish
    status, body = _post(
        srv, action="infer", model="/nonexistent/model.ckpt",
        input="/nonexistent/in.wav", output=str(tmp / "out.wav"),
    )
    assert status == 200 and "started 'infer'" in body
    assert (tmp / "webui_infer.log").exists()

    # duplicate launch while running is refused
    status, body2 = _post(
        srv, action="infer", model="/nonexistent/model.ckpt",
        input="/nonexistent/in.wav", output=str(tmp / "out.wav"),
    )
    if "started" not in body2:  # raced completion is fine
        assert "already running" in body2

    # poll status until the job exits (nonzero — bogus model)
    deadline = time.time() + 120
    while time.time() < deadline:
        _, body = _get(srv)
        if "exited" in body:
            break
        time.sleep(1.0)
    assert "exited" in body, body[-1000:]
