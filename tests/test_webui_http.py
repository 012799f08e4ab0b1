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


def _post_stream(srv, **form):
    import html

    port = srv.server_address[1]
    data = urllib.parse.urlencode(form).encode()
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stream", data=data, timeout=120
    ) as r:
        return r.status, html.unescape(r.read().decode())


def test_stream_page_convert_and_profiles(server):
    """The /stream page (reference gui.py:174-360 control surface): GET
    renders the tunables form; POST converts a wav through StreamingSession
    and reports per-block latency; profile save/load round-trips YAML
    (gui.py:160-171 semantics)."""
    import json as _json

    import numpy as np

    import bench_stream
    from ddsp_svc_tpu.data.wavio import write_wav, load_audio

    srv, tmp = server
    port = srv.server_address[1]

    # GET renders the form
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stream", timeout=10) as r:
        body = r.read().decode()
    assert "block_time" in body and "profile_save" in body

    # tiny real checkpoint + short song
    sr, block = 16000, 256
    ckpt = bench_stream._make_ckpt(str(tmp), sr, block, causal=False,
                                   frame_norm=False, bf16=False)
    song = bench_stream._song(sr, 1.0)
    write_wav(str(tmp / "in.wav"), song.astype(np.float32), sr)

    status, body = _post_stream(
        srv, action="stream", model=ckpt, input=str(tmp / "in.wav"),
        output=str(tmp / "out.wav"), samplerate=str(sr), block_time="0.25",
        crossfade_time="0.04", buffer_num="2", spk="1", key="0",
        threshold="-45", pe="dio", enhance="false", phase_vocoder="false",
    )
    assert status == 200
    stats = _json.loads(body[body.index("{"): body.rindex("}") + 1])
    assert stats["blocks"] == 4
    assert stats["latency_ms"]["p95"] > 0
    out, _ = load_audio(str(tmp / "out.wav"), sr=sr, mono=True)
    assert len(out) == 4 * int(0.25 * sr)
    assert np.isfinite(out).all() and np.abs(out).max() > 0

    # profile save -> file exists; load -> values echoed back
    status, body = _post_stream(
        srv, action="stream", model=ckpt, block_time="0.5", spk="3",
        profile_dir=str(tmp / "profiles"), profile_save="stage",
    )
    assert status == 200
    prof = tmp / "profiles" / "stage.yaml"
    assert prof.is_file()
    saved = yaml.safe_load(prof.read_text())
    assert saved["block_time"] == 0.5 and saved["spk_id"] == 3

    status, body = _post_stream(
        srv, action="stream", model=ckpt,
        profile_dir=str(tmp / "profiles"), profile_load="stage",
    )
    assert status == 200
    loaded = _json.loads(body[body.index("{"): body.rindex("}") + 1])
    assert loaded["config"]["block_time"] == 0.5
    assert loaded["config"]["spk_id"] == 3
