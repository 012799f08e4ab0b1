"""Serving over an exported StableHLO artifact: windowed conversion must be
consistent with the direct fixed-shape forward, and the HTTP surface must
round-trip wav bytes."""
import os
import sys
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SR, BS, NF = 16000, 256, 16  # artifact pinned to 16 frames


@pytest.fixture(scope="module")
def exported_setup(tmp_path_factory):
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config
    import export as export_tool

    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    units = jnp.asarray(rng.standard_normal((1, NF, 256)).astype(np.float32))
    f0 = jnp.asarray((200 * rng.random((1, NF, 1)) + 80).astype(np.float32))
    volume = jnp.asarray(rng.random((1, NF)).astype(np.float32))
    spk = jnp.asarray(np.ones((1, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((1, NF * BS)) * 2 - 1).astype(np.float32))

    model = CombSubFast(sampling_rate=SR, block_size=BS, n_unit=256, n_spk=2)
    variables = model.init(
        {"params": jax.random.key(0)}, units, f0, volume, spk, noise=noise
    )
    ckpt = str(tmp / "model_1.ckpt")
    save_checkpoint(ckpt, 1, variables)
    cfg = str(tmp / "config.yaml")
    save_config(cfg, {
        "data": {
            "sampling_rate": SR, "block_size": BS,
            "encoder_out_channels": 256, "encoder": "hubertsoft",
            "encoder_ckpt": None, "encoder_sample_rate": 16000,
            "encoder_hop_size": 320,
        },
        "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
    })
    artifact = export_tool.export_synth(
        ckpt, str(tmp / "model.stablehlo"), frames=NF, batch=1
    )
    return artifact, cfg


def test_windowed_convert_runs(exported_setup):
    from serve import ExportedSynth

    artifact, cfg = exported_setup
    synth = ExportedSynth(artifact, cfg, threshold_db=-80.0, overlap_frames=4)
    t = np.arange(3 * NF * BS + 5 * BS) / SR  # not a multiple of the window
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    out = synth.convert(audio, spk_id=2, key=2.0)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert len(out) >= 3 * NF * BS
    assert np.abs(out).max() > 1e-6

    with pytest.raises(ValueError):
        synth.convert(audio, spk_id=5)


def test_http_surface(exported_setup):
    from serve import ExportedSynth, make_handler
    from http.server import ThreadingHTTPServer
    from ddsp_svc_tpu.data.wavio import wav_bytes, read_wav_bytes

    artifact, cfg = exported_setup
    synth = ExportedSynth(artifact, cfg, threshold_db=-80.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(synth))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert r.status == 200
            assert b'"ok"' in r.read()

        t = np.arange(2 * NF * BS) / SR
        audio = (0.3 * np.sin(2 * np.pi * 196.0 * t)).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/convert?spk_id=1&key=0",
            data=wav_bytes(audio, SR),
            headers={"Content-Type": "audio/wav"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            out, sr = read_wav_bytes(r.read())
        assert sr == SR
        assert np.isfinite(out).all()

        # error path: garbage body -> 400 with a JSON error
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/convert", data=b"not a wav"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
