"""AOT export round-trip: serialize the synth, deserialize, compare."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_export_roundtrip(tmp_path):
    from jax import export as jexport

    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config
    import export as export_tool

    block, n_frames, n_unit = 256, 16, 64
    rng = np.random.default_rng(0)
    units = jnp.asarray(rng.standard_normal((1, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((200 * rng.random((1, n_frames, 1)) + 80).astype(np.float32))
    volume = jnp.asarray(rng.random((1, n_frames)).astype(np.float32))
    spk = jnp.asarray(np.ones((1, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((1, n_frames * block)) * 2 - 1).astype(np.float32))

    model = CombSubFast(sampling_rate=16000, block_size=block, n_unit=n_unit, n_spk=2)
    variables = model.init(
        {"params": jax.random.key(0)}, units, f0, volume, spk, noise=noise
    )

    # write a checkpoint + config the export tool can load
    ckpt = str(tmp_path / "model_1.ckpt")
    save_checkpoint(ckpt, 1, variables)
    save_config(
        str(tmp_path / "config.yaml"),
        {
            "data": {
                "sampling_rate": 16000, "block_size": block,
                "encoder_out_channels": n_unit,
            },
            "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
        },
    )

    out = export_tool.export_synth(
        ckpt, str(tmp_path / "model.stablehlo"), frames=n_frames, batch=1
    )
    blob = open(out, "rb").read()
    restored = jexport.deserialize(bytearray(blob))
    got = np.asarray(restored.call(units, f0, volume, spk, noise))

    ref = np.asarray(
        model.apply(variables, units, f0, volume, spk, infer=True, noise=noise)[0]
    )
    np.testing.assert_allclose(got, ref, atol=1e-3)  # separate XLA compilations reassociate float math
