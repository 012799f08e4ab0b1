"""HuBERT-soft parity: reference torch implementation (random weights) vs
JAX implementation with converted weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.nn.hubert import HubertSoft
from ddsp_svc_tpu.utils.convert import convert_hubert_state_dict


@pytest.fixture(scope="module")
def ref_hubert():
    try:
        from encoder.hubert.model import HubertSoft as RefHubertSoft  # type: ignore
    except Exception as e:
        pytest.skip(f"reference hubert not importable: {e}")
    import torch

    torch.manual_seed(0)
    model = RefHubertSoft()
    model.eval()
    return model


def test_hubert_units_parity(ref_hubert):
    import torch

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)  # 1 s

    with torch.inference_mode():
        ref_units = ref_hubert.units(torch.from_numpy(wav).unsqueeze(1)).numpy()

    variables = jax.tree.map(
        jnp.asarray, convert_hubert_state_dict(ref_hubert.state_dict())
    )
    model = HubertSoft()
    got = np.asarray(model.apply(variables, jnp.asarray(wav)))

    assert got.shape == ref_units.shape, (got.shape, ref_units.shape)
    scale = np.abs(ref_units).max() + 1e-9
    assert np.abs(got - ref_units).max() / scale < 5e-3, (
        np.abs(got - ref_units).max() / scale
    )


def test_hubert_frame_rate(ref_hubert):
    """320x downsampling contract: T samples -> T//320 frames."""
    variables = jax.tree.map(
        jnp.asarray, convert_hubert_state_dict(ref_hubert.state_dict())
    )
    model = HubertSoft()
    wav = jnp.zeros((1, 16000))
    out = model.apply(variables, wav)
    assert out.shape == (1, 16000 // 320, 256)
