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


def test_encoder_variant_shapes():
    """Encoder variant matrix: layer-9 truncation and projection options."""
    from ddsp_svc_tpu.data.features import UnitsEncoder

    wav = np.random.default_rng(0).standard_normal((1, 32000)).astype(np.float32) * 0.1
    for name, dim in (("hubertbase", 256), ("contentvec768", 768)):
        enc = UnitsEncoder(name, None)
        units = enc.encode(wav, 16000, 320)
        assert units.shape == (1, 32000 // 320 + 1, dim), (name, units.shape)
        assert np.isfinite(units).all()


def test_fairseq_converter_roundtrip():
    """A synthetic fairseq-layout state dict converts and runs; weights are
    actually used (output differs from random init)."""
    import jax
    import jax.numpy as jnp
    from ddsp_svc_tpu.nn.hubert import HubertSoft
    from ddsp_svc_tpu.utils.convert import convert_fairseq_hubert_state_dict

    rng = np.random.default_rng(0)
    sd = {}
    convs = [(512, 1, 10)] + [(512, 512, 3)] * 4 + [(512, 512, 2)] * 2
    for i, shape in enumerate(convs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rng.standard_normal(shape).astype(np.float32) * 0.05
    sd["feature_extractor.conv_layers.0.2.weight"] = np.ones(512, np.float32)
    sd["feature_extractor.conv_layers.0.2.bias"] = np.zeros(512, np.float32)
    sd["layer_norm.weight"] = np.ones(512, np.float32)
    sd["layer_norm.bias"] = np.zeros(512, np.float32)
    sd["post_extract_proj.weight"] = rng.standard_normal((768, 512)).astype(np.float32) * 0.05
    sd["post_extract_proj.bias"] = np.zeros(768, np.float32)
    sd["encoder.pos_conv.0.weight_g"] = np.ones((1, 1, 128), np.float32)
    sd["encoder.pos_conv.0.weight_v"] = rng.standard_normal((768, 48, 128)).astype(np.float32) * 0.05
    sd["encoder.pos_conv.0.bias"] = np.zeros(768, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(768, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(768, np.float32)
    for i in range(9):
        lp = f"encoder.layers.{i}."
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[lp + f"self_attn.{p}.weight"] = rng.standard_normal((768, 768)).astype(np.float32) * 0.03
            sd[lp + f"self_attn.{p}.bias"] = np.zeros(768, np.float32)
        sd[lp + "fc1.weight"] = rng.standard_normal((3072, 768)).astype(np.float32) * 0.03
        sd[lp + "fc1.bias"] = np.zeros(3072, np.float32)
        sd[lp + "fc2.weight"] = rng.standard_normal((768, 3072)).astype(np.float32) * 0.03
        sd[lp + "fc2.bias"] = np.zeros(768, np.float32)
        sd[lp + "self_attn_layer_norm.weight"] = np.ones(768, np.float32)
        sd[lp + "self_attn_layer_norm.bias"] = np.zeros(768, np.float32)
        sd[lp + "final_layer_norm.weight"] = np.ones(768, np.float32)
        sd[lp + "final_layer_norm.bias"] = np.zeros(768, np.float32)
    sd["final_proj.weight"] = rng.standard_normal((256, 768)).astype(np.float32) * 0.05
    sd["final_proj.bias"] = np.zeros(256, np.float32)

    variables = jax.tree.map(jnp.asarray, convert_fairseq_hubert_state_dict(sd))
    model = HubertSoft(output_layer=9, proj_dim=256, pad_input=False)
    wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    out = model.apply(variables, wav)
    assert out.shape == (1, 49, 256)  # no input pad: (16000-400)//320+1
    assert np.isfinite(np.asarray(out)).all()


def test_compute_mask_properties():
    import jax
    from ddsp_svc_tpu.nn.hubert import compute_mask

    mask = compute_mask(jax.random.key(0), (4, 100), mask_prob=0.8, mask_length=10)
    m = np.asarray(mask)
    assert m.shape == (4, 100) and m.dtype == bool
    # masked fraction in a sane band and spans contiguous by construction
    frac = m.mean(axis=1)
    assert (frac > 0.05).all() and (frac <= 0.85).all(), frac


def test_hubert_discrete_units():
    import jax
    import jax.numpy as jnp
    from ddsp_svc_tpu.nn.hubert import HubertSoft, HubertDiscrete

    model = HubertSoft(output_layer=7, proj_dim=None)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 3200)))
    centers = np.random.default_rng(0).standard_normal((100, 768)).astype(np.float32)
    hd = HubertDiscrete(variables, centers)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16000)).astype(np.float32) * 0.1
    )
    units = hd.units(wav)
    assert units.shape[0] == 1 and units.shape[1] > 0
    assert (units >= 0).all() and (units < 100).all()


def test_hubert_discrete_units_parity():
    """HubertDiscrete (layer-7 features -> k-means ids, model.py:87-97) vs
    the EXECUTED reference with identical seeded weights and centroids:
    the discrete unit sequences must match id-for-id."""
    try:
        from encoder.hubert.model import HubertDiscrete as RefHubertDiscrete  # type: ignore
        from sklearn.cluster import KMeans
    except Exception as e:
        pytest.skip(f"reference hubert/sklearn not importable: {e}")
    import torch

    from ddsp_svc_tpu.nn.hubert import HubertDiscrete

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((100, 768)).astype(np.float32)
    km = KMeans(100)
    # load the codebook exactly like the reference's _kmeans loader
    # (model.py:263-273): attributes set directly, no fit
    km.__dict__["n_features_in_"] = 768
    km.__dict__["_n_threads"] = 1
    km.__dict__["cluster_centers_"] = centers  # float32, like the torch checkpoint
    # sklearn >=1.3 predict also wants labels_; mirror what fit would set
    km.__dict__["labels_"] = np.zeros(100, dtype=np.int32)

    torch.manual_seed(4)
    ref = RefHubertDiscrete(km)
    ref.eval()

    wav = (0.1 * rng.standard_normal((1, 32000))).astype(np.float32)
    with torch.inference_mode():
        ref_ids = ref.units(torch.from_numpy(wav).unsqueeze(1)).numpy()

    from ddsp_svc_tpu.utils.convert import convert_hubert_state_dict

    variables = jax.tree.map(
        jnp.asarray, convert_hubert_state_dict(ref.state_dict())
    )
    ours = HubertDiscrete(variables, centers)
    got = np.asarray(ours.units(jnp.asarray(wav)))[0]

    assert got.shape == ref_ids.shape, (got.shape, ref_ids.shape)
    # identical centroids + parity-level features => identical ids except
    # where a frame sits near a Voronoi boundary; require near-total match
    agree = (got == ref_ids).mean()
    assert agree > 0.99, (agree, got[:20], ref_ids[:20])
