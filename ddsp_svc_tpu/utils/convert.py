"""PyTorch -> JAX weight converters.

Converts reference-format checkpoints (tarepan/DDSP-SVC-official state
dicts) into this framework's flax variable trees, so users can migrate
trained models and so parity tests can compare full forwards numerically.

All functions take plain `{name: numpy array}` dicts (call `.numpy()` on
torch tensors first, or pass a torch state_dict — tensors are converted
lazily), so torch is not a hard dependency of the framework.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv1d(sd: Mapping, prefix: str) -> Dict:
    # torch (out, in/groups, k) -> flax (k, in/groups, out)
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _norm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _pointwise_conv_as_dense(sd: Mapping, prefix: str) -> Dict:
    # torch conv1d k=1 (out, in, 1) -> dense kernel (in, out)
    out = {"kernel": _np(sd[prefix + ".weight"])[:, :, 0].T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _weight_norm_dense(sd: Mapping, prefix: str) -> Dict:
    g = _np(sd[prefix + ".weight_g"]).reshape(-1)
    v = _np(sd[prefix + ".weight_v"]).T  # (in, out)
    return {"g": g, "v": v, "bias": _np(sd[prefix + ".bias"])}


def convert_unit2control(
    sd: Mapping, prefix: str = "unit2ctrl.", num_layers: int = 3
):
    """Reference Unit2Control state dict -> (params, constants) subtrees.

    Torch module paths per /root/reference/ddsp/unit2control.py:38-62 and
    ddsp/pcmer.py layer structure.
    """
    p = prefix
    params: Dict = {
        "prenet_conv0": {"Conv_0": _conv1d(sd, p + "unit_prenet.1")},
        "prenet_gn": _norm(sd, p + "unit_prenet.2"),
        "prenet_conv1": {"Conv_0": _conv1d(sd, p + "unit_prenet.4")},
        "f0_embed": _dense(sd, p + "f0_embed"),
        "phase_embed": _dense(sd, p + "phase_embed"),
        "volume_embed": _dense(sd, p + "volume_embed"),
        "spk_embed": {"embedding": _np(sd[p + "spk_embed.weight"])},
        "norm": _norm(sd, p + "dec_post.1"),
        "dense_out": _weight_norm_dense(sd, p + "dec_post.2"),
    }
    constants: Dict = {}
    decoder: Dict = {}
    for i in range(num_layers):
        lp = f"{p}dec_post.0.net.{i}."
        decoder[f"layer_{i}"] = {
            "norm": _norm(sd, lp + "norm"),
            "attn": {
                "to_q": _dense(sd, lp + "attn.to_q"),
                "to_k": _dense(sd, lp + "attn.to_k"),
                "to_v": _dense(sd, lp + "attn.to_v"),
                "to_out": _dense(sd, lp + "attn.to_out"),
            },
            "conv": {
                "LayerNorm_0": _norm(sd, lp + "local_mixer.net.0"),
                "Dense_0": _pointwise_conv_as_dense(sd, lp + "local_mixer.net.2"),
                "Conv1d_0": {"Conv_0": _conv1d(sd, lp + "local_mixer.net.4")},
                "Dense_1": _pointwise_conv_as_dense(sd, lp + "local_mixer.net.6"),
            },
        }
        constants[f"layer_{i}"] = {
            "attn": {
                "projection": _np(sd[lp + "attn.fast_attention.projection_matrix"])
            }
        }
    params["decoder"] = decoder
    return params, {"decoder": constants}


def convert_synth_state_dict(sd: Mapping, num_layers: int = 3) -> Dict:
    """Full reference synthesizer (Sins/CombSub/CombSubFast) state dict ->
    flax variables {'params': ..., 'constants': ...}."""
    params, constants = convert_unit2control(sd, "unit2ctrl.", num_layers)
    return {
        "params": {"unit2ctrl": params},
        "constants": {"unit2ctrl": constants},
    }


def detect_unit2control_num_layers(sd: Mapping, prefix: str = "unit2ctrl.") -> int:
    """Count PCmer decoder layers present in a reference state dict
    (keys `unit2ctrl.dec_post.0.net.{i}.`, /root/reference/ddsp/pcmer.py:11-18)."""
    n = 0
    while f"{prefix}dec_post.0.net.{n}.norm.weight" in sd:
        n += 1
    if n == 0:
        raise KeyError(
            f"no '{prefix}dec_post.0.net.*' keys — not a reference DDSP "
            "synthesizer state dict"
        )
    return n


def load_reference_torch_checkpoint(pt_path: str):
    """Read a reference-format torch checkpoint from disk
    (`{'global_step', 'model', 'optimizer'}` as written by
    /root/reference/logger/saver.py:83-87, or a bare state dict) and convert
    the synthesizer weights to flax variables.

    Returns (step, variables). Requires torch (CPU is fine).
    """
    import torch

    try:
        ckpt = torch.load(pt_path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    step = 0
    sd = ckpt
    if isinstance(ckpt, Mapping) and "model" in ckpt:
        sd = ckpt["model"]
        step = int(ckpt.get("global_step", 0) or 0)
    num_layers = detect_unit2control_num_layers(sd)
    variables = convert_synth_state_dict(sd, num_layers=num_layers)
    return step, variables


def convert_reference_checkpoint(pt_path: str, out_dir: str) -> str:
    """One-command reference->TPU checkpoint migration.

    Takes a reference `model_{step}.pt` (sibling config.yaml required, as the
    reference's own loader assumes — vocoder.py:343-345), writes
    `out_dir/model_{step}.ckpt` (flax msgpack) plus a copy of config.yaml, so
    the result is directly loadable by models.factory.load_model and usable
    with the offline CLI (`main.py -m out_dir/model_{step}.ckpt`).

    Returns the written checkpoint path.
    """
    import os
    import shutil

    from ..train.checkpoint import save_checkpoint

    config_file = os.path.join(os.path.dirname(os.path.abspath(pt_path)), "config.yaml")
    if not os.path.isfile(config_file):
        raise FileNotFoundError(
            f"expected sibling config.yaml next to {pt_path} "
            "(reference checkpoint layout, vocoder.py:343-345)"
        )
    step, variables = load_reference_torch_checkpoint(pt_path)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"model_{step}.ckpt")
    save_checkpoint(out_path, step, variables)
    out_config = os.path.join(out_dir, "config.yaml")
    if os.path.abspath(out_config) != os.path.abspath(config_file):
        shutil.copyfile(config_file, out_config)
    return out_path


def convert_hubert_state_dict(sd: Mapping, num_layers: int = 12) -> Dict:
    """bshall HuBERT-soft torch checkpoint -> flax params for nn.hubert.

    Weight-norm on the positional conv (dim=2: per-kernel-position g) is
    folded into a plain kernel here.
    """
    params: Dict = {"feature_extractor": {}, "feature_projection": {}}
    fe = params["feature_extractor"]
    fe["conv0"] = _conv1d(sd, "feature_extractor.conv0")
    fe["norm0_scale"] = _np(sd["feature_extractor.norm0.weight"])
    fe["norm0_bias"] = _np(sd["feature_extractor.norm0.bias"])
    for i in range(1, 7):
        fe[f"conv{i}"] = _conv1d(sd, f"feature_extractor.conv{i}")

    params["feature_projection"] = {
        "norm": _norm(sd, "feature_projection.norm"),
        "projection": _dense(sd, "feature_projection.projection"),
    }

    # positional conv: weight_norm(dim=2) -> fold g*(v/||v||) per k-position
    g = _np(sd["positional_embedding.conv.weight_g"])  # (1, 1, 128)
    v = _np(sd["positional_embedding.conv.weight_v"])  # (768, 48, 128)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = v * (g / (norm + 1e-12))
    params["positional_embedding"] = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),  # (k, in/groups, out)
            "bias": _np(sd["positional_embedding.conv.bias"]),
        }
    }
    params["norm"] = _norm(sd, "norm")
    for i in range(num_layers):
        lp = f"encoder.layers.{i}."
        params[f"layer_{i}"] = {
            "in_proj": {
                "kernel": _np(sd[lp + "self_attn.in_proj_weight"]).T,
                "bias": _np(sd[lp + "self_attn.in_proj_bias"]),
            },
            "out_proj": _dense(sd, lp + "self_attn.out_proj"),
            "linear1": _dense(sd, lp + "linear1"),
            "linear2": _dense(sd, lp + "linear2"),
            "norm1": _norm(sd, lp + "norm1"),
            "norm2": _norm(sd, lp + "norm2"),
        }
    params["proj"] = _dense(sd, "proj")
    return {"params": params}


def convert_fairseq_hubert_state_dict(
    sd: Mapping, num_layers: int = 12, final_proj: bool = True
) -> Dict:
    """fairseq HubertModel / ContentVec checkpoint -> flax params for
    nn.hubert.HubertSoft (base-variant layout: separate q/k/v projections,
    grouped feature-extractor conv list, pos_conv weight norm folded).

    Covers the reference's Audio2ContentVec/Audio2HubertBase loading paths
    (vocoder.py:231-332), which go through fairseq checkpoint loading there.
    """
    if "model" in sd and isinstance(sd["model"], Mapping):
        sd = sd["model"]

    params: Dict = {"feature_extractor": {}, "feature_projection": {}}
    fe = params["feature_extractor"]
    for i in range(7):
        fe[f"conv{i}"] = _conv1d(sd, f"feature_extractor.conv_layers.{i}.0")
    fe["norm0_scale"] = _np(sd["feature_extractor.conv_layers.0.2.weight"])
    fe["norm0_bias"] = _np(sd["feature_extractor.conv_layers.0.2.bias"])

    params["feature_projection"] = {
        "norm": _norm(sd, "layer_norm"),
        "projection": _dense(sd, "post_extract_proj"),
    }

    g = _np(sd["encoder.pos_conv.0.weight_g"])
    v = _np(sd["encoder.pos_conv.0.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = v * (g / (norm + 1e-12))
    params["positional_embedding"] = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),
            "bias": _np(sd["encoder.pos_conv.0.bias"]),
        }
    }
    params["norm"] = _norm(sd, "encoder.layer_norm")
    for i in range(num_layers):
        lp = f"encoder.layers.{i}."
        if lp + "self_attn.q_proj.weight" not in sd:
            break
        wq = _np(sd[lp + "self_attn.q_proj.weight"]).T
        wk = _np(sd[lp + "self_attn.k_proj.weight"]).T
        wv = _np(sd[lp + "self_attn.v_proj.weight"]).T
        bq = _np(sd[lp + "self_attn.q_proj.bias"])
        bk = _np(sd[lp + "self_attn.k_proj.bias"])
        bv = _np(sd[lp + "self_attn.v_proj.bias"])
        params[f"layer_{i}"] = {
            "in_proj": {
                "kernel": np.concatenate([wq, wk, wv], axis=1),
                "bias": np.concatenate([bq, bk, bv]),
            },
            "out_proj": _dense(sd, lp + "self_attn.out_proj"),
            "linear1": _dense(sd, lp + "fc1"),
            "linear2": _dense(sd, lp + "fc2"),
            "norm1": _norm(sd, lp + "self_attn_layer_norm"),
            "norm2": _norm(sd, lp + "final_layer_norm"),
        }
    if final_proj and "final_proj.weight" in sd:
        params["proj"] = _dense(sd, "final_proj")
    return {"params": params}


def _fold_weight_norm(sd: Mapping, prefix: str) -> np.ndarray:
    """Fold torch weight_norm(dim=0): w = g * v / ||v|| (norm over all dims
    but 0). Falls back to a plain .weight if norm was already removed."""
    if prefix + ".weight" in sd:
        return _np(sd[prefix + ".weight"])
    g = _np(sd[prefix + ".weight_g"])
    v = _np(sd[prefix + ".weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return v * (g / (norm + 1e-12))


def convert_nsf_hifigan_state_dict(sd: Mapping, h: Mapping) -> Dict:
    """Reference NSF-HiFiGAN 'generator' state dict -> flax params for
    nn.nsf_hifigan.Generator (weight norm folded)."""

    def conv_wn(prefix):
        w = _fold_weight_norm(sd, prefix)  # (out, in, k)
        return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[prefix + ".bias"])}

    def convtrans_wn(prefix):
        w = _fold_weight_norm(sd, prefix)  # (in, out, k)
        return {"kernel": w.transpose(2, 0, 1), "bias": _np(sd[prefix + ".bias"])}

    params: Dict = {
        "conv_pre": conv_wn("conv_pre"),
        "conv_post": conv_wn("conv_post"),
        "source_linear": _dense(sd, "m_source.l_linear"),
    }
    n_kernels = len(h["resblock_kernel_sizes"])
    for i in range(len(h["upsample_rates"])):
        params[f"up_{i}"] = convtrans_wn(f"ups.{i}")
        params[f"noise_conv_{i}"] = conv_wn(f"noise_convs.{i}")
        for j in range(n_kernels):
            rp = f"resblocks.{i * n_kernels + j}"
            block: Dict = {}
            for m in range(3):
                block[f"conv1_{m}"] = conv_wn(f"{rp}.convs1.{m}")
                block[f"conv2_{m}"] = conv_wn(f"{rp}.convs2.{m}")
            params[f"resblock_{i}_{j}"] = block
    return {"params": params}


def convert_crepe_state_dict(sd: Mapping) -> Dict:
    """torchcrepe checkpoint -> flax params for nn.crepe.CrepeFull, with
    BatchNorm folded into per-channel (scale, bias)."""
    params: Dict = {}
    for i in range(1, 7):
        w = _np(sd[f"conv{i}.weight"])  # (out, in, k, 1)
        params[f"conv{i}"] = {
            "kernel": w[..., 0].transpose(2, 1, 0),
            "bias": _np(sd[f"conv{i}.bias"]),
        }
        gamma = _np(sd[f"conv{i}_BN.weight"])
        beta = _np(sd[f"conv{i}_BN.bias"])
        mean = _np(sd[f"conv{i}_BN.running_mean"])
        var = _np(sd[f"conv{i}_BN.running_var"])
        scale = gamma / np.sqrt(var + 1e-5)
        params[f"bn{i}_scale"] = scale
        params[f"bn{i}_bias"] = beta - mean * scale
    params["classifier"] = _dense(sd, "classifier")
    return {"params": params}
