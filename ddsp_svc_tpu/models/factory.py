"""Model factory: config -> synthesizer module (+ checkpoint loading).

Parity with /root/reference/ddsp/vocoder.py:343-369 (`load_model`) and
/root/reference/train.py:23-38: builds Sins / CombSub / CombSubFast from the
`model.type` field of a yaml config.
"""
from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn

from ..utils.config import DotDict, load_config
from .synths import Sins, CombSub, CombSubFast


def build_model(args: DotDict) -> nn.Module:
    mtype = args.model.type
    if mtype == "Sins":
        return Sins(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_harmonics=args.model.n_harmonics,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
        )
    if mtype == "CombSub":
        return CombSub(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_harmonic=args.model.n_mag_harmonic,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
        )
    if mtype == "CombSubFast":
        return CombSubFast(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            causal=bool(args.model.c),
        )
    raise ValueError(f" [x] Unknown Model: {mtype}")


def load_model(model_path: str) -> Tuple[nn.Module, dict, DotDict]:
    """Load (module, variables, args) from a checkpoint; reads the sibling
    config.yaml as the reference does (vocoder.py:343-345)."""
    from ..train.checkpoint import restore_variables

    config_file = os.path.join(os.path.dirname(model_path), "config.yaml")
    args = load_config(config_file)
    model = build_model(args)
    variables = restore_variables(model_path)
    return model, variables, args
