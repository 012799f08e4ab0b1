"""Checkpointing: save/restore {step, model variables, optimizer state}.

Capability parity with the reference's Saver.save_model / logger.utils
(saver.py:83-87, utils.py:49-67): single-file checkpoints named
`model_{step}.ckpt` (+ `model_best.ckpt`), resume picks the max-step file
else best. Serialization is flax msgpack (pure arrays, no pickle), so
checkpoints are portable across hosts and safe to load.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import numpy as np
import jax
from flax import serialization


def save_checkpoint(
    path: str, step: int, variables: dict, opt_state: Any = None
) -> None:
    payload = {
        "global_step": np.asarray(step, dtype=np.int64),
        "model": serialization.to_state_dict(jax.device_get(variables["params"])),
        "constants": serialization.to_state_dict(
            jax.device_get(variables.get("constants", {}))
        ),
        "optimizer": serialization.to_state_dict(jax.device_get(opt_state))
        if opt_state is not None
        else {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _load_payload(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_checkpoint(
    path: str,
    params_template: Optional[dict] = None,
    opt_state_template: Any = None,
) -> Tuple[int, dict, Any]:
    """Returns (step, variables, opt_state). Templates restore pytree
    structure (NamedTuple optimizer states etc.)."""
    payload = _load_payload(path)
    step = int(payload["global_step"])
    params = payload["model"]
    constants = payload.get("constants", {})
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    variables = {"params": params}
    if constants:
        variables["constants"] = constants
    opt_state = None
    if opt_state_template is not None and payload.get("optimizer"):
        opt_state = serialization.from_state_dict(
            opt_state_template, payload["optimizer"]
        )
    return step, variables, opt_state


def restore_variables(path: str) -> dict:
    """Variables-only restore (inference)."""
    _, variables, _ = restore_checkpoint(path)
    return variables


def latest_checkpoint(expdir: str) -> Optional[str]:
    """Resume policy parity (logger/utils.py:52-66): max numeric
    model_{step}.ckpt, else model_best.ckpt, else None."""
    if not os.path.isdir(expdir):
        return None
    steps = []
    for name in os.listdir(expdir):
        m = re.fullmatch(r"model_(\d+)\.ckpt", name)
        if m:
            steps.append(int(m.group(1)))
    if steps:
        return os.path.join(expdir, f"model_{max(steps)}.ckpt")
    best = os.path.join(expdir, "model_best.ckpt")
    return best if os.path.isfile(best) else None
