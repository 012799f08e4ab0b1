"""Config handling: YAML -> attribute-access dict.

Capability parity with the reference's config layer
(/root/reference/logger/utils.py:31-46 and its duplicate
/root/reference/ddsp/vocoder.py:335-341): YAML files parse into a recursive
dot-accessible dict; missing keys return None rather than raising.

Unlike the reference we add a `to_dict` round-trip and a deep-merge helper so
derived configs (e.g. webui-generated ones) don't need textual templating.
"""
from __future__ import annotations

import os
from typing import Any, Mapping

import yaml


class DotDict(dict):
    """dict with attribute access; nested dicts wrap lazily, missing -> None."""

    def __getattr__(self, name: str):
        val = dict.get(self, name)
        return DotDict(val) if type(val) is dict else val

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, DotDict) else v
        return out


def load_config(path_config: str) -> DotDict:
    with open(path_config, "r") as f:
        args = yaml.safe_load(f)
    return DotDict(args)


def save_config(path_config: str, config: Mapping[str, Any]) -> None:
    cfg = config.to_dict() if isinstance(config, DotDict) else dict(config)
    os.makedirs(os.path.dirname(os.path.abspath(path_config)), exist_ok=True)
    with open(path_config, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def deep_update(base: dict, override: Mapping[str, Any]) -> dict:
    """Recursively merge `override` into a copy of `base`."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = deep_update(dict(out[k]), v)
        else:
            out[k] = v
    return out
