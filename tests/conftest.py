"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware. Must be set before
jax initializes its backend (i.e. before any test module imports jax).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize pre-imports jax and pins the platform to
# the TPU tunnel; override via config (valid until first backend use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests import torch-only modules from the read-only reference mount
# (they are executed, never copied). Guarded: tests skip if unavailable.
# Appended LAST so top-level repo modules (main, webui, gui_locale, ...)
# shadow the reference's same-named files; repo root goes first.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.append(REFERENCE_PATH)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_core():
    """The reference ddsp/core.py module (torch-only; importable)."""
    try:
        from ddsp import core  # type: ignore
    except Exception:
        pytest.skip("reference ddsp.core not importable")
    return core
