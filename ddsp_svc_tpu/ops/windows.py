"""Window functions with torch-compatible (periodic) conventions.

numpy/jnp `hanning`/`bartlett` are symmetric; the reference stack uses
torch's periodic windows throughout (e.g. `torch.hann_window(2*block)` in
/root/reference/ddsp/vocoder.py:434, `torch.bartlett_window` in
/root/reference/ddsp/core.py:221), so we provide periodic variants here.
Windows are computed in float64 on host and cast, so they are bit-stable
constants baked into jit graphs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window of length n (torch.hann_window default)."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n, 1))
    return jnp.asarray(w, dtype=dtype)


def hann_window_symmetric(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric Hann window (scipy/np convention)."""
    if n == 1:
        return jnp.ones((1,), dtype=dtype)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return jnp.asarray(w, dtype=dtype)


def bartlett_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Bartlett (triangular) window (torch.bartlett_window default)."""
    w = 1.0 - np.abs(2.0 * np.arange(n) / max(n, 1) - 1.0)
    return jnp.asarray(w, dtype=dtype)


def sqrt_hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """sqrt of the periodic Hann window — the 50%-overlap COLA analysis/synthesis
    window used by the CombSubFast synthesizer (vocoder.py:434)."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n, 1))
    return jnp.asarray(np.sqrt(w), dtype=dtype)
