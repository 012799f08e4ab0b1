"""Length-mask helpers for bucket-padded batches.

`valid_frames` began as a traced *scalar* (one segment per call, padded to
a power-of-two bucket — infer/offline.py's per-segment path). The batched
offline path packs SEGMENTS OF DIFFERENT TRUE LENGTHS into one device
batch, so every masking site accepts either a scalar or a (B,) vector.
This module is the single place that normalizes the two forms; every
consumer then works with a (B?, t) mask (leading dim 1 for the scalar
case, broadcasting over the batch).
"""
from __future__ import annotations

import jax.numpy as jnp


def frame_mask(t: int, valid_frames, dtype=None) -> jnp.ndarray:
    """0/1 mask of valid positions. :: -> (1, t) for scalar valid_frames,
    (B, t) for a (B,)-vector. Multiply against (B, t, ...) data after
    appending trailing axes."""
    vf = jnp.asarray(valid_frames)
    m = jnp.arange(t)[None, :] < vf.reshape(-1, 1)
    return m if dtype is None else m.astype(dtype)


def valid_col(valid_frames, dtype=None) -> jnp.ndarray:
    """valid_frames as a (B?, 1) column (scalar -> (1, 1))."""
    vf = jnp.asarray(valid_frames)
    col = vf.reshape(-1, 1)
    return col if dtype is None else col.astype(dtype)
