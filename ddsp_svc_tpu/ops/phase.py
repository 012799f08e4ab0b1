"""Phase accumulation: instantaneous frequency -> wrapped rotation.

Behavioral contract from the reference (/root/reference/ddsp/core.py:31-51):
    rot = cumsum(f0 / sr) [+ initial_phase / 2pi];  rot -= round(rot)
yielding rotations in (-0.5, 0.5], with an fp64 path (`precise=True`) used at
inference (vocoder.py:392,450 pass `infer` as `precise`).

TPU-first design: fp64 is emulated and slow on TPU, so instead of a raw
cumsum (whose magnitude — and therefore rounding error — grows linearly with
T) we run a *wrapped* prefix scan: mod-1 addition is associative, so
`lax.associative_scan` with a wrap-after-add combiner keeps every partial in
[-1, 1], giving O(sqrt(T))·eps error instead of O(T·f0/sr)·eps. For
`precise=True` we additionally carry a compensated two-float (hi, lo) pair
(double-single arithmetic), reaching ~2^-45 accuracy using only fp32 hardware
ops — matching the fp64 reference to well below audio significance.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _wrap(x: jnp.ndarray) -> jnp.ndarray:
    """x - round(x): wrap to (-0.5, 0.5] (round is ties-to-even, as torch)."""
    return x - jnp.round(x)


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b| roughly; used for renorm)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _cumsum_mod1(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Prefix sum modulo 1 with wrapped partials (single fp32 precision)."""

    def combine(a, b):
        return _wrap(a + b)

    return jax.lax.associative_scan(combine, _wrap(x), axis=axis)


def _cumsum_mod1_compensated(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Prefix sum modulo 1 in two-float compensated (double-single) arithmetic.

    Each partial is represented as hi + lo with |lo| <= ulp(hi)/2. The
    combiner adds pairs with TwoSum, folds the wrap into hi (exact: hi stays
    in [-1, 1] so subtracting round(hi) is a Sterbenz-exact operation), then
    renormalizes. Mod-1 addition stays associative, so associative_scan is
    valid; accuracy is ~2^-45 absolute on the wrapped value.
    """
    hi0 = _wrap(x)
    lo0 = jnp.zeros_like(hi0)

    def combine(a, b):
        a_hi, a_lo = a
        b_hi, b_lo = b
        s, e = _two_sum(a_hi, b_hi)
        s = _wrap(s)
        lo = a_lo + b_lo + e
        hi, lo = _fast_two_sum(s, lo)
        hi2 = _wrap(hi)
        # carry any wrap spill (hi - hi2 is 0 or ±1, exact)
        return hi2, lo

    hi, lo = jax.lax.associative_scan(combine, (hi0, lo0), axis=axis)
    return _wrap(hi + lo)


def f0_to_rot(
    f0: jnp.ndarray,
    sr: int,
    initial_phase: Optional[jnp.ndarray] = None,
    precise: bool = False,
) -> jnp.ndarray:
    """Instantaneous frequency [Hz] -> wrapped rotation in (-0.5, 0.5].

    Args:
        f0 :: (B, T) - instantaneous frequency series [Hz]
        sr - sampling rate
        initial_phase :: (B,) - initial phase [rad]
        precise - use compensated two-float accumulation (inference path)
    Returns:
        rot :: (B, T) - wrapped rotation, same dtype as f0
    """
    step = f0 / sr
    if precise:
        rot = _cumsum_mod1_compensated(step.astype(jnp.float32), axis=1)
    else:
        rot = _cumsum_mod1(step, axis=1)
    if initial_phase is not None:
        rot = rot + initial_phase[..., None].astype(rot.dtype) / (2.0 * np.pi)
    rot = _wrap(rot)
    return rot.astype(f0.dtype)


def f0_to_phase(
    f0: jnp.ndarray,
    sr: int,
    initial_phase: Optional[jnp.ndarray] = None,
    precise: bool = False,
) -> jnp.ndarray:
    """Wrapped phase [rad] in (-pi, pi]."""
    return 2.0 * np.pi * f0_to_rot(f0, sr, initial_phase, precise)
