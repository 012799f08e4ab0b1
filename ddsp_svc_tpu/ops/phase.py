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


def _split(a):
    """Dekker split (fp32: factor 2^12 + 1): a == hi + lo with hi, lo
    representable in 12 bits of mantissa each — enables exact products."""
    c = a * jnp.float32(4097.0)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker TwoProduct: p + err == a * b exactly (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _div_ds(hi, lo, d):
    """Double-single (hi + lo) / scalar d -> double-single quotient."""
    q1 = hi / d
    p, pe = _two_prod(q1, jnp.full_like(q1, d))
    q2 = ((hi - p) - pe + lo) / d
    return _fast_two_sum(q1, q2)


def _cumsum_mod1(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Prefix sum modulo 1 with wrapped partials (single fp32 precision)."""

    def combine(a, b):
        return _wrap(a + b)

    return jax.lax.associative_scan(combine, _wrap(x), axis=axis)


def _cumsum_mod1_compensated(
    x: jnp.ndarray, axis: int = -1, x_lo: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Prefix sum modulo 1 in two-float compensated (double-single) arithmetic.

    Each partial is represented as hi + lo with |lo| <= ulp(hi)/2. The
    combiner adds pairs with TwoSum, folds the wrap into hi (exact: hi stays
    in [-1, 1] so subtracting round(hi) is a Sterbenz-exact operation), then
    renormalizes. Mod-1 addition stays associative, so associative_scan is
    valid; accuracy is ~2^-45 absolute on the wrapped value.

    x_lo: optional low words when the inputs are themselves double-single
    pairs (then the scan is exact w.r.t. the pairs' values — input rounding
    no longer accumulates across steps).
    """
    if x_lo is None:
        hi0 = _wrap(x)
        lo0 = jnp.zeros_like(hi0)
    else:
        hi0 = _wrap(x)
        lo0 = x_lo

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


def f0_to_rot_upsampled(
    f0_frames: jnp.ndarray,
    block: int,
    sr: int,
    initial_phase: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """f0_to_rot(upsample_frames(f0_frames)) with a frame-rate scan.

    The synthesizers always accumulate phase over a *linearly upsampled*
    frame-rate f0 (reference vocoder.py:449-450 after core.py:7-21), so the
    within-frame prefix sum is an arithmetic series with a closed form:
        x(f*block + s) = a + (b - a) * s / block      (a=F[f], b=F[f+1])
        sum_{sigma<=s} x = (s+1)*a + (b-a)*s*(s+1)/(2*block)
    Only the per-frame totals need a sequential scan — F steps instead of
    F*block — run in compensated (hi, lo) mod-1 arithmetic. The per-sample
    closed form is elementwise and fuses into the combtooth/sine that
    consumes it. Accuracy: frame carries ~2^-45; the fp32 closed-form term
    adds <= ~3e-7 rotations of rounding — far below the fp64 reference's
    audio significance and an order better than a per-sample fp32 scan.

    f0_frames :: (B, F) [Hz] -> (B, F*block) wrapped rotations (-0.5, 0.5].
    """
    a = f0_frames
    nxt = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)  # last frame repeated
    slope = nxt - a
    # inclusive per-frame totals as exact double-single pairs: a single fp32
    # rounding per frame here would random-walk across the carry scan
    # (~2e-6 rotations by frame 400 — audible phase drift vs the fp64
    # reference); with error-free TwoProduct/TwoSum the totals are exact and
    # only the scan's own ~2^-45 compensation floor remains.
    t1_hi, t1_lo = _two_prod(jnp.full_like(a, float(block)), a)
    sl_hi, sl_lo = _two_sum(nxt, -a)
    half = jnp.float32((block - 1) / 2.0)
    t2_hi, t2_lo = _two_prod(sl_hi, jnp.full_like(a, half))
    t2_lo = t2_lo + sl_lo * half
    s_hi, e1 = _two_sum(t1_hi, t2_hi)
    s_lo = t1_lo + t2_lo + e1
    s_hi, s_lo = _fast_two_sum(s_hi, s_lo)
    s_hi, s_lo = _div_ds(s_hi, s_lo, jnp.float32(sr))  # (B, F) rotations
    # EXCLUSIVE prefix via zero-prepend
    zeros = jnp.zeros_like(s_hi[:, :1])
    shifted_hi = jnp.concatenate([zeros, s_hi[:, :-1]], axis=1)
    shifted_lo = jnp.concatenate([zeros, s_lo[:, :-1]], axis=1)
    carry = _cumsum_mod1_compensated(shifted_hi, axis=1, x_lo=shifted_lo)
    s = jnp.arange(block, dtype=a.dtype)  # sample index within frame
    # inclusive within-frame prefix at sample s (torch cumsum includes t)
    tri = (s * (s + 1.0)) * (0.5 / block)
    inner = ((s + 1.0)[None, None, :] * a[..., None]
             + tri[None, None, :] * slope[..., None]) / sr  # (B, F, block)
    rot = _wrap(_wrap(inner) + carry[..., None])
    if initial_phase is not None:
        rot = _wrap(rot + initial_phase[..., None, None].astype(rot.dtype)
                    / (2.0 * np.pi))
    b, f = a.shape
    return rot.reshape(b, f * block)
