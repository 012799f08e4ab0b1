"""Analytic FLOP / HBM-byte counters for the hot programs.

SURVEY §5 calls for per-kernel speed-of-light accounting; the reference has
none (wall-clock RTF prints only). These counters mirror the *executed*
compute of each program — convolutions and matmuls at 2*m*n*k, the MXU DFT
transforms at their matmul shapes (including lane padding, since that is
what the systolic array actually multiplies), elementwise/transcendental
work at 1 flop/element class — so `roofline()` (utils/profiling.py) can
place a measured wall-clock against the v5e MXU and HBM roofs.

Byte counts are *program-boundary* HBM traffic estimates: parameters once
per dispatch, plus each major stage's input/output activations once (fused
Pallas stages keep their intermediates in VMEM; XLA fusion does the same
for elementwise chains). They are a principled lower bound — XLA may spill
or re-materialize — so hbm_util is reported as an estimate.

Counter accuracy is pinned by tests/test_flops.py: the conv/matmul
components are compared against XLA's own HLO cost analysis
(compiled.cost_analysis()['flops']) on CPU at small geometry.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Cost:
    flops: float = 0.0
    bytes: float = 0.0

    def __add__(self, other: "Cost") -> "Cost":
        return Cost(self.flops + other.flops, self.bytes + other.bytes)

    def __mul__(self, k: float) -> "Cost":
        return Cost(self.flops * k, self.bytes * k)

    __rmul__ = __mul__


def matmul(m: float, n: float, k: float, dtype_bytes: int = 4) -> Cost:
    """(m, k) @ (k, n): 2mnk flops; operands + result through HBM once."""
    return Cost(2.0 * m * n * k, dtype_bytes * (m * k + k * n + m * n))


def conv1d(t: float, cin: float, cout: float, k: float,
           dtype_bytes: int = 4) -> Cost:
    """Length-t 1-D conv (stride 1, any dilation): 2*t*cin*cout*k flops."""
    return Cost(
        2.0 * t * cin * cout * k,
        dtype_bytes * (t * cin + t * cout + cin * cout * k),
    )


def elemwise(n: float, flops_per_el: float = 1.0,
             dtype_bytes: int = 4, rw: int = 2) -> Cost:
    return Cost(flops_per_el * n, dtype_bytes * rw * n)


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


# --------------------------- PCmer / Unit2Control ---------------------------


def pcmer_cost(b: int, f: int, *, dim: int = 256, heads: int = 8,
               dim_head: int = 64, num_layers: int = 3,
               fused: bool = True, dtype_bytes: int = 4) -> Cost:
    """One PCmer stack (nn/pcmer.py). fused=True counts the Pallas FAVOR+
    kernel's executed shapes (feature dim padded to 128 lanes; q/k/v/out
    HBM traffic only); fused=False counts the XLA formulation (feature
    tensors round-trip HBM)."""
    import math

    inner = heads * dim_head
    m = int(dim_head * math.log(dim_head))
    m_eff = _pad128(m) if fused else m
    t = b * f
    c = Cost()
    for _ in range(num_layers):
        # attention projections
        c += 3 * matmul(t, inner, dim, dtype_bytes)   # q, k, v
        c += matmul(t, dim, inner, dtype_bytes)       # out
        # FAVOR+ features (q and k) + contractions, per head
        feat = Cost(2.0 * 2 * t * dim_head * m_eff * heads, 0)
        ctx = Cost(2.0 * t * m_eff * dim_head * heads, 0)   # k'v context
        num = Cost(2.0 * t * m_eff * dim_head * heads, 0)   # ctx @ q'
        den = Cost(2.0 * t * m_eff * heads, 0)
        c += feat + ctx + num + den
        if fused:
            # kernel HBM traffic: q/k/v in, out — the features stay in VMEM
            c += Cost(0, dtype_bytes * 4 * t * inner)
        else:
            # XLA path round-trips the (B,H,T,m) feature tensors
            c += Cost(0, dtype_bytes * (4 * t * inner + 4 * t * heads * m))
        # conformer conv module: LN -> Dense(4*dim) -> GLU -> dw k31 -> Dense
        c += matmul(t, 4 * dim, dim, dtype_bytes)
        c += conv1d(t, 1, 1, 31, dtype_bytes) * (2 * dim)  # depthwise
        c += matmul(t, dim, 2 * dim, dtype_bytes)
        c += elemwise(t * dim, 8, dtype_bytes)  # LNs, GLU, silu, residuals
    return c


def unit2control_cost(b: int, f: int, *, n_unit: int = 256, dim: int = 256,
                      ndim_out: int = 0, num_layers: int = 3,
                      fused: bool = True, dtype_bytes: int = 4) -> Cost:
    t = b * f
    c = conv1d(t, n_unit, dim, 3, dtype_bytes)
    c += conv1d(t, dim, dim, 3, dtype_bytes)
    c += elemwise(t * dim, 6, dtype_bytes)  # GN, leaky, embeds-add
    c += pcmer_cost(b, f, dim=dim, num_layers=num_layers, fused=fused,
                    dtype_bytes=dtype_bytes)
    c += matmul(t, ndim_out, dim, dtype_bytes)  # weight-norm head
    return c


# ------------------------------ CombSubFast ---------------------------------


def combsub_cost(b: int, f: int, block: int, *, n_unit: int = 256,
                 fused_spectral: bool = True, bf16: bool = True) -> Cost:
    """CombSubFast forward (models/synths.py:140). The STFT-domain filter
    chain is counted at its executed MXU-DFT shapes: 6 matmuls of
    (rows, 2*block) x (2*block, bins_pad) per frame row (forward transforms
    for tooth and noise, then the inverse pair), rows = b*(f+1)."""
    dtype_bytes = 2 if bf16 else 4
    t_samples = b * f * block
    c = unit2control_cost(b, f, n_unit=n_unit, ndim_out=3 * (block + 1),
                          dtype_bytes=dtype_bytes)
    # phase accumulation, combtooth sinc, upsample, window framing
    c += elemwise(t_samples, 20)
    if fused_spectral:
        rows = b * (f + 1)
        n_fft = 2 * block
        bins = _pad128(block + 1)
        c += Cost(6 * 2.0 * rows * n_fft * bins, 0)
        # kernel HBM traffic: two excitation frame sets in, frames out,
        # three control tensors in
        c += Cost(0, dtype_bytes * rows * (3 * n_fft + 3 * (block + 1)))
    else:
        rows = b * (f + 1)
        n_fft = 2 * block
        c += elemwise(rows * n_fft * 3, 5 * 11)  # 3 FFTs, ~5 N log2 N
    c += elemwise(t_samples, 4)  # overlap-add + trim
    return c


# ------------------------------ NSF-HiFiGAN ---------------------------------


def nsf_generator_cost(h: dict, b: int, f: int, *,
                       bf16_min_channels: int = 128) -> Cost:
    """Generator forward (nn/nsf_hifigan.py, reference models.py:106-276).
    Counts conv_pre, each ConvTranspose upsample, the f0-source injection
    convs, the resblock trios, conv_post and the sine source."""
    import numpy as np

    rates = list(h["upsample_rates"])
    kernels = list(h["upsample_kernel_sizes"])
    c0 = int(h["upsample_initial_channel"])
    rks = list(h["resblock_kernel_sizes"])
    rds = [list(d) for d in h["resblock_dilation_sizes"]]
    num_mels = int(h["num_mels"])
    upp = int(np.prod(rates))
    t_full = b * f * upp

    c = conv1d(b * f, num_mels, c0, 7)
    # sine source: 9 harmonics of sin + uv logic + tanh(Dense(9->1))
    c += elemwise(t_full * 9, 6)
    c += Cost(2.0 * 9 * t_full, 4 * 2 * t_full)
    t_in = b * f
    cin = c0
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ch = c0 // (2 ** (i + 1))
        dtype_bytes = 2 if ch >= bf16_min_channels else 4
        t_out = t_in * u
        # transposed conv: every input sample feeds k taps
        c += Cost(2.0 * t_in * cin * ch * k,
                  dtype_bytes * (t_in * cin + t_out * ch + cin * ch * k))
        # f0-source injection conv from the full-rate source
        stride_f0 = int(np.prod(rates[i + 1:])) if i + 1 < len(rates) else 1
        nck = 2 * stride_f0 if i + 1 < len(rates) else 1
        c += Cost(2.0 * t_out * 1 * ch * nck,
                  dtype_bytes * (t_full + t_out * ch))
        # resblock trio: per kernel size, len(dilations) dilated convs +
        # len(dilations) unit-dilation convs (ResBlock1)
        n_convs = sum(2 * len(d) for d in rds)
        trio_flops = sum(
            2 * len(rd) * 2.0 * t_out * ch * ch * rk
            for rk, rd in zip(rks, rds)
        )
        # fused trio kernel HBM (intra-kernel, not just stage boundaries):
        # the host-side im2col staging (ops/pallas_kernels.py:1092-1096)
        # reads x and WRITES an fp32 halo'd tile stack which the kernel
        # grid then reads back — 1 + 2*(1 + 2*halo/tile) full activations
        # in fp32 regardless of the stage dtype — plus the kernel's output
        # write and the weight tensors once per grid
        tile = min(8192, max(512, 131072 // ch))
        halo_frac = 1.0 + 2.0 * 64 / tile  # _RB_HALO = 64
        c += Cost(
            trio_flops,
            dtype_bytes * t_out * ch               # x read for staging
            + 2 * 4.0 * t_out * ch * halo_frac     # tile stack write + read
            + dtype_bytes * t_out * ch             # kernel output write
            + 4 * n_convs * ch * ch * 11,
        )
        c += elemwise(t_out * ch, 4, dtype_bytes)  # leaky/mean/skip adds
        t_in, cin = t_out, ch
    c += conv1d(t_full, cin, 1, 7)
    c += elemwise(t_full, 2)  # tanh
    return c


def mel_frontend_cost(b: int, t_samples: int, *, sr: int, n_fft: int,
                      hop: int, win: int, n_mels: int,
                      mxu: bool = True, bf16: bool = True) -> Cost:
    """log_mel_spectrogram (ops/spectral.py). MXU path: two DFT matmuls at
    lane-padded bins; then the mel basis matmul and the log."""
    rows = b * ((t_samples + (win - hop) // 2 + max((win - hop + 1) // 2, hop)
                 - n_fft) // hop + 1)
    bins = n_fft // 2 + 1
    dtype_bytes = 2 if bf16 else 4
    if mxu:
        c = Cost(2 * 2.0 * rows * n_fft * _pad128(bins),
                 dtype_bytes * rows * (n_fft + bins))
    else:
        c = elemwise(rows * n_fft, 5 * 11)
    c += matmul(rows, n_mels, bins)
    c += elemwise(rows * n_mels, 2)
    return c


def params_bytes(variables) -> float:
    """Total parameter bytes of a flax variable tree (read once/dispatch)."""
    import jax

    return float(sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(variables)
        if hasattr(x, "dtype")
    ))


# ------------------------- program-level aggregates -------------------------


def headline_window_cost(b: int, n_frames: int, block: int, sr: int,
                         n_unit: int, h_nsf: dict, *, bf16: bool = True,
                         bf16_min_channels: int = 128) -> Cost:
    """The fused combsub+enhancer inference window (bench.py `full`)."""
    c = combsub_cost(b, n_frames, block, n_unit=n_unit, bf16=bf16)
    t_samples = n_frames * block
    c += mel_frontend_cost(
        b, t_samples, sr=h_nsf["sampling_rate"], n_fft=h_nsf["n_fft"],
        hop=h_nsf["hop_size"], win=h_nsf["win_size"],
        n_mels=h_nsf["num_mels"], bf16=bool(bf16_min_channels) or bf16,
    )
    mel_frames = t_samples // h_nsf["hop_size"]
    c += nsf_generator_cost(h_nsf, b, mel_frames,
                            bf16_min_channels=bf16_min_channels)
    return c


def train_step_cost(b: int, n_frames: int, block: int, n_unit: int,
                    fft_sizes, *, n_scale: int = 4,
                    bf16: bool = False) -> Cost:
    """One RSS training step (train/solver.py): forward + backward (~2x
    forward for the matmul/conv chain) + the multi-scale loss spectrograms
    (forward + their gradients) + Adam update traffic.

    fft_sizes is the static bucket set (RSSLoss.buckets); the per-step draw
    selects n_scale of them uniformly, so the expected loss cost is
    n_scale * mean-over-buckets."""
    fwd = combsub_cost(b, n_frames, block, n_unit=n_unit, bf16=bf16,
                       fused_spectral=bf16)
    c = 3.0 * fwd
    t_samples = b * n_frames * block
    per_bucket = []
    for n_fft in fft_sizes:
        rows = b * (n_frames * block // n_fft)  # hop == n_fft (SSS loss)
        bins = _pad128(n_fft // 2 + 1)
        # spectrogram fwd for pred+target + bwd for pred, DFT-matmul shapes
        per_bucket.append(
            Cost(3 * 2 * 2.0 * rows * n_fft * bins, 4.0 * rows * n_fft)
        )
    if per_bucket:
        mean = Cost()
        for pc in per_bucket:
            mean += pc
        c += (n_scale / len(per_bucket)) * mean
    c += elemwise(t_samples, 6)
    return c
