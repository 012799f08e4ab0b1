"""PCmer: conformer-performer control-network backbone.

Capability parity with /root/reference/ddsp/pcmer.py: a stack of layers, each
    x = x + FastAttention(LayerNorm(x));  x = x + ConformerConvModule(x)
where FastAttention is Performer FAVOR+ (softmax kernel with a Gaussian
orthogonal random projection, dim_head=64, nb_features=int(64*ln 64)=266) and
the conv module is LN -> pointwise(2x expansion) -> GLU -> depthwise k31
(optionally causal) -> SiLU -> pointwise.

TPU-native notes:
  - The non-causal linear attention is three einsums — pure MXU work.
  - The causal variant replaces the reference's CUDA `CausalDotProduct`
    (pcmer.py:8,176-188) with a *chunked prefix scan*: per chunk of C frames
    we do two CxC / Cxm matmuls plus a carried (m x d) state update — all MXU
    ops, sequential only across T/C steps (lax.scan). See
    `causal_linear_attention`.
  - The random projection is drawn once, deterministically from a per-layer
    seed, and baked into the graph as a constant (the reference's
    redraw_projection_matrix is never called during training either —
    pcmer.py:203-207). Redraw = rebuild the module with a new seed.
  - Mixed precision: `compute_dtype=jnp.bfloat16` runs the matmuls (QKV/out
    projections, random-feature projection, attention contractions, conv
    module) in bf16 on the MXU while keeping every numerically sensitive
    piece in fp32: LayerNorms, the FAVOR+ exponentials, attention
    denominators, the causal scan's carried prefix state, and the residual
    stream. Params always stay fp32 (flax `dtype` casts at apply time only).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, glu


def gaussian_orthogonal_random_matrix(
    nb_rows: int, nb_columns: int, seed: int
) -> np.ndarray:
    """Orthogonal random feature projection (Performer; pcmer.py:93-120).

    Blocks of QR-orthogonalized Gaussian matrices, rescaled so row norms are
    chi-distributed like an unstructured Gaussian (scaling=0 mode).
    """
    rng = np.random.default_rng(seed)
    blocks = []
    n_full = nb_rows // nb_columns
    for _ in range(n_full):
        q, _ = np.linalg.qr(rng.standard_normal((nb_columns, nb_columns)))
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_columns
    if rem > 0:
        q, _ = np.linalg.qr(rng.standard_normal((nb_columns, nb_columns)))
        blocks.append(q.T[:rem])
    final = np.concatenate(blocks, axis=0)
    multiplier = np.linalg.norm(
        rng.standard_normal((nb_rows, nb_columns)), axis=1
    )
    return (np.diag(multiplier) @ final).astype(np.float32)


def softmax_kernel(
    data: jnp.ndarray,
    projection: jnp.ndarray,
    is_query: bool,
    normalize_data: bool = True,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """FAVOR+ positive softmax features (pcmer.py:123-159).

    data :: (B, H, T, d); projection :: (m, d) -> (B, H, T, m)
    """
    d = data.shape[-1]
    out_dtype = data.dtype
    data_normalizer = d ** -0.25 if normalize_data else 1.0
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum(
        "bhid,jd->bhij", data_normalizer * data, projection.astype(data.dtype)
    )
    # exponentials and their stabilization always run in fp32 (a bf16
    # compute dtype only affects the projection matmul above)
    data_dash = data_dash.astype(jnp.float32)
    data32 = data.astype(jnp.float32)
    diag_data = jnp.sum(data32 * data32, axis=-1) * 0.5 * (data_normalizer ** 2)
    diag_data = diag_data[..., None]
    if is_query:
        out = ratio * (
            jnp.exp(
                data_dash
                - diag_data
                - jnp.max(data_dash, axis=-1, keepdims=True)
            )
            + eps
        )
    else:
        out = ratio * jnp.exp(data_dash - diag_data + eps)
    return out.astype(out_dtype)


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Non-causal linear attention (pcmer.py:69-77). q,k :: (B,H,T,m); v :: (B,H,T,d)."""
    k_sum = jnp.sum(k.astype(jnp.float32), axis=-2)
    d_inv = 1.0 / (
        jnp.einsum("...nd,...d->...n", q.astype(jnp.float32), k_sum) + 1e-8
    )
    context = jnp.einsum("...nd,...ne->...de", k, v)
    return jnp.einsum(
        "...de,...nd,...n->...ne", context, q, d_inv.astype(q.dtype)
    )


def causal_linear_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, chunk: int = 128, eps: float = 1e-6
) -> jnp.ndarray:
    """Causal linear attention as a chunked prefix scan (TPU replacement for
    the reference's CUDA CausalDotProduct, pcmer.py:170-188).

    out[t] = (q[t] @ S_t) / (q[t] . K_t),  S_t = sum_{s<=t} k[s] v[s]^T,
    K_t = cumsum(k)[t] + eps.

    Within a chunk the causal interaction is a masked (C x C) matmul; across
    chunks a (m x d) state and an (m,) key-sum are carried — the only
    sequential dependency, which also makes time-axis sharding cheap (the
    carried state is a single m x d matrix per head; cf. SURVEY §2.3).
    """
    b, h, t, m = q.shape
    d = v.shape[-1]
    pad = (-t) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_chunks = q.shape[2] // chunk
    qc = q.reshape(b, h, n_chunks, chunk, m).transpose(2, 0, 1, 3, 4)
    kc = k.reshape(b, h, n_chunks, chunk, m).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)

    causal_mask = jnp.tril(jnp.ones((chunk, chunk), dtype=q.dtype))

    def body(carry, inp):
        # the carried prefix state and key-sum accumulate in fp32 even under
        # a bf16 compute dtype: they grow with T and bf16's 8-bit mantissa
        # would drop late contributions
        s_prev, ksum_prev = carry  # (B,H,m,d), (B,H,m) fp32
        qi, ki, vi = inp
        attn = jnp.einsum("bhim,bhjm->bhij", qi, ki) * causal_mask
        num = jnp.einsum("bhij,bhjd->bhid", attn, vi) + jnp.einsum(
            "bhim,bhmd->bhid", qi, s_prev.astype(qi.dtype)
        )
        k_cum = (
            jnp.cumsum(ki.astype(jnp.float32), axis=-2)
            + ksum_prev[:, :, None, :]
        )
        denom = jnp.einsum(
            "bhim,bhim->bhi", qi.astype(jnp.float32), k_cum + eps
        )
        # chunk-padding guard: padded tail positions have q == k == 0, so
        # denom == 0 there. The raw 0/0 is sliced away in the forward, but
        # the division VJP (-num*g/denom^2) would still emit NaN gradients
        # (a tiny clamp does not help: clamp^2 underflows fp32 to 0). Route
        # padded positions through a benign denominator instead — real
        # positions always have denom > 0 (FAVOR+ features are positive).
        safe = jnp.where(denom > 0, denom, 1.0)
        out = (num.astype(jnp.float32) / safe[..., None]).astype(qi.dtype)
        s_new = s_prev + jnp.einsum("bhjm,bhjd->bhmd", ki, vi).astype(
            jnp.float32
        )
        ksum_new = ksum_prev + jnp.sum(ki.astype(jnp.float32), axis=-2)
        return (s_new, ksum_new), out

    init = (
        jnp.zeros((b, h, m, d), dtype=jnp.float32),
        jnp.zeros((b, h, m), dtype=jnp.float32),
    )
    _, outs = jax.lax.scan(body, init, (qc, kc, vc))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, -1, d)
    return out[:, :, :t, :]


class SelfAttention(nn.Module):
    """Multi-head Performer self-attention (pcmer.py:221-251)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    proj_seed: int = 0
    compute_dtype: object = None
    # Fuse FAVOR+ features + linear attention into one Pallas pass at
    # inference (performer_attention_pallas): the (B, H, T, m) feature
    # tensors never round-trip HBM. Training keeps the XLA formulation (and
    # its full-precision gradients); "force" runs interpret off-TPU (tests).
    fused_attention: object = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, infer: bool = False,
                 valid_frames=None) -> jnp.ndarray:
        """valid_frames (traced scalar or per-item (B,) vector): mask key
        features beyond each segment's first N frames so bucket-padded
        inference attends exactly as the reference does at the true length
        (pad keys contribute to neither the numerator k'v sums nor the
        denominator k' sums)."""
        in_dtype = x.dtype
        inner = self.dim_head * self.heads
        nb_features = int(self.dim_head * math.log(self.dim_head))
        # The projection lives in the 'constants' collection: excluded from
        # the optimizer, injectable by weight converters / redraw utilities.
        proj_var = self.variable(
            "constants",
            "projection",
            lambda: jnp.asarray(
                gaussian_orthogonal_random_matrix(
                    nb_features, self.dim_head, seed=self.proj_seed
                )
            ),
        )
        projection = proj_var.value
        q = nn.Dense(inner, name="to_q", dtype=self.compute_dtype)(x)
        k = nn.Dense(inner, name="to_k", dtype=self.compute_dtype)(x)
        v = nn.Dense(inner, name="to_v", dtype=self.compute_dtype)(x)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        if self._use_fused(infer, q.shape[2]):
            from ..ops.pallas_kernels import performer_attention_pallas

            out = performer_attention_pallas(
                q, k, v, projection,
                mxu_bf16=self.compute_dtype == jnp.bfloat16,
                interpret=self.fused_attention == "force",
                valid_frames=valid_frames,
            ).astype(q.dtype)
        else:
            q = softmax_kernel(q, projection, is_query=True)
            k = softmax_kernel(k, projection, is_query=False)
            if valid_frames is not None:
                from ..ops.masking import frame_mask

                mask = frame_mask(k.shape[2], valid_frames, k.dtype)
                k = k * mask[:, None, :, None]
            if self.causal:
                out = causal_linear_attention(q, k, v)
            else:
                out = linear_attention(q, k, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(self.dim, name="to_out", dtype=self.compute_dtype)(out)
        return out.astype(in_dtype)

    def _use_fused(self, infer: bool, t: int) -> bool:
        if not (self.fused_attention and infer) or self.causal:
            return False
        if t % 128 != 0 or self.dim_head % 8 != 0:
            return False
        # the kernel holds a whole (H, d, T) row plus per-head (m_pad, T)
        # intermediates in VMEM (~14 KB x T at the 8-head/64-dim PCmer):
        # long offline segments (power-of-two buckets beyond 512 frames)
        # would exceed ~16 MB VMEM, so they fall back to the XLA path
        if t > 512:
            return False
        if self.fused_attention == "force":
            return True
        return jax.default_backend() not in ("cpu", "gpu")


class ConformerConvModule(nn.Module):
    """LN -> pointwise x2 -> GLU -> depthwise k31 -> SiLU -> pointwise
    (pcmer.py:42-63)."""

    dim: int
    causal: bool = False
    expansion_factor: int = 2
    kernel_size: int = 31
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
        in_dtype = x.dtype
        inner = self.dim * self.expansion_factor
        x = nn.LayerNorm(epsilon=1e-5)(x)  # stats in fp32
        x = nn.Dense(inner * 2, dtype=self.compute_dtype)(x)
        x = glu(x, axis=-1)
        if valid_frames is not None:
            # zero pad frames so the depthwise conv sees exactly the zeros
            # the reference's own boundary padding provides at true length
            from ..ops.masking import frame_mask

            mask = frame_mask(x.shape[1], valid_frames, x.dtype)
            x = x * mask[:, :, None]
        x = Conv1d(
            inner, self.kernel_size, causal=self.causal, groups=inner,
            dtype=self.compute_dtype,
        )(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.compute_dtype)(x)
        return x.astype(in_dtype)


class PCmerLayer(nn.Module):
    """One conformer-performer encoder layer (pcmer.py:20-38)."""

    dim: int
    heads: int
    causal: bool = False
    proj_seed: int = 0
    compute_dtype: object = None
    fused_attention: object = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, infer: bool = False,
                 valid_frames=None) -> jnp.ndarray:
        x = x + SelfAttention(
            dim=self.dim,
            heads=self.heads,
            causal=self.causal,
            proj_seed=self.proj_seed,
            compute_dtype=self.compute_dtype,
            fused_attention=self.fused_attention,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, name="norm")(x), infer=infer,
          valid_frames=valid_frames)
        x = x + ConformerConvModule(
            dim=self.dim, causal=self.causal,
            compute_dtype=self.compute_dtype, name="conv"
        )(x, valid_frames=valid_frames)
        return x


class PCmer(nn.Module):
    """Stack of PCmer layers (pcmer.py:11-17)."""

    num_layers: int
    num_heads: int
    dim_model: int
    causal: bool = False
    compute_dtype: object = None  # e.g. jnp.bfloat16; residuals stay fp32
    fused_attention: object = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, infer: bool = False,
                 valid_frames=None) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = PCmerLayer(
                dim=self.dim_model,
                heads=self.num_heads,
                causal=self.causal,
                proj_seed=i,
                compute_dtype=self.compute_dtype,
                fused_attention=self.fused_attention,
                name=f"layer_{i}",
            )(x, infer=infer, valid_frames=valid_frames)
        return x
