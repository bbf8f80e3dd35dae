"""QoQ quantization library (weights, activations, KV cache).

Numerical contracts copied exactly from the reference (the TPU build must
reproduce QServe's perplexity deltas):

- W4 per-channel: ``w_u4 = round(W / s1) + zp`` in [0,15]; stored scale
  ``s1`` and *scaled* zero ``s1_szero = zp * s1`` (reference
  w4a8_linear.py:285-337). GEMM epilogue:
  ``out = psum * s1 * a_scale - s1_szero * a_sum``, where ``a_sum`` is the
  per-token sum of the *dequantized* int8 activations — the act-sum trick
  cancels the weight zero point without per-element subtraction (reference
  kernels/csrc/qgemm/w4a8_per_chn/gemm_cuda.cu:586-593).
- W4 per-group (g128, "progressive"): stage 1 ``w_i8 = round(W / s1)`` in
  int8; stage 2 ``w_u4 = w_i8 / s2 + zp`` in [0,15] with int8 ``s2`` and
  stored ``s2_zero = -zp * s2`` so the in-kernel dequant is a single int8
  FMA ``w_i8 = w_u4 * s2 + s2_zero`` (reference w4a8_linear.py:199-282,
  gemm_cuda.cu:278-332). Epilogue: ``out = psum * s1 * a_scale``.
- W8 per-channel symmetric: ``w_i8 = round(W / s1)``.
- A8 per-token symmetric: ``a_i8 = round(x * 127 / amax)``.
- KV fine-grained (per-token-per-head asymmetric):
  ``scale = (max - min) / L``, ``zero = -L * min / (max - min)``,
  ``q = round(x / scale + zero)`` in [0, L], L = 15 (kv4) / 255 (kv8)
  (reference applyBiasRopeUpdateKVCache.h:355-369).
- KV per-tensor: symmetric with a calibrated scale, signed values.

Rounding everywhere is round-half-even (jnp.rint), matching torch.round_
used by the reference converter (SURVEY.md §7.3).

TPU packing (replaces the reference's tensor-core interleave,
w4a8_linear.py:199-231): 4-bit values are packed two-per-byte with a
HALF-SPLIT along the reduction axis — byte[k, n] holds w[k, n] in the low
nibble and w[k + K/2, n] in the high nibble. Unpacking yields two
*contiguous* [K/2, N] int8 blocks, so the matmul is
``a[:, :K/2] @ low + a[:, K/2:] @ high`` with no lane interleave. KV int4
uses the same trick along the token axis of a page.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

INT4_LEVELS = 15
INT8_LEVELS = 255
EPS = 1e-8


def _rint(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.rint(x)


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------


class QuantizedWeightPerChannel(NamedTuple):
    """W4 per-channel: packed uint4 weights + fp scale/scaled-zero per OC."""

    qweight: jnp.ndarray   # [K/2, N] uint8, half-split packed, K=IC, N=OC
    s1_scales: jnp.ndarray  # [N] float32
    s1_szeros: jnp.ndarray  # [N] float32 (= zero_point * s1)


class QuantizedWeightPerGroup(NamedTuple):
    """W4 per-group: packed uint4 + int8 second-level scale/zero per group."""

    qweight: jnp.ndarray    # [K/2, N] uint8
    s1_scales: jnp.ndarray  # [N] float32
    s2_scales: jnp.ndarray  # [K/group, N] int8
    s2_zeros: jnp.ndarray   # [K/group, N] int8 (= -zp * s2)


class QuantizedWeightW8(NamedTuple):
    qweight: jnp.ndarray    # [K, N] int8
    scales: jnp.ndarray     # [N] float32


def pack_int4(w_u4: jnp.ndarray, axis: int = 0, shards: int = 1) -> jnp.ndarray:
    """Half-split nibble packing along ``axis`` (even size required).

    byte[i] = w[i] | (w[i + n/2] << 4), i < n/2.

    ``shards > 1`` applies the half-split independently within each of
    ``shards`` contiguous blocks, so that a tensor-parallel row shard of the
    packed array unpacks to exactly its contiguous slice of original rows
    (each rank then runs the ordinary unpack on its local block).
    """
    n = w_u4.shape[axis]
    assert n % (2 * shards) == 0, f"pack axis {n} not divisible by 2*{shards}"
    if shards > 1:
        block = n // shards
        parts = [
            pack_int4(
                jnp.take(w_u4, jnp.arange(r * block, (r + 1) * block),
                         axis=axis),
                axis=axis,
            )
            for r in range(shards)
        ]
        return jnp.concatenate(parts, axis=axis)
    lo = jnp.take(w_u4, jnp.arange(n // 2), axis=axis).astype(jnp.uint8)
    hi = jnp.take(w_u4, jnp.arange(n // 2, n), axis=axis).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(packed: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: [.., n/2, ..] uint8 -> [.., n, ..] int8."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=axis)


def quantize_weight_per_channel(
    w: jnp.ndarray,
    s1_scales: Optional[jnp.ndarray] = None,
    zeros: Optional[jnp.ndarray] = None,
    k_shards: int = 1,
) -> QuantizedWeightPerChannel:
    """Quantize fp weight [N(out), K(in)] to uint4 per-output-channel.

    If scales/zeros are given (DeepCompressor calibration), they are used
    verbatim; otherwise asymmetric min/max quantization params are derived.
    ``zeros`` is the INTEGER zero point (the converter scales it).
    """
    w = w.astype(jnp.float32)
    n_out, k_in = w.shape
    if s1_scales is None:
        w_max = w.max(axis=1)
        w_min = w.min(axis=1)
        s1_scales = jnp.maximum((w_max - w_min) / INT4_LEVELS, EPS)
        zeros = jnp.clip(_rint(-w_min / s1_scales), 0, INT4_LEVELS)
    assert zeros is not None
    w_u4 = _rint(w / s1_scales[:, None]) + zeros[:, None]
    w_u4 = jnp.clip(w_u4, 0, INT4_LEVELS).astype(jnp.uint8)
    # [N, K] -> [K, N] -> packed [K/2, N]
    qweight = pack_int4(w_u4.T, axis=0, shards=k_shards)
    return QuantizedWeightPerChannel(
        qweight=qweight,
        s1_scales=s1_scales.astype(jnp.float32),
        s1_szeros=(zeros * s1_scales).astype(jnp.float32),
    )


def quantize_weight_per_group(
    w: jnp.ndarray,
    group_size: int = 128,
    s1_scales: Optional[jnp.ndarray] = None,
    s2_scales: Optional[jnp.ndarray] = None,
    zeros: Optional[jnp.ndarray] = None,
    k_shards: int = 1,
) -> QuantizedWeightPerGroup:
    """Progressive W4 quantization of fp weight [N(out), K(in)].

    Stage 1: int8 per-channel; stage 2: uint4 per group of ``group_size``
    input channels with int8 scales. When calibration params are not given,
    they are derived (stage-1 symmetric amax, stage-2 asymmetric min/max on
    the int8 values with integer scales).
    """
    w = w.astype(jnp.float32)
    n_out, k_in = w.shape
    assert k_in % group_size == 0
    n_groups = k_in // group_size
    if s1_scales is None:
        # Leave stage-2 headroom: the int8 grid must absorb the grouped
        # uint4 reconstruction, so target ~119 like DeepCompressor.
        s1_scales = jnp.maximum(jnp.abs(w).max(axis=1) / 119.0, EPS)
    w_i8 = _rint(w / s1_scales[:, None])
    w_i8 = jnp.clip(w_i8, -128, 127)
    wg = w_i8.reshape(n_out, n_groups, group_size)
    if s2_scales is None:
        g_max = wg.max(axis=2)
        g_min = wg.min(axis=2)
        s2_scales = jnp.ceil(jnp.maximum((g_max - g_min) / INT4_LEVELS, 1.0))
        zeros = jnp.clip(_rint(-g_min / s2_scales), 0, INT4_LEVELS)
        # The stored plane is -zeros * s2 in INT8: cap zeros so the
        # product cannot wrap when a caller-provided s1 left no stage-2
        # headroom (w_i8 spanning the full +-128 derives s2 up to 17 and
        # zeros*s2 up to 136 -> int8 wrap = values off by 256). The
        # derived-s1 path (119 target) never hits this cap.
        zeros = jnp.minimum(zeros, jnp.floor(127.0 / s2_scales))
    assert zeros is not None and s2_scales is not None
    w_u4 = _rint(wg / s2_scales[..., None]) + zeros[..., None]
    w_u4 = jnp.clip(w_u4, 0, INT4_LEVELS).astype(jnp.uint8)
    w_u4 = w_u4.reshape(n_out, k_in)
    qweight = pack_int4(w_u4.T, axis=0, shards=k_shards)
    # Layout [K/group, N] so the kernel indexes groups along the K axis.
    s2_scales_kn = s2_scales.T.astype(jnp.int8)
    s2_zeros_kn = (-zeros * s2_scales).T.astype(jnp.int8)
    return QuantizedWeightPerGroup(
        qweight=qweight,
        s1_scales=s1_scales.astype(jnp.float32),
        s2_scales=s2_scales_kn,
        s2_zeros=s2_zeros_kn,
    )


def quantize_weight_w8(
    w: jnp.ndarray, scales: Optional[jnp.ndarray] = None
) -> QuantizedWeightW8:
    """Symmetric per-channel int8 weight quantization of [N, K]."""
    w = w.astype(jnp.float32)
    if scales is None:
        scales = jnp.maximum(jnp.abs(w).max(axis=1) / 127.0, EPS)
    w_i8 = jnp.clip(_rint(w / scales[:, None]), -128, 127).astype(jnp.int8)
    return QuantizedWeightW8(qweight=w_i8.T, scales=scales.astype(jnp.float32))


# -- dequant references (for tests and the jnp fallback matmuls) -----------


def dequantize_per_channel(q: QuantizedWeightPerChannel) -> jnp.ndarray:
    """Reconstruct fp weight [K, N] from per-channel quantized form."""
    w_u4 = unpack_int4(q.qweight, axis=0).astype(jnp.float32)
    return w_u4 * q.s1_scales[None, :] - q.s1_szeros[None, :]


def dequantize_per_group(
    q: QuantizedWeightPerGroup, group_size: int
) -> jnp.ndarray:
    """Reconstruct fp weight [K, N] from per-group quantized form."""
    w_u4 = unpack_int4(q.qweight, axis=0).astype(jnp.int32)
    k_in, n_out = w_u4.shape
    n_groups = q.s2_scales.shape[0]
    w_u4 = w_u4.reshape(n_groups, group_size, n_out)
    w_i8 = (
        w_u4 * q.s2_scales.astype(jnp.int32)[:, None, :]
        + q.s2_zeros.astype(jnp.int32)[:, None, :]
    )
    return w_i8.reshape(k_in, n_out).astype(jnp.float32) * q.s1_scales[None, :]


# ---------------------------------------------------------------------------
# Activation quantization (per-token symmetric int8)
# ---------------------------------------------------------------------------


def quantize_activations(
    x: jnp.ndarray, fuse_sum: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-token int8 quant: returns (a_i8 [M,K], scale [M], sum [M]|None).

    ``sum`` is the per-token sum of the dequantized int8 values
    (``scale * int_sum``) — exact cancellation for the per-channel zero-point
    trick. Reference: kernels/csrc/fused_kernels.cu invoke_quant(_fuse_sum).
    """
    x = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.abs(x).max(axis=-1), EPS)
    scale = amax / 127.0
    a_i8 = jnp.clip(_rint(x / scale[..., None]), -128, 127).astype(jnp.int8)
    a_sum = None
    if fuse_sum:
        a_sum = a_i8.astype(jnp.float32).sum(axis=-1) * scale
    return a_i8, scale, a_sum


# ---------------------------------------------------------------------------
# KV cache quantization
# ---------------------------------------------------------------------------


def kv_quant_params_fine_grained(
    x: jnp.ndarray, bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Asymmetric per-vector quant params over the last axis.

    scale = (max - min) / L, zero = -L * min / (max - min) (= -min/scale),
    matching applyBiasRopeUpdateKVCache.h:355-369.
    """
    levels = INT4_LEVELS if bits == 4 else INT8_LEVELS
    x = x.astype(jnp.float32)
    x_max = x.max(axis=-1)
    x_min = x.min(axis=-1)
    rng = jnp.maximum(x_max - x_min, EPS)
    scale = rng / levels
    zero = -levels * x_min / rng
    return scale, zero


def kv_quantize_fine_grained(
    x: jnp.ndarray, bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize [..., D] to unsigned ints with per-vector scale/zero."""
    levels = INT4_LEVELS if bits == 4 else INT8_LEVELS
    scale, zero = kv_quant_params_fine_grained(x, bits)
    q = _rint(x.astype(jnp.float32) / scale[..., None] + zero[..., None])
    q = jnp.clip(q, 0, levels).astype(jnp.uint8)
    return q, scale, zero


def kv_dequantize_fine_grained(
    q: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray
) -> jnp.ndarray:
    return (q.astype(jnp.float32) - zero[..., None]) * scale[..., None]


def kv_quantize_per_tensor(x: jnp.ndarray, scale, bits: int) -> jnp.ndarray:
    """Symmetric per-tensor quant with a calibrated scale (signed storage,

    biased to unsigned so int4 packing stays uniform: stored = q + 2^(b-1)).
    """
    qmax = 7 if bits == 4 else 127
    q = jnp.clip(_rint(x.astype(jnp.float32) / scale), -qmax - 1, qmax)
    return (q + (qmax + 1)).astype(jnp.uint8)


def kv_dequantize_per_tensor(q: jnp.ndarray, scale, bits: int) -> jnp.ndarray:
    qmax = 7 if bits == 4 else 127
    return (q.astype(jnp.float32) - (qmax + 1)) * scale
