"""Quantized matmuls: W4A8 (per-channel / per-group) and W8A8.

These are the TPU equivalents of the reference CUDA GEMMs
(kernels/csrc/qgemm/{w4a8_per_chn,w4a8_per_group,w8a8}/*.cu). The public
functions here are the *semantic contract*, implemented with plain
``jax.lax.dot_general`` over int8 operands — XLA maps int8 x int8 -> int32
contractions straight onto the MXU, and fuses the unpack + epilogue
elementwise work, so this path is already fast; a hand-written Pallas
variant lives in ``omniserve_tpu.ops.pallas.w4a8_matmul`` and is selected by
``omniserve_tpu.ops.dispatch`` when profitable.

Epilogue contracts (see quantization.py for symbol definitions):

- per-channel: out[m,n] = psum[m,n] * s1[n] * a_scale[m]
                          - s1_szero[n] * a_sum[m]
  (reference gemm_cuda.cu:586-593 — the act-sum cancels the weight zero
  point outside the inner loop)
- per-group:   w_i8 = w_u4 * s2 + s2_zero (int8 FMA, reference
  gemm_cuda.cu:278-332), out = psum * s1[n] * a_scale[m]
- w8a8:        out = psum * w_scale[n] * a_scale[m]
  (reference w8a8_gemm_cuda.cu:522-531)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from omniserve_tpu.ops.quantization import (
    QuantizedWeightPerChannel,
    QuantizedWeightPerGroup,
    QuantizedWeightW8,
)

_FORCE_REFERENCE = os.environ.get("OMNISERVE_TPU_DISABLE_PALLAS", "0") == "1"


def _use_pallas(k2: int, n: int, group_size: int = 0) -> bool:
    """Pallas quantized GEMM on TPU when the K/N tiling divides evenly."""
    if _FORCE_REFERENCE:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    from omniserve_tpu.ops.pallas.quant_matmul import _pick_tile

    if group_size > 0:
        if _pick_tile(k2, 512, group_size) is None:
            return False
    elif _pick_tile(k2, 512, 128) is None and _pick_tile(k2, 512, 64) is None:
        return False
    return _pick_tile(n, 256, 128) is not None


def _int8_matmul(a_i8: jnp.ndarray, w_i8: jnp.ndarray) -> jnp.ndarray:
    """[M,K]x[K,N] int8 contraction accumulated in int32 (MXU path)."""
    return jax.lax.dot_general(
        a_i8,
        w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _unpack_halves(qweight: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed [K/2, N] uint8 -> (low [K/2,N], high [K/2,N]) int8 in [0,15]."""
    lo = (qweight & 0xF).astype(jnp.int8)
    hi = (qweight >> 4).astype(jnp.int8)
    return lo, hi


@partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_matmul_per_channel_ref(
    a_i8: jnp.ndarray,        # [M, K] int8
    qweight: jnp.ndarray,     # [K/2, N] uint8 (half-split packed uint4)
    s1_scales: jnp.ndarray,   # [N] f32
    s1_szeros: jnp.ndarray,   # [N] f32
    a_scale: jnp.ndarray,     # [M] f32
    a_sum: jnp.ndarray,       # [M] f32 (scale * int8 row-sum)
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    k2 = qweight.shape[0]
    w_lo, w_hi = _unpack_halves(qweight)
    psum = _int8_matmul(a_i8[:, :k2], w_lo) + _int8_matmul(a_i8[:, k2:], w_hi)
    out = (
        psum.astype(jnp.float32) * s1_scales[None, :] * a_scale[:, None]
        - s1_szeros[None, :] * a_sum[:, None]
    )
    return out.astype(out_dtype)


@partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_matmul_per_group_ref(
    a_i8: jnp.ndarray,        # [M, K] int8
    qweight: jnp.ndarray,     # [K/2, N] uint8
    s1_scales: jnp.ndarray,   # [N] f32
    s2_scales: jnp.ndarray,   # [K/group, N] int8
    s2_zeros: jnp.ndarray,    # [K/group, N] int8
    a_scale: jnp.ndarray,     # [M] f32
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    k2, n = qweight.shape
    k = 2 * k2
    n_groups = k // group_size
    w_u4 = jnp.concatenate(_unpack_halves(qweight), axis=0)  # [K, N] int8
    # Progressive dequant int4 -> int8 (exact by construction; int16 interm
    # avoids overflow of w_u4 * s2 before the zero offset pulls it back).
    w_i8 = (
        w_u4.reshape(n_groups, group_size, n).astype(jnp.int16)
        * s2_scales.astype(jnp.int16)[:, None, :]
        + s2_zeros.astype(jnp.int16)[:, None, :]
    ).astype(jnp.int8).reshape(k, n)
    psum = _int8_matmul(a_i8, w_i8)
    out = psum.astype(jnp.float32) * s1_scales[None, :] * a_scale[:, None]
    return out.astype(out_dtype)


@partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_matmul_ref(
    a_i8: jnp.ndarray,       # [M, K] int8
    qweight: jnp.ndarray,    # [K, N] int8
    w_scales: jnp.ndarray,   # [N] f32
    a_scale: jnp.ndarray,    # [M] f32
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    psum = _int8_matmul(a_i8, qweight)
    out = psum.astype(jnp.float32) * w_scales[None, :] * a_scale[:, None]
    return out.astype(out_dtype)


# -- public entry points: Pallas on TPU (in-VMEM nibble unpack), jnp ref
# elsewhere or when the shape doesn't tile evenly ---------------------------


def w4a8_matmul_per_channel(
    a_i8, qweight, s1_scales, s1_szeros, a_scale, a_sum,
    out_dtype=jnp.bfloat16, layer=None,
):
    """``layer`` (traced) selects a layer of STACKED [L, ...] weights; the
    Pallas path indexes via the BlockSpec (no materialized slice copy),
    the reference path slices."""
    k2, n = qweight.shape[-2:]
    if _use_pallas(k2, n):
        from omniserve_tpu.ops.pallas import quant_matmul

        return quant_matmul.w4a8_matmul_per_channel(
            a_i8, qweight, s1_scales, s1_szeros, a_scale, a_sum,
            out_dtype=out_dtype, layer=layer,
        )
    if layer is not None:
        qweight, s1_scales, s1_szeros = (
            qweight[layer], s1_scales[layer], s1_szeros[layer]
        )
    return w4a8_matmul_per_channel_ref(
        a_i8, qweight, s1_scales, s1_szeros, a_scale, a_sum,
        out_dtype=out_dtype,
    )


def w4a8_matmul_per_group(
    a_i8, qweight, s1_scales, s2_scales, s2_zeros, a_scale,
    group_size=128, out_dtype=jnp.bfloat16, layer=None,
):
    k2, n = qweight.shape[-2:]
    if _use_pallas(k2, n, group_size):
        from omniserve_tpu.ops.pallas import quant_matmul

        return quant_matmul.w4a8_matmul_per_group(
            a_i8, qweight, s1_scales, s2_scales, s2_zeros, a_scale,
            group_size=group_size, out_dtype=out_dtype, layer=layer,
        )
    if layer is not None:
        qweight, s1_scales, s2_scales, s2_zeros = (
            qweight[layer], s1_scales[layer], s2_scales[layer],
            s2_zeros[layer],
        )
    return w4a8_matmul_per_group_ref(
        a_i8, qweight, s1_scales, s2_scales, s2_zeros, a_scale,
        group_size=group_size, out_dtype=out_dtype,
    )


def w8a8_matmul(a_i8, qweight, w_scales, a_scale, out_dtype=jnp.bfloat16,
                layer=None):
    k, n = qweight.shape[-2:]
    if _use_pallas(k // 2, n):
        from omniserve_tpu.ops.pallas import quant_matmul

        return quant_matmul.w8a8_matmul(
            a_i8, qweight, w_scales, a_scale, out_dtype=out_dtype,
            layer=layer,
        )
    if layer is not None:
        qweight, w_scales = qweight[layer], w_scales[layer]
    return w8a8_matmul_ref(a_i8, qweight, w_scales, a_scale,
                           out_dtype=out_dtype)


def quantized_matmul(a_i8, weight, a_scale, a_sum=None, group_size=-1,
                     out_dtype=jnp.bfloat16):
    """Dispatch on the quantized-weight container type."""
    if isinstance(weight, QuantizedWeightPerChannel):
        assert a_sum is not None, "per-channel W4A8 needs act sums"
        return w4a8_matmul_per_channel(
            a_i8, weight.qweight, weight.s1_scales, weight.s1_szeros,
            a_scale, a_sum, out_dtype=out_dtype,
        )
    if isinstance(weight, QuantizedWeightPerGroup):
        return w4a8_matmul_per_group(
            a_i8, weight.qweight, weight.s1_scales, weight.s2_scales,
            weight.s2_zeros, a_scale, group_size=group_size,
            out_dtype=out_dtype,
        )
    if isinstance(weight, QuantizedWeightW8):
        return w8a8_matmul(
            a_i8, weight.qweight, weight.scales, a_scale, out_dtype=out_dtype
        )
    raise TypeError(f"unknown quantized weight type {type(weight)}")
