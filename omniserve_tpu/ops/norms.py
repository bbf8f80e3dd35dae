"""RMSNorm variants, incl. fused per-token int8 output quantization.

TPU equivalents of the reference ``layernorm_ops`` extension
(kernels/csrc/layernorm_kernels.cu): ``rms_norm`` (:409),
``rms_norm_general`` = RMSNorm fused with per-token quant (:432-469),
``rms_norm_general_fuse_sum`` (+ per-token act sums, :471-516), and the
fused dequant-add-residual-rmsnorm-quant used between layers (:517-563).

Written as plain jnp: XLA fuses the whole chain into one VPU pass over the
row, which is what the CUDA kernels do by hand. (Pallas not needed here —
these are bandwidth-bound elementwise ops that fuse into neighbors.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from omniserve_tpu.ops.quantization import quantize_activations


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Plain RMSNorm over the last axis."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def rms_norm_quant(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 1e-6,
    fuse_sum: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """RMSNorm fused with per-token int8 quant (+ optional act sums).

    Returns (x_i8 [M,K], scale [M], sum [M] or None).
    """
    normed = rms_norm(x.astype(jnp.float32), weight, eps)
    return quantize_activations(normed, fuse_sum=fuse_sum)


def add_residual_rms_norm_quant(
    x: jnp.ndarray,
    residual: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 1e-6,
    fuse_sum: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused residual-add + RMSNorm + per-token quant.

    Returns (new_residual, x_i8, scale, sum|None); ``new_residual`` is
    ``x + residual`` in the residual dtype (fed to the next layer's add).
    """
    new_residual = (x.astype(jnp.float32) + residual.astype(jnp.float32))
    x_i8, scale, a_sum = rms_norm_quant(
        new_residual, weight, eps, fuse_sum=fuse_sum
    )
    return new_residual.astype(residual.dtype), x_i8, scale, a_sum
