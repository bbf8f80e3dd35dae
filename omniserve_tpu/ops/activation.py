"""Activation functions, incl. SwiGLU fused with int8 output quantization.

TPU equivalents of the reference ``activation_ops`` extension
(kernels/csrc/activation_kernels.cu): ``silu_and_mul`` (:17-33) and the
fused dequant-silu-mul-quant used inside the quantized MLP (:34-133).
Plain jnp — XLA fuses these into single VPU passes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from omniserve_tpu.ops.quantization import quantize_activations


def silu_and_mul(gate_up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU on a fused [..., 2*D] gate_up projection: silu(gate) * up."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)


def silu_and_mul_quant(
    gate_up: jnp.ndarray, fuse_sum: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """SwiGLU fused with per-token int8 quant (+ optional act sums)."""
    return quantize_activations(silu_and_mul(gate_up), fuse_sum=fuse_sum)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


ACTIVATION_REGISTRY = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
}
