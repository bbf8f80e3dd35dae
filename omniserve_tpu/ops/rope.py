"""Rotary position embedding (NeoX style; linear + llama3 scaling).

The reference applies RoPE inside its fused KV-update / MMHA kernels
(applyBiasRopeUpdateKVCache.h:279-294); here it's a standalone functional
op applied to q/k before the KV append — XLA fuses it into the surrounding
computation.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def rope_freqs(
    head_dim: int,
    base: float = 10000.0,
    scaling_factor: float = 1.0,
    llama3_cfg: Optional[Tuple[float, float, float, float]] = None,
) -> jnp.ndarray:
    """Inverse frequencies [head_dim/2].

    ``llama3_cfg`` = (factor, low_freq_factor, high_freq_factor,
    original_max_position): the Llama-3.1 context-extension remap — long
    wavelengths scale by 1/factor, short wavelengths stay, the band
    between interpolates (HF modeling_rope_utils._compute_llama3_*)."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (base ** exponents)
    if llama3_cfg is not None:
        factor, low_f, high_f, orig_max = llama3_cfg
        low_wavelen = orig_max / low_f
        high_wavelen = orig_max / high_f
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < high_wavelen, inv_freq,
            jnp.where(wavelen > low_wavelen, inv_freq / factor, mid),
        )
    return inv_freq / scaling_factor


def apply_rope(
    x: jnp.ndarray,           # [..., T, H, D] or [T, H, D]
    positions: jnp.ndarray,   # [..., T] int32
    inv_freq: jnp.ndarray,    # [D/2]
) -> jnp.ndarray:
    """NeoX-style rotation: first half paired with second half of the dim."""
    dtype = x.dtype
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..,T,D/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, D/2]
    sin = jnp.sin(angles)[..., None, :]
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(dtype)
