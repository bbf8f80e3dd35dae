"""Sequence parallelism: flash-decoding across chips.

The reference has no sequence parallelism (single-GPU, SURVEY §2.5); for
long-context TPU serving we add it natively: KV pages are sharded over the
``sequence`` mesh axis, every rank runs decode attention over its LOCAL
token window (ops/attention_ref.paged_decode_attention with
``return_lse=True``), and the partial results merge with a log-sum-exp
combine over the axis — the cross-chip analogue of the in-chip chunked
online softmax in ops/pallas/paged_attention.py.

Contract for the partials (see attention_ref._sdpa):
  out  [B, Hq, D]  locally-normalized attention output
  m    [B, Hq]     masked row max of the local scores (NEG_INF if empty)
  l    [B, Hq]     sum exp(score - m) over local keys (0 if empty)
Ranks whose window holds no valid keys contribute weight
l * exp(m - m*) = 0, so uneven splits (and empty tails) are a no-op.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from omniserve_tpu.parallel.mesh import SEQ_AXIS


def sp_combine(
    out: jnp.ndarray,   # [B, Hq, D] locally-normalized partial output
    m: jnp.ndarray,     # [B, Hq] local max score
    l: jnp.ndarray,     # [B, Hq] local sum exp(score - m)
    axis: str = SEQ_AXIS,
) -> jnp.ndarray:
    """Merge per-rank partial attention over a mesh axis (inside shard_map).

    out* = sum_r(out_r * l_r * exp(m_r - m*)) / sum_r(l_r * exp(m_r - m*))
    with m* = max_r m_r — numerically the same merge flash-decoding does
    between split-K blocks, but with psum/pmax collectives riding ICI.
    """
    m_star = jax.lax.pmax(m, axis)
    w = l * jnp.exp(m - m_star)                      # [B, Hq]
    num = jax.lax.psum(out.astype(jnp.float32) * w[..., None], axis)
    den = jax.lax.psum(w, axis)
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(out.dtype)


def sequence_parallel_decode_attention(
    q: jnp.ndarray,                 # [B, Hq, D] (replicated over sequence)
    pool,                           # local KVPool shard (this rank's pages)
    layer: int,
    block_tables: jnp.ndarray,      # [B, max_blocks] LOCAL page ids
    local_context_lens: jnp.ndarray,  # [B] tokens held by THIS rank
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    axis: str = SEQ_AXIS,
    **attn_kwargs,
) -> jnp.ndarray:
    """Decode attention with the KV cache sharded over ``axis``.

    Call inside shard_map: each rank owns a contiguous token window of the
    sequence (rank r holds tokens [r*W, r*W + local_context_lens)), its
    block tables index only local pages, and queries are replicated.
    RoPE is position-absolute so no per-rank adjustment is needed — keys
    were rotated at append time with global positions.
    """
    from omniserve_tpu.ops.attention_ref import paged_decode_attention

    out, m, l = paged_decode_attention(
        q, pool, layer, block_tables, local_context_lens, sm_scale,
        page_size, kv_bits, kv_zeros, return_lse=True, **attn_kwargs,
    )
    return sp_combine(out, m, l, axis)
