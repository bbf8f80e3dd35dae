"""Paged, quantized KV cache: pool layout + append/update ops.

TPU-native replacement for the reference's byte-offset page layout
(worker/cache_engine.py:73-88) and the fused RoPE+quant+append CUDA kernels
(fine_grained_common/applyBiasRopeUpdateKVCache.h:300-500,
sparse_utils/ContextPool/context_pool_kernel.cu:17-95): instead of a blob
with scales at the page tail, each quantity is its own named array, indexed
by physical page id. One page id indexes EVERY layer's pool (leading layer
axis), mirroring the reference's per-layer pools sharing one block table.

Pool layout (per pool — retrieval or streaming):

- kv4 (packed):  data  [L, P, H, page/2, D] uint8 — token t of a page lives
  in row t % (page/2); low nibble holds tokens [0, page/2), high nibble
  [page/2, page) (same half-split trick as the weight packing: unpack gives
  two contiguous token blocks, no lane interleave).
- kv8:           data  [L, P, H, page, D] uint8 (biased +128 for per-tensor)
- kv16:          data  [L, P, H, page, D] bfloat16 (no scales)
- fine-grained scales/zeros: [L, P, H, page] float32 each
- K min/max sub-chunk stats (retrieval pool, sparse decode):
  [L, P, H, n_sub, 2, D] bfloat16 — stats[..., 0, :]=min, [..., 1, :]=max.

All updates are functional (jnp scatter); the engine jit-donates the pool
arrays so XLA performs them in place.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omniserve_tpu.ops.quantization import (
    kv_quantize_fine_grained,
    kv_quantize_per_tensor,
)


class KVPool(NamedTuple):
    """One KV pool (all layers). Optional fields are None when unused."""

    k_data: jnp.ndarray
    v_data: jnp.ndarray
    k_scale: Optional[jnp.ndarray]  # fine-grained [L,P,H,page] or None
    k_zero: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    v_zero: Optional[jnp.ndarray]
    k_stats: Optional[jnp.ndarray]  # [L,P,H,n_sub,2,D] or None
    # per-tensor calibrated scales [L] (None in fine-grained/kv16 modes)
    k_scale_per_tensor: Optional[jnp.ndarray]
    v_scale_per_tensor: Optional[jnp.ndarray]

    @property
    def kv_bits(self) -> int:
        if self.k_data.dtype == jnp.bfloat16:
            return 16
        # packed int4 halves the token rows
        page_rows = self.k_data.shape[3]
        scale_rows = (
            self.k_scale.shape[3] if self.k_scale is not None else None
        )
        if scale_rows is not None and page_rows * 2 == scale_rows:
            return 4
        if self.k_scale is None and self.k_scale_per_tensor is not None:
            # per-tensor: compare against stats/page constant is unavailable;
            # encode int4 as half rows of v_data too
            return 4 if page_rows * 2 == self.v_data.shape[3] * 2 else 8
        return 8 if scale_rows == page_rows else 4

    @property
    def num_layers(self) -> int:
        return self.k_data.shape[0]

    @property
    def num_pages(self) -> int:
        return self.k_data.shape[1]

    @property
    def num_heads(self) -> int:
        return self.k_data.shape[2]


def make_kv_pool(
    num_layers: int,
    num_pages: int,
    num_heads: int,
    page_size: int,
    head_dim: int,
    kv_bits: int = 4,
    kv_zeros: bool = True,
    with_stats: bool = False,
    sub_chunks: int = 4,
    k_scale_per_tensor: Optional[jnp.ndarray] = None,
    v_scale_per_tensor: Optional[jnp.ndarray] = None,
) -> KVPool:
    L, P, H, D = num_layers, num_pages, num_heads, head_dim
    if kv_bits == 16:
        data_shape = (L, P, H, page_size, D)
        data_dtype = jnp.bfloat16
    elif kv_bits == 8:
        data_shape = (L, P, H, page_size, D)
        data_dtype = jnp.uint8
    elif kv_bits == 4:
        assert page_size % 2 == 0
        data_shape = (L, P, H, page_size // 2, D)
        data_dtype = jnp.uint8
    else:
        raise ValueError(f"kv_bits must be 4/8/16, got {kv_bits}")
    k_data = jnp.zeros(data_shape, data_dtype)
    v_data = jnp.zeros(data_shape, data_dtype)
    fine_grained = kv_bits < 16 and kv_zeros
    scale = (
        jnp.zeros((L, P, H, page_size), jnp.float32) if fine_grained else None
    )
    stats = (
        jnp.zeros((L, P, H, sub_chunks, 2, D), jnp.float32)
        if with_stats
        else None
    )
    if kv_bits < 16 and not kv_zeros:
        if k_scale_per_tensor is None:
            k_scale_per_tensor = jnp.ones((L,), jnp.float32)
        if v_scale_per_tensor is None:
            v_scale_per_tensor = jnp.ones((L,), jnp.float32)
    else:
        k_scale_per_tensor = None
        v_scale_per_tensor = None
    return KVPool(
        k_data=k_data,
        v_data=v_data,
        k_scale=scale,
        k_zero=(jnp.zeros_like(scale) if fine_grained else None),
        v_scale=(jnp.zeros_like(scale) if fine_grained else None),
        v_zero=(jnp.zeros_like(scale) if fine_grained else None),
        k_stats=stats,
        k_scale_per_tensor=k_scale_per_tensor,
        v_scale_per_tensor=v_scale_per_tensor,
    )


# ---------------------------------------------------------------------------
# Quantize + scatter append
# ---------------------------------------------------------------------------


def _quantize_kv(
    x: jnp.ndarray, kv_bits: int, kv_zeros: bool, pt_scale
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """[..., D] -> (stored values, scale, zero) per kv-quant mode."""
    if kv_bits == 16:
        return x.astype(jnp.bfloat16), None, None
    if kv_zeros:
        q, scale, zero = kv_quantize_fine_grained(x, kv_bits)
        return q, scale, zero
    q = kv_quantize_per_tensor(x, pt_scale, kv_bits)
    return q, None, None


def _pack_slot(slot: jnp.ndarray, page_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token slot within a page -> (packed row, is_high_nibble) for kv4."""
    half = page_size // 2
    return slot % half, slot // half


def _scatter_data(
    data: jnp.ndarray,       # [P, H, rows, D] layer slice
    q: jnp.ndarray,          # [T, H, D] stored values (uint8/bf16)
    page_ids: jnp.ndarray,   # [T]
    slots: jnp.ndarray,      # [T]
    kv_bits: int,
    page_size: int,
) -> jnp.ndarray:
    if kv_bits != 4:
        return data.at[page_ids, :, slots].set(
            q.astype(data.dtype), mode="drop"
        )
    # int4: read-modify-write the shared byte (half-split nibble layout).
    # Two sequential passes (low nibbles, then high nibbles) so a token pair
    # sharing one byte within this batch composes instead of last-wins.
    rows, is_hi = _pack_slot(slots, page_size)
    q = q.astype(jnp.uint8)
    num_pages = data.shape[0]
    lo_pages = jnp.where(is_hi == 0, page_ids, num_pages)
    current = data[jnp.minimum(lo_pages, num_pages - 1), :, rows]
    lo_byte = (current & 0xF0) | (q & 0x0F)
    data = data.at[lo_pages, :, rows].set(lo_byte, mode="drop")
    hi_pages = jnp.where(is_hi == 1, page_ids, num_pages)
    current = data[jnp.minimum(hi_pages, num_pages - 1), :, rows]
    hi_byte = (current & 0x0F) | (q << 4)
    return data.at[hi_pages, :, rows].set(hi_byte, mode="drop")


def append_kv(
    pool: KVPool,
    layer: int,
    k: jnp.ndarray,          # [T, H, D] post-RoPE keys (float)
    v: jnp.ndarray,          # [T, H, D] values
    page_ids: jnp.ndarray,   # [T] physical page per token (-1 = skip)
    slots: jnp.ndarray,      # [T] slot within page
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
) -> KVPool:
    """Quantize and scatter T tokens into one layer of a pool.

    TPU equivalent of apply_bias_rope_update_kv_cache (RoPE is applied by
    the caller; this op does quant + paged scatter). Tokens with
    ``page_ids < 0`` are dropped (jnp scatter ``mode='drop'`` needs an
    out-of-range index, so callers encode skips as -1).
    """
    pt_k = (
        pool.k_scale_per_tensor[layer]
        if pool.k_scale_per_tensor is not None
        else None
    )
    pt_v = (
        pool.v_scale_per_tensor[layer]
        if pool.v_scale_per_tensor is not None
        else None
    )
    qk, k_scale, k_zero = _quantize_kv(k, kv_bits, kv_zeros, pt_k)
    qv, v_scale, v_zero = _quantize_kv(v, kv_bits, kv_zeros, pt_v)
    safe_pages = jnp.where(page_ids < 0, pool.num_pages, page_ids)
    k_data = pool.k_data.at[layer].set(
        _scatter_data(
            pool.k_data[layer], qk, safe_pages, slots, kv_bits, page_size
        )
    )
    v_data = pool.v_data.at[layer].set(
        _scatter_data(
            pool.v_data[layer], qv, safe_pages, slots, kv_bits, page_size
        )
    )
    updates = {"k_data": k_data, "v_data": v_data}
    if k_scale is not None:
        updates["k_scale"] = pool.k_scale.at[layer, safe_pages, :, slots].set(
            k_scale, mode="drop"
        )
        updates["k_zero"] = pool.k_zero.at[layer, safe_pages, :, slots].set(
            k_zero, mode="drop"
        )
        updates["v_scale"] = pool.v_scale.at[layer, safe_pages, :, slots].set(
            v_scale, mode="drop"
        )
        updates["v_zero"] = pool.v_zero.at[layer, safe_pages, :, slots].set(
            v_zero, mode="drop"
        )
    return pool._replace(**updates)


def update_k_stats(
    pool: KVPool,
    layer: int,
    k: jnp.ndarray,          # [T, H, D] post-RoPE keys
    page_ids: jnp.ndarray,   # [T]
    slots: jnp.ndarray,      # [T]
    page_size: int,
    sub_chunks: int,
) -> KVPool:
    """Merge per-sub-chunk K min/max stats (PagedMinMaxPool equivalent).

    Reference: context_pool_kernel.cu:17-95 (prefill bulk pooling) and the
    in-kernel decode-time update. Implemented as a scatter-min/scatter-max
    over (page, sub_chunk) cells.
    """
    if pool.k_stats is None:
        return pool
    sub_size = page_size // sub_chunks
    sub_idx = slots // sub_size
    safe_pages = jnp.where(page_ids < 0, pool.num_pages, page_ids)
    kf = k.astype(pool.k_stats.dtype)
    stats = pool.k_stats.at[layer, safe_pages, :, sub_idx, 0].min(
        kf, mode="drop"
    )
    stats = stats.at[layer, safe_pages, :, sub_idx, 1].max(kf, mode="drop")
    return pool._replace(k_stats=stats)


def reset_page_stats(
    pool: KVPool, layer: int, page_ids: jnp.ndarray
) -> KVPool:
    """Re-initialize stats of freshly allocated pages (+inf/-inf)."""
    if pool.k_stats is None:
        return pool
    safe = jnp.where(page_ids < 0, pool.num_pages, page_ids)
    stats = pool.k_stats.at[layer, safe, :, :, 0].set(jnp.inf, mode="drop")
    stats = stats.at[layer, safe, :, :, 1].set(-jnp.inf, mode="drop")
    return pool._replace(k_stats=stats)


def reset_page_stats_all_layers(
    pool: KVPool, page_ids: jnp.ndarray
) -> KVPool:
    """Reset the given pages' stats across every layer at once.

    Called at the start of a step with the pages newly allocated by the
    scheduler (pages are recycled dirty; stale min/max would corrupt the
    selector's upper bounds)."""
    if pool.k_stats is None:
        return pool
    safe = jnp.where(page_ids < 0, pool.num_pages, page_ids)
    stats = pool.k_stats.at[:, safe, :, :, 0].set(jnp.inf, mode="drop")
    stats = stats.at[:, safe, :, :, 1].set(-jnp.inf, mode="drop")
    return pool._replace(k_stats=stats)


# ---------------------------------------------------------------------------
# Gather + dequantize (reference path; Pallas kernels read pools directly)
# ---------------------------------------------------------------------------


def gather_kv_for_seq(
    pool: KVPool,
    layer: int,
    block_table: jnp.ndarray,  # [max_blocks] int32 physical page ids
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dequantize one sequence's K/V to float: [max_blocks*page, H, D].

    Test/reference path only — materializes the whole history.
    """
    k = _gather_one(
        pool.k_data[layer], pool.k_scale, pool.k_zero,
        pool.k_scale_per_tensor, layer, block_table, page_size, kv_bits,
        kv_zeros,
    )
    v = _gather_one(
        pool.v_data[layer], pool.v_scale, pool.v_zero,
        pool.v_scale_per_tensor, layer, block_table, page_size, kv_bits,
        kv_zeros,
    )
    return k, v


def _gather_one(
    data, scale, zero, pt_scale, layer, block_table, page_size, kv_bits,
    kv_zeros,
):
    pages = data[block_table]  # [B', H, rows, D]
    n_blocks, H = pages.shape[0], pages.shape[1]
    if kv_bits == 16:
        vals = pages.astype(jnp.float32)
    elif kv_bits == 8:
        vals = pages.astype(jnp.float32)
    else:
        lo = (pages & 0xF).astype(jnp.float32)
        hi = (pages >> 4).astype(jnp.float32)
        vals = jnp.concatenate([lo, hi], axis=2)  # [B', H, page, D]
    if kv_bits == 16:
        out = vals
    elif kv_zeros:
        s = scale[layer, block_table]  # [B', H, page]
        z = zero[layer, block_table]
        out = (vals - z[..., None]) * s[..., None]
    else:
        qmax = 7 if kv_bits == 4 else 127
        out = (vals - (qmax + 1)) * pt_scale[layer]
    # [B', H, page, D] -> [B'*page, H, D]
    return out.transpose(0, 2, 1, 3).reshape(n_blocks * page_size, H, -1)
