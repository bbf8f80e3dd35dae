"""Paged, quantized KV cache: pool layout + append/update ops.

TPU-native replacement for the reference's byte-offset page layout
(worker/cache_engine.py:73-88) and the fused RoPE+quant+append CUDA kernels
(fine_grained_common/applyBiasRopeUpdateKVCache.h:300-500,
sparse_utils/ContextPool/context_pool_kernel.cu:17-95): instead of a blob
with scales at the page tail, each quantity is its own named array, indexed
by physical page id. One page id indexes EVERY layer's pool (leading layer
axis), mirroring the reference's per-layer pools sharing one block table.

Pool layout (per pool — retrieval or streaming):

- kv4 (packed):  data  [L, P, H, page/2, D] uint8 in the HALF-SPLIT
  layout (same scheme as the GEMM weight packing, ops/quantization.py):
  token t maps to byte_row = t % (page/2), high-nibble iff t >= page/2
  (``kv4_slot_to_row_nibble``). This ordering is chosen so the decode
  kernel's packed-domain 2-stream unpack (bitcast u8->i32, ``& 0x0F0F0F0F``
  / ``>> 4``, bitcast straight back to i8 — little-endian sublane packing,
  verified on hardware) yields two row-blocks that are EXACTLY tokens
  [0, page/2) and [page/2, page) in order: int8 MXU operands with two VPU
  ops per word and no sublane shuffles. ``kv4_unpack_order(page)`` is the
  identity under this layout (kept for kernels that consult it).
- kv8:           data  [L, P, H, page, D] uint8 (biased +128 for per-tensor)
- kv16:          data  [L, P, H, page, D] bfloat16 (no scales)
- fine-grained scale planes: [L, P, 4, H, page] float32 (folded; see
  ``KVPool``)
- K min/max sub-chunk stats (retrieval pool, sparse decode):
  [L, P, H, 2*n_sub, D] float32 — row 2s = sub-chunk s min, row 2s+1 = max
  (f32: the selector's upper bounds accumulate against running extrema).

All updates are functional (jnp scatter); the engine jit-donates the pool
arrays so XLA performs them in place.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops.quantization import (
    kv_quantize_fine_grained,
    kv_quantize_per_tensor,
)


class KVPool(NamedTuple):
    """One KV pool (all layers). Optional fields are None when unused.

    The four fine-grained quant-param planes live INTERLEAVED in one array
    ``kv_scales[L, P, 4, H, page]`` (f32) and are stored PRE-FOLDED
    for the single-pass decode kernel's rank-1 corrections:

        plane 0: k_scale
        plane 1: k_scale * (k_zero + 128)
        plane 2: v_scale
        plane 3: v_zero + 128

    so the per-step scale gather is pure data movement (no arithmetic
    passes over the 0.5 GB/step of gathered params). The ``k_scale``/...
    properties expose reference-semantics views (deriving k_zero/v_zero
    back out) for tests and the jnp fallback paths.
    """

    k_data: jnp.ndarray
    v_data: jnp.ndarray
    # [L, P, 4, H, page] f32: planes (k_scale|k_zero|v_scale|v_zero) on a
    # LEADING axis so (a) the trailing (H, page) dims tile without padding
    # (a [.., 4, page] tail pads (4, 128) tiles to (8, 128): 2x memory),
    # and (b) the decode kernels' scale gather is ONE lax.gather straight
    # into the [B, 4, H, lanes] block layout — no transpose pass over the
    # ~0.7 GB of per-step gathered params
    kv_scales: Optional[jnp.ndarray]
    # [L, P, H, n_sub*2, D]: row 2i = sub-chunk i min, 2i+1 = max (merged
    # so trailing dims are tile-aligned; a [.., 2, D] tail pads 4x)
    k_stats: Optional[jnp.ndarray]
    # per-tensor calibrated scales [L] (None in fine-grained/kv16 modes)
    k_scale_per_tensor: Optional[jnp.ndarray]
    v_scale_per_tensor: Optional[jnp.ndarray]

    def _plane(self, i):
        # [L, P, H, page] f32 reference-semantics view of plane i
        if self.kv_scales is None:
            return None
        return self.kv_scales[:, :, i].astype(jnp.float32)

    @property
    def k_scale(self):
        return self._plane(0)

    @property
    def k_zero(self):
        # stored folded: plane1 = k_scale * (k_zero + 128)
        p0, p1 = self._plane(0), self._plane(1)
        if p0 is None:
            return None
        return p1 / jnp.maximum(p0, 1e-20) - 128.0

    @property
    def v_scale(self):
        return self._plane(2)

    @property
    def v_zero(self):
        # stored folded: plane3 = v_zero + 128
        p3 = self._plane(3)
        return None if p3 is None else p3 - 128.0

    @property
    def kv_bits(self) -> int:
        if self.k_data.dtype == jnp.bfloat16:
            return 16
        # packed int4 halves the token rows vs the scale planes' per-token
        # lanes
        page_rows = self.k_data.shape[3]
        if self.kv_scales is not None:
            scale_rows = self.kv_scales.shape[-1]
            return 4 if page_rows * 2 == scale_rows else 8
        # per-tensor pools carry no per-token planes, so kv4 and kv8 are
        # indistinguishable from the data shapes alone — derive it with
        # page context instead (kv_bits = 4 if rows * 2 == page_size
        # else 8, as the kernels do)
        raise ValueError(
            "per-tensor quantized pool: kv_bits is not derivable without "
            "page_size; use `4 if pool.k_data.shape[3] * 2 == page_size "
            "else 8`"
        )

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
    # Convention: the TOP page index is a TRASH page — the Pallas
    # decode-append kernel routes inactive tokens there (a block write must
    # land somewhere). The block manager reserves it (never allocated).
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
    # planes stored f32: a bf16 attempt (r5) halved the DMA bytes but the
    # bf16 VMEM tiling (16,128 with sublane pairing) turned the plane
    # copies into strided descriptor storms — kernel time went 384 ->
    # 500 us/call at B=128 W=14. f32 tiles are flat for the DMA engine.
    scale = (
        jnp.zeros((L, P, 4, H, page_size), jnp.float32)
        if fine_grained else None
    )
    stats = (
        jnp.zeros((L, P, H, sub_chunks * 2, D), jnp.float32)
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
        kv_scales=scale,
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


def ring_logical_blocks(
    context_lens: jnp.ndarray,   # [B] tokens
    n_slots: int,
    sink_blocks: int,
    local_blocks: int,
    page_size: int,
) -> jnp.ndarray:
    """Logical block id currently held by each streaming-ring slot.

    The ring maps logical block b -> slot ``sink + (b - sink) % local``
    (reference kvCacheUtils.h:117-133); this inverts it: slot s holds the
    LARGEST logical block <= the current block that maps to s, or -1 if
    the slot has not been written yet. Returns [B, n_slots] int32.
    """
    cb = (context_lens[:, None] - 1) // page_size          # [B, 1]
    slots = jnp.arange(n_slots, dtype=jnp.int32)[None, :]  # [1, S]
    sink_logic = jnp.where(slots <= cb, slots, -1)
    raw = cb - jnp.mod(cb - slots, max(local_blocks, 1))
    ring_logic = jnp.where(
        (cb >= sink_blocks) & (raw >= sink_blocks), raw, -1
    )
    out = jnp.where(slots < sink_blocks, sink_logic, ring_logic)
    return jnp.where(context_lens[:, None] > 0, out, -1).astype(jnp.int32)


def ring_token_positions(
    context_lens: jnp.ndarray,   # [B] tokens
    n_slots: int,
    sink_blocks: int,
    local_blocks: int,
    page_size: int,
) -> jnp.ndarray:
    """Token position held by every row of the streaming ring, or -1.

    Token-granular inverse of the ring mapping: the current ring page's
    rows past the write head still hold last-wrap tokens. Returns
    [B, n_slots*page_size] int32 (slot-major row order).
    """
    logic = ring_logical_blocks(
        context_lens, n_slots, sink_blocks, local_blocks, page_size
    )                                                      # [B, S]
    off = jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
    pos = logic[:, :, None] * page_size + off              # [B, S, page]
    L = context_lens[:, None, None]
    cb = (L - 1) // page_size
    stale = (logic[:, :, None] == cb) & (off > (L - 1) % page_size)
    pos = jnp.where(stale, pos - local_blocks * page_size, pos)
    sink_tok = sink_blocks * page_size
    ok = (logic[:, :, None] >= 0) & (pos < L) & (
        jnp.where(stale, pos >= sink_tok, pos >= 0)
    )
    pos = jnp.where(ok, pos, -1)
    return pos.reshape(pos.shape[0], n_slots * page_size)


def kv4_slot_to_row_nibble(slot, page_size: int):
    """Token slot within a page -> (byte_row, is_high_nibble) for kv4.

    Half-split layout (see module docstring): row = slot % (page/2),
    high nibble iff slot >= page/2. Works on python ints, numpy, and
    traced jax values.
    """
    half = page_size // 2
    return slot % half, slot // half


def kv4_unpack_order(page_size: int):
    """Token index held at unpacked lane q of a cat([lo, hi]) kv4 unpack.

    Under the half-split layout a plain unpack (lo = b & 0xF rows, then
    hi = b >> 4 rows) produces tokens in sequential order — the identity
    permutation. Kept so kernels that consult the order stay
    layout-agnostic.
    """
    return np.arange(page_size)


def _pack_slot(slot: jnp.ndarray, page_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token slot within a page -> (packed row, is_high_nibble) for kv4."""
    return kv4_slot_to_row_nibble(slot, page_size)


def _flat_rows_idx(page_ids, slots, num_heads, rows_per_page):
    """(page, slot) per token x all heads -> [T, H] flat row index into a
    [P*H*rows, D] view. Scattering on the LEADING dim avoids the relayout
    copies XLA inserts for scatters that index interior dims."""
    h = jnp.arange(num_heads)
    return (
        (page_ids[:, None] * num_heads + h[None, :]) * rows_per_page
        + slots[:, None]
    )


def _scatter_data(
    data: jnp.ndarray,       # [L, P, H, rows, D] FULL pool array
    q: jnp.ndarray,          # [T, H, D] stored values (uint8/bf16)
    layer,                   # traced int
    page_ids: jnp.ndarray,   # [T] (>= P = drop)
    slots: jnp.ndarray,      # [T]
    kv_bits: int,
    page_size: int,
) -> jnp.ndarray:
    """Global flat-index scatter with the layer folded into the row index —
    per-layer slice+update would copy the 67 MB+ layer slab each call."""
    L, p, h_, rows_per_page, d = data.shape
    t = q.shape[0]
    n_rows = L * p * h_ * rows_per_page
    flat = data.reshape(n_rows, d)

    def fold(pages, rows):
        idx = _flat_rows_idx(pages, rows, h_, rows_per_page)
        idx = idx + layer * (p * h_ * rows_per_page)
        # pages >= p got the sentinel: push past the array end (layer
        # folding would otherwise alias the next layer's page 0)
        return jnp.where(pages[:, None] >= p, n_rows, idx).reshape(-1)

    if kv_bits != 4:
        out = flat.at[fold(page_ids, slots)].set(
            q.astype(data.dtype).reshape(t * h_, d), mode="drop"
        )
        return out.reshape(data.shape)
    # int4: read-modify-write the shared byte (half-split nibble layout).
    # Two sequential passes (low nibbles, then high nibbles) so a token pair
    # sharing one byte within this batch composes instead of last-wins.
    row, is_hi = _pack_slot(slots, page_size)
    q = q.astype(jnp.uint8).reshape(t * h_, d)
    for nibble, mask_keep, shift in ((0, 0xF0, 0), (1, 0x0F, 4)):
        pages_n = jnp.where(is_hi == nibble, page_ids, p)
        idx = fold(pages_n, row)
        current = flat[jnp.minimum(idx, n_rows - 1)]
        byte = (current & mask_keep) | (
            (q << shift) if shift else (q & 0x0F)
        )
        flat = flat.at[idx].set(byte, mode="drop")
    return flat.reshape(data.shape)


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
    unique_pages: bool = False,
    page_aligned: bool = False,
) -> KVPool:
    """Quantize and scatter T tokens into one layer of a pool.

    ``unique_pages=True`` (decode) promises every token targets a distinct
    page, enabling the fast row-granular scale update.

    ``page_aligned=True`` (chunked prefill) promises tokens come in groups
    of ``page_size`` consecutive slots (slot = i % page within each group)
    where all non-dropped tokens of a group share ONE page, and no two
    groups in the call target the same page. Scale updates then become
    whole-row read-modify-writes at PAGE granularity (n_pages*H rows)
    instead of the per-element interior-dim scatter, which XLA lowers to a
    sequential per-element loop (~17 s across a 256K prefill).

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
    k_data = _scatter_data(
        pool.k_data, qk, layer, safe_pages, slots, kv_bits, page_size
    )
    v_data = _scatter_data(
        pool.v_data, qv, layer, safe_pages, slots, kv_bits, page_size
    )
    updates = {"k_data": k_data, "v_data": v_data}
    if k_scale is not None:
        L, p, _, h_, page = pool.kv_scales.shape
        t = k_scale.shape[0]
        # folded plane values (see KVPool docstring), plane-major
        vals = jnp.stack(
            [k_scale, k_scale * (k_zero + 128.0), v_scale, v_zero + 128.0],
            axis=1,
        )                                                 # [T, 4, H]
        if unique_pages:
            # Decode path: every token targets a DISTINCT page, so a
            # read-modify-write of whole [page] lane rows is race-free.
            # The 2-D [L*P*4*H, page] view keeps the lane dim intact.
            rows2d = pool.kv_scales.reshape(L * p * 4 * h_, page)
            n_rows = rows2d.shape[0]
            ph = jnp.arange(4 * h_)[None, :]              # plane*H + h
            row_idx = (layer * p + safe_pages[:, None]) * (4 * h_) + ph
            row_idx = jnp.where(
                safe_pages[:, None] >= p, n_rows, row_idx
            )                                             # [T, 4H]
            cur = rows2d[jnp.minimum(row_idx, n_rows - 1)]  # [T, 4H, page]
            lane = jnp.arange(page)[None, None, :]
            hit = lane == slots[:, None, None]
            new = jnp.where(
                hit, vals.reshape(t, 4 * h_, 1).astype(cur.dtype), cur
            )
            rows2d = rows2d.at[row_idx.reshape(-1)].set(
                new.reshape(t * 4 * h_, page), mode="drop"
            )
            updates["kv_scales"] = rows2d.reshape(pool.kv_scales.shape)
        elif page_aligned and t % page == 0:
            # Chunked-prefill path: each group of `page` tokens covers one
            # page's slots in order, so build each page's full [4, H, page]
            # scale block and do a leading-dim row RMW (lane-merged against
            # the current rows so dropped tokens — padding tails, streaming
            # dead spans, live last-wrap ring slots — keep their scales).
            n_pg = t // page
            rows2d = pool.kv_scales.reshape(L * p, 4 * h_ * page)
            n_rows = rows2d.shape[0]
            gpages = jnp.max(page_ids.reshape(n_pg, page), axis=1)
            row_idx = layer * p + gpages                     # [n_pg]
            bad = (gpages < 0) | (gpages >= p)
            row_idx = jnp.where(bad, n_rows, row_idx)
            cur = rows2d[jnp.minimum(row_idx, n_rows - 1)]   # [n_pg, 4Hpg]
            planes = (
                k_scale, k_scale * (k_zero + 128.0), v_scale, v_zero + 128.0
            )
            new = jnp.stack(
                [pp.reshape(n_pg, page, h_).transpose(0, 2, 1)
                 for pp in planes], axis=1,
            ).reshape(n_pg, 4 * h_ * page)                   # [n_pg, 4Hpg]
            valid = page_ids.reshape(n_pg, 1, 1, page) >= 0
            valid4 = jnp.broadcast_to(
                valid, (n_pg, 4, h_, page)
            ).reshape(n_pg, 4 * h_ * page)
            merged = jnp.where(valid4, new.astype(cur.dtype), cur)
            rows2d = rows2d.at[row_idx].set(merged, mode="drop")
            updates["kv_scales"] = rows2d.reshape(pool.kv_scales.shape)
        else:
            # Prefill path: tokens share pages (element-unique updates);
            # interior-dim element scatter, amortized over the whole prompt.
            updates["kv_scales"] = _prefill_scale_scatter(
                pool.kv_scales, layer, safe_pages, slots, vals, page
            )
    return pool._replace(**updates)


def _prefill_scale_scatter(kv_scales, layer, safe_pages, slots, vals, page):
    """Element scatter of [T, 4, H] quant params at (layer, page, plane,
    h, slot)."""
    out = kv_scales
    for plane in range(4):
        out = out.at[
            layer, safe_pages, plane, :, slots
        ].set(vals[:, plane, :].astype(kv_scales.dtype), mode="drop")
    return out


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
    # global flat leading-dim scatter over [(L*P*H*S*2), D] rows
    L, p, h_, s2, d = pool.k_stats.shape
    s = s2 // 2
    t = k.shape[0]
    n_rows = L * p * h_ * s2
    base = _flat_rows_idx(safe_pages, sub_idx, h_, s) * 2  # [T, H]
    base = base + layer * (p * h_ * s2)
    base = jnp.where(safe_pages[:, None] >= p, n_rows, base)
    flat = pool.k_stats.reshape(n_rows, d)
    kf2 = kf.reshape(t * h_, d)
    flat = flat.at[base.reshape(-1)].min(kf2, mode="drop")
    flat = flat.at[(base.reshape(-1) + 1)].max(kf2, mode="drop")
    return pool._replace(k_stats=flat.reshape(pool.k_stats.shape))


def reset_page_stats(
    pool: KVPool, layer: int, page_ids: jnp.ndarray
) -> KVPool:
    """Re-initialize stats of freshly allocated pages (+inf/-inf)."""
    if pool.k_stats is None:
        return pool
    safe = jnp.where(page_ids < 0, pool.num_pages, page_ids)
    _, p, h_, s2, d = pool.k_stats.shape
    s = s2 // 2
    pattern = jnp.stack(
        [jnp.full((d,), jnp.inf, pool.k_stats.dtype),
         jnp.full((d,), -jnp.inf, pool.k_stats.dtype)]
    )
    row = jnp.broadcast_to(pattern, (h_, s, 2, d)).reshape(-1)
    flat = pool.k_stats[layer].reshape(p, h_ * s2 * d)
    flat = flat.at[safe].set(
        jnp.broadcast_to(row, (safe.shape[0], row.shape[0])), mode="drop"
    )
    stats = pool.k_stats.at[layer].set(flat.reshape(p, h_, s2, d))
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
    L, p, h_, s2, d = pool.k_stats.shape
    s = s2 // 2
    npg = safe.shape[0]
    # one leading-dim scatter of whole-page rows across all layers
    # Row-granular scatter on a [rows, D] view: merging the trailing
    # (H, S2, D) dims into lanes would relayout-copy the whole stats pool
    # (hundreds of MB) every step.
    pattern = jnp.stack(
        [jnp.full((d,), jnp.inf, pool.k_stats.dtype),
         jnp.full((d,), -jnp.inf, pool.k_stats.dtype)]
    )                                                  # [2, D]
    vals_page = jnp.broadcast_to(
        pattern[None, :, :], (h_ * s, 2, d)
    ).reshape(h_ * s2, d)                              # [H*S2, D]
    flat = pool.k_stats.reshape(-1, d)                 # [L*P*H*S2, D]
    n_rows = flat.shape[0]
    base = jnp.arange(L)[:, None] * p + safe[None, :]     # [L, Npg]
    # dropped pages got the sentinel ``p``: push them out of range so the
    # scatter's drop mode catches them (l*p + p would alias layer l+1)
    base = jnp.where(safe[None, :] >= p, L * p, base)
    rows = (
        base[:, :, None] * (h_ * s2)
        + jnp.arange(h_ * s2)[None, None, :]
    )                                                  # [L, Npg, H*S2]
    rows = jnp.where(rows >= n_rows, n_rows, rows)
    flat = flat.at[rows.reshape(-1)].set(
        jnp.broadcast_to(
            vals_page[None, :, :], (L * npg, h_ * s2, d)
        ).reshape(-1, d),
        mode="drop",
    )
    return pool._replace(k_stats=flat.reshape(pool.k_stats.shape))


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
        cat = jnp.concatenate([lo, hi], axis=2)   # [B', H, page, D] lane q
        # lane q holds token kv4_unpack_order(q); invert to token order
        order = kv4_unpack_order(page_size)
        inv = np.argsort(order)
        vals = jnp.take(cat, jnp.asarray(inv), axis=2)
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
