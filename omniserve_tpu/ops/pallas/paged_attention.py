"""Pallas TPU paged decode attention (the MMHA equivalent).

One kernel serves all decode paths of the reference MMHA family
(kernels/csrc/fused_attention/**, SURVEY.md §2.3):

- dense retrieval-head attention: per-(seq, head) page list = the block
  table in order
- dynamic-sparse: page list = the selector's logical top-k pages
  (reference ...Template.hpp:1631-1641's page indirection becomes a
  scalar-prefetched physical-page list)
- streaming ring heads: the ring slots ARE a dense prefix of the streaming
  table (valid slots = [0, min(L, sink+local tokens))), so the same kernel
  runs over the streaming pool with a clamped length

Quantized KV compute stays in the quantized domain on the MXU:
  qk_t   = s_t * (q . k_u)_t - s_t * z_t * sum(q)          (per token t)
  out_d  = (p~ @ v_u)_d - sum_t(p~_t * z_t),  p~_t = p_t * s_t
i.e. the same zero-point factorization the reference does in CUDA registers
(decoderMaskedMultiheadAttentionUtils.h convert_from_4bit_kv_cache), but as
two small matmuls per page plus rank-1 corrections.

Grid: (batch, kv_heads, page_tiles); page DMA is driven by BlockSpec
index maps reading the scalar-prefetched page lists, so Mosaic pipelines
the HBM loads (double buffering) automatically. Per-tile masking uses the
LOGICAL page index, which also encodes padding (-1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniserve_tpu.ops.paged_kv import KVPool

MASK_VALUE = -1e37


def _mqa_kernel(
    # scalar prefetch
    sel_phys_ref,   # [B, H, n_tiles] int32 physical page (clamped >= 0)
    sel_logic_ref,  # [B, H, n_tiles] int32 logical page (-1 = padding)
    lengths_ref,    # [B] int32
    pt_ref,         # [2] f32 per-tensor (k, v) scales (dummy when unused)
    # blocks
    q_ref,          # [1, 1, n_rep, D]
    k_ref,          # [1, 1, rows, D] uint8/bf16
    v_ref,
    k_s_ref,        # [1, 1, 1, page] f32 scale   (fine-grained only)
    k_z_ref,        # [1, 1, 1, page] f32 zero
    v_s_ref,
    v_z_ref,
    # outputs
    o_ref,          # [1, 1, n_rep, D]
    # scratch
    m_ref, l_ref, acc_ref,
    *,
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    n_tiles: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    logical = sel_logic_ref[b, h, j]
    length = lengths_ref[b]

    @pl.when(logical >= 0)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [n_rep, D]
        n_rep = q.shape[0]

        # -- unpack K/V to integer-valued bf16 [page, D] --
        def unpack(data_ref):
            raw = data_ref[0, 0]                      # [rows, D]
            if kv_bits == 16:
                return raw.astype(jnp.bfloat16)
            # Mosaic lacks a direct uint8->bf16 cast; hop through int32.
            raw_i = raw.astype(jnp.int32)
            if kv_bits == 4:
                lo = (raw_i & 0xF).astype(jnp.bfloat16)
                hi = (raw_i >> 4).astype(jnp.bfloat16)
                return jnp.concatenate([lo, hi], axis=0)   # [page, D]
            return raw_i.astype(jnp.bfloat16)         # kv8 uint8 exact

        k_u = unpack(k_ref)                           # [page, D]

        # token positions of this page & validity
        pos = logical * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )                                             # [1, page]
        valid = pos < length                          # [1, page]

        q_bf = q.astype(jnp.bfloat16)
        qk_int = jax.lax.dot_general(
            q_bf, k_u,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [n_rep, page]
        if kv_bits == 16:
            qk = qk_int * sm_scale
        elif kv_zeros:
            s = k_s_ref[0, 0, 0][None, :]             # [1, page]
            z = k_z_ref[0, 0, 0][None, :]
            q_sum = jnp.sum(q, axis=1, keepdims=True)  # [n_rep, 1]
            qk = (qk_int * s - (s * z) * q_sum) * sm_scale
        else:
            ks = pt_ref[0]
            bias = 8.0 if kv_bits == 4 else 128.0
            q_sum = jnp.sum(q, axis=1, keepdims=True)
            qk = (qk_int - bias * q_sum) * (ks * sm_scale)

        qk = jnp.where(valid, qk, MASK_VALUE)

        # -- online softmax update --
        m_prev = m_ref[:, 0][:, None]                 # [n_rep, 1]
        l_prev = l_ref[:, 0][:, None]
        m_curr = jnp.max(qk, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(qk - m_next)                      # [n_rep, page]
        p = jnp.where(valid, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        # -- V accumulation in the quantized domain --
        v_u = unpack(v_ref)                           # [page, D]
        if kv_bits == 16:
            p_eff = p
            corr = jnp.zeros((n_rep, 1), jnp.float32)
            v_scale = 1.0
        elif kv_zeros:
            vs = v_s_ref[0, 0, 0][None, :]
            vz = v_z_ref[0, 0, 0][None, :]
            p_eff = p * vs                            # [n_rep, page]
            corr = jnp.sum(p_eff * vz, axis=1, keepdims=True)
            v_scale = 1.0
        else:
            bias = 8.0 if kv_bits == 4 else 128.0
            p_eff = p
            corr = bias * jnp.sum(p, axis=1, keepdims=True)
            v_scale = pt_ref[1]
        pv = jax.lax.dot_general(
            p_eff.astype(jnp.bfloat16), v_u,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [n_rep, D]
        o_curr = (pv - corr) * v_scale
        acc_ref[...] = acc_ref[...] * alpha + o_curr

    @pl.when(j == n_tiles - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0][:, None], 1e-10)
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)


def paged_mqa_attention(
    q: jnp.ndarray,           # [B, Hkv, n_rep, D]
    k_data: jnp.ndarray,      # [P, Hkv, rows, D]
    v_data: jnp.ndarray,
    k_scale, k_zero, v_scale, v_zero,   # [P, Hkv, page] f32 or None
    sel_phys: jnp.ndarray,    # [B, Hkv, n_tiles] int32, clamped
    sel_logic: jnp.ndarray,   # [B, Hkv, n_tiles] int32, -1 padded
    lengths: jnp.ndarray,     # [B] int32
    *,
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    pt_scales=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query attention over selected pages; returns [B, Hkv, n_rep, D]."""
    b, hkv, n_rep, d = q.shape
    n_tiles = sel_phys.shape[2]
    rows = k_data.shape[2]

    fine = kv_bits < 16 and kv_zeros

    def phys_map(b_, h_, j_, sp, sl, ln, pt):
        return (sp[b_, h_, j_], h_, 0, 0)

    def scale_map(b_, h_, j_, sp, sl, ln, pt):
        return (sp[b_, h_, j_], h_, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, n_rep, d), lambda b_, h_, j_, sp, sl, ln, pt:
                     (b_, h_, 0, 0)),
        pl.BlockSpec((1, 1, rows, d), phys_map),
        pl.BlockSpec((1, 1, rows, d), phys_map),
    ]
    inputs = [q, k_data, v_data]
    if fine:
        for arr in (k_scale, k_zero, v_scale, v_zero):
            # [P, H, page] -> [P, H, 1, page]: the trailing two block dims
            # (1, page) then equal the array dims (TPU tiling rule).
            in_specs.append(pl.BlockSpec((1, 1, 1, page_size), scale_map))
            inputs.append(arr[:, :, None, :])
    else:
        # dummy tiny refs (unused); keep kernel arity fixed
        dummy = jnp.zeros((1, 1, 1, page_size), jnp.float32)
        for _ in range(4):
            in_specs.append(
                pl.BlockSpec((1, 1, 1, page_size),
                             lambda b_, h_, j_, sp, sl, ln, pt: (0, 0, 0, 0))
            )
            inputs.append(dummy)

    if pt_scales is None:
        pt_arr = jnp.zeros((2,), jnp.float32)
    else:
        pt_arr = jnp.stack([
            jnp.asarray(pt_scales[0], jnp.float32),
            jnp.asarray(pt_scales[1], jnp.float32),
        ])
    kernel = functools.partial(
        _mqa_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_bits=kv_bits,
        kv_zeros=kv_zeros,
        n_tiles=n_tiles,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, n_rep, d),
            lambda b_, h_, j_, sp, sl, ln, pt: (b_, h_, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rep, 128), jnp.float32),  # m
            pltpu.VMEM((n_rep, 128), jnp.float32),  # l
            pltpu.VMEM((n_rep, d), jnp.float32),    # acc
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sel_phys, sel_logic, lengths, pt_arr, *inputs)


# ---------------------------------------------------------------------------
# Wrapper with the reference signature (pool routing, sparse, streaming)
# ---------------------------------------------------------------------------


def _pool_head_sources(head_rank, flags, n_pool_heads, want_retrieval):
    """For each pool row r: which kv head maps to it (inverse of rank)."""
    rows = jnp.arange(n_pool_heads)
    sel = flags if want_retrieval else ~flags
    match = (head_rank[None, :] == rows[:, None]) & sel[None, :]
    return jnp.argmax(match, axis=1)  # [n_pool_heads]


def paged_decode_attention(
    q: jnp.ndarray,               # [B, Hq, D]
    pool: KVPool,
    layer,
    block_tables: jnp.ndarray,    # [B, max_blocks]
    context_lens: jnp.ndarray,    # [B]
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    streaming_pool: Optional[KVPool] = None,
    streaming_block_tables: Optional[jnp.ndarray] = None,
    head_is_retrieval: Optional[jnp.ndarray] = None,
    head_rank: Optional[jnp.ndarray] = None,
    sink_blocks: int = 0,
    local_blocks: int = 0,
    page_idxes: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas replacement for attention_ref.paged_decode_attention."""
    b, hq, d = q.shape
    max_blocks = block_tables.shape[1]
    if head_is_retrieval is None:
        hkv = pool.num_heads
        head_is_retrieval = jnp.ones((hkv,), bool)
        head_rank = jnp.arange(hkv)
    else:
        hkv = head_is_retrieval.shape[0]
    n_rep = hq // hkv
    q_g = q.reshape(b, hkv, n_rep, d)

    def pool_arrays(p: KVPool):
        args = (p.k_data[layer], p.v_data[layer])
        if p.k_scale is not None:
            scales = (p.k_scale[layer], p.k_zero[layer], p.v_scale[layer],
                      p.v_zero[layer])
        else:
            scales = (None, None, None, None)
        pt = None
        if p.k_scale_per_tensor is not None:
            pt = (p.k_scale_per_tensor[layer], p.v_scale_per_tensor[layer])
        return args, scales, pt

    # -- retrieval pool call (q heads routed by rank) --
    hr = pool.num_heads
    src_r = _pool_head_sources(head_rank, head_is_retrieval, hr, True)
    q_r = q_g[:, src_r]                               # [B, Hr, n_rep, D]
    if page_idxes is not None:
        sel_logic = page_idxes[:, src_r]              # [B, Hr, n_sel]
        safe = jnp.clip(sel_logic, 0, max_blocks - 1)
        bsel = jnp.take_along_axis(
            block_tables[:, None, :].repeat(hr, 1), safe, axis=2
        )
        sel_phys = jnp.where(sel_logic >= 0, bsel, 0)
    else:
        n_pages = (context_lens + page_size - 1) // page_size  # [B]
        tile = jnp.arange(max_blocks)
        logic = jnp.where(
            tile[None, :] < n_pages[:, None], tile[None, :], -1
        )                                             # [B, max_blocks]
        sel_logic = jnp.broadcast_to(
            logic[:, None, :], (b, hr, max_blocks)
        )
        sel_phys = jnp.broadcast_to(
            jnp.where(logic >= 0, block_tables, 0)[:, None, :],
            (b, hr, max_blocks),
        )
    (kd, vd), (ks, kz, vs, vz), pt = pool_arrays(pool)
    out_r = paged_mqa_attention(
        q_r, kd, vd, ks, kz, vs, vz,
        sel_phys.astype(jnp.int32), sel_logic.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        sm_scale=sm_scale, page_size=page_size, kv_bits=kv_bits,
        kv_zeros=kv_zeros, pt_scales=pt, interpret=interpret,
    )                                                 # [B, Hr, n_rep, D]
    # scatter pool rows back to kv-head positions
    rank_c = jnp.clip(head_rank, 0, hr - 1)
    out_full_r = jnp.take_along_axis(
        out_r, rank_c[None, :, None, None].repeat(b, 0).repeat(n_rep, 2),
        axis=1,
    )                                                 # [B, Hkv, n_rep, D]

    if streaming_pool is None:
        return out_full_r.reshape(b, hq, d)

    # -- streaming ring pool call --
    hs = streaming_pool.num_heads
    src_s = _pool_head_sources(head_rank, head_is_retrieval, hs, False)
    q_s = q_g[:, src_s]
    n_slots = streaming_block_tables.shape[1]
    window = (sink_blocks + local_blocks) * page_size
    eff_len = jnp.minimum(context_lens, window)       # slot-space length
    tile = jnp.arange(n_slots)
    n_slot_pages = (eff_len + page_size - 1) // page_size
    logic_s = jnp.where(
        tile[None, :] < n_slot_pages[:, None], tile[None, :], -1
    )
    sel_logic_s = jnp.broadcast_to(logic_s[:, None, :], (b, hs, n_slots))
    sel_phys_s = jnp.broadcast_to(
        jnp.where(logic_s >= 0, streaming_block_tables, 0)[:, None, :],
        (b, hs, n_slots),
    )
    (kd, vd), (ks, kz, vs, vz), pt = pool_arrays(streaming_pool)
    out_s = paged_mqa_attention(
        q_s, kd, vd, ks, kz, vs, vz,
        sel_phys_s.astype(jnp.int32), sel_logic_s.astype(jnp.int32),
        eff_len.astype(jnp.int32),
        sm_scale=sm_scale, page_size=page_size, kv_bits=kv_bits,
        kv_zeros=kv_zeros, pt_scales=pt, interpret=interpret,
    )
    rank_s = jnp.clip(head_rank, 0, hs - 1)
    out_full_s = jnp.take_along_axis(
        out_s, rank_s[None, :, None, None].repeat(b, 0).repeat(n_rep, 2),
        axis=1,
    )
    out = jnp.where(
        head_is_retrieval[None, :, None, None], out_full_r, out_full_s
    )
    return out.reshape(b, hq, d)
