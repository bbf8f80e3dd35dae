"""Pallas chunked-prefill attention over the paged quantized KV pool.

The reference never pages prefill attention — it runs flash over the whole
in-register prompt and only chunks the MLP to cap activations
(llama_w4a8_unpad.py:89-112). At 256K context that still means multi-GB
activation buffers per GEMM, so the TPU build chunks the WHOLE prefill:
each engine-level chunk appends its KV to the pool, then attends causally
over the pool (history + itself) with this kernel.

Structure mirrors the decode kernel (pallas/paged_attention.py): XLA page
gather -> [B, T, H, rows, D], then a flash loop over page chunks. Queries
come in tiles of ``tq`` tokens; per-(kv head, GQA group) matmuls are
[tq*n_rep, D] x [D, G*page] — real MXU shapes, unlike decode's skinny
[n_rep, D] rows. Per-q-head streaming (sink+local band) masks give the
LServe sparse prefill on the paged path too.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniserve_tpu.ops.paged_kv import KVPool
from omniserve_tpu.ops.pallas.paged_attention import (
    MASK_VALUE,
    _cdiv,
    _choose_chunk,
    _gather_pool,
    _pad_sel,
)


def _prefill_kernel(
    # scalar prefetch
    sel_logic_ref,   # [B, T] int32 logical page ids (-1 pad)
    q_start_ref,     # [B] int32 absolute position of the chunk's 1st token
    q_count_ref,     # [B] int32 valid queries in the chunk
    lengths_ref,     # [B] int32 kv tokens (history + chunk)
    flags_ref,       # [Hkv] int32 1 = retrieval (dense), 0 = streaming
    pt_ref,          # [2] f32
    # blocks
    q_ref,           # [1, tq, Hkv, n_rep, D]
    k_ref,           # [1, G, Hkv, rows, D]
    v_ref,
    sc_ref,          # [1, Hkv, 4, nc, G*page]
    # out
    o_ref,           # [1, tq, Hkv, n_rep, D] (+ with_lse: m_out, l_out
    #                  [1, tq, Hkv, n_rep, 128] via *outs)
    *outs,           # (with_lse outputs +) scratch m_ref, l_ref, acc_ref
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    n_chunks: int,
    pages_per_chunk: int,
    n_heads: int,
    tq: int,
    sink_size: int,
    local_size: int,
    sparse_heads: bool,
    ring_span: int = 0,
    ring_sink_tok: int = 0,
    with_lse: bool = False,
):
    if with_lse:
        m_out, l_out, m_ref, l_ref, acc_ref = outs
    else:
        m_ref, l_ref, acc_ref = outs
    b = pl.program_id(0)
    qt = pl.program_id(1)
    j = pl.program_id(2)
    g = pages_per_chunk

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    q_start = q_start_ref[b] + qt * tq
    q_count = q_count_ref[b] - qt * tq    # valid rows in this tile

    logic_vals = [sel_logic_ref[b, j * g + i] for i in range(g)]

    # Half-split kv4 pool layout (ops/paged_kv.kv4_slot_to_row_nibble):
    # a cat([lo, hi]) unpack emits lanes in TRUE token order (identity
    # kv4_unpack_order), so no lane relabel is needed.

    # kv-token positions of this chunk's lanes (page-major)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g * page_size), 1)
    page_of = lane // page_size
    within = lane % page_size
    logic_lane = jnp.full_like(lane, -1)
    for i in range(g):
        logic_lane = jnp.where(page_of == i, logic_vals[i], logic_lane)
    kv_pos = logic_lane * page_size + within
    if ring_span > 0:
        # streaming ring source: the current ring page's tail rows hold
        # last-wrap tokens — re-label their positions
        cb = (length - 1) // page_size
        stale = (logic_lane == cb) & (
            within > jax.lax.rem(length - 1, page_size)
        )
        kv_pos = jnp.where(stale, kv_pos - ring_span * page_size, kv_pos)
        floor = jnp.where(stale, ring_sink_tok, 0)
    else:
        floor = 0
    kv_ok = (logic_lane >= 0) & (kv_pos < length) & (kv_pos >= floor)

    # query positions per row (rows = tq * n_rep, position repeats n_rep x)
    n_rep = q_ref.shape[3]
    rows = tq * n_rep
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    q_pos = q_start + ridx // n_rep                   # [rows, 1]
    q_ok = ridx // n_rep < q_count

    causal = (kv_pos <= q_pos) & kv_ok & q_ok         # [rows, G*page]
    if sparse_heads:
        band = (kv_pos < sink_size) | (q_pos - kv_pos < local_size)

    # skip chunks entirely above the causal diagonal or past the length
    # (ring sources skip only on emptiness: stale rows hold positions far
    # below their page label, so the diagonal test would over-skip)
    min_kv = jnp.stack(logic_vals).min() * page_size
    any_needed = (jnp.stack(logic_vals).max() >= 0) & (q_count > 0)
    if ring_span == 0:
        any_needed = any_needed & (min_kv <= q_start + tq - 1)

    @pl.when(any_needed)
    def _compute():
        for h in range(n_heads):
            if sparse_heads:
                # scalar-pred jnp.where doesn't legalize in Mosaic;
                # broadcast the head flag into the mask instead
                mask = (causal & band) | (causal & (flags_ref[h] == 1))
            else:
                mask = causal
            rs = slice(h * rows, (h + 1) * rows)
            q = q_ref[0, :, h].reshape(rows, q_ref.shape[-1]).astype(
                jnp.float32
            )
            q_bf = q.astype(jnp.bfloat16)

            def raw_block(ref):
                raw = ref[0, :, h]                    # [G, rows_pg, D]
                rows_pg = raw.shape[-2]
                d_ = raw.shape[-1]
                if kv_bits == 16:
                    return raw.reshape(g * rows_pg, d_).astype(jnp.bfloat16)
                if kv_bits == 4 and (rows_pg * d_) % 4 == 0:
                    # packed-domain 2-stream unpack (i32 masks, bitcast to
                    # i8, ONE convert to bf16); half-split layout = token
                    # order (see pallas/decode_attention._sp_kernel)
                    w32 = pltpu.bitcast(
                        raw.reshape(g * rows_pg, d_), jnp.int32
                    )
                    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
                    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
                    return jnp.concatenate([
                        lo.reshape(g, rows_pg, d_).astype(jnp.bfloat16),
                        hi.reshape(g, rows_pg, d_).astype(jnp.bfloat16),
                    ], axis=1).reshape(g * page_size, d_)
                raw_i = raw.astype(jnp.int32)
                if kv_bits == 4:
                    lo = (raw_i & 0xF).astype(jnp.bfloat16)
                    hi = (raw_i >> 4).astype(jnp.bfloat16)
                    return jnp.concatenate([lo, hi], axis=1).reshape(
                        g * page_size, -1
                    )
                return raw_i.reshape(g * rows_pg, d_).astype(jnp.bfloat16)

            def scales(plane):
                # [1, H, 4, G*page]: chunk j selected by the BlockSpec
                return sc_ref[0, h, plane][None, :]

            k_u = raw_block(k_ref)                    # [G*page, D]
            qk_int = jax.lax.dot_general(
                q_bf, k_u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # [rows, G*page]
            if kv_bits == 16:
                qk = qk_int * sm_scale
            elif kv_zeros:
                # planes stored folded: plane1 = sc*(z+128) (paged_kv) —
                # which is EXACTLY the rank-1 correction the kv4 magic
                # bias (values 128+nib) needs; kv8 values carry no bias
                sc = scales(0)
                # plane1 = sc*(z+128); unpacked values carry no bias
                sz = scales(1) - 128.0 * sc
                q_sum = jnp.sum(q, axis=1, keepdims=True)
                qk = (qk_int * sc - sz * q_sum) * sm_scale
            else:
                # per-tensor kv4 stores q+8 -> 136+q under the magic
                # bias; plain-nibble kv4 is q+8; kv8 is q+128
                # per-tensor kv4 stores q+8; kv8 stores q+128
                bias = 8.0 if kv_bits == 4 else 128.0
                q_sum = jnp.sum(q, axis=1, keepdims=True)
                qk = (qk_int - bias * q_sum) * (pt_ref[0] * sm_scale)
            qk = jnp.where(mask, qk, MASK_VALUE)

            m_prev = m_ref[rs, 0][:, None]
            l_prev = l_ref[rs, 0][:, None]
            m_curr = jnp.max(qk, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.where(mask, jnp.exp(qk - m_next), 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[rs, :] = jnp.broadcast_to(m_next, (rows, 128))
            l_ref[rs, :] = jnp.broadcast_to(l_next, (rows, 128))

            # corrections from the SAME bf16-rounded weights the PV dot
            # uses (f32 weights leave a systematic zero-point residual)
            v_u = raw_block(v_ref)
            if kv_bits == 16:
                p_bf, corr, v_scale = p.astype(jnp.bfloat16), 0.0, 1.0
            elif kv_zeros:
                vs = scales(2)
                # plane3 = v_zero+128 = the kv4 magic-bias correction
                # verbatim; kv8 values carry no bias -> plain zero
                vz = scales(3) - 128.0   # plane3 = v_zero + 128
                p_bf = (p * vs).astype(jnp.bfloat16)
                corr = jnp.sum(
                    p_bf.astype(jnp.float32) * vz, axis=1, keepdims=True
                )
                v_scale = 1.0
            else:
                bias = 8.0 if kv_bits == 4 else 128.0
                p_bf = p.astype(jnp.bfloat16)
                corr = bias * jnp.sum(
                    p_bf.astype(jnp.float32), axis=1, keepdims=True
                )
                v_scale = pt_ref[1]
            pv = jax.lax.dot_general(
                p_bf, v_u,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[rs, :] = acc_ref[rs, :] * alpha + (pv - corr) * v_scale

    @pl.when(j == n_chunks - 1)
    def _finalize():
        n_rep = o_ref.shape[3]
        d = o_ref.shape[-1]
        rows = tq * n_rep
        for h in range(n_heads):
            rs = slice(h * rows, (h + 1) * rows)
            l = jnp.maximum(l_ref[rs, 0][:, None], 1e-10)
            o_ref[0, :, h] = (acc_ref[rs, :] / l).reshape(
                tq, n_rep, d
            ).astype(o_ref.dtype)
            if with_lse:
                # sequence-parallel partials: locally-normalized output +
                # (m, l) for the cross-rank LSE combine (parallel/sp.py);
                # rows with no attended lanes keep (MASK, 0) so the
                # combine zeroes them
                m_out[0, :, h] = m_ref[rs, :].reshape(tq, n_rep, 128)
                l_out[0, :, h] = l_ref[rs, :].reshape(tq, n_rep, 128)


def paged_prefill_attention(
    q: jnp.ndarray,               # [B, Tq, Hq, D]
    pool: KVPool,
    layer,
    block_tables: jnp.ndarray,    # [B, max_blocks]
    q_positions: jnp.ndarray,     # [B, Tq] (contiguous per seq; -1 pad)
    context_lens: jnp.ndarray,    # [B]
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    head_is_retrieval=None,
    sink_size: int = 0,
    local_size: int = 0,
    tile_q: int = 128,
    sel_logic: Optional[jnp.ndarray] = None,   # [B, n_slots] override
    ring_span_pages: int = 0,
    ring_sink_tokens: int = 0,
    return_lse: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal multi-query attention over the paged pool (history + chunk).

    ``q_positions`` rows must be ``start + arange(count)`` then -1 padding
    (the packed chunk layout the model runner produces). ``sel_logic``
    overrides the dense page list with explicit logical page ids (the
    streaming-ring source: slot s holds block sel_logic[b, s]); with
    ``ring_span_pages`` set the kernel re-labels the current ring page's
    stale tail rows to their last-wrap positions.
    """
    b, tq_total, hq, d = q.shape
    hkv = pool.num_heads
    n_rep = hq // hkv
    max_blocks = block_tables.shape[1]

    if sel_logic is None:
        # page list: all pages holding < context_lens tokens
        n_pages = (context_lens + page_size - 1) // page_size
        tile = jnp.arange(max_blocks)
        sel_logic = jnp.where(
            tile[None, :] < n_pages[:, None], tile[None, :], -1
        )
    sel_phys = jnp.where(sel_logic >= 0, block_tables, 0)
    # long histories: per-grid-step fixed cost dominates (~10 us/step x
    # O(T^2 / tile_q / chunk) steps at 256K), so stream as many KV tokens
    # per step as VMEM affords. The f32 qk temporaries cap the chunk;
    # OMNISERVE_PREFILL_KV_CHUNK + OMNISERVE_PREFILL_VMEM_MB sweep it on
    # hardware (defaults: the measured v5e sweet spot).
    kv_chunk_tok = int(os.environ.get("OMNISERVE_PREFILL_KV_CHUNK", "2048"))
    kv_cap = max(8, kv_chunk_tok // page_size)
    g = _choose_chunk(sel_logic.shape[-1], cap=kv_cap,
                      page_size=page_size)
    sel_phys, sel_logic = _pad_sel(sel_phys, sel_logic, quantum=g)
    kd, vd, ksc = _gather_pool(pool, layer, sel_phys)
    n_tiles = sel_logic.shape[-1]
    n_chunks = n_tiles // g
    rows_pg = kd.shape[-2]

    tq = min(int(os.environ.get("OMNISERVE_PREFILL_TILE_Q", tile_q)),
             tq_total)
    q_tiles = _cdiv(tq_total, tq)
    if q_tiles * tq != tq_total:
        pad = q_tiles * tq - tq_total
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))

    q5 = q.reshape(b, q_tiles * tq, hkv, n_rep, d)

    # per-seq chunk start & count from q_positions
    q_start = q_positions[:, 0].astype(jnp.int32)
    q_count = (q_positions >= 0).sum(axis=1).astype(jnp.int32)

    # scales -> [B, H, 4, nc*G*page] kernel lane order (reuse decode layout)
    fine = kv_bits < 16 and kv_zeros

    def flatten_scale(s):
        # page-major lane order == TRUE token order (half-split kv4
        # layout: cat([lo, hi]) unpack is the identity permutation)
        if s is None:
            return None
        bb, tt, hh, pg4 = s.shape
        pg = pg4 // 4
        s = s.reshape(bb, tt, hh, 4, pg)
        s = s.transpose(0, 2, 3, 1, 4)
        # chunk axis flattened into lanes: blockable at (1, H, 4, G*page)
        return s.reshape(bb, hh, 4, n_chunks * g * pg)

    ksc = flatten_scale(ksc)

    if head_is_retrieval is not None and (sink_size or local_size):
        flags = head_is_retrieval.astype(jnp.int32)
        if flags.shape[0] == hq:       # per-q-head -> per-kv-head
            flags = flags[::n_rep]
        sparse = True
    else:
        flags = jnp.ones((hkv,), jnp.int32)
        sparse = False

    if pool.k_scale_per_tensor is not None:
        pt_arr = jnp.stack([
            pool.k_scale_per_tensor[layer], pool.v_scale_per_tensor[layer]
        ]).astype(jnp.float32)
    else:
        pt_arr = jnp.zeros((2,), jnp.float32)

    data_spec = pl.BlockSpec(
        (1, g, hkv, rows_pg, d),
        lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt: (b_, j_, 0, 0, 0),
    )
    gp = g * page_size
    # one chunk's quant planes per grid step (a whole-history block would
    # blow VMEM past ~64K context)
    if fine:
        sc_input = ksc
        sc_spec = pl.BlockSpec(
            (1, hkv, 4, gp),
            lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt: (b_, 0, 0, j_),
        )
    else:
        sc_input = jnp.zeros((1, hkv, 4, gp), jnp.float32)
        sc_spec = pl.BlockSpec(
            (1, hkv, 4, gp),
            lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt: (0,) * 4,
        )

    kernel = functools.partial(
        _prefill_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_bits=kv_bits,
        kv_zeros=kv_zeros,
        n_chunks=n_chunks,
        pages_per_chunk=g,
        n_heads=hkv,
        tq=tq,
        sink_size=int(sink_size),
        local_size=int(local_size),
        sparse_heads=sparse,
        ring_span=int(ring_span_pages),
        ring_sink_tok=int(ring_sink_tokens),
        with_lse=bool(return_lse),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, q_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, tq, hkv, n_rep, d),
                lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt:
                (b_, qt_, 0, 0, 0),
            ),
            data_spec, data_spec, sc_spec,
        ],
        out_specs=(
            tuple(
                pl.BlockSpec(
                    (1, tq, hkv, n_rep, dd),
                    lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt:
                    (b_, qt_, 0, 0, 0),
                )
                for dd in ((d, 128, 128) if return_lse else (d,))
            ) if return_lse else pl.BlockSpec(
                (1, tq, hkv, n_rep, d),
                lambda b_, qt_, j_, sl, qs, qc, ln, fl, pt:
                (b_, qt_, 0, 0, 0),
            )
        ),
        scratch_shapes=[
            pltpu.VMEM((hkv * tq * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * tq * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * tq * n_rep, d), jnp.float32),
        ],
    )
    out_shape = jax.ShapeDtypeStruct((b, q_tiles * tq, hkv, n_rep, d),
                                     q.dtype)
    if return_lse:
        ml = jax.ShapeDtypeStruct(
            (b, q_tiles * tq, hkv, n_rep, 128), jnp.float32
        )
        out_shape = (out_shape, ml, ml)
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(
                int(os.environ.get("OMNISERVE_PREFILL_VMEM_MB", "100"))
                * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(sel_logic.astype(jnp.int32), q_start, q_count,
      context_lens.astype(jnp.int32), flags, pt_arr, q5, kd, vd, sc_input)
    if return_lse:
        out, m_b, l_b = res
        return (
            out.reshape(b, q_tiles * tq, hq, d)[:, :tq_total],
            m_b[..., 0].reshape(b, q_tiles * tq, hq)[:, :tq_total],
            l_b[..., 0].reshape(b, q_tiles * tq, hq)[:, :tq_total],
        )
    return res.reshape(b, q_tiles * tq, hq, d)[:, :tq_total]
