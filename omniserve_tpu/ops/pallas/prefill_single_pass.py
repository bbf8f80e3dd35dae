"""Single-pass Pallas chunked-prefill attention (kv4/kv8) over HBM pools.

Long-context prefill with the two-stage kernel (XLA page gather ->
paged_prefill.py) pays a ~10 us fixed cost per grid step over the FULL
q-tile x kv-chunk rectangle — at 256K that is O(T^2 / tile_q / chunk)
steps and dominates the sweep (the same overhead the decode path killed
in decode_attention.py). This kernel moves the kv-chunk loop INSIDE the
kernel:

- grid = (batch, q_tiles) only; each step runs a `fori_loop` whose trip
  count is the CAUSAL frontier for that q tile (the rectangle becomes the
  triangle and non-causal chunks are never DMA'd at all),
- KV pages stay in HBM (`memory_space=ANY`); the loop double-buffers its
  own per-page DMAs from the scalar-prefetched page list, so history
  bytes are read exactly once per q tile with no XLA pre-gather,
- the kv4 unpack is the decode kernel's packed-int32 magic bitcast
  (u8 -> i32 nibble masks, | 0x4300 -> bf16 128+v) yielding PAGE-MAJOR
  TOKEN ORDER, so scale planes DMA straight from the pool's pre-folded
  [L*P, H, 4, page] layout with no permutation; kv8 rows are token-major
  u8 already, so the unpack is a plain convert (every u8 value is exact
  in bf16) and the +128 magic bias drops out of the corrections,
- per-q-head streaming bands (sink + sliding local window, LServe sparse
  prefill) use the same mask algebra as paged_prefill.py.

Reference scope: the dense/sparse context attention kernels
(kernels/csrc/fused_attention ctx paths + Block-Sparse-Attention wheel);
structure per the single-pass MMHA
(decoderMaskedMultiheadAttentionTemplate.hpp:1631-1641).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniserve_tpu.ops.paged_kv import KVPool
from omniserve_tpu.ops.pallas.decode_attention import (
    _cdiv,
    supports,
)

MASK_VALUE = -1e37


def _psp_kernel(
    # scalar prefetch
    sel_fold_ref,   # [B, Tp] i32 layer-folded physical page (pad -> 0)
    sel_logic_ref,  # [B, Tp] i32 logical page (-1 = pad)
    q_start_ref,    # [B] i32 absolute position of the chunk's first token
    q_count_ref,    # [B] i32 valid queries in the engine chunk
    lengths_ref,    # [B] i32 kv tokens (history + chunk)
    flags_ref,      # [Hkv] i32 1 = retrieval
    trips_ref,      # [B, n_q_tiles] i32 kv chunks this q tile attends
    sc_off_ref,     # [1] i32: layer*P (scale slab is per-layer, k/v folded)
    pt_ref,         # [2] f32 per-tensor scales
    # blocks
    q_ref,          # [1, tq, Hkv, n_rep, D]
    # HBM refs
    k_hbm,          # [L*P, H, R, D] u8
    v_hbm,
    sc_hbm,         # [L*P, 4, H, page] f32 pre-folded planes (or dummy)
    # out
    o_ref,          # [1, tq, Hkv, n_rep, D]
    # scratch
    k_buf,          # [2, H, G*R, D] u8
    v_buf,
    sc_buf,         # [2, 4, H, G*page] f32
    sem,            # DMA sems [2, G, 3]
    m_ref, l_ref, acc_ref,  # [Hkv*tq*n_rep, 128] x2 / [..., D]
    *,
    sm_scale: float,
    page_size: int,
    kv_zeros: bool,
    g: int,
    n_chunks: int,
    n_heads: int,
    tq: int,
    sink_size: int,
    local_size: int,
    sparse_heads: bool,
    kv_bits: int = 4,
    ring_span: int = 0,
    ring_sink_tok: int = 0,
):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    kv4 = kv_bits == 4
    rows_pg = page_size // 2 if kv4 else page_size  # byte rows per page
    # token domain the MXU sees: kv4 unpacks to plain nibbles (half-split
    # layout, i8 masks + one bf16 convert), kv8 converts u8 verbatim;
    # per-tensor kv4 stores q+8, kv8 stores q+128
    pt_bias = 8.0 if kv4 else 128.0
    lanes = g * page_size
    n_rep = q_ref.shape[3]
    rows = tq * n_rep

    trip = trips_ref[b, qt]
    length = lengths_ref[b]
    q_start = q_start_ref[b] + qt * tq
    q_count = q_count_ref[b] - qt * tq

    # ---------------- DMA plumbing ----------------
    def copies(cc, sl, i):
        idx = sel_fold_ref[b, cc * g + i]
        out = [
            pltpu.make_async_copy(
                k_hbm.at[idx],
                k_buf.at[sl, :, pl.ds(i * rows_pg, rows_pg), :],
                sem.at[sl, i, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[idx],
                v_buf.at[sl, :, pl.ds(i * rows_pg, rows_pg), :],
                sem.at[sl, i, 1],
            ),
        ]
        if kv_zeros:
            out.append(pltpu.make_async_copy(
                sc_hbm.at[idx - sc_off_ref[0]],
                sc_buf.at[sl, :, :, pl.ds(i * page_size, page_size)],
                sem.at[sl, i, 2],
            ))
        return out

    def issue(cc, sl):
        # clamp into the padded page list (trip may be 0 for padded
        # q tiles; predication skips the copies, the clamp keeps the
        # scalar reads in bounds)
        ccc = jnp.clip(cc, 0, n_chunks - 1)
        for i in range(g):
            @pl.when((cc < trip)
                     & (sel_logic_ref[b, ccc * g + i] >= 0))
            def _():
                for c in copies(ccc, sl, i):
                    c.start()

    m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    issue(0, 0)

    # lane -> (page slot, token) map; the half-split cat([lo, hi])
    # unpack emits tokens IN ORDER within each page (identity order)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    p_of = lane // page_size
    within = lane % page_size
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    q_pos = q_start + ridx // n_rep                       # [rows, 1]
    q_ok = ridx // n_rep < q_count

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        issue(j + 1, 1 - slot)
        for i in range(g):
            @pl.when(sel_logic_ref[b, j * g + i] >= 0)
            def _():
                for c in copies(j, slot, i):
                    c.wait()

        logic = jnp.full_like(lane, -1)
        for i in range(g):
            logic = jnp.where(p_of == i, sel_logic_ref[b, j * g + i],
                              logic)
        kv_pos = logic * page_size + within
        if ring_span > 0:
            cb = (length - 1) // page_size
            stale = (logic == cb) & (
                within > jax.lax.rem(length - 1, page_size)
            )
            kv_pos = jnp.where(stale, kv_pos - ring_span * page_size,
                               kv_pos)
            floor = jnp.where(stale, ring_sink_tok, 0)
        else:
            floor = 0
        kv_ok = (logic >= 0) & (kv_pos < length) & (kv_pos >= floor)
        causal = (kv_pos <= q_pos) & kv_ok & q_ok         # [rows, lanes]
        if sparse_heads:
            band = (kv_pos < sink_size) | (q_pos - kv_pos < local_size)

        def nib_tokens(buf):
            flat = buf[slot]                              # [H, G*R, D] u8
            d_ = flat.shape[2]
            if not kv4:                                   # kv8: rows ARE
                return flat.reshape(                      # tokens, exact
                    n_heads * lanes, d_                   # in bf16
                ).astype(jnp.bfloat16)
            w32 = pltpu.bitcast(
                flat.reshape(n_heads * flat.shape[1], d_), jnp.int32,
            )
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            half = flat.shape[1] // g
            return jnp.concatenate([
                lo.reshape(n_heads, g, half, d_).astype(jnp.bfloat16),
                hi.reshape(n_heads, g, half, d_).astype(jnp.bfloat16),
            ], axis=2).reshape(n_heads * lanes, d_)       # [H*lanes, D]

        k_tok = nib_tokens(k_buf)
        v_tok = nib_tokens(v_buf)

        for h in range(n_heads):
            if sparse_heads:
                mask = (causal & band) | (causal & (flags_ref[h] == 1))
            else:
                mask = causal
            rs = slice(h * rows, (h + 1) * rows)
            hl = slice(h * lanes, (h + 1) * lanes)
            q_bf = q_ref[0, :, h].reshape(rows, q_ref.shape[-1]).astype(
                jnp.bfloat16
            )
            # corrections must use the bf16-rounded operands the MXU
            # sees: the +128 magic bias cancels ~128x (decode kernel)
            q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1,
                            keepdims=True)
            qk_int = jax.lax.dot_general(
                q_bf, k_tok[hl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [rows, lanes]
            if kv_zeros:
                s0 = sc_buf[slot, 0, h][None, :].astype(jnp.float32)
                s1 = sc_buf[slot, 1, h][None, :].astype(
                    jnp.float32)                          # = s*(z+128)
                # unpacked values carry no bias in either width
                s1 = s1 - 128.0 * s0
                qk = (qk_int * s0 - s1 * q_sum) * sm_scale
            else:
                qk = (qk_int - pt_bias * q_sum) * (pt_ref[0] * sm_scale)
            qk = jnp.where(mask, qk, MASK_VALUE)

            m_prev = m_ref[rs, 0][:, None]
            l_prev = l_ref[rs, 0][:, None]
            m_curr = jnp.max(qk, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask, jnp.exp(qk - m_next), 0.0)
            l_next = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)
            m_ref[rs, :] = jnp.broadcast_to(m_next, (rows, 128))
            l_ref[rs, :] = jnp.broadcast_to(l_next, (rows, 128))

            if kv_zeros:
                # scale planes of never-DMA'd lanes are garbage: mask
                # BEFORE multiplying (0 * NaN = NaN)
                p_bf = jnp.where(
                    mask,
                    pexp * sc_buf[slot, 2, h][None, :].astype(jnp.float32),
                    0.0,
                ).astype(jnp.bfloat16)
                z3 = sc_buf[slot, 3, h][None, :].astype(
                    jnp.float32) - 128.0                  # plane3=z+128
                corr = jnp.sum(
                    jnp.where(
                        mask,
                        p_bf.astype(jnp.float32) * z3,
                        0.0,
                    ),
                    axis=1, keepdims=True,
                )
                v_scale = 1.0
            else:
                p_bf = pexp.astype(jnp.bfloat16)
                corr = pt_bias * jnp.sum(
                    p_bf.astype(jnp.float32), axis=1, keepdims=True
                )
                v_scale = pt_ref[1]
            pv = jax.lax.dot_general(
                p_bf, v_tok[hl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[rs, :] = acc_ref[rs, :] * alpha + (pv - corr) * v_scale
        return 0

    jax.lax.fori_loop(0, trip, body, 0)

    d = o_ref.shape[-1]
    for h in range(n_heads):
        rs = slice(h * rows, (h + 1) * rows)
        l = jnp.maximum(l_ref[rs, 0][:, None], 1e-10)
        o_ref[0, :, h] = (acc_ref[rs, :] / l).reshape(
            tq, n_rep, d
        ).astype(o_ref.dtype)


def paged_prefill_single_pass(
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
    sel_logic=None,
    ring_span_pages: int = 0,
    ring_sink_tokens: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as paged_prefill.paged_prefill_attention (kv4/kv8)."""
    assert kv_bits in (4, 8)
    b, tq_total, hq, d = q.shape
    hkv = pool.num_heads
    n_rep = hq // hkv
    max_blocks = block_tables.shape[1]

    if sel_logic is None:
        n_pages = (context_lens + page_size - 1) // page_size
        tile = jnp.arange(max_blocks)
        sel_logic = jnp.where(
            tile[None, :] < n_pages[:, None], tile[None, :], -1
        )
    sel_phys = jnp.where(sel_logic >= 0, block_tables, 0)

    kv_chunk_tok = int(os.environ.get("OMNISERVE_PREFILL_KV_CHUNK", "2048"))
    quantum = max(1, 128 // page_size)
    cap = max(quantum, kv_chunk_tok // page_size)
    tp = sel_logic.shape[-1]
    g = min(cap, quantum * _cdiv(tp, quantum))
    n_chunks = _cdiv(tp, g)
    pad = n_chunks * g - tp
    if pad:
        cfg = [(0, 0), (0, pad)]
        sel_phys = jnp.pad(sel_phys, cfg)
        sel_logic = jnp.pad(sel_logic, cfg, constant_values=-1)

    L, P = pool.k_data.shape[0], pool.k_data.shape[1]
    rows_pg = pool.k_data.shape[3]
    k_flat = pool.k_data.reshape(L * P, hkv, rows_pg, d)
    v_flat = pool.v_data.reshape(L * P, hkv, rows_pg, d)
    sel_fold = (layer * P + sel_phys).astype(jnp.int32)

    fine = pool.kv_scales is not None and kv_zeros
    if fine:
        # plane-major pool scales ([L, P, 4, H, page], KVPool docstring)
        # reshape to the layer-folded view for FREE (leading dims only) —
        # the kernel DMAs pages with the same folded index as k/v
        sc_flat = pool.kv_scales.reshape(L * P, 4, hkv, page_size)
        sc_off = jnp.zeros((1,), jnp.int32)
    else:
        sc_flat = jnp.zeros((1, 4, hkv, page_size), jnp.float32)
        sc_off = jnp.zeros((1,), jnp.int32)

    if pool.k_scale_per_tensor is not None:
        pt_arr = jnp.stack([
            pool.k_scale_per_tensor[layer], pool.v_scale_per_tensor[layer]
        ]).astype(jnp.float32)
    else:
        pt_arr = jnp.zeros((2,), jnp.float32)

    tq = min(int(os.environ.get("OMNISERVE_PREFILL_TILE_Q", tile_q)),
             tq_total)
    q_tiles = _cdiv(tq_total, tq)
    if q_tiles * tq != tq_total:
        q = jnp.pad(q, ((0, 0), (0, q_tiles * tq - tq_total),
                        (0, 0), (0, 0)))
    q5 = q.reshape(b, q_tiles * tq, hkv, n_rep, d)

    q_start = q_positions[:, 0].astype(jnp.int32)
    q_count = (q_positions >= 0).sum(axis=1).astype(jnp.int32)

    # causal frontier per q tile -> fori_loop trip counts. Ring sources
    # carry relabeled positions far below their page label, so only the
    # plain paged source may skip past the diagonal.
    qt_idx = jnp.arange(q_tiles, dtype=jnp.int32)
    if ring_span_pages == 0:
        frontier = jnp.minimum(
            context_lens[:, None].astype(jnp.int32),
            q_start[:, None] + (qt_idx[None, :] + 1) * tq,
        )
        trips = _cdiv(_cdiv(frontier, page_size), g)
    else:
        trips = jnp.full((b, q_tiles), n_chunks, jnp.int32)
    trips = jnp.minimum(trips, n_chunks)
    # padded q tiles (q_count exhausted) attend nothing
    trips = jnp.where(
        (q_count[:, None] - qt_idx[None, :] * tq) > 0, trips, 0
    ).astype(jnp.int32)

    if head_is_retrieval is not None and (sink_size or local_size):
        flags = head_is_retrieval.astype(jnp.int32)
        if flags.shape[0] == hq:
            flags = flags[::n_rep]
        sparse = True
    else:
        flags = jnp.ones((hkv,), jnp.int32)
        sparse = False

    kernel = functools.partial(
        _psp_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_zeros=fine,
        g=g,
        n_chunks=n_chunks,
        n_heads=hkv,
        tq=tq,
        sink_size=int(sink_size),
        local_size=int(local_size),
        sparse_heads=sparse,
        kv_bits=kv_bits,
        ring_span=int(ring_span_pages),
        ring_sink_tok=int(ring_sink_tokens),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(b, q_tiles),
        in_specs=[
            pl.BlockSpec((1, tq, hkv, n_rep, d),
                         lambda b_, qt_, *pref: (b_, qt_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tq, hkv, n_rep, d),
                               lambda b_, qt_, *pref: (b_, qt_, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, g * rows_pg, d), jnp.uint8),
            pltpu.VMEM((2, hkv, g * rows_pg, d), jnp.uint8),
            pltpu.VMEM((2, 4, hkv, g * page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2, g, 3)),
            pltpu.VMEM((hkv * tq * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * tq * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * tq * n_rep, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_tiles * tq, hkv, n_rep, d),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=(
                int(os.environ.get("OMNISERVE_PREFILL_VMEM_MB", "100"))
                * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(sel_fold, sel_logic.astype(jnp.int32), q_start, q_count,
      context_lens.astype(jnp.int32), flags, trips, sc_off, pt_arr,
      q5, k_flat, v_flat, sc_flat)
    return out.reshape(b, q_tiles * tq, hq, d)[:, :tq_total]
