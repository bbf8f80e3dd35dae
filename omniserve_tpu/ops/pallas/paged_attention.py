"""Pallas TPU paged decode attention (the MMHA equivalent).

One kernel serves all decode paths of the reference MMHA family
(kernels/csrc/fused_attention/**, SURVEY.md §2.3):

- dense retrieval-head attention: page list = the block table in order
- dynamic-sparse: page list = the selector's logical top-k pages
  (reference ...Template.hpp:1631-1641's page indirection)
- streaming ring heads: the ring slots ARE a dense prefix of the streaming
  table, so the same kernel runs over the streaming pool with the length
  clamped to sink+local

Two-stage design, sized for TPU DMA efficiency:

1. **XLA page gather**: the selected pages are gathered from the pool into
   a contiguous [B, T, H, rows, D] (dense; one page list shared by all
   heads) or [B, H, T, rows, D] (per-head, dynamic-sparse) buffer with ONE
   large single-axis gather (each page slice is a contiguous 4 KB+ chunk).
   This costs one extra pass over the selected KV bytes but makes the
   page axis contiguous.
2. **Flash kernel over big blocks**: the kernel streams G pages per grid
   step through plain BlockSpecs (32 KB+ DMAs Mosaic can pipeline), doing
   online softmax with the KV kept in the QUANTIZED domain on the MXU:

     qk_t  = s_t * (q . k_u)_t - s_t * z_t * sum(q)          (per token t)
     out_d = (p~ @ v_u)_d - sum_t(p~_t * z_t),  p~_t = p_t * s_t

   i.e. the same zero-point factorization the reference does in CUDA
   registers (decoderMaskedMultiheadAttentionUtils.h
   convert_from_4bit_kv_cache), as two matmuls per chunk plus rank-1
   corrections.

A first cut drove per-page DMAs from scalar-prefetched page tables
(one 4 KB DMA per grid step): 18k grid steps at batch 128 ran ~300 ms.
The gather+big-blocks design runs the same shapes in ~2 ms at a cost of
one extra KV read+write.
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


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _mqa_kernel(
    # scalar prefetch
    sel_logic_ref,  # [B, T] or [B, H, T] int32 logical page (-1 = padding)
    lengths_ref,    # [B] int32
    win_ref,        # [B] int32 band window start (unused when band off)
    pt_ref,         # [2] f32 per-tensor (k, v) scales (dummy when unused)
    # blocks
    q_ref,          # [1, H, n_rep, D]
    k_ref,          # [1, G, H, rows, D] (dense) / [1, H, G, rows, D]
    v_ref,
    sc_ref,         # [1, H, 4, G*page] f32 quant-param planes for chunk j
                    # (k_scale, k_zero, v_scale, v_zero; fine-grained only)
    # outputs
    o_ref,          # [1, H, n_rep, D]
    # scratch
    m_ref, l_ref, acc_ref,  # [H*n_rep, 128] x2, [H*n_rep, D]
    *,
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    n_chunks: int,
    pages_per_chunk: int,
    per_head_sel: bool,
    n_heads: int,
    band_sink: int = -1,
    ring_span: int = 0,
    ring_sink_tok: int = 0,
):
    """One grid step = one sequence x one page chunk x ALL kv heads.

    The head loop lives INSIDE the kernel: at batch x heads x chunks grid
    granularity the per-step Mosaic overhead dominated (98k steps/decode on
    an 8B model); folding heads cuts grid steps 8x and enlarges each DMA.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    g = pages_per_chunk

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]

    # Token-lane layout of the flattened [1, G*page] axis is page-major for
    # every kv width (the kv4 unpack concats nibble halves per page along
    # the token axis). Lane-dim reshapes are unsupported in Mosaic — masks
    # are built directly at [1, G*page] via iota arithmetic, and the scale
    # inputs are pre-flattened OUTSIDE the kernel.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g * page_size), 1)
    page_of = lane // page_size
    within = lane % page_size
    # half-split kv4 layout: cat([lo, hi]) unpack lanes ARE token order
    # (kv4_unpack_order is the identity) — no relabel needed

    def chunk_mask(h):
        if per_head_sel:
            vals = [sel_logic_ref[b, h, j * g + i] for i in range(g)]
        else:
            vals = [sel_logic_ref[b, j * g + i] for i in range(g)]
        logic_lane = jnp.full_like(lane, -1)
        for i in range(g):
            logic_lane = jnp.where(page_of == i, vals[i], logic_lane)
        pos = logic_lane * page_size + within
        if band_sink >= 0 and ring_span > 0:
            # token-level ring: the current ring page's tail rows hold
            # last-wrap tokens (still inside the window) — re-label them
            cb = (length - 1) // page_size
            stale = (logic_lane == cb) & (
                within > jax.lax.rem(length - 1, page_size)
            )
            pos = jnp.where(stale, pos - ring_span * page_size, pos)
            floor = jnp.where(stale, ring_sink_tok, 0)
        else:
            floor = 0
        m = (logic_lane >= 0) & (pos < length) & (pos >= floor)
        if band_sink >= 0:
            # streaming decode band: sink + last dec-local window only
            m = m & ((pos < band_sink) | (pos >= win_ref[b]))
        return m

    shared_mask = None if per_head_sel else chunk_mask(0)

    def unpack(ref, h):
        raw = ref[0, :, h] if not per_head_sel else ref[0, h]
        if kv_bits == 16:
            return raw.reshape(g * raw.shape[-2], raw.shape[-1]).astype(
                jnp.bfloat16
            )
        raw_i = raw.astype(jnp.int32)                  # [g, rows, D]
        if kv_bits == 4:
            lo = (raw_i & 0xF).astype(jnp.bfloat16)
            hi = (raw_i >> 4).astype(jnp.bfloat16)
            # per-page nibble concat -> page-major token order
            cat = jnp.concatenate([lo, hi], axis=1)    # [g, page, D]
            return cat.reshape(g * page_size, -1)
        return raw_i.reshape(g * raw.shape[-2], raw.shape[-1]).astype(
            jnp.bfloat16
        )

    any_valid = (
        jnp.any(shared_mask) if not per_head_sel
        else (lengths_ref[b] > 0)
    )

    @pl.when(any_valid)
    def _compute():
        for h in range(n_heads):
            valid_f = shared_mask if shared_mask is not None else \
                chunk_mask(h)
            q = q_ref[0, h].astype(jnp.float32)        # [n_rep, D]
            n_rep = q.shape[0]
            rs = slice(h * n_rep, (h + 1) * n_rep)

            def scales(plane):
                return sc_ref[0, h, plane][None, :]    # [1, G*page]

            k_u = unpack(k_ref, h)                     # [G*page, D]
            q_bf = q.astype(jnp.bfloat16)
            qk_int = jax.lax.dot_general(
                q_bf, k_u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [n_rep, G*page]
            if kv_bits == 16:
                qk = qk_int * sm_scale
            elif kv_zeros:
                # planes stored folded: plane1 = sc*(z+128) (paged_kv)
                sc = scales(0)
                sz = scales(1) - 128.0 * sc
                q_sum = jnp.sum(q, axis=1, keepdims=True)
                qk = (qk_int * sc - sz * q_sum) * sm_scale
            else:
                ks = pt_ref[0]
                bias = 8.0 if kv_bits == 4 else 128.0
                q_sum = jnp.sum(q, axis=1, keepdims=True)
                qk = (qk_int - bias * q_sum) * (ks * sm_scale)

            qk = jnp.where(valid_f, qk, MASK_VALUE)

            # -- online softmax update (rows rs of the merged scratch) --
            m_prev = m_ref[rs, 0][:, None]             # [n_rep, 1]
            l_prev = l_ref[rs, 0][:, None]
            m_curr = jnp.max(qk, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.exp(qk - m_next)                # [n_rep, G*page]
            pexp = jnp.where(valid_f, pexp, 0.0)
            l_next = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)
            m_ref[rs, :] = jnp.broadcast_to(m_next, (n_rep, 128))
            l_ref[rs, :] = jnp.broadcast_to(l_next, (n_rep, 128))

            # -- V accumulation in the quantized domain --
            # corrections are computed from the SAME bf16-rounded weights
            # the PV dot uses: the zero-point cancellation is exact only
            # against the operands the MXU saw (f32 weights leave an O(1%)
            # residual sum((p_bf - p_f32) * z) because z >> signal)
            v_u = unpack(v_ref, h)
            if kv_bits == 16:
                p_bf = pexp.astype(jnp.bfloat16)
                corr = jnp.zeros((n_rep, 1), jnp.float32)
                v_scale = 1.0
            elif kv_zeros:
                vs = scales(2)
                vz = scales(3) - 128.0      # plane3 stored as v_zero+128
                p_bf = (pexp * vs).astype(jnp.bfloat16)
                corr = jnp.sum(
                    p_bf.astype(jnp.float32) * vz, axis=1, keepdims=True
                )
                v_scale = 1.0
            else:
                bias = 8.0 if kv_bits == 4 else 128.0
                p_bf = pexp.astype(jnp.bfloat16)
                corr = bias * jnp.sum(
                    p_bf.astype(jnp.float32), axis=1, keepdims=True
                )
                v_scale = pt_ref[1]
            pv = jax.lax.dot_general(
                p_bf, v_u,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [n_rep, D]
            o_curr = (pv - corr) * v_scale
            acc_ref[rs, :] = acc_ref[rs, :] * alpha + o_curr

    @pl.when(j == n_chunks - 1)
    def _finalize():
        n_rep = o_ref.shape[2]
        for h in range(n_heads):
            rs = slice(h * n_rep, (h + 1) * n_rep)
            l = jnp.maximum(l_ref[rs, 0][:, None], 1e-10)
            o_ref[0, h] = (acc_ref[rs, :] / l).astype(o_ref.dtype)


def paged_mqa_attention(
    q: jnp.ndarray,           # [B, Hkv, n_rep, D]
    k_sel: jnp.ndarray,       # [B, T, Hkv, rows, D] or [B, Hkv, T, rows, D]
    v_sel: jnp.ndarray,
    k_s, k_z, v_s, v_z,       # gathered scales, same leading dims + [page]
    sel_logic: jnp.ndarray,   # [B, T] or [B, Hkv, T] int32, -1 padded
    lengths: jnp.ndarray,     # [B] int32
    *,
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    pt_scales=None,
    pages_per_chunk: int = 8,
    band_sink_tokens: int = -1,
    band_local_tokens: int = 0,
    ring_span_pages: int = 0,
    ring_sink_tokens: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query attention over pre-gathered pages -> [B,Hkv,n_rep,D].

    ``band_sink_tokens >= 0`` enables the streaming decode band (only
    positions < sink or >= length - band_local attended); sel_logic must
    then hold true logical page ids (ring slots resolved by the caller).
    """
    b, hkv, n_rep, d = q.shape
    del k_z, v_s, v_z  # merged into k_s = kv_scales [B, T, H, 4, page]
    per_head_sel = sel_logic.ndim == 3
    n_tiles = sel_logic.shape[-1]
    g = min(pages_per_chunk, n_tiles)
    n_chunks = _cdiv(n_tiles, g)
    rows = k_sel.shape[-2]

    # pad the page axis to a multiple of g (logical -1 = masked). Callers
    # should pad the page LISTS before gathering (paged_decode_attention
    # does) — padding here would copy the whole gathered KV.
    pad = n_chunks * g - n_tiles
    if pad:
        sel_logic = jnp.pad(sel_logic, [(0, 0)] * (sel_logic.ndim - 1)
                            + [(0, pad)], constant_values=-1)

        def padp(x, ax):
            if x is None:
                return None
            cfg = [(0, 0)] * x.ndim
            cfg[ax] = (0, pad)
            return jnp.pad(x, cfg)

        # page axis is 1 in the dense [B, T, H, ...] layout but 2 in the
        # per-head [B, H, T, ...] layout
        page_ax = 2 if per_head_sel else 1
        k_sel = padp(k_sel, page_ax)
        v_sel = padp(v_sel, page_ax)
        k_s = padp(k_s, page_ax)

    def flatten_scale(s):
        """[B, T, H, 4, page] -> [B, H, 4, nc, G*page] in kernel lane order.

        One transpose+reshape pass over the (small) gathered params. kv4
        lanes are [G low halves; G high halves] per chunk (the order the
        half-split nibble unpack produces). Lane-dim reshapes are illegal
        inside Mosaic, hence this happens here in XLA.
        """
        if s is None:
            return None

        def perm_tokens(x):
            # half-split kv4: unpack lane order == token order
            # (kv4_unpack_order is the identity) — nothing to permute
            return x

        if per_head_sel:
            bb, hh, tt, pg4 = s.shape              # [B, H, T, 4*page]
            pg = pg4 // 4
            s = perm_tokens(s.reshape(bb, hh, tt, 4, pg))
            s = s.transpose(0, 1, 3, 2, 4)
            return s.reshape(bb, hh, 4, tt * pg)
        bb, tt, hh, pg4 = s.shape                  # [B, T, H, 4*page]
        pg = pg4 // 4
        s = perm_tokens(s.reshape(bb, tt, hh, 4, pg))
        s = s.transpose(0, 2, 3, 1, 4)
        return s.reshape(bb, hh, 4, tt * pg)

    k_s = flatten_scale(k_s)

    fine = kv_bits < 16 and kv_zeros

    if per_head_sel:
        # [B, H, T, rows, D]: contiguous page blocks per head
        data_spec = pl.BlockSpec(
            (1, hkv, g, rows, d), lambda b_, j_, *pref:
            (b_, 0, j_, 0, 0)
        )
    else:
        # page-major [B, T, H, rows, D] (the fast single-axis gather
        # layout); one fully-contiguous 256 KB block per step
        data_spec = pl.BlockSpec(
            (1, g, hkv, rows, d), lambda b_, j_, *pref:
            (b_, j_, 0, 0, 0)
        )
    # scales flattened to [B, H, 4, nc*G*page] in kernel lane order; chunk
    # j is a lane-axis block (trailing block dims (4, G*page): the 4 equals
    # the array dim, G*page is 128-aligned)
    gp = g * page_size
    scale_spec = pl.BlockSpec(
        (1, hkv, 4, gp),
        lambda b_, j_, *pref: (b_, 0, 0, j_)
    )

    in_specs = [
        pl.BlockSpec((1, hkv, n_rep, d), lambda b_, j_, *pref:
                     (b_, 0, 0, 0)),
        data_spec, data_spec,
    ]
    inputs = [q, k_sel, v_sel]
    if fine:
        in_specs += [scale_spec]
        inputs += [k_s]
    else:
        dummy = jnp.zeros((1, hkv, 4, gp), jnp.float32)
        zero_spec = pl.BlockSpec(
            (1, hkv, 4, gp),
            lambda b_, j_, *pref: (0,) * 4
        )
        in_specs += [zero_spec]
        inputs += [dummy]

    if pt_scales is None:
        pt_arr = jnp.zeros((2,), jnp.float32)
    else:
        pt_arr = jnp.stack([
            jnp.asarray(pt_scales[0], jnp.float32),
            jnp.asarray(pt_scales[1], jnp.float32),
        ])
    win_start = jnp.maximum(
        0, lengths.astype(jnp.int32) - int(band_local_tokens)
    )
    kernel = functools.partial(
        _mqa_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_bits=kv_bits,
        kv_zeros=kv_zeros,
        n_chunks=n_chunks,
        pages_per_chunk=g,
        per_head_sel=per_head_sel,
        n_heads=hkv,
        band_sink=int(band_sink_tokens),
        ring_span=int(ring_span_pages),
        ring_sink_tok=int(ring_sink_tokens),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hkv, n_rep, d),
            lambda b_, j_, *pref: (b_, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((hkv * n_rep, 128), jnp.float32),  # m
            pltpu.VMEM((hkv * n_rep, 128), jnp.float32),  # l
            pltpu.VMEM((hkv * n_rep, d), jnp.float32),    # acc
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sel_logic.astype(jnp.int32), lengths.astype(jnp.int32), win_start,
      pt_arr, *inputs)


# ---------------------------------------------------------------------------
# Wrapper with the reference signature (pool routing, sparse, streaming)
# ---------------------------------------------------------------------------


def _pool_head_sources(head_rank, flags, n_pool_heads, want_retrieval):
    """For each pool row r: which kv head maps to it (inverse of rank)."""
    rows = jnp.arange(n_pool_heads)
    sel = flags if want_retrieval else ~flags
    match = (head_rank[None, :] == rows[:, None]) & sel[None, :]
    return jnp.argmax(match, axis=1)  # [n_pool_heads]



def _choose_chunk(t: int, cap: int = 8, page_size: int = 128) -> int:
    """Pages per kernel chunk. Pad pages are DMA'd (compute is masked), so
    minimize the padded total ceil(t/g)*g; ties go to the larger chunk
    (fewer grid steps).

    Alignment: the fine-grained scale BlockSpec's lane block is g*page, so
    g*page must be a 128-lane multiple UNLESS one chunk covers the whole
    (padded) list — the "block == array dims" escape hatch. Sub-128 pages
    (reference default 64) therefore need g to be a multiple of
    128/page_size; without this, multi-chunk fine-grained calls fail
    Mosaic lowering on hardware while interpret mode accepts them."""
    quantum = max(1, 128 // page_size)
    if t <= cap:
        return t                       # single chunk == whole array
    best_g, best_padded = None, None
    for g in range(min(cap, t), 1, -1):
        if g % quantum:
            continue
        padded = -(-t // g) * g
        if best_padded is None or padded < best_padded:
            best_g, best_padded = g, padded
    if best_g is None:
        # no aligned chunk fits under the cap: fall back to one chunk
        # covering the whole list (block == array, no alignment rule)
        return t
    return best_g


def _pad_sel(sel_phys, sel_logic, quantum: int = 8):
    """Pad page lists to a DMA-chunk multiple BEFORE the gather (padding
    the gathered KV afterwards would copy it wholesale)."""
    t = sel_logic.shape[-1]
    pad = (-t) % quantum
    if pad == 0:
        return sel_phys, sel_logic
    cfg = [(0, 0)] * (sel_logic.ndim - 1) + [(0, pad)]
    return (jnp.pad(sel_phys, cfg),
            jnp.pad(sel_logic, cfg, constant_values=-1))


def _gather_pool(pool: KVPool, layer, sel_phys):
    """Gather selected pages: -> [B(,H), T, H, rows, D] data and
    [B(,H), T, H, 4, page] quant params.

    ONE single-axis gather per array over a [L*P, ...] flat view with the
    (traced) layer folded into the page index — ``arr[layer][sel]`` would
    first dynamic-slice-copy the whole 67 MB+ layer slab, and multi-array
    index gathers (page + head) lower to slow small-slice gathers. Each
    gathered slice here is a contiguous 32 KB+ page."""
    per_head = sel_phys.ndim == 3
    n_pages = pool.k_data.shape[1]
    # pool scales are plane-major [L, P, 4, H, page] (KVPool docstring);
    # this FALLBACK path (supports()==False configs only) restores the
    # head-major [L, P, H, 4*page] view the two-stage kernels consume.
    # The transpose materializes pool-sized scales — acceptable off the
    # hot path, the single-pass kernels gather plane-major directly.
    sc_head_major = pool.kv_scales
    if sc_head_major is not None:
        L_, P_, _, H_, pg_ = sc_head_major.shape
        sc_head_major = sc_head_major.transpose(0, 1, 3, 2, 4).reshape(
            L_, P_, H_, 4 * pg_
        )
    if per_head:
        # dynamic-sparse: pages differ per head. Fold (layer, page, head)
        # into ONE flat index over a [L*P*H, ...] view — multi-index-array
        # gathers lower to slow small-slice gathers, single-axis gathers
        # of contiguous [rows, D] slices run near HBM peak.
        h_ = pool.k_data.shape[2]
        h_idx = jnp.arange(h_)[None, :, None]
        flat_idx = (layer * n_pages + sel_phys) * h_ + h_idx  # [B, H, T]

        def take(arr):
            if arr is None:
                return None
            return arr.reshape((-1,) + arr.shape[3:])[flat_idx]

        return take(pool.k_data), take(pool.v_data), take(sc_head_major)

    flat_idx = layer * n_pages + sel_phys       # [B, T]

    def take(arr):
        if arr is None:
            return None
        return arr.reshape((-1,) + arr.shape[2:])[flat_idx]

    return take(pool.k_data), take(pool.v_data), take(sc_head_major)


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
    dec_sink_tokens: Optional[int] = None,
    dec_local_tokens: Optional[int] = None,
    append_kv=None,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for attention_ref.paged_decode_attention.

    ``append_kv=(k_new [B,Hkv,D], v_new)`` fuses the decode KV append into
    the single-pass kernels (context_lens must then INCLUDE the new
    token); requires the single-pass path and no dynamic page selection.
    Returns (out, retrieval_pool', streaming_pool') instead of out."""
    b, hq, d = q.shape
    max_blocks = block_tables.shape[1]
    pure_dense = head_is_retrieval is None
    if pure_dense:
        # no streaming pool and identity head routing: skip the pool-row
        # gathers/scatters entirely (they cost ~1 ms/step at batch 128)
        hkv = pool.num_heads
        head_is_retrieval = jnp.ones((hkv,), bool)
        head_rank = jnp.arange(hkv)
    else:
        hkv = head_is_retrieval.shape[0]
    n_rep = hq // hkv
    q_g = q.reshape(b, hkv, n_rep, d)

    def pt_of(p: KVPool):
        if p.k_scale_per_tensor is not None:
            return (p.k_scale_per_tensor[layer], p.v_scale_per_tensor[layer])
        return None

    from omniserve_tpu.ops.pallas import decode_attention as sp

    use_sp = sp.supports(kv_bits, page_size, d)
    if append_kv is not None:
        assert use_sp and page_idxes is None, (
            "fused decode append needs the single-pass kernel and no "
            "dynamic page selection (dispatch gates this)"
        )
        k_all_new, v_all_new = append_kv
        tgt_logic = jnp.where(
            context_lens > 0, (context_lens - 1) // page_size, -1
        ).astype(jnp.int32)
        tgt_slot = jnp.where(
            context_lens > 0, (context_lens - 1) % page_size, 0
        ).astype(jnp.int32)

    # -- retrieval pool call (q heads routed by rank) --
    hr = pool.num_heads
    if pure_dense:
        q_r = q_g
        src_r = jnp.arange(hr)   # identity (used by page_idxes routing)
    else:
        src_r = _pool_head_sources(head_rank, head_is_retrieval, hr, True)
        q_r = q_g[:, src_r]                           # [B, Hr, n_rep, D]
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
        sel_logic = jnp.where(
            tile[None, :] < n_pages[:, None], tile[None, :], -1
        )                                             # [B, max_blocks]
        sel_phys = jnp.where(sel_logic >= 0, block_tables, 0)
    # Dynamic-sparse decode runs the _ph single-pass kernel, which (r5)
    # DMAs each selected page's whole plane record in-kernel. The r4
    # version pre-gathered planes with an XLA fancy gather that
    # relayout-copied the layer's plane slab every step (13.5 ms/step at
    # 64K, the sparse-decode sweep regression); a row-granular gather
    # lowers to a while-loop 20x worse still. OMNISERVE_SPARSE_SINGLE_PASS=0
    # forces the two-stage gather path for A/B.
    import os as _os

    use_sp_ph = use_sp and (
        _os.environ.get("OMNISERVE_SPARSE_SINGLE_PASS", "1") == "1"
    )
    if use_sp_ph and page_idxes is not None:
        # per-head page lists: pages + quant planes DMA'd in-kernel
        out_r = sp.paged_mqa_attention_single_pass_ph(
            q_r, pool, layer, sel_phys, sel_logic,
            context_lens.astype(jnp.int32),
            sm_scale=sm_scale, page_size=page_size, kv_zeros=kv_zeros,
            pt_scales=pt_of(pool), interpret=interpret,
        )
    elif use_sp and page_idxes is None:
        # single-pass kernel: pages read straight from the HBM pool
        app_r = None
        if append_kv is not None:
            # dense list position == logical page
            app_r = (
                k_all_new[:, src_r], v_all_new[:, src_r],
                tgt_logic, tgt_slot,
            )
        out_r = sp.paged_mqa_attention_single_pass(
            q_r, pool, layer, sel_phys, sel_logic,
            context_lens.astype(jnp.int32),
            sm_scale=sm_scale, page_size=page_size, kv_zeros=kv_zeros,
            pt_scales=pt_of(pool), append=app_r,
            # sel_logic above is tile < n_pages: position == logical page,
            # so the kernel derives positions from iotas (no lane map)
            contiguous_logic=True, interpret=interpret,
        )
        if app_r is not None:
            out_r, pool = out_r
    else:
        g_r = _choose_chunk(sel_logic.shape[-1], page_size=page_size)
        sel_phys, sel_logic = _pad_sel(sel_phys, sel_logic, quantum=g_r)
        kd, vd, ksc = _gather_pool(pool, layer, sel_phys)
        out_r = paged_mqa_attention(
            q_r, kd, vd, ksc, None, None, None,
            sel_logic.astype(jnp.int32),
            context_lens.astype(jnp.int32),
            pages_per_chunk=g_r,
            sm_scale=sm_scale, page_size=page_size, kv_bits=kv_bits,
            kv_zeros=kv_zeros, pt_scales=pt_of(pool), interpret=interpret,
        )                                             # [B, Hr, n_rep, D]
    if pure_dense:
        out_flat = out_r.reshape(b, hq, d)
        if append_kv is not None:
            return out_flat, pool, None
        return out_flat

    # scatter pool rows back to kv-head positions
    rank_c = jnp.clip(head_rank, 0, hr - 1)
    out_full_r = jnp.take_along_axis(
        out_r, rank_c[None, :, None, None].repeat(b, 0).repeat(n_rep, 2),
        axis=1,
    )                                                 # [B, Hkv, n_rep, D]

    if streaming_pool is None:
        out_flat = out_full_r.reshape(b, hq, d)
        if append_kv is not None:
            return out_flat, pool, None
        return out_flat

    # -- streaming ring pool call --
    # Ring slots are resolved to their LOGICAL block ids so positions are
    # true token positions; the (dec sink, dec local) band then attends
    # exactly the reference streaming window even when the ring is larger
    # (chunked sparse prefill sizes it for the ctx-local window).
    hs = streaming_pool.num_heads
    src_s = _pool_head_sources(head_rank, head_is_retrieval, hs, False)
    q_s = q_g[:, src_s]
    n_slots = streaming_block_tables.shape[1]
    ring_local = max(1, n_slots - sink_blocks)
    if dec_sink_tokens is None:
        dec_sink_tokens = sink_blocks * page_size
    if dec_local_tokens is None:
        dec_local_tokens = local_blocks * page_size
    # COMPACT page list: only the sink blocks plus the newest blocks that
    # intersect the decode band — the ring may be sized for the much
    # larger chunked-prefill window, and streaming the whole ring through
    # the kernel with 99% of it masked cost ~13 ms/step at 64K.
    dec_local_b = min(
        ring_local, -(-int(dec_local_tokens) // page_size) + 1
    )
    sink_eff = min(sink_blocks, n_slots)
    cb = jnp.maximum((context_lens[:, None] - 1) // page_size, 0)  # [B,1]
    kk = jnp.arange(dec_local_b)[None, :]
    bb_blk = cb - kk                                  # newest blocks
    ring_sl = sink_blocks + jnp.mod(
        bb_blk - sink_blocks, ring_local
    )
    ok_ring = (bb_blk >= sink_blocks) & (context_lens[:, None] > 0)
    logic_ring = jnp.where(ok_ring, bb_blk, -1)
    phys_ring = jnp.take_along_axis(
        streaming_block_tables, jnp.clip(ring_sl, 0, n_slots - 1), axis=1
    )
    phys_ring = jnp.where(ok_ring, phys_ring, 0)
    sink_ids = jnp.arange(sink_eff)[None, :]
    logic_sink = jnp.where(
        (sink_ids <= cb) & (context_lens[:, None] > 0), sink_ids, -1
    )
    sel_logic_s = jnp.concatenate([logic_sink, logic_ring], axis=1)
    sel_phys_s = jnp.concatenate(
        [streaming_block_tables[:, :sink_eff], phys_ring], axis=1
    )
    sel_phys_s = jnp.where(sel_logic_s >= 0, sel_phys_s, 0)
    if use_sp:
        app_s = None
        if append_kv is not None:
            # newest page's position in [sinks..., newest ring blocks...]:
            # within the sinks it is cb itself, else the first ring entry
            tgt_pos_s = jnp.where(
                context_lens > 0,
                jnp.where(tgt_logic < sink_blocks, tgt_logic, sink_eff),
                -1,
            ).astype(jnp.int32)
            app_s = (
                k_all_new[:, src_s], v_all_new[:, src_s],
                tgt_pos_s, tgt_slot,
            )
        out_s = sp.paged_mqa_attention_single_pass(
            q_s, streaming_pool, layer, sel_phys_s, sel_logic_s,
            context_lens.astype(jnp.int32),
            sm_scale=sm_scale, page_size=page_size, kv_zeros=kv_zeros,
            pt_scales=pt_of(streaming_pool),
            band_sink_tokens=int(dec_sink_tokens),
            band_local_tokens=int(dec_local_tokens),
            ring_span_pages=ring_local,
            ring_sink_tokens=sink_blocks * page_size,
            append=app_s,
            interpret=interpret,
        )
        if app_s is not None:
            out_s, streaming_pool = out_s
    else:
        g_s = _choose_chunk(sel_logic_s.shape[-1], page_size=page_size)
        sel_phys_s, sel_logic_s = _pad_sel(
            sel_phys_s, sel_logic_s, quantum=g_s
        )
        kd, vd, ksc = _gather_pool(streaming_pool, layer, sel_phys_s)
        out_s = paged_mqa_attention(
            q_s, kd, vd, ksc, None, None, None,
            sel_logic_s.astype(jnp.int32),
            context_lens.astype(jnp.int32),
            pages_per_chunk=g_s,
            sm_scale=sm_scale, page_size=page_size, kv_bits=kv_bits,
            kv_zeros=kv_zeros, pt_scales=pt_of(streaming_pool),
            band_sink_tokens=int(dec_sink_tokens),
            band_local_tokens=int(dec_local_tokens),
            ring_span_pages=ring_local,
            ring_sink_tokens=sink_blocks * page_size,
            interpret=interpret,
        )
    rank_s = jnp.clip(head_rank, 0, hs - 1)
    out_full_s = jnp.take_along_axis(
        out_s, rank_s[None, :, None, None].repeat(b, 0).repeat(n_rep, 2),
        axis=1,
    )
    out = jnp.where(
        head_is_retrieval[None, :, None, None], out_full_r, out_full_s
    )
    out_flat = out.reshape(b, hq, d)
    if append_kv is not None:
        return out_flat, pool, streaming_pool
    return out_flat
