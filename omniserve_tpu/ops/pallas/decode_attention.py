"""Single-pass Pallas TPU paged decode attention (kv4/kv8).

Replaces the two-stage (XLA page gather -> flash kernel) design of
``paged_attention.py`` for the hot QServe decode path. The KV pools stay
in HBM (``memory_space=ANY``); the kernel drives its own double-buffered
page DMAs from scalar-prefetched page tables, so the selected KV bytes are
read from HBM exactly ONCE (the reference MMHA's single-pass structure,
kernels/csrc/fused_attention/.../decoderMaskedMultiheadAttentionTemplate.hpp,
reached here with Pallas ``make_async_copy`` instead of cp.async).

Compute runs on the INT8 MXU (round 5): the bf16 dots at decode's skinny
M = n_rep measured ~10x their int8 time (scripts/microbench_attn.py,
MB_COMPUTE=dots vs dots_i8), leaving the kernel compute-bound at ~133%
of its DMA floor. K/V codes are exact small ints, so only two new
roundings enter vs the reference's fp16 MMHA math: q is dynamically
quantized per (head, rep) row (q_i8 = rint(q/qs), qs = amax/127) and the
softmax weights p per (head, rep) row for the PV dot. Unpack stays in
the packed int32 domain with zero per-element conversions: bytes bitcast
u8->i32 (little-endian sublane packing, verified on hardware), the two
nibble streams extracted with ``& 0x0F0F0F0F`` / ``>> 4`` and bitcast
straight back to i8; kv8 rows are XOR'd 0x80 so biased u8 storage lands
in two's complement exactly. Every zero-point / bias correction is a
rank-1 term computed from the SAME integers the MXU consumed:

    k_fp = (A - z) * s,  A = k_nib (i8 exact)
    q.k  = qs * (s * (q_i8.A) + (s*128 - s*(z+128)) * sum(q_i8))

The HALF-SPLIT kv4 page layout (ops/paged_kv.kv4_slot_to_row_nibble:
row = slot %% page/2, hi nibble iff slot >= page/2 — the GEMM weight
packing scheme) makes the cat([lo, hi]) streams tokens [0, page/2) and
[page/2, page) IN ORDER: token order is restored by a plain sublane
concat, no shuffles (the interleaved r1-r4 layout needed a (32,2)
sublane transpose in the i8 domain, which Mosaic lowers ~2 ms/call).

Scale/zero planes ride the SAME in-kernel DMA pipeline as the pages: each
page's [4, H, page] f32 plane block lands at lane window [i*page, (i+1)*
page) of a per-chunk VMEM buffer, which is exactly the kernel's page-major
token lane order. (Round 2 pre-gathered the planes with lax.gather, which
costs three HBM passes — gather read + write + kernel re-read, ~2.2 GB at
batch 160 — where the in-kernel DMA costs one. The page%128==0 constraint
in ``supports`` keeps these f32 lane windows tile-aligned.) The zero-point
math is folded into two planes per K/V at append time (ops/paged_kv.KVPool).
The per-head dynamic-sparse variant (``_sp_kernel_ph``) still pre-gathers:
its selected pages are few and per-(page, head) plane rows are sub-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniserve_tpu.ops.paged_kv import KVPool

MASK_VALUE = -1e37
DMA_GROUP = 7                # pages per predicated DMA group (see issue();
#                              r5 sweep: 390 us @2 -> 384 us @7, B=128 W=14)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def supports(kv_bits: int, page_size: int, head_dim: int) -> bool:
    """Whether the single-pass kernel can serve this config.

    Alignment invariants (violations compile in interpret mode but fail
    Mosaic on hardware):
    - per-page KV DMA destinations sit at i*rows_pg u8 sublanes, so
      rows_pg (= page/2 for kv4, page for kv8) must be a 32-multiple;
    - the scale-buffer DMA destinations and quant-plane blocks slice f32
      lanes at i*page offsets, so page must be a 128-lane multiple;
    - per-page KV DMAs slice the pool's trailing dim, so head_dim must be
      a 128-lane multiple.
    Excluded configs fall back to the two-stage gather kernels.
    """
    if kv_bits not in (4, 8) or page_size <= 0:
        return False
    rows_pg = page_size // 2 if kv_bits == 4 else page_size
    return (
        rows_pg % 32 == 0
        and page_size % 128 == 0
        and head_dim % 128 == 0
    )


def _quant_token_rows(x, kv_bits, kv_zeros, pt_scale):
    """[H, D] f32 -> (q in [0, levels] f32, dequantized f32, planes|None).

    Same math as ops/pallas/kv_append._quant_rows; ``planes`` is the
    per-head folded (scale, scale*(zero+128)) pair for the fine path.
    """
    if kv_zeros:
        levels = 15.0 if kv_bits == 4 else 255.0
        x_max = jnp.max(x, axis=1, keepdims=True)
        x_min = jnp.min(x, axis=1, keepdims=True)
        rng = jnp.maximum(x_max - x_min, 1e-5)
        scale = rng / levels
        zero = -levels * x_min / rng
        qv = jnp.clip(jnp.rint(x / scale + zero), 0.0, levels)
        dq = (qv - zero) * scale
        return qv, dq, (scale, zero)
    qmax = 7.0 if kv_bits == 4 else 127.0
    qv = jnp.clip(jnp.rint(x / pt_scale), -qmax - 1.0, qmax) + (qmax + 1.0)
    dq = (qv - (qmax + 1.0)) * pt_scale
    return qv, dq, None


def _sp_kernel(
    *args,
    sm_scale: float,
    page_size: int,
    kv_zeros: bool,
    n_chunks: int,
    g: int,
    n_heads: int,
    band_sink: int,
    kv_bits: int = 4,
    ring_span: int = 0,       # ring capacity in pages (streaming calls)
    ring_sink_tok: int = 0,   # first ring-block position (tokens)
    fused: bool = False,      # quantize + append the new token in-kernel
    contiguous: bool = False,  # sel_logic[b, t] == t for live entries
    with_lse: bool = False,   # emit (m, l) partials for SP LSE-combine
):
    if fused:
        (sel_phys_ref, sel_logic_ref, lengths_ref, win_ref, pt_ref,
         tgt_pos_ref, tgt_slot_ref,
         q_ref, k_hbm, v_hbm, sc_hbm,
         o_ref, kd_out, vd_out, sc_out,
         k_buf, v_buf, sc_buf, sem,
         wk_buf, wv_buf, wsc_buf, wsem,
         m_ref, l_ref, acc_ref) = args
    elif with_lse:
        (sel_phys_ref, sel_logic_ref, lengths_ref, win_ref, pt_ref,
         q_ref, k_hbm, v_hbm, sc_hbm,
         o_ref, m_out, l_out,
         k_buf, v_buf, sc_buf, sem,
         m_ref, l_ref, acc_ref) = args
    else:
        (sel_phys_ref, sel_logic_ref, lengths_ref, win_ref, pt_ref,
         q_ref, k_hbm, v_hbm, sc_hbm,
         o_ref,
         k_buf, v_buf, sc_buf, sem,
         m_ref, l_ref, acc_ref) = args
    # args: scalar prefetch [B,Tp] phys / [B,Tp] logic / [B] lengths /
    # [B] band window start / [2] per-tensor scales (+ fused: [B] target
    # position in the sel list, [B] slot within the page); blocks q
    # [1,H,n_rep,D] (fused: [1,H,n_rep+2,D] — the new-token k/v ride as
    # two extra q rows so the window streams ONE input block per step);
    # ANY-space pools [L*P,H,R,D] u8 and planes [L*P,4,H,page] f32; out o
    # (+ fused: aliased pool arrays); scratch: double-buffered page/plane
    # buffers, (+ fused: write-back window/plane buffers), flash m/l/acc.
    n_rep = q_ref.shape[2] - 2 if fused else q_ref.shape[2]
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    kv4 = kv_bits == 4
    rows = page_size // 2 if kv4 else page_size  # byte rows per page
    bk = page_size // 4            # quarter-page (lane/chunk geometry)
    step = b * n_chunks + j
    slot = jax.lax.rem(step, 2)

    # ---------------- DMA pipeline ----------------
    def copies(bb, cc, sl, i):
        idx = sel_phys_ref[bb, cc * g + i]
        cps = [
            pltpu.make_async_copy(
                k_hbm.at[idx],
                k_buf.at[sl, :, pl.ds(i * rows, rows), :],
                sem.at[sl, i, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[idx],
                v_buf.at[sl, :, pl.ds(i * rows, rows), :],
                sem.at[sl, i, 1],
            ),
        ]
        if kv_zeros:
            # dst sc_buf[sl, i] is CONTIGUOUS (page-record-major buffer):
            # a lane-window dst ([..., i*page:(i+1)*page]) costs ~25% extra
            # kernel time from 32 strided 512B chunks per copy (measured,
            # scripts/microbench_attn.py v_scdma vs the r3 strided layout)
            cps.append(pltpu.make_async_copy(
                sc_hbm.at[idx],
                sc_buf.at[sl, i],
                sem.at[sl, i, 2],
            ))
        return cps

    # Page-GROUP predicated copies: page lists fill front-to-back, so a
    # group whose FIRST page is padding is entirely padding (exactness:
    # at most DMA_GROUP-1 pad pages leak per sequence). Round 3 issued
    # the whole chunk unconditionally ("~1 pad page of waste beats one
    # predicated scalar region per page"), but the engine's pow-2 block
    # tables carry up to 7 pad pages at w=16/len 1024 — 44% wasted HBM
    # bandwidth on the step's dominant stream. Group size 2 keeps the
    # predicated regions at g/2 while bounding waste at one page.
    def issue(bb, cc, sl):
        bbc = jnp.minimum(bb, nb - 1)
        for i0 in range(0, g, DMA_GROUP):
            @pl.when((bb < nb) & (sel_logic_ref[bbc, cc * g + i0] >= 0))
            def _():
                for i in range(i0, min(i0 + DMA_GROUP, g)):
                    for c in copies(bbc, cc, sl, i):
                        c.start()

    @pl.when(step == 0)
    def _cold_start():
        issue(b, j, slot)

    # prefetch the next chunk (wrapping to the next sequence) while this
    # chunk computes; slot bookkeeping is global-step parity
    nxt_b = jnp.where(j == n_chunks - 1, b + 1, b)
    nxt_j = jnp.where(j == n_chunks - 1, 0, j + 1)
    issue(nxt_b, nxt_j, 1 - slot)

    for i0 in range(0, g, DMA_GROUP):
        @pl.when(sel_logic_ref[b, j * g + i0] >= 0)
        def _wait_group():
            for i in range(i0, min(i0 + DMA_GROUP, g)):
                for c in copies(b, j, slot, i):
                    c.wait()

    # ---------------- flash accumulation ----------------
    single = n_chunks == 1

    if not single:
        @pl.when(j == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    gb = g * bk                    # tokens per nibble stream per chunk
    lanes = 4 * gb                 # chunk token lanes

    # 4-D [·, ·, G, T] page x token geometry: per-PAGE logical ids (G
    # scalars) broadcast against a token iota. Round 3 built a per-LANE
    # map with g sequential selects over [1, 1, lanes] and ran all the
    # softmax/scale math on flat lanes — measured 0.51 -> 0.41 ms/call at
    # B=128, G=16 (scripts/microbench_attn.py v_cur vs v_scdma).
    tok4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g, page_size), 3)
    pgi4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g, 1), 2)
    if contiguous:
        # dense page lists: logical page == list position (wrapper built
        # sel_logic as tile < n_pages — pad lanes fall past ``length``)
        logic4 = j * g + pgi4
    else:
        logic4 = jnp.full_like(pgi4, -1)
        for p in range(g):
            logic4 = jnp.where(
                pgi4 == p, sel_logic_ref[b, j * g + p], logic4
            )
    pos = logic4 * page_size + tok4            # [1, 1, g, T]
    if band_sink >= 0 and ring_span > 0:
        # Token-level ring: rows of the CURRENT ring page past the write
        # head still hold tokens from one wrap earlier (still inside the
        # local window) — re-label their positions instead of masking.
        cb = (length - 1) // page_size
        stale = (logic4 == cb) & (tok4 > jax.lax.rem(length - 1, page_size))
        pos = jnp.where(stale, pos - ring_span * page_size, pos)
        floor = jnp.where(stale, ring_sink_tok, 0)
    else:
        floor = 0
    # fused append: the new token's in-page lane is stale (its write
    # happens in this same kernel pass) — exclude it and attend the token
    # through an exact extra lane computed from the quantized values
    page_len = length - 1 if fused else length
    valid = (pos < page_len) & (pos >= floor)
    if not contiguous:
        valid = valid & (logic4 >= 0)
    if band_sink >= 0:
        # streaming decode band: sink tokens + the last dec-local window
        # (reference MMHA streaming-head semantics at token granularity)
        valid = valid & ((pos < band_sink) | (pos >= win_ref[b]))

    if fused:
        tgt_pos = tgt_pos_ref[b]
        tslot = tgt_slot_ref[b]
        new_active = (tgt_pos >= 0) & (length > 0)
        kq, k_dq, k_pl = _quant_token_rows(
            q_ref[0, :, n_rep].astype(jnp.float32), kv_bits, kv_zeros,
            pt_ref[0],
        )
        vq, v_dq, v_pl = _quant_token_rows(
            q_ref[0, :, n_rep + 1].astype(jnp.float32), kv_bits, kv_zeros,
            pt_ref[1],
        )
        # extra-lane score from the SAME dequantized values the page would
        # hold after the append (append-then-attend numerics)
        q_f32 = q_ref[0, :, :n_rep].astype(jnp.float32)  # [H, n_rep, D]
        qk_new = jnp.sum(
            q_f32 * k_dq[:, None, :], axis=2, keepdims=True
        ) * sm_scale                                   # [H, n_rep, 1]
        qk_new = jnp.where(new_active, qk_new, MASK_VALUE)
        qk_new4 = qk_new[..., None]                    # [H, n_rep, 1, 1]
        v_dq_b = v_dq[:, None, :]                      # [H, 1, D]

    # ---------------- fused append write-back ----------------
    if fused:
        c_star = tgt_pos // g              # chunk holding the target page
        i_star = tgt_pos - c_star * g      # page position within the chunk
        phys_tgt = sel_phys_ref[b, jnp.maximum(tgt_pos, 0)]
        if kv4:
            # half-split: row = slot % (page/2), hi nibble iff slot >= it
            half_pg = page_size // 2
            drow = jax.lax.rem(tslot, half_pg)
            is_hi = tslot >= half_pg
        else:
            drow = tslot
            is_hi = jnp.asarray(False)
        win = 32 if rows % 32 == 0 else rows   # u8 sublane window
        wbase = (drow // win) * win            # page-local window start
        rel = drow - wbase

        def wb_copies():
            cps = [
                pltpu.make_async_copy(
                    wk_buf,
                    kd_out.at[phys_tgt, :, pl.ds(
                        pl.multiple_of(wbase, win), win), :],
                    wsem.at[0],
                ),
                pltpu.make_async_copy(
                    wv_buf,
                    vd_out.at[phys_tgt, :, pl.ds(
                        pl.multiple_of(wbase, win), win), :],
                    wsem.at[1],
                ),
            ]
            if kv_zeros:
                cps.append(pltpu.make_async_copy(
                    wsc_buf, sc_out.at[phys_tgt], wsem.at[2],
                ))
            return cps

        do_wb = new_active & (j == jnp.minimum(c_star, n_chunks - 1))

        @pl.when(do_wb)
        def _write_back():
            bstart = pl.multiple_of(i_star * rows + wbase, win)

            # merge only the target row's 8-row ALIGNED slice (Mosaic u8
            # sublane windows must be provably 8-aligned). The round-3
            # form int32-expanded the whole [H, win, D] window through a
            # where(hit) select — with n_chunks == 1 every grid step is
            # its own target chunk, so that ran per step (~0.5 ms/step at
            # batch 128); this touches win/8 = 4x less data.
            relb8 = pl.multiple_of((rel // 8) * 8, 8)
            r8 = rel - relb8
            hit8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == r8

            def merge(buf, wbuf, qv):
                wbuf[...] = buf[slot, :, pl.ds(bstart, win), :]
                w_i = buf[
                    slot, :, pl.ds(pl.multiple_of(bstart + relb8, 8), 8), :
                ].astype(jnp.int32)                    # [H, 8, D]
                q_i = jnp.clip(qv, 0.0, 255.0).astype(jnp.int32)[:, None, :]
                if kv4:
                    upd = jnp.where(
                        is_hi,
                        (w_i & 0x0F) | (q_i << 4),
                        (w_i & 0xF0) | q_i,
                    )
                else:
                    upd = jnp.broadcast_to(q_i, w_i.shape)
                wbuf[:, pl.ds(relb8, 8), :] = pltpu.bitcast(
                    jnp.where(hit8, upd, w_i).astype(jnp.int8), jnp.uint8
                )

            merge(k_buf, wk_buf, kq)
            merge(v_buf, wv_buf, vq)
            if kv_zeros:
                lane_sc = jax.lax.broadcasted_iota(
                    jnp.int32, (4, n_heads, page_size), 2
                )
                ks_, kz_ = k_pl
                vs_, vz_ = v_pl
                vals = jnp.stack([
                    ks_, ks_ * (kz_ + 128.0), vs_, vz_ + 128.0
                ], axis=0)                             # [4, H, 1]
                wsc_buf[...] = jnp.where(
                    lane_sc == tslot, vals,
                    sc_buf[slot, jnp.minimum(i_star, g - 1)].astype(
                        jnp.float32),
                ).astype(wsc_buf.dtype)
            for c in wb_copies():
                c.start()

    # shared page lists fill in order: chunk live iff its first page is
    any_valid = sel_logic_ref[b, j * g] >= 0

    @pl.when(any_valid)
    def _compute():
        # ---- int8 MXU compute path ----
        # K/V nibbles are EXACT small ints; the dots run on the int8 MXU
        # (4x the bf16 rate, and the M=n_rep bf16 dots measured ~10x
        # their own int8 time at B=128 G=14 — scripts/microbench_attn.py
        # MB_COMPUTE=dots vs dots_i8). Two new roundings vs the old bf16
        # path: q is dynamically quantized per (head, rep) row and the
        # softmax weights p per (head, rep) row; every zero-point /
        # bias correction below is computed from the SAME integer values
        # the MXU consumed, so the rank-1 algebra stays exact.
        def nib_tok_i8(buf):
            # [H, G*R, D] u8 -> [H*G*page, D] i8 token-ordered rows.
            # kv4 half-split (ops/paged_kv.kv4_slot_to_row_nibble): lo
            # nibbles = tokens [0, page/2), hi = [page/2, page) -- two
            # masks and two bitcasts, rows already in token order.
            flat = buf[slot]                           # [H, G*R, D] u8
            d_ = flat.shape[2]
            w32 = pltpu.bitcast(
                flat.reshape(n_heads * flat.shape[1], d_), jnp.int32)
            if not kv4:
                # kv8: u8 rows ARE tokens; flip the top bit so biased
                # storage (q+128 per-tensor, asym code 0..255 fine) lands
                # in two's complement EXACTLY: i8 value = stored - 128
                return pltpu.bitcast(
                    w32 ^ jnp.int32(-0x7F7F7F80), jnp.int8
                )  # 0x80808080 as signed i32
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            half = flat.shape[1] // g                  # rows per page
            return jnp.concatenate([
                lo.reshape(n_heads, g, half, d_),
                hi.reshape(n_heads, g, half, d_),
            ], axis=2).reshape(n_heads * lanes, d_)

        k_tok = nib_tok_i8(k_buf)
        v_tok = nib_tok_i8(v_buf)

        # i8 operand bias: kv4 stores v (fine) / q+8 (per-tensor) in the
        # nibble; kv8's top-bit flip shifts stored-128
        beta = 0.0 if kv4 else 128.0
        q_f32c = q_ref[0, :, :n_rep].astype(jnp.float32)  # [H, n_rep, D]
        qs = jnp.max(jnp.abs(q_f32c), axis=2, keepdims=True) / 127.0
        qs = jnp.maximum(qs, 1e-20)
        q_i8 = jnp.clip(
            jnp.rint(q_f32c / qs), -127.0, 127.0
        ).astype(jnp.int8)
        q_isum = jnp.sum(
            q_i8.astype(jnp.float32), axis=2, keepdims=True
        )[..., None]                                   # [H, n_rep, 1, 1]
        qsc = qs[..., None]                            # [H, n_rep, 1, 1]

        qk4 = jnp.stack([
            jax.lax.dot_general(
                q_i8[h], k_tok[h * lanes:(h + 1) * lanes],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for h in range(n_heads)], axis=0,
        ).reshape(n_heads, n_rep, g, page_size).astype(jnp.float32)

        def plane(k):
            # [g, H, T] -> [H, 1, g, T]: a sublane permute (T minor
            # preserved) — measured free vs the math; planes are stored
            # bf16 (paged_kv) — corrections run in f32
            return jnp.transpose(
                sc_buf[slot, :, k], (1, 0, 2)
            )[:, None].astype(jnp.float32)

        if kv_zeros:
            # planes at pad lanes (no DMA issued) are VMEM garbage — every
            # use is masked by ``valid`` downstream.
            # true = s*(sum q(A - z)); A = i8 + beta, s*z = s1 - 128*s0
            # => qk = (qk4*s0 + ((beta + 128)*s0 - s1)*q_isum) * qs * sm
            s0 = plane(0)                              # [H, 1, g, T]
            s1 = plane(1)                              # = s*(z+128)
            qk = (
                qk4 * s0 + ((beta + 128.0) * s0 - s1) * q_isum
            ) * qsc * sm_scale
        else:
            # per-tensor: kv4 stores q+8 (i8 = q+8); kv8 top-bit flip
            # gives q exactly
            ptb = 8.0 if kv4 else 0.0
            qk = (qk4 - ptb * q_isum) * (qsc * (pt_ref[0] * sm_scale))
        qk = jnp.where(valid, qk, MASK_VALUE)

        m_curr = jnp.max(jnp.max(qk, axis=3, keepdims=True),
                         axis=2, keepdims=True)        # [H, n_rep, 1, 1]
        if single:
            m_next = jnp.maximum(m_curr, qk_new4) if fused else m_curr
        else:
            m_prev = m_ref[...].reshape(
                n_heads, n_rep, 128)[:, :, :1].reshape(n_heads, n_rep, 1, 1)   # [H, n_rep, 1, 1]
            l_prev = l_ref[...].reshape(
                n_heads, n_rep, 128)[:, :, :1].reshape(n_heads, n_rep, 1, 1)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
        pexp = jnp.where(valid, jnp.exp(qk - m_next), 0.0)
        l_curr = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True),
                         axis=2, keepdims=True)
        if single:
            if fused:
                # qk_new may equal MASK together with m_next (inactive
                # row): exp(0)=1 would corrupt l — mask explicitly
                pexp_new = jnp.where(
                    new_active, jnp.exp(qk_new4 - m_next), 0.0
                )                                      # [H, n_rep, 1, 1]
                l_next = l_curr + pexp_new
            else:
                l_next = l_curr
        else:
            l_next = alpha * l_prev + l_curr
            m_ref[...] = jnp.broadcast_to(
                m_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
            ).reshape(n_heads * n_rep, 128)
            l_ref[...] = jnp.broadcast_to(
                l_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
            ).reshape(n_heads * n_rep, 128)

        # ---- int8 PV ----
        if kv_zeros:
            p4 = jnp.where(valid, pexp * plane(2), 0.0)  # s2 folded in
        else:
            p4 = pexp
        ps = jnp.max(jnp.max(p4, axis=3, keepdims=True), axis=2,
                     keepdims=True) / 127.0             # [H, n_rep, 1, 1]
        ps = jnp.maximum(ps, 1e-30)
        p_i8f = jnp.rint(p4 / ps)                       # exact ints, f32
        psum_i = jnp.sum(jnp.sum(p_i8f, axis=3, keepdims=True), axis=2,
                         keepdims=True)                 # [H, n_rep, 1, 1]
        if kv_zeros:
            # v_true = (B - z)*s2; B = i8 + beta, z = z3 - 128
            # => contrib = ps*(pv + (beta + 128)*psum - sum p*z3)
            corr3 = jnp.sum(jnp.sum(
                jnp.where(valid, p_i8f * plane(3), 0.0),
                axis=3, keepdims=True), axis=2, keepdims=True)
            int_corr = (beta + 128.0) * psum_i - corr3  # [H, n_rep, 1, 1]
            v_scale = 1.0
        else:
            ptb = 8.0 if kv4 else 0.0
            int_corr = -ptb * psum_i
            v_scale = pt_ref[1]
        p3 = p_i8f.reshape(n_heads, n_rep, lanes).astype(jnp.int8)
        pv = jnp.stack([
            jax.lax.dot_general(
                p3[h], v_tok[h * lanes:(h + 1) * lanes],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for h in range(n_heads)], axis=0
        ).astype(jnp.float32)                           # [H, n_rep, D]
        contrib = (
            (pv + int_corr.reshape(n_heads, n_rep, 1))
            * ps.reshape(n_heads, n_rep, 1)
        ) * v_scale
        if single:
            if fused:
                contrib = contrib + pexp_new.reshape(n_heads, n_rep, 1) * v_dq_b
            o_ref[0] = (
                contrib / jnp.maximum(l_next.reshape(n_heads, n_rep, 1), 1e-10)
            ).astype(o_ref.dtype)
            if with_lse:
                m_out[0] = jnp.broadcast_to(
                    m_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
                )
                l_out[0] = jnp.broadcast_to(
                    l_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
                )
        else:
            d_ = acc_ref.shape[-1]
            acc3 = acc_ref[...].reshape(n_heads, n_rep, d_)
            acc_ref[...] = (
                acc3 * alpha.reshape(n_heads, n_rep, 1) + contrib
            ).reshape(n_heads * n_rep, d_)

    if single:
        # short sequences whose first page is empty still need an output
        # (SP ranks owning no pages of a sequence land here: their (m, l)
        # partial must be the neutral (MASK, 0) so sp_combine zeroes them)
        @pl.when(jnp.logical_not(any_valid))
        def _zero():
            o_ref[0] = jnp.zeros_like(o_ref[0])
            if with_lse:
                m_out[0] = jnp.full_like(m_out[0], MASK_VALUE)
                l_out[0] = jnp.zeros_like(l_out[0])
    else:
        @pl.when(j == n_chunks - 1)
        def _finalize():
            n_rep = o_ref.shape[2]
            d_ = acc_ref.shape[-1]
            m_prev = m_ref[...].reshape(n_heads, n_rep, 128)[:, :, :1]
            l_prev = l_ref[...].reshape(n_heads, n_rep, 128)[:, :, :1]
            acc3 = acc_ref[...].reshape(n_heads, n_rep, d_)
            if fused:
                # fold the new token's extra lane into the accumulated
                # online softmax (it belongs to the LAST chunk's window)
                m_fin = jnp.maximum(m_prev, qk_new)
                alpha_f = jnp.exp(m_prev - m_fin)
                p_new = jnp.where(
                    new_active, jnp.exp(qk_new - m_fin), 0.0
                )
                l_fin = alpha_f * l_prev + p_new
                acc3 = alpha_f * acc3 + p_new * v_dq_b
            else:
                l_fin = l_prev
            o_ref[0] = (
                acc3 / jnp.maximum(l_fin, 1e-10)
            ).astype(o_ref.dtype)
            if with_lse:
                m_fin_ = m_prev if not fused else m_fin
                m_out[0] = jnp.broadcast_to(m_fin_, (n_heads, n_rep, 128))
                l_out[0] = jnp.broadcast_to(l_fin, (n_heads, n_rep, 128))

    if fused:
        # the write-back scratches are reused next grid step: wait
        # before leaving it (the copies overlapped the attention math,
        # which was issued after them)
        @pl.when(do_wb)
        def _wait_write_back():
            for c in wb_copies():
                c.wait()


def paged_mqa_attention_single_pass(
    q: jnp.ndarray,            # [B, Hkv, n_rep, D]
    pool: KVPool,
    layer,
    sel_phys: jnp.ndarray,     # [B, Tp] physical page ids (pad -> any)
    sel_logic: jnp.ndarray,    # [B, Tp] logical page or -1
    lengths: jnp.ndarray,      # [B]
    *,
    sm_scale: float,
    page_size: int,
    kv_zeros: bool,
    pt_scales=None,
    band_sink_tokens: int = -1,
    band_local_tokens: int = 0,
    ring_span_pages: int = 0,
    ring_sink_tokens: int = 0,
    append=None,
    contiguous_logic: bool = False,
    return_lse: bool = False,
    interpret: bool = False,
):
    """kv4/kv8 decode attention reading pages straight from the pool in HBM.

    ``band_sink_tokens >= 0`` enables the streaming decode band: only
    positions < band_sink_tokens or >= length - band_local_tokens are
    attended (the ring may hold a larger window for chunked prefill).

    ``append=(k_new, v_new, tgt_pos, tgt_slot)`` fuses the decode KV
    append into this kernel (the reference MMHA structure: quantize the
    new token, attend it through an exact extra lane, read-modify-write
    only the touched page window back to the pool — replaces the separate
    per-token append kernel, which cost ~2.7 ms/step at batch 160).
    ``lengths`` then INCLUDE the new token; ``tgt_pos`` is the page's
    position in the sel list (-1 = inactive), ``tgt_slot`` the token's
    slot within the page. Returns (out, pool') instead of out."""
    b, hkv, n_rep, d = q.shape
    bk = page_size // 4
    tp = sel_logic.shape[-1]
    # Pages per chunk: per-grid-step fixed cost dominates at small chunks,
    # so cover the WHOLE page list in one chunk up to ~2K tokens (VMEM for
    # the double-buffered pages: 4*H*g*page/2 bytes per side). g*page must
    # be a 128-multiple (lane-tiled scale blocks). The VMEM cap scales
    # with the kv head count: MHA models (hkv 32) carry 4x the buffer
    # bytes per page of GQA-8 and blow the 16 MB scoped limit at g=13+.
    quantum = max(1, 128 // page_size)
    rows_pg = page_size // 2 if pool.k_data.shape[3] * 2 == page_size \
        else page_size
    per_page = 4 * hkv * rows_pg * d + 2 * 4 * 4 * hkv * page_size
    import os as _os

    max_chunk_tok = int(_os.environ.get("OMNISERVE_DECODE_CHUNK", "2048"))
    cap = max(quantum, min(max_chunk_tok // page_size,
                           (9 * 2 ** 20) // per_page))
    g = min(cap, quantum * _cdiv(tp, quantum))
    n_chunks = _cdiv(tp, g)
    pad = n_chunks * g - tp
    if pad:
        cfg = [(0, 0), (0, pad)]
        sel_phys = jnp.pad(sel_phys, cfg)
        sel_logic = jnp.pad(sel_logic, cfg, constant_values=-1)

    L, P = pool.k_data.shape[0], pool.k_data.shape[1]
    rows = pool.k_data.shape[3]
    k_flat = pool.k_data.reshape(L * P, hkv, rows, d)
    v_flat = pool.v_data.reshape(L * P, hkv, rows, d)
    phys_folded = (layer * P + sel_phys).astype(jnp.int32)

    fine = pool.kv_scales is not None
    assert fine == kv_zeros, (
        "kv_zeros flag disagrees with the pool's scale planes "
        f"(kv_zeros={kv_zeros}, pool fine-grained={fine}) — the kernel "
        "would silently scale by zeros"
    )
    if fine:
        sc_flat = pool.kv_scales.reshape(L * P, 4, hkv, page_size)
    else:
        sc_flat = jnp.zeros((1, 4, hkv, page_size), jnp.float32)

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

    fused = append is not None
    assert not (fused and return_lse), (
        "return_lse is the SP partial-output mode and runs the plain "
        "kernel (SP appends through the split path)"
    )
    kernel = functools.partial(
        _sp_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_zeros=kv_zeros,
        n_chunks=n_chunks,
        g=g,
        n_heads=hkv,
        band_sink=int(band_sink_tokens),
        kv_bits=4 if rows * 2 == page_size else 8,
        ring_span=int(ring_span_pages),
        ring_sink_tok=int(ring_sink_tokens),
        fused=fused,
        contiguous=bool(contiguous_logic),
        with_lse=bool(return_lse),
    )
    q_rows = n_rep + 2 if fused else n_rep
    q_spec = pl.BlockSpec((1, hkv, q_rows, d),
                          lambda b_, j_, *pref: (b_, 0, 0, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    win_rows = 32 if rows % 32 == 0 else rows
    scratch = [
        pltpu.VMEM((2, hkv, g * rows, d), jnp.uint8),   # k pages
        pltpu.VMEM((2, hkv, g * rows, d), jnp.uint8),   # v pages
        pltpu.VMEM((2, g, 4, hkv, page_size), jnp.float32),  # planes
        pltpu.SemaphoreType.DMA((2, g, 3)),
    ]
    if fused:
        scratch += [
            pltpu.VMEM((hkv, win_rows, d), jnp.uint8),   # k write window
            pltpu.VMEM((hkv, win_rows, d), jnp.uint8),   # v write window
            pltpu.VMEM((4, hkv, page_size), jnp.float32),  # plane record
            pltpu.SemaphoreType.DMA((3,)),
        ]
    scratch += [
        pltpu.VMEM((hkv * n_rep, 128), jnp.float32),    # m
        pltpu.VMEM((hkv * n_rep, 128), jnp.float32),    # l
        pltpu.VMEM((hkv * n_rep, d), jnp.float32),      # acc
    ]
    if not fused:
        o_spec = pl.BlockSpec((1, hkv, n_rep, d),
                              lambda b_, j_, *pref: (b_, 0, 0, 0))
        ml_spec = pl.BlockSpec((1, hkv, n_rep, 128),
                               lambda b_, j_, *pref: (b_, 0, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b, n_chunks),
            in_specs=[q_spec, any_spec, any_spec, any_spec],
            out_specs=(
                (o_spec, ml_spec, ml_spec) if return_lse else o_spec
            ),
            scratch_shapes=scratch,
        )
        out_shape = jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype)
        if return_lse:
            ml_shape = jax.ShapeDtypeStruct(
                (b, hkv, n_rep, 128), jnp.float32
            )
            out_shape = (out_shape, ml_shape, ml_shape)
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(phys_folded, sel_logic.astype(jnp.int32),
          lengths.astype(jnp.int32), win_start, pt_arr, q,
          k_flat, v_flat, sc_flat)
        if return_lse:
            out, m_b, l_b = res
            return out, m_b[..., 0], l_b[..., 0]
        return res

    k_new, v_new, tgt_pos, tgt_slot = append
    # new-token k/v ride as two extra q rows: one pipelined input block
    # per grid step instead of three (each extra block stream cost a DMA
    # issue+wait per step — measured ~1 ms/step at batch 128 together
    # with the old whole-window merge)
    # INTENTIONAL rounding (ADVICE r4): the new-token k/v are cast to
    # q.dtype (bf16) before in-kernel quantization, so the fused path's
    # stored codes can differ from the split path's f32-sourced ones by
    # at most the bf16 ulp (2^-8 relative) feeding the (max-min)/15 scale
    # — an order below the kv4 step itself. Quantified alongside the
    # other quant noise in eval/quant_fidelity_0p29b.json.
    q_aug = jnp.concatenate([
        q, k_new.astype(q.dtype)[:, :, None], v_new.astype(q.dtype)[:, :, None],
    ], axis=2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b, n_chunks),
        in_specs=[q_spec, any_spec, any_spec, any_spec],
        out_specs=(
            pl.BlockSpec((1, hkv, n_rep, d),
                         lambda b_, j_, *pref: (b_, 0, 0, 0)),
            any_spec, any_spec, any_spec,
        ),
        scratch_shapes=scratch,
    )
    out, kd, vd, sc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
            jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
            jax.ShapeDtypeStruct(sc_flat.shape, sc_flat.dtype),
        ),
        # pool arrays update in place (args indexed incl. scalar prefetch)
        input_output_aliases={8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(phys_folded, sel_logic.astype(jnp.int32),
      lengths.astype(jnp.int32), win_start, pt_arr,
      tgt_pos.astype(jnp.int32), tgt_slot.astype(jnp.int32),
      q_aug, k_flat, v_flat, sc_flat)
    new_pool = pool._replace(
        k_data=kd.reshape(pool.k_data.shape),
        v_data=vd.reshape(pool.v_data.shape),
        kv_scales=(
            sc.reshape(pool.kv_scales.shape) if fine else pool.kv_scales
        ),
    )
    return out, new_pool



# ---------------------------------------------------------------------------
# Per-head page lists (dynamic-sparse decode)
# ---------------------------------------------------------------------------


def _sp_kernel_ph(
    # scalar prefetch
    sel_phys_ref,   # [B, H, Tp] i32 layer-folded physical page index
    sel_logic_ref,  # [B, H, Tp] i32 logical page (-1 = pad)
    lengths_ref,    # [B] i32
    pt_ref,         # [2] f32
    # blocks
    q_ref,          # [1, H, n_rep, D]
    # full-array HBM refs
    k_hbm,          # [L*P, H, R, D] u8
    v_hbm,
    sc_hbm,         # [L*P, 4, H, T] f32 folded planes (dummy if !fine)
    # out
    o_ref,
    # scratch
    k_buf,          # [2, H, G*R, D] u8
    v_buf,
    sc_buf,         # [2, H, G, 4, H, T] f32 whole-page plane records
    sem,            # [2, H, 3] (shared across the head's page copies)
    m_ref, l_ref, acc_ref,
    *,
    sm_scale: float,
    page_size: int,
    kv_zeros: bool,
    n_chunks: int,
    g: int,
    n_heads: int,
    kv_bits: int = 4,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    kv4 = kv_bits == 4
    rows = page_size // 2 if kv4 else page_size
    bk = page_size // 4
    step = b * n_chunks + j
    slot = jax.lax.rem(step, 2)
    single = n_chunks == 1

    def copies(bb, cc, sl, h, i):
        idx = sel_phys_ref[bb, h, cc * g + i]
        cps = [
            pltpu.make_async_copy(
                k_hbm.at[idx, h],
                k_buf.at[sl, h, pl.ds(i * rows, rows), :],
                sem.at[sl, h, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[idx, h],
                v_buf.at[sl, h, pl.ds(i * rows, rows), :],
                sem.at[sl, h, 1],
            ),
        ]
        if kv_zeros:
            # the page's WHOLE [4, H, T] plane record (16 KB, tile
            # aligned). 8x head overfetch, but the r4 XLA pre-gather made
            # XLA relayout-copy the layer's plane slab every step
            # (13.5 ms/step at 64K) and a row-granular gather lowers to a
            # 20x-worse while loop; the in-kernel DMA costs ~0.25 ms.
            cps.append(pltpu.make_async_copy(
                sc_hbm.at[idx],
                sc_buf.at[sl, h, i],
                sem.at[sl, h, 2],
            ))
        return cps

    def issue(bb, cc, sl):
        bbc = jnp.minimum(bb, nb - 1)
        for h in range(n_heads):
            for i in range(g):
                @pl.when((bb < nb)
                         & (sel_logic_ref[bbc, h, cc * g + i] >= 0))
                def _():
                    for c in copies(bbc, cc, sl, h, i):
                        c.start()

    @pl.when(step == 0)
    def _cold_start():
        issue(b, j, slot)

    nxt_b = jnp.where(j == n_chunks - 1, b + 1, b)
    nxt_j = jnp.where(j == n_chunks - 1, 0, j + 1)
    issue(nxt_b, nxt_j, 1 - slot)

    for h in range(n_heads):
        for i in range(g):
            @pl.when(sel_logic_ref[b, h, j * g + i] >= 0)
            def _():
                for c in copies(b, j, slot, h, i):
                    c.wait()

    if not single:
        @pl.when(j == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    gb = g * bk
    lanes = 4 * gb
    tok4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g, page_size), 3)
    pgi4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g, 1), 2)

    @pl.when(length > 0)
    def _compute():
        n_rep = q_ref.shape[2]

        def nib_tok_i8(buf):
            # [H, G*R, D] u8 -> [H*G*page, D] i8 token-ordered rows
            # (half-split kv4 / top-bit-flipped kv8 — see _sp_kernel)
            flat = buf[slot]
            d_ = flat.shape[2]
            w32 = pltpu.bitcast(
                flat.reshape(n_heads * flat.shape[1], d_), jnp.int32)
            if not kv4:
                return pltpu.bitcast(
                    w32 ^ jnp.int32(-0x7F7F7F80), jnp.int8
                )  # 0x80808080 as signed i32
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            half = flat.shape[1] // g
            return jnp.concatenate([
                lo.reshape(n_heads, g, half, d_),
                hi.reshape(n_heads, g, half, d_),
            ], axis=2).reshape(n_heads * lanes, d_)

        k_tok = nib_tok_i8(k_buf)
        v_tok = nib_tok_i8(v_buf)

        # per-head page lists -> per-head PAGE logic [H, 1, g, 1] (selects
        # over a g-wide iota, not a lanes-wide one — see _sp_kernel)
        rows_logic = []
        for h in range(n_heads):
            row = jnp.full_like(pgi4, -1)
            for p in range(g):
                row = jnp.where(
                    pgi4 == p, sel_logic_ref[b, h, j * g + p], row
                )
            rows_logic.append(row)
        logic4 = jnp.concatenate(rows_logic, axis=0)   # [H, 1, g, 1]
        valid = (logic4 >= 0) & (logic4 * page_size + tok4 < length)

        # int8 MXU math, head-batched [H, n_rep, G, T] (see _sp_kernel for
        # the quantization + correction algebra)
        beta = 0.0 if kv4 else 128.0
        q_f32c = q_ref[0].astype(jnp.float32)          # [H, n_rep, D]
        qs = jnp.max(jnp.abs(q_f32c), axis=2, keepdims=True) / 127.0
        qs = jnp.maximum(qs, 1e-20)
        q_i8 = jnp.clip(
            jnp.rint(q_f32c / qs), -127.0, 127.0
        ).astype(jnp.int8)
        q_isum = jnp.sum(
            q_i8.astype(jnp.float32), axis=2, keepdims=True
        )[..., None]                                   # [H, n_rep, 1, 1]
        qsc = qs[..., None]
        qk4 = jnp.stack([
            jax.lax.dot_general(
                q_i8[h], k_tok[h * lanes:(h + 1) * lanes],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for h in range(n_heads)], axis=0,
        ).reshape(n_heads, n_rep, g, page_size).astype(jnp.float32)

        def plane(k):
            # head h's rows of its own pages' records: [H, 1, g, T]
            return jnp.stack([
                sc_buf[slot, h, :, k, h, :] for h in range(n_heads)
            ], axis=0)[:, None].astype(jnp.float32)

        if kv_zeros:
            s0 = plane(0)
            s1 = plane(1)                              # = s*(z+128)
            qk = (
                qk4 * s0 + ((beta + 128.0) * s0 - s1) * q_isum
            ) * qsc * sm_scale
        else:
            ptb = 8.0 if kv4 else 0.0
            qk = (qk4 - ptb * q_isum) * (qsc * (pt_ref[0] * sm_scale))
        qk = jnp.where(valid, qk, MASK_VALUE)

        m_curr = jnp.max(jnp.max(qk, axis=3, keepdims=True),
                         axis=2, keepdims=True)        # [H, n_rep, 1, 1]
        if single:
            m_next = m_curr
        else:
            m_prev = m_ref[...].reshape(
                n_heads, n_rep, 128)[:, :, :1].reshape(n_heads, n_rep, 1, 1)
            l_prev = l_ref[...].reshape(
                n_heads, n_rep, 128)[:, :, :1].reshape(n_heads, n_rep, 1, 1)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
        pexp = jnp.where(valid, jnp.exp(qk - m_next), 0.0)
        l_curr = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True),
                         axis=2, keepdims=True)
        if single:
            l_next = l_curr
        else:
            l_next = alpha * l_prev + l_curr
            m_ref[...] = jnp.broadcast_to(
                m_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
            ).reshape(n_heads * n_rep, 128)
            l_ref[...] = jnp.broadcast_to(
                l_next.reshape(n_heads, n_rep, 1), (n_heads, n_rep, 128)
            ).reshape(n_heads * n_rep, 128)

        # int8 PV (pre-gathered planes are garbage at invalid lanes —
        # mask BEFORE multiplying)
        if kv_zeros:
            p4 = jnp.where(valid, pexp * plane(2), 0.0)
        else:
            p4 = pexp
        ps = jnp.max(jnp.max(p4, axis=3, keepdims=True), axis=2,
                     keepdims=True) / 127.0
        ps = jnp.maximum(ps, 1e-30)
        p_i8f = jnp.rint(p4 / ps)
        psum_i = jnp.sum(jnp.sum(p_i8f, axis=3, keepdims=True), axis=2,
                         keepdims=True)
        if kv_zeros:
            corr3 = jnp.sum(jnp.sum(
                jnp.where(valid, p_i8f * plane(3), 0.0),
                axis=3, keepdims=True), axis=2, keepdims=True)
            int_corr = (beta + 128.0) * psum_i - corr3
            v_scale = 1.0
        else:
            ptb = 8.0 if kv4 else 0.0
            int_corr = -ptb * psum_i
            v_scale = pt_ref[1]
        p3 = p_i8f.reshape(n_heads, n_rep, lanes).astype(jnp.int8)
        pv = jnp.stack([
            jax.lax.dot_general(
                p3[h], v_tok[h * lanes:(h + 1) * lanes],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for h in range(n_heads)], axis=0
        ).astype(jnp.float32)                          # [H, n_rep, D]
        contrib = (
            (pv + int_corr.reshape(n_heads, n_rep, 1))
            * ps.reshape(n_heads, n_rep, 1)
        ) * v_scale
        if single:
            o_ref[0] = (
                contrib / jnp.maximum(l_next.reshape(n_heads, n_rep, 1), 1e-10)
            ).astype(o_ref.dtype)
        else:
            d_ = acc_ref.shape[-1]
            acc3 = acc_ref[...].reshape(n_heads, n_rep, d_)
            acc_ref[...] = (
                acc3 * alpha.reshape(n_heads, n_rep, 1) + contrib
            ).reshape(n_heads * n_rep, d_)

    if single:
        @pl.when(length <= 0)
        def _zero():
            o_ref[0] = jnp.zeros_like(o_ref[0])
    else:
        @pl.when(j == n_chunks - 1)
        def _finalize():
            n_rep = o_ref.shape[2]
            d_ = acc_ref.shape[-1]
            l3 = jnp.maximum(
                l_ref[...].reshape(n_heads, n_rep, 128)[:, :, :1], 1e-10
            )
            acc3 = acc_ref[...].reshape(n_heads, n_rep, d_)
            o_ref[0] = (acc3 / l3).astype(o_ref.dtype)


def paged_mqa_attention_single_pass_ph(
    q: jnp.ndarray,            # [B, Hkv, n_rep, D]
    pool: KVPool,
    layer,
    sel_phys: jnp.ndarray,     # [B, H, Tp] physical page ids
    sel_logic: jnp.ndarray,    # [B, H, Tp] logical page or -1
    lengths: jnp.ndarray,      # [B]
    *,
    sm_scale: float,
    page_size: int,
    kv_zeros: bool,
    pt_scales=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """kv4/kv8 dynamic-sparse decode: PER-HEAD page lists, pages DMA'd
    straight from the HBM pools; quant planes arrive through one
    interleaved XLA gather (selected pages are few in the sparse regime,
    so the gather is small, while XLA gathers of pool DATA rows lower to
    while-loops costing ~0.3 ms/index on TPU)."""
    b, hkv, n_rep, d = q.shape
    tp = sel_logic.shape[-1]
    quantum = max(1, 128 // page_size)
    # whole-page plane records cost 2*H*g*(4*H*T*4) VMEM bytes — cap the
    # chunk so records + double-buffered pages stay ~4 MB (g=8 at the
    # LServe defaults; budget 32 pages -> 4 chunks)
    cap = max(quantum, min(4096 // page_size,
                           (2 * 2 ** 20) // (2 * hkv * 4 * hkv
                                             * page_size * 4)))
    g = min(cap, quantum * _cdiv(tp, quantum))
    n_chunks = _cdiv(tp, g)
    pad = n_chunks * g - tp
    if pad:
        cfg = [(0, 0), (0, 0), (0, pad)]
        sel_phys = jnp.pad(sel_phys, cfg)
        sel_logic = jnp.pad(sel_logic, cfg, constant_values=-1)

    L, P = pool.k_data.shape[0], pool.k_data.shape[1]
    rows = pool.k_data.shape[3]
    k_flat = pool.k_data.reshape(L * P, hkv, rows, d)
    v_flat = pool.v_data.reshape(L * P, hkv, rows, d)
    phys_folded = (layer * P + sel_phys).astype(jnp.int32)
    fine = pool.kv_scales is not None and kv_zeros
    if fine:
        sc_flat = pool.kv_scales.reshape(L * P, 4, hkv, page_size)
    else:
        sc_flat = jnp.zeros((1, 4, hkv, page_size), jnp.float32)

    if pt_scales is None:
        pt_arr = jnp.zeros((2,), jnp.float32)
    else:
        pt_arr = jnp.stack([
            jnp.asarray(pt_scales[0], jnp.float32),
            jnp.asarray(pt_scales[1], jnp.float32),
        ])

    kernel = functools.partial(
        _sp_kernel_ph,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_zeros=fine,
        n_chunks=n_chunks,
        g=g,
        n_heads=hkv,
        kv_bits=4 if rows * 2 == page_size else 8,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hkv, n_rep, d),
                         lambda b_, j_, *pref: (b_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv, n_rep, d),
                               lambda b_, j_, *pref: (b_, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, g * rows, d), jnp.uint8),
            pltpu.VMEM((2, hkv, g * rows, d), jnp.uint8),
            pltpu.VMEM((2, hkv, g, 4, hkv, page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2, hkv, 3)),
            pltpu.VMEM((hkv * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * n_rep, 128), jnp.float32),
            pltpu.VMEM((hkv * n_rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(phys_folded, sel_logic.astype(jnp.int32),
      lengths.astype(jnp.int32), pt_arr, q, k_flat, v_flat, sc_flat)
