"""Pallas in-place decode KV append (quantize + paged write).

TPU equivalent of the reference's in-kernel decode KV append (the MMHA
kernels quantize and store the current token's K/V inside the attention
pass, decoderMaskedMultiheadAttentionTemplate.hpp; the prefill bulk path is
applyBiasRopeUpdateKVCache.h:300-500). We keep append separate from
attention but make it a real scattered-write kernel: XLA scatter lowers to
sequential per-element updates plus full-operand relayouts and cost ~11 ms
per decode step at batch 128; this kernel read-modify-writes only the
touched pages via aliased input/output blocks (~1 ms).

Decode-only by contract: one token per sequence, every token targets a
DISTINCT page (enforced by the caller via ``unique_pages``). Distinctness
matters because grid steps are pipelined — two steps aliasing one page
could reorder the read of step t+1 before the write of step t. Prefill
uses the jnp scatter path (amortized over the whole prompt).

Layout contracts (ops/paged_kv.py):
- kv4 data [L, P, H, page/2, D] u8 in the half-split layout
  (ops/paged_kv.kv4_slot_to_row_nibble); kv8 [L, P, H, page, D] u8;
  kv16 bf16.
- kv_scales [L, P, 4, H, page] f32, plane-major folded planes (see
  ops/paged_kv.KVPool), token at lane ``slot`` of plane row (plane, h).
- k_stats [L, P, H, 2*n_sub, D] f32, row 2i = min of sub-chunk i, 2i+1 max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniserve_tpu.ops.paged_kv import KVPool
from omniserve_tpu.ops.quantization import EPS, INT4_LEVELS, INT8_LEVELS


def _quant_rows(x, kv_bits, kv_zeros, pt_scale):
    """[H, D] f32 -> (q [H, D] f32-int-valued, scale [H,1], zero [H,1])."""
    if kv_bits == 16:
        return x, None, None
    if kv_zeros:
        levels = INT4_LEVELS if kv_bits == 4 else INT8_LEVELS
        x_max = jnp.max(x, axis=1, keepdims=True)
        x_min = jnp.min(x, axis=1, keepdims=True)
        rng = jnp.maximum(x_max - x_min, EPS)
        scale = rng / levels
        zero = -levels * x_min / rng
        q = jnp.clip(jnp.rint(x / scale + zero), 0, levels)
        return q, scale, zero
    qmax = 7.0 if kv_bits == 4 else 127.0
    q = jnp.clip(jnp.rint(x / pt_scale), -qmax - 1, qmax) + (qmax + 1)
    return q, None, None


def _append_kernel(
    # scalar prefetch
    pages_ref,     # [T] int32 physical page (>= P encodes inactive)
    slots_ref,     # [T] int32
    layer_ref,     # [1] int32
    pt_ref,        # [2] f32
    # inputs
    k_ref,         # [1, H, D] new K (bf16/f32)
    v_ref,
    kd_ref,        # aliased [1, 1, H, rows, D] page block
    vd_ref,
    sc_ref,        # aliased [1, 1, 4, H, page] scale block (dummy if unused)
    st_ref,        # aliased [1, 1, H, 2S, D] stats row (dummy if unused)
    # outputs (aliased)
    kd_out, vd_out, sc_out, st_out,
    *,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    with_stats: bool,
    sub_chunks: int,
):
    t = pl.program_id(0)
    slot = slots_ref[t]
    fine = kv_bits < 16 and kv_zeros

    k_new = k_ref[0].astype(jnp.float32)     # [H, D]
    v_new = v_ref[0].astype(jnp.float32)
    qk, ks, kz = _quant_rows(k_new, kv_bits, kv_zeros, pt_ref[0])
    qv, vs, vz = _quant_rows(v_new, kv_bits, kv_zeros, pt_ref[1])

    def store_data(dst, src_block, q):
        # The BLOCK is already the row window holding the target row (the
        # index maps select it from the prefetched slot), so only ~8 rows
        # of the page move through VMEM instead of the whole page.
        dst[...] = src_block[...]
        if kv_bits == 4:
            # half-split kv4 layout (ops/paged_kv.kv4_slot_to_row_nibble)
            half = page_size // 2
            row = jax.lax.rem(slot, half)
            is_hi = slot >= half
        else:
            row = slot
            is_hi = False
        win_rows = dst.shape[3]
        rel = row % win_rows
        win = dst[0, 0, :, :, :]                        # [H, win, D]
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (1, win_rows, 1), 1) == rel
        )
        if kv_bits == 16:
            q_b = q.astype(jnp.bfloat16)[:, None, :]
            dst[0, 0, :, :, :] = jnp.where(hit, q_b, win)
            return
        win_i = win.astype(jnp.int32)
        q_i = jnp.clip(q, 0, 255).astype(jnp.int32)[:, None, :]
        if kv_bits == 4:
            upd = jnp.where(
                is_hi,
                (win_i & 0x0F) | (q_i << 4),
                (win_i & 0xF0) | q_i,
            )
        else:
            upd = q_i
        new = jnp.where(hit, upd, win_i)
        dst[0, 0, :, :, :] = pltpu.bitcast(
            new.astype(jnp.int8), jnp.uint8
        )

    store_data(kd_out, kd_ref, qk)
    store_data(vd_out, vd_ref, qv)

    if fine:
        blk = sc_ref[0, 0]                                  # [4, H, page]
        lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 2)
        # folded plane values (ops/paged_kv.KVPool docstring), plane-major
        vals = jnp.stack(
            [ks, ks * (kz + 128.0), vs, vz + 128.0], axis=0
        )                                                   # [4, H, 1]
        sc_out[0, 0] = jnp.where(lane == slot, vals, blk.astype(
            jnp.float32)).astype(sc_out.dtype)
    else:
        sc_out[0, 0] = sc_ref[0, 0]

    st_out[...] = st_ref[...]
    if with_stats:
        # stats block is small ([H, 2S, D]); full-block masked min/max
        sub = slot // (page_size // sub_chunks)
        cur = st_out[0, 0]
        ridx = jax.lax.broadcasted_iota(
            jnp.int32, (1, cur.shape[1], 1), 1
        )
        kb = k_new[:, None, :]
        new = jnp.where(ridx == 2 * sub, jnp.minimum(cur, kb), cur)
        new = jnp.where(ridx == 2 * sub + 1, jnp.maximum(new, kb), new)
        st_out[0, 0] = new


def append_kv_decode(
    pool: KVPool,
    layer,
    k: jnp.ndarray,          # [T, H, D]
    v: jnp.ndarray,
    page_ids: jnp.ndarray,   # [T] (-1 = inactive)
    slots: jnp.ndarray,      # [T]
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    update_stats: bool = False,
    sub_chunks: int = 4,
    interpret: bool = False,
) -> KVPool:
    """In-place decode append; tokens must target distinct pages."""
    t, h_, d = k.shape
    p = pool.num_pages
    rows = pool.k_data.shape[3]
    fine = kv_bits < 16 and kv_zeros
    with_stats = update_stats and pool.k_stats is not None

    # Inactive tokens (-1) are routed to the pool's TRASH page (the last
    # physical page, which make_kv_pool over-allocates and the block
    # manager never hands out) — their garbage write is absorbed there.
    active = page_ids >= 0
    safe_pages = jnp.where(active, page_ids, p - 1).astype(jnp.int32)

    layer_arr = jnp.asarray([layer], jnp.int32)
    if pool.k_scale_per_tensor is not None:
        pt = jnp.stack([
            pool.k_scale_per_tensor[layer], pool.v_scale_per_tensor[layer]
        ]).astype(jnp.float32)
    else:
        pt = jnp.ones((2,), jnp.float32)

    sc_in = pool.kv_scales if fine else jnp.zeros(
        (1, 1, 4, h_, page_size), jnp.float32
    )
    st_in = pool.k_stats if with_stats else jnp.zeros(
        (1, 1, h_, 2 * sub_chunks, d), jnp.float32
    )

    # the data block is only the 8-row window holding the token's row
    win = 8 if rows % 8 == 0 else rows

    def row8(t_, sl):
        s = sl[t_]
        if kv_bits == 4:
            # half-split: row = slot % (page/2)
            r = s % (page_size // 2)
        else:
            r = s
        return r // win

    def pmap_data(t_, pg, sl, ly, pt_):
        return (ly[0], pg[t_], 0, row8(t_, sl), 0)

    def pmap(t_, pg, sl, ly, pt_):
        return (ly[0], pg[t_], 0, 0, 0)

    def zmap5(t_, pg, sl, ly, pt_):
        return (0, 0, 0, 0, 0)

    data_block = (1, 1, h_, win, d)
    sc_block = (1, 1, 4, h_, page_size)
    st_block = (1, 1, h_, 2 * sub_chunks, d)

    in_specs = [
        pl.BlockSpec((1, h_, d), lambda t_, pg, sl, ly, pt_: (t_, 0, 0)),
        pl.BlockSpec((1, h_, d), lambda t_, pg, sl, ly, pt_: (t_, 0, 0)),
        pl.BlockSpec(data_block, pmap_data),
        pl.BlockSpec(data_block, pmap_data),
        pl.BlockSpec(sc_block, pmap if fine else zmap5),
        pl.BlockSpec(st_block, pmap if with_stats else zmap5),
    ]
    out_specs = (
        pl.BlockSpec(data_block, pmap_data),
        pl.BlockSpec(data_block, pmap_data),
        pl.BlockSpec(sc_block, pmap if fine else zmap5),
        pl.BlockSpec(st_block, pmap if with_stats else zmap5),
    )
    out_shape = (
        jax.ShapeDtypeStruct(pool.k_data.shape, pool.k_data.dtype),
        jax.ShapeDtypeStruct(pool.v_data.shape, pool.v_data.dtype),
        jax.ShapeDtypeStruct(sc_in.shape, sc_in.dtype),
        jax.ShapeDtypeStruct(st_in.shape, st_in.dtype),
    )
    kernel = functools.partial(
        _append_kernel,
        page_size=page_size,
        kv_bits=kv_bits,
        kv_zeros=kv_zeros,
        with_stats=with_stats,
        sub_chunks=sub_chunks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kd, vd, sc, st = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(safe_pages, slots.astype(jnp.int32), layer_arr, pt,
      k.astype(jnp.float32), v.astype(jnp.float32),
      pool.k_data, pool.v_data, sc_in, st_in)
    return pool._replace(
        k_data=kd,
        v_data=vd,
        kv_scales=sc if fine else pool.kv_scales,
        k_stats=st if with_stats else pool.k_stats,
    )
