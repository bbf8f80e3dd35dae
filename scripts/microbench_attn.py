"""Microbenchmark for decode-attention kernel variants (perf only).

Isolates the Pallas kernel from the model to iterate on its design:
  v_dma     DMA pages only (floor)
  v_cur     current production compute (magic unpack + token-order concat)
  v_stream  stream-major dots, no K/V concat, per-page scale DMA
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_attn.py
Env: MB_BATCH (128), MB_PAGES (10), MB_VARIANTS (comma list).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e37
_MAGIC = 0x43004300
_NIBBLE_SHIFTS = (0, 8, 4, 12)

B = int(os.environ.get("MB_BATCH", "128"))
G = int(os.environ.get("MB_PAGES", "10"))   # pages per sequence
H = 8
REP = 4
D = 128
PAGE = int(os.environ.get("MB_PAGE", "128"))
ROWS = PAGE // 2
BK = PAGE // 4
LANES = G * PAGE
CTX = G * PAGE - 24
SM = 1.0 / 11.3


def _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, bb, sl, nb,
                     sc_hbm=None, sc_buf=None):
    bbc = jnp.minimum(bb, nb - 1)
    per_page = os.environ.get("MB_PER_PAGE_COND", "0") == "1"

    @pl.when(bb < nb)
    def _():
        for i in range(G):
            idx = sel_ref[bbc, i]
            if per_page:
                @pl.when(idx >= 0)
                def _(i=i, idx=idx):
                    pltpu.make_async_copy(
                        k_hbm.at[idx],
                        k_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                        sem.at[sl, i, 0]).start()
                    pltpu.make_async_copy(
                        v_hbm.at[idx],
                        v_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                        sem.at[sl, i, 1]).start()
                continue
            pltpu.make_async_copy(
                k_hbm.at[idx], k_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                sem.at[sl, i, 0]).start()
            pltpu.make_async_copy(
                v_hbm.at[idx], v_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                sem.at[sl, i, 1]).start()
            if sc_hbm is not None:
                pltpu.make_async_copy(
                    sc_hbm.at[idx], sc_buf.at[sl, i],
                    sem.at[sl, i, 2]).start()


def _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, sl,
                    sc_hbm=None, sc_buf=None):
    per_page = os.environ.get("MB_PER_PAGE_COND", "0") == "1"
    for i in range(G):
        idx = sel_ref[b, i]
        if per_page:
            @pl.when(idx >= 0)
            def _(i=i, idx=idx):
                pltpu.make_async_copy(
                    k_hbm.at[idx],
                    k_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                    sem.at[sl, i, 0]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[idx],
                    v_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                    sem.at[sl, i, 1]).wait()
            continue
        pltpu.make_async_copy(
            k_hbm.at[idx], k_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
            sem.at[sl, i, 0]).wait()
        pltpu.make_async_copy(
            v_hbm.at[idx], v_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
            sem.at[sl, i, 1]).wait()
        if sc_hbm is not None:
            pltpu.make_async_copy(
                sc_hbm.at[idx], sc_buf.at[sl, i],
                sem.at[sl, i, 2]).wait()


# ---------------------------------------------------------------------------
# v_dma: pure DMA floor
# ---------------------------------------------------------------------------

def _dma_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf,
                sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)
    # touch the buffers so nothing is elided
    if os.environ.get("MB_DMA_EPILOGUE", "1") == "1":
        kw = pltpu.bitcast(k_buf[slot].reshape(H * G * ROWS, D), jnp.int32)
        vw = pltpu.bitcast(v_buf[slot].reshape(H * G * ROWS, D), jnp.int32)
        o_ref[0] = (
            kw[:H * REP] + vw[:H * REP]
        ).astype(jnp.float32).reshape(H, REP, D)
    else:
        o_ref[0] = q_ref[0] * 1.0


def v_dma(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp)


# ---------------------------------------------------------------------------
# v_cur: current production compute (token-order concat), pre-gathered scales
# ---------------------------------------------------------------------------

def _cur_kernel(sel_ref, len_ref, q_ref, sc_ref, k_hbm, v_hbm, o_ref,
                k_buf, v_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)

    length = len_ref[b]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    valid = lane < length

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    for h in range(H):
        hrows = slice(h * LANES, (h + 1) * LANES)
        q_bf = q_ref[0, h].astype(jnp.bfloat16)
        q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1, keepdims=True)
        qk_int = jax.lax.dot_general(
            q_bf, k_tok[hrows], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s0 = sc_ref[0, h, 0][None, :]
        s1 = sc_ref[0, h, 1][None, :]
        qk = (qk_int * s0 - s1 * q_sum) * SM
        qk = jnp.where(valid, qk, MASK_VALUE)
        m = jnp.max(qk, axis=1, keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
        l = jnp.sum(pexp, axis=1, keepdims=True)
        p_bf = (pexp * sc_ref[0, h, 2][None, :]).astype(jnp.bfloat16)
        z3 = sc_ref[0, h, 3][None, :]
        corr = jnp.sum(p_bf.astype(jnp.float32) * z3, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p_bf, v_tok[hrows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr) / jnp.maximum(l, 1e-10)


def v_cur(q, kp, vp, sc, sel, lens):
    # sc pre-gathered to [B, H, 4, LANES] outside (cost charged separately)
    return pl.pallas_call(
        _cur_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, 4, LANES), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, sc, kp, vp)


# ---------------------------------------------------------------------------
# v_cur_pt: concat structure, scalar (per-tensor) scales — isolates the cost
# of the per-token scale lane-vectors
# ---------------------------------------------------------------------------

def _cur_pt_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, o_ref,
                   k_buf, v_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)

    length = len_ref[b]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    valid = lane < length

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    for h in range(H):
        hrows = slice(h * LANES, (h + 1) * LANES)
        q_bf = q_ref[0, h].astype(jnp.bfloat16)
        q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1, keepdims=True)
        qk_int = jax.lax.dot_general(
            q_bf, k_tok[hrows], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qk = (qk_int - 136.0 * q_sum) * (0.01 * SM)
        qk = jnp.where(valid, qk, MASK_VALUE)
        m = jnp.max(qk, axis=1, keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
        l = jnp.sum(pexp, axis=1, keepdims=True)
        p_bf = pexp.astype(jnp.bfloat16)
        corr = 136.0 * jnp.sum(
            p_bf.astype(jnp.float32), axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p_bf, v_tok[hrows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr) * 0.02 / jnp.maximum(l, 1e-10)


def v_cur_pt(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _cur_pt_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp)


# ---------------------------------------------------------------------------
# v_noconcat: stream-major everything, no K/V concat, scalar scales; pieces
# stacked on a sublane axis ([REP, 4, G*BK])
# ---------------------------------------------------------------------------

def _noconcat_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, o_ref,
                     k_buf, v_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)

    length = len_ref[b]
    # stream-major position map: [1, 4, G*BK]; pos = p*PAGE + i*BK + jj
    i_s = jax.lax.broadcasted_iota(jnp.int32, (1, 4, G * BK), 1)
    pj = jax.lax.broadcasted_iota(jnp.int32, (1, 4, G * BK), 2)
    pos = (pj // BK) * PAGE + i_s * BK + pj % BK
    valid = pos < length

    def streams_of(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        out = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            out.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G * BK, D))
        return out

    k_str = streams_of(k_buf)
    v_str = streams_of(v_buf)
    for h in range(H):
        q_bf = q_ref[0, h].astype(jnp.bfloat16)
        q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1, keepdims=True)
        qk3 = jnp.stack([
            jax.lax.dot_general(
                q_bf, k_str[i][h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for i in range(4)], axis=1)                  # [REP, 4, G*BK]
        qk3 = (qk3 - 136.0 * q_sum[:, :, None]) * (0.01 * SM)
        qk3 = jnp.where(valid, qk3, MASK_VALUE)
        m = jnp.max(jnp.max(qk3, axis=2, keepdims=True), axis=1,
                    keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk3 - m), 0.0)
        l = jnp.sum(jnp.sum(pexp, axis=2, keepdims=True), axis=1)
        p3 = pexp.astype(jnp.bfloat16)
        corr = 136.0 * jnp.sum(jnp.sum(
            p3.astype(jnp.float32), axis=2, keepdims=True), axis=1)
        acc = jnp.zeros((REP, D), jnp.float32)
        for i in range(4):
            acc = acc + jax.lax.dot_general(
                p3[:, i, :], v_str[i][h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, h] = (acc - corr) * 0.02 / jnp.maximum(l, 1e-10)


def v_noconcat(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _noconcat_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp)


# ---------------------------------------------------------------------------
# v_tok3d: token-order concat (as v_cur) + per-page scale DMAs; scales used
# as [G, PAGE] blocks against qk reshaped [REP, G, PAGE]
# ---------------------------------------------------------------------------

def _tok3d_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, sc_hbm, o_ref,
                  k_buf, v_buf, sc_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb, sc_hbm, sc_buf)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb, sc_hbm, sc_buf)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                    sc_hbm, sc_buf)

    length = len_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, G, PAGE), 1) * PAGE
           + jax.lax.broadcasted_iota(jnp.int32, (1, G, PAGE), 2))
    valid = pos < length

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    for h in range(H):
        hrows = slice(h * LANES, (h + 1) * LANES)
        q_bf = q_ref[0, h].astype(jnp.bfloat16)
        q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1, keepdims=True)
        qk_int = jax.lax.dot_general(
            q_bf, k_tok[hrows], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qk3 = qk_int.reshape(REP, G, PAGE)
        s0 = sc_buf[slot, :, h, 0 * PAGE:1 * PAGE][None]   # [1, G, PAGE]
        s1 = sc_buf[slot, :, h, 1 * PAGE:2 * PAGE][None]
        qk3 = (qk3 * s0 - s1 * q_sum[:, :, None]) * SM
        qk3 = jnp.where(valid, qk3, MASK_VALUE)
        m = jnp.max(jnp.max(qk3, axis=2, keepdims=True), axis=1,
                    keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk3 - m), 0.0)
        l = jnp.sum(jnp.sum(pexp, axis=2, keepdims=True), axis=1)  # [REP, 1]
        s2 = sc_buf[slot, :, h, 2 * PAGE:3 * PAGE][None]
        z3 = sc_buf[slot, :, h, 3 * PAGE:4 * PAGE][None]
        p3 = (pexp * s2).astype(jnp.bfloat16)
        corr = jnp.sum(jnp.sum(
            p3.astype(jnp.float32) * z3, axis=2, keepdims=True), axis=1)
        pv = jax.lax.dot_general(
            p3.reshape(REP, LANES), v_tok[hrows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr) / jnp.maximum(l, 1e-10)


def v_tok3d(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _tok3d_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, H, 4 * PAGE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp, sc)


# ---------------------------------------------------------------------------
# v_batch: concat unpack as v_cur, but softmax/scale math batched over ALL
# heads ([H, REP, LANES]) to fill VPU tiles; dots stay per-head
# ---------------------------------------------------------------------------

def _batch_kernel(sel_ref, len_ref, q_ref, sc_ref, k_hbm, v_hbm, o_ref,
                  k_buf, v_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)

    length = len_ref[b]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    valid = lane < length

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    q_bf = q_ref[0].astype(jnp.bfloat16)              # [H, REP, D]
    qk_all = jnp.stack([
        jax.lax.dot_general(
            q_bf[h], k_tok[h * LANES:(h + 1) * LANES],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                   # [H, REP, LANES]
    q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=2, keepdims=True)
    s0 = sc_ref[0, :, 0, :][:, None, :]               # [H, 1, LANES]
    s1 = sc_ref[0, :, 1, :][:, None, :]
    qk = (qk_all * s0 - s1 * q_sum) * SM
    qk = jnp.where(valid, qk, MASK_VALUE)
    m = jnp.max(qk, axis=2, keepdims=True)
    pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
    l = jnp.sum(pexp, axis=2, keepdims=True)
    s2 = sc_ref[0, :, 2, :][:, None, :]
    z3 = sc_ref[0, :, 3, :][:, None, :]
    p3 = (pexp * s2).astype(jnp.bfloat16)
    corr = jnp.sum(p3.astype(jnp.float32) * z3, axis=2, keepdims=True)
    scale = 1.0 / jnp.maximum(l, 1e-10)
    for h in range(H):
        pv = jax.lax.dot_general(
            p3[h], v_tok[h * LANES:(h + 1) * LANES],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr[h]) * scale[h]


def v_batch(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _batch_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, 4, LANES), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, sc, kp, vp)


# ---------------------------------------------------------------------------
# v_batch4d: like v_batch but scales arrive in PAGE-PLANE-MAJOR lane layout
# [B, H, Tp*4T] (a pure gather from the pool view, no transpose); the
# kernel views qk as [H, REP, G, T] so per-page plane slices are clean
# 128-lane slices
# ---------------------------------------------------------------------------

def _batch4d_kernel(sel_ref, len_ref, q_ref, sc_ref, k_hbm, v_hbm, o_ref,
                    k_buf, v_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot)

    length = len_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 2) * PAGE
           + jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 3))
    valid = pos < length

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    q_bf = q_ref[0].astype(jnp.bfloat16)              # [H, REP, D]
    qk4 = jnp.stack([
        jax.lax.dot_general(
            q_bf[h], k_tok[h * LANES:(h + 1) * LANES],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0).reshape(H, REP, G, PAGE)
    q_sum = jnp.sum(
        q_bf.astype(jnp.float32), axis=2, keepdims=True)[:, :, :, None]
    sc4 = sc_ref[0].reshape(H, G, 4 * PAGE)[:, None]  # [H, 1, G, 4T]
    s0 = sc4[..., 0 * PAGE:1 * PAGE]                  # [H, 1, G, T]
    s1 = sc4[..., 1 * PAGE:2 * PAGE]
    qk = (qk4 * s0 - s1 * q_sum) * SM
    qk = jnp.where(valid, qk, MASK_VALUE)
    m = jnp.max(jnp.max(qk, axis=3, keepdims=True), axis=2, keepdims=True)
    pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
    l = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True), axis=2,
                keepdims=True)[:, :, 0]               # [H, REP, 1]
    s2 = sc4[..., 2 * PAGE:3 * PAGE]
    z3 = sc4[..., 3 * PAGE:4 * PAGE]
    p4 = (pexp * s2).astype(jnp.bfloat16)
    corr = jnp.sum(jnp.sum(
        p4.astype(jnp.float32) * z3, axis=3, keepdims=True), axis=2,
        keepdims=True)[:, :, 0]                       # [H, REP, 1]
    p3 = p4.reshape(H, REP, LANES)
    scale = 1.0 / jnp.maximum(l, 1e-10)
    for h in range(H):
        pv = jax.lax.dot_general(
            p3[h], v_tok[h * LANES:(h + 1) * LANES],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr[h]) * scale[h]


def v_batch4d(q, kp, vp, sc, sel, lens):
    # sc: [B, H, Tp*4T] page-plane-major (pure gather of the pool rows)
    return pl.pallas_call(
        _batch4d_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, G * 4 * PAGE),
                             lambda b, *p: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, sc, kp, vp)


# ---------------------------------------------------------------------------
# v_stream: no K/V concat; 4 stream dots; qk reassembled in lane domain;
# per-page scale DMA from [P, H, 4*PAGE]
# ---------------------------------------------------------------------------

def _stream_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, sc_hbm, o_ref,
                   k_buf, v_buf, sc_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                         nb, sc_hbm, sc_buf)
    _issue_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b + 1,
                     1 - slot, nb, sc_hbm, sc_buf)
    _wait_page_dmas(sel_ref, k_hbm, v_hbm, k_buf, v_buf, sem, b, slot,
                    sc_hbm, sc_buf)

    length = len_ref[b]
    # token-order validity on the [G, PAGE] view
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, G, PAGE), 1) * PAGE
           + jax.lax.broadcasted_iota(jnp.int32, (1, G, PAGE), 2))
    valid = pos < length

    def streams_of(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        out = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            out.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G * BK, D))
        return out          # 4 x [H, G*BK, D]; rows (p, jj) per stream

    k_str = streams_of(k_buf)
    v_str = streams_of(v_buf)
    for h in range(H):
        q_bf = q_ref[0, h].astype(jnp.bfloat16)
        q_sum = jnp.sum(q_bf.astype(jnp.float32), axis=1, keepdims=True)
        pieces = []
        for i in range(4):
            qk_i = jax.lax.dot_general(
                q_bf, k_str[i][h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [REP, G*BK]
            pieces.append(qk_i.reshape(REP, G, BK))
        qk3 = jnp.concatenate(pieces, axis=2)            # [REP, G, PAGE]
        s0 = sc_buf[slot, :, h, 0 * PAGE:1 * PAGE][None]  # [1, G, PAGE]
        s1 = sc_buf[slot, :, h, 1 * PAGE:2 * PAGE][None]
        qk3 = (qk3 * s0 - s1 * q_sum[:, :, None]) * SM
        qk3 = jnp.where(valid, qk3, MASK_VALUE)
        m = jnp.max(jnp.max(qk3, axis=2, keepdims=True), axis=1,
                    keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk3 - m), 0.0)
        l = jnp.sum(jnp.sum(pexp, axis=2, keepdims=True), axis=1)
        s2 = sc_buf[slot, :, h, 2 * PAGE:3 * PAGE][None]
        z3 = sc_buf[slot, :, h, 3 * PAGE:4 * PAGE][None]
        p3 = (pexp * s2).astype(jnp.bfloat16)
        corr = jnp.sum(jnp.sum(
            p3.astype(jnp.float32) * z3, axis=2, keepdims=True), axis=1)
        acc = 0.0
        for i in range(4):
            p_i = p3[:, :, i * BK:(i + 1) * BK].reshape(REP, G * BK)
            acc = acc + jax.lax.dot_general(
                p_i, v_str[i][h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, h] = (acc - corr) / jnp.maximum(l, 1e-10)


def v_stream(q, kp, vp, sc, sel, lens):
    # sc here is the POOL layout [P, H, 4*PAGE]
    return pl.pallas_call(
        _stream_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, H, 4 * PAGE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp, sc)


# ---------------------------------------------------------------------------
# v_scdma: v_batch4d math + per-page scale DMAs into a CONTIGUOUS
# [2, G, 4, H, T] buffer (src [P, 4, H, T] rows are contiguous per page),
# planes brought to [H, 1, G, T] broadcast shape by an in-kernel sublane
# transpose. Candidate replacement for the production strided-dst DMA.
# ---------------------------------------------------------------------------

def _scdma_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, sc_hbm, o_ref,
                  k_buf, v_buf, sc_buf, sem, k_mat, v_mat):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)
    no_dma = os.environ.get("MB_NO_DMA", "0") == "1"

    def issue(bb, sl):
        bbc = jnp.minimum(bb, nb - 1)

        @pl.when(bb < nb)
        def _():
            for i in range(G):
                idx = sel_ref[bbc, i]
                pltpu.make_async_copy(
                    k_hbm.at[idx], k_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                    sem.at[sl, i, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[idx], v_buf.at[sl, :, pl.ds(i * ROWS, ROWS), :],
                    sem.at[sl, i, 1]).start()
                pltpu.make_async_copy(
                    sc_hbm.at[idx], sc_buf.at[sl, i],
                    sem.at[sl, i, 2]).start()

    if not no_dma:
        @pl.when(b == 0)
        def _():
            issue(b, slot)
        issue(b + 1, 1 - slot)
        for i in range(G):
            idx = sel_ref[b, i]
            pltpu.make_async_copy(
                k_hbm.at[idx], k_buf.at[slot, :, pl.ds(i * ROWS, ROWS), :],
                sem.at[slot, i, 0]).wait()
            pltpu.make_async_copy(
                v_hbm.at[idx], v_buf.at[slot, :, pl.ds(i * ROWS, ROWS), :],
                sem.at[slot, i, 1]).wait()
            pltpu.make_async_copy(
                sc_hbm.at[idx], sc_buf.at[slot, i],
                sem.at[slot, i, 2]).wait()

    length = len_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 2) * PAGE
           + jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 3))
    valid = pos < length
    mode = os.environ.get("MB_COMPUTE", "full")

    def nib_tokens(buf):
        flat = buf[slot]
        w32 = pltpu.bitcast(flat.reshape(H * G * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, G, BK, D))
        return jnp.concatenate(streams, axis=2).reshape(H * LANES, D)

    if mode == "unpack":
        # unpack both buffers, fold to output, skip dots/softmax
        k_tok = nib_tokens(k_buf)
        v_tok = nib_tokens(v_buf)
        o_ref[0] = (
            k_tok[:H * REP] + v_tok[:H * REP]
        ).astype(jnp.float32).reshape(H, REP, D)
        return
    if mode == "dots_i8":
        # GEMM-style int8 path: 2-op nibble unpack straight to i8 (token
        # order interleaved — fine for timing), int8 MXU dots with i32
        # accum, q pre-quantized to i8 on the host side of the kernel
        def nib_i8(buf):
            w32 = pltpu.bitcast(
                buf[slot].reshape(H * G * ROWS, D), jnp.int32)
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            return lo, hi                       # each [H*G*ROWS, D]

        k_lo, k_hi = nib_i8(k_buf)
        v_lo, v_hi = nib_i8(v_buf)
        q_i8 = jnp.clip(
            q_ref[0].reshape(H * REP, D) * 4.0, -127, 127
        ).astype(jnp.int8)
        qk_lo = jax.lax.dot_general(
            q_i8, k_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)   # [32, H*G*ROWS]
        qk_hi = jax.lax.dot_general(
            q_i8, k_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        p_i8 = jnp.clip(qk_lo + qk_hi, -127, 127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_i8, v_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        pv += jax.lax.dot_general(
            p_i8, v_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[0] = pv[:, :D].astype(jnp.float32).reshape(H, REP, D)
        return
    if mode == "full_i8":
        # COMPLETE math with int8 MXU dots. K/V nibbles are exact ints in
        # [0,15]; q is dynamically quantized per (h, rep) row and p per
        # (h, rep) row for the PV dot (the two new roundings vs bf16).
        # Token order is restored in the SUBLANE domain (rows are
        # sublanes, D is lanes): k_lo row r = 2j+m holds token m*32+j, a
        # [32,2]->[2,32] sublane transpose + concat — the same op class
        # as the bf16 path's 4-stream concat.
        def nib_tok_i8(buf):
            w32 = pltpu.bitcast(
                buf[slot].reshape(H * G * ROWS, D), jnp.int32)
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)

            if os.environ.get("MB_I8_NOREORD", "0") == "1":
                # timing-only: skip the token reorder (wrong order)
                return jnp.concatenate([
                    lo.reshape(H, G, ROWS, D), hi.reshape(H, G, ROWS, D),
                ], axis=2).reshape(H * LANES, D)

            def reord(x):
                # [H*G*ROWS, D] rows r=2j+m -> token-within-half m*32+j
                x5 = x.reshape(H, G, BK, 2, D)
                return jnp.swapaxes(x5, 2, 3)        # [H, G, 2, BK, D]

            return jnp.concatenate(
                [reord(lo), reord(hi)], axis=2
            ).reshape(H * LANES, D)                  # token order rows

        k_tok = nib_tok_i8(k_buf)
        v_tok = nib_tok_i8(v_buf)
        q_f = q_ref[0].astype(jnp.float32)           # [H, REP, D]
        qs = jnp.max(jnp.abs(q_f), axis=2, keepdims=True) / 127.0
        qs = jnp.maximum(qs, 1e-20)
        q_i8 = jnp.clip(jnp.rint(q_f / qs), -127, 127).astype(jnp.int8)
        q_isum = jnp.sum(
            q_i8.astype(jnp.float32), axis=2, keepdims=True
        )[..., None]                                 # [H, REP, 1, 1]

        if os.environ.get("MB_I8_BIG", "0") == "1":
            qk_full = jax.lax.dot_general(
                q_i8.reshape(H * REP, D), k_tok, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)    # [H*REP, H*LANES]
            qk4 = jnp.stack([
                qk_full[h * REP:(h + 1) * REP, h * LANES:(h + 1) * LANES]
                for h in range(H)], axis=0).reshape(
                    H, REP, G, PAGE).astype(jnp.float32)
        else:
            qk4 = jnp.stack([
                jax.lax.dot_general(
                    q_i8[h], k_tok[h * LANES:(h + 1) * LANES],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                for h in range(H)], axis=0).reshape(
                    H, REP, G, PAGE).astype(jnp.float32)

        s0 = jnp.transpose(sc_buf[slot, :, 0], (1, 0, 2))[:, None]
        s1 = jnp.transpose(sc_buf[slot, :, 1], (1, 0, 2))[:, None]
        qsc = qs[..., None]                          # [H, REP, 1, 1]
        qk = (qk4 * s0 - s1 * q_isum) * qsc * SM
        qk = jnp.where(valid, qk, MASK_VALUE)
        m = jnp.max(jnp.max(qk, axis=3, keepdims=True), axis=2,
                    keepdims=True)
        pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
        l = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True), axis=2,
                    keepdims=True)[:, :, 0]
        s2 = jnp.transpose(sc_buf[slot, :, 2], (1, 0, 2))[:, None]
        z3 = jnp.transpose(sc_buf[slot, :, 3], (1, 0, 2))[:, None]
        p4 = jnp.where(valid, pexp * s2, 0.0)
        # quantize p rows for the int8 PV dot; corr from the SAME
        # quantized values so the zero-point cancellation stays exact
        ps = jnp.max(jnp.max(p4, axis=3, keepdims=True), axis=2,
                     keepdims=True) / 127.0
        ps = jnp.maximum(ps, 1e-30)
        p_i8f = jnp.rint(p4 / ps)
        corr = jnp.sum(jnp.sum(
            p_i8f * z3, axis=3, keepdims=True), axis=2,
            keepdims=True)[:, :, 0] * ps[:, :, 0]
        p3 = p_i8f.reshape(H, REP, LANES)
        pvs = []
        for h in range(H):
            pv = jax.lax.dot_general(
                p3[h].astype(jnp.int8), v_tok[h * LANES:(h + 1) * LANES],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # [REP, D]
            pvs.append(pv)
        pvf = jnp.stack(pvs, axis=0).astype(jnp.float32) * ps[:, :, 0]
        scale = 1.0 / jnp.maximum(l, 1e-10)
        o_ref[0] = (pvf - corr) * scale
        return
    k_tok = nib_tokens(k_buf)
    v_tok = nib_tokens(v_buf)
    if os.environ.get("MB_MAT", "0") == "1":
        # force the unpacked streams through VMEM scratch: if Mosaic was
        # fusing the unpack chain into the dot (recompute per tile), this
        # materializes once and the dots read plain refs
        k_mat[...] = k_tok
        v_mat[...] = v_tok
        k_tok = k_mat[...]
        v_tok = v_mat[...]
    q_bf = q_ref[0].astype(jnp.bfloat16)
    if mode in ("dots_bigqk", "dots_bigboth"):
        # ONE [H*REP, D] x [D, H*LANES] dot for all heads (cross-head
        # products computed and discarded: MXU is idle at M=4 anyway),
        # block-diagonal rows/cols sliced back out
        qk_full = jax.lax.dot_general(
            q_bf.reshape(H * REP, D), k_tok,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [H*REP, H*LANES]
        qk4 = jnp.stack([
            qk_full[h * REP:(h + 1) * REP, h * LANES:(h + 1) * LANES]
            for h in range(H)], axis=0).reshape(H, REP, G, PAGE)
        if mode == "dots_bigboth":
            p3 = qk4.reshape(H, REP, LANES).astype(jnp.bfloat16)
            # block-diagonal P: [H*REP, H*LANES] with zeros off-block
            hh = jax.lax.broadcasted_iota(
                jnp.int32, (H * REP, H * LANES), 0) // REP
            cc = jax.lax.broadcasted_iota(
                jnp.int32, (H * REP, H * LANES), 1) // LANES
            p_big = jnp.where(
                hh == cc,
                qk_full.astype(jnp.bfloat16),
                jnp.bfloat16(0.0),
            )
            pv = jax.lax.dot_general(
                p_big, v_tok, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [H*REP, D]
            o_ref[0] = pv.reshape(H, REP, D)
            return
        for h in range(H):
            pvh = jax.lax.dot_general(
                qk4.reshape(H, REP, LANES)[h].astype(jnp.bfloat16),
                v_tok[h * LANES:(h + 1) * LANES],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = pvh
        return
    qk4 = jnp.stack([
        jax.lax.dot_general(
            q_bf[h], k_tok[h * LANES:(h + 1) * LANES],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0).reshape(H, REP, G, PAGE)
    if mode == "dots":
        # unpack + QK dots + PV dots, skip softmax/planes
        p3 = qk4.reshape(H, REP, LANES).astype(jnp.bfloat16)
        for h in range(H):
            pv = jax.lax.dot_general(
                p3[h], v_tok[h * LANES:(h + 1) * LANES],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = pv
        return
    q_sum = jnp.sum(
        q_bf.astype(jnp.float32), axis=2, keepdims=True)[:, :, :, None]

    def plane(k):
        # [G, H, T] -> [H, 1, G, T]
        return jnp.transpose(sc_buf[slot, :, k], (1, 0, 2))[:, None]

    s0 = plane(0)
    s1 = plane(1)
    qk = (qk4 * s0 - s1 * q_sum) * SM
    qk = jnp.where(valid, qk, MASK_VALUE)
    m = jnp.max(jnp.max(qk, axis=3, keepdims=True), axis=2, keepdims=True)
    pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
    l = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True), axis=2,
                keepdims=True)[:, :, 0]
    p4 = (pexp * plane(2)).astype(jnp.bfloat16)
    corr = jnp.sum(jnp.sum(
        p4.astype(jnp.float32) * plane(3), axis=3, keepdims=True), axis=2,
        keepdims=True)[:, :, 0]
    p3 = p4.reshape(H, REP, LANES)
    scale = 1.0 / jnp.maximum(l, 1e-10)
    for h in range(H):
        pv = jax.lax.dot_general(
            p3[h], v_tok[h * LANES:(h + 1) * LANES],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr[h]) * scale[h]


def v_scdma(q, kp, vp, sc, sel, lens):
    # sc: pool layout [P, 4, H, PAGE] f32
    return pl.pallas_call(
        _scdma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, H, G * ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, 4, H, PAGE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, 3)),
                pltpu.VMEM((H * LANES if os.environ.get("MB_MAT", "0") == "1" else 8, D), jnp.bfloat16),
                pltpu.VMEM((H * LANES if os.environ.get("MB_MAT", "0") == "1" else 8, D), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 2 ** 20),
    )(sel, lens, q, kp, vp, sc)


# ---------------------------------------------------------------------------
# v_fused: ONE page record [P, 2*H*ROWS + SC_ROWS, D] u8 holding K rows,
# V rows and the folded scale planes (bitcast f32) — ONE DMA per page.
# Tests whether cutting DMA issue/wait count (27 -> 9 per grid step) and
# riding a single 144KB contiguous transfer beats the split arrays.
# ---------------------------------------------------------------------------

SC_ROWS = 4 * 4 * PAGE // 128 // (D // 128)   # 4 planes * H? computed below


def _fused_layout():
    # record rows: K [H*ROWS], V [H*ROWS], planes [4*H*PAGE f32 as u8 rows]
    sc_rows = 4 * H * PAGE * 4 // D
    return 2 * H * ROWS + sc_rows, sc_rows


def _fused_kernel(sel_ref, len_ref, q_ref, pg_hbm, o_ref, buf, sem):
    rec_rows, sc_rows = _fused_layout()
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def issue(bb, sl):
        bbc = jnp.minimum(bb, nb - 1)

        @pl.when(bb < nb)
        def _():
            for i in range(G):
                pltpu.make_async_copy(
                    pg_hbm.at[sel_ref[bbc, i]],
                    buf.at[sl, i], sem.at[sl, i],
                ).start()

    @pl.when(b == 0)
    def _():
        issue(b, slot)
    issue(b + 1, 1 - slot)
    for i in range(G):
        pltpu.make_async_copy(
            pg_hbm.at[sel_ref[b, i]], buf.at[slot, i], sem.at[slot, i],
        ).wait()

    length = len_ref[b]
    # 4-D mask built from iotas directly: reshaping a [1,1,LANES] i1
    # vector to 4-D is an unsupported Mosaic shape cast
    pg4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 2)
    tk4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 3)
    valid4 = pg4 * PAGE + tk4 < length

    def nib_tokens(raw):                      # [G, H*ROWS, D] u8
        w32 = pltpu.bitcast(
            raw.reshape(G * H * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(G, H, BK, D))
        # [G, H, PAGE, D] -> rows (h, p, t)
        return jnp.concatenate(streams, axis=2).transpose(1, 0, 2, 3
                                                          ).reshape(H * LANES, D)

    k_tok = nib_tokens(buf[slot, :, :H * ROWS, :])
    v_tok = nib_tokens(buf[slot, :, H * ROWS:2 * H * ROWS, :])
    # planes: [G, sc_rows, D] u8 -> f32 [G, 4, H, PAGE] -> [4, H, G*PAGE]
    sc_raw = buf[slot, :, 2 * H * ROWS:, :]
    sc = pltpu.bitcast(sc_raw.reshape(G * _fused_layout()[1], D),
                       jnp.float32).reshape(G, 4, H, PAGE)

    q_bf = q_ref[0].astype(jnp.bfloat16)
    qk_all = jnp.stack([
        jax.lax.dot_general(
            q_bf[h], k_tok[h * LANES:(h + 1) * LANES],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0).reshape(H, REP, G, PAGE)
    q_sum = jnp.sum(
        q_bf.astype(jnp.float32), axis=2, keepdims=True)[:, :, :, None]
    s0 = sc[:, 0].transpose(1, 0, 2)[:, None]       # [H, 1, G, PAGE]
    s1 = sc[:, 1].transpose(1, 0, 2)[:, None]
    qk = (qk_all * s0 - s1 * q_sum) * SM
    qk = jnp.where(valid4, qk, MASK_VALUE)
    m = jnp.max(jnp.max(qk, axis=3, keepdims=True), axis=2, keepdims=True)
    pexp = jnp.where(valid4, jnp.exp(qk - m), 0.0)
    l = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True), axis=2,
                keepdims=True)[:, :, 0]
    s2 = sc[:, 2].transpose(1, 0, 2)[:, None]
    z3 = sc[:, 3].transpose(1, 0, 2)[:, None]
    p4 = (pexp * s2).astype(jnp.bfloat16)
    corr = jnp.sum(jnp.sum(
        p4.astype(jnp.float32) * z3, axis=3, keepdims=True), axis=2,
        keepdims=True)[:, :, 0]
    p3 = p4.reshape(H, REP, LANES)
    scale = 1.0 / jnp.maximum(l, 1e-10)
    for h in range(H):
        pv = jax.lax.dot_general(
            p3[h], v_tok[h * LANES:(h + 1) * LANES],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (pv - corr[h]) * scale[h]


def v_fused(q, kp, vp, sc, sel, lens):
    rec_rows, _ = _fused_layout()
    return pl.pallas_call(
        _fused_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, rec_rows, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, sc)


def _fused_dma_kernel(sel_ref, len_ref, q_ref, pg_hbm, o_ref, buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def issue(bb, sl):
        bbc = jnp.minimum(bb, nb - 1)

        @pl.when(bb < nb)
        def _():
            for i in range(G):
                pltpu.make_async_copy(
                    pg_hbm.at[sel_ref[bbc, i]],
                    buf.at[sl, i], sem.at[sl, i],
                ).start()

    @pl.when(b == 0)
    def _():
        issue(b, slot)
    issue(b + 1, 1 - slot)
    for i in range(G):
        pltpu.make_async_copy(
            pg_hbm.at[sel_ref[b, i]], buf.at[slot, i], sem.at[slot, i],
        ).wait()
    kw = pltpu.bitcast(
        buf[slot, 0, :4 * H * REP, :], jnp.int32)   # u8 rows -> i32 /4
    o_ref[0] = kw.astype(jnp.float32).reshape(H, REP, D)


def v_fused_dma(q, kp, vp, sc, sel, lens):
    rec_rows, _ = _fused_layout()
    return pl.pallas_call(
        _fused_dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, rec_rows, D), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, sc)


# ---------------------------------------------------------------------------
# v_pgmaj: PAGE-MAJOR VMEM buffers — dst of every page DMA is fully
# contiguous ([G, H, ROWS, D] buffer, dst buf[sl, i]), pool layout
# unchanged. Compute restructured to per-page dots batched over H. Tests
# whether contiguous dsts alone (3 DMAs/page) reach the fused-record DMA
# rate without any pool relayout.
# ---------------------------------------------------------------------------

def _pgmaj_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, sc_hbm, o_ref,
                  k_buf, v_buf, sc_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def issue(bb, sl):
        bbc = jnp.minimum(bb, nb - 1)

        @pl.when(bb < nb)
        def _():
            for i in range(G):
                idx = sel_ref[bbc, i]
                pltpu.make_async_copy(
                    k_hbm.at[idx], k_buf.at[sl, i], sem.at[sl, i, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[idx], v_buf.at[sl, i], sem.at[sl, i, 1]).start()
                pltpu.make_async_copy(
                    sc_hbm.at[idx], sc_buf.at[sl, i], sem.at[sl, i, 2]).start()

    @pl.when(b == 0)
    def _():
        issue(b, slot)
    issue(b + 1, 1 - slot)
    for i in range(G):
        idx = sel_ref[b, i]
        pltpu.make_async_copy(
            k_hbm.at[idx], k_buf.at[slot, i], sem.at[slot, i, 0]).wait()
        pltpu.make_async_copy(
            v_hbm.at[idx], v_buf.at[slot, i], sem.at[slot, i, 1]).wait()
        pltpu.make_async_copy(
            sc_hbm.at[idx], sc_buf.at[slot, i], sem.at[slot, i, 2]).wait()

    length = len_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 2) * PAGE
           + jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, PAGE), 3))
    valid = pos < length

    def nib_page(buf, i):
        # one page [H, ROWS, D] u8 -> [H, PAGE, D] bf16 token order
        w32 = pltpu.bitcast(buf[slot, i].reshape(H * ROWS, D), jnp.int32)
        streams = []
        for sh in _NIBBLE_SHIFTS:
            w = w32 if sh == 0 else (w32 >> sh)
            streams.append(pltpu.bitcast(
                (w & 0x000F000F) | _MAGIC, jnp.bfloat16
            ).reshape(H, 1, BK, D))
        return jnp.concatenate(streams, axis=2)       # [H, 1, PAGE, D]

    q_bf = q_ref[0].astype(jnp.bfloat16)              # [H, REP, D]
    q_sum = jnp.sum(
        q_bf.astype(jnp.float32), axis=2, keepdims=True)[:, :, :, None]
    v_pages = []
    qk_pages = []
    for i in range(G):
        k_pg = nib_page(k_buf, i)[:, 0]               # [H, PAGE, D]
        v_pages.append(nib_page(v_buf, i))
        qk_pages.append(jax.lax.dot_general(
            q_bf, k_pg, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, None, :])                             # [H, REP, 1, T]
    qk4 = jnp.concatenate(qk_pages, axis=2)           # [H, REP, G, T]

    def plane(k):
        return jnp.transpose(sc_buf[slot, :, k], (1, 0, 2))[:, None]

    s0 = plane(0)
    s1 = plane(1)
    qk = (qk4 * s0 - s1 * q_sum) * SM
    qk = jnp.where(valid, qk, MASK_VALUE)
    m = jnp.max(jnp.max(qk, axis=3, keepdims=True), axis=2, keepdims=True)
    pexp = jnp.where(valid, jnp.exp(qk - m), 0.0)
    l = jnp.sum(jnp.sum(pexp, axis=3, keepdims=True), axis=2,
                keepdims=True)[:, :, 0]
    p4 = (pexp * plane(2)).astype(jnp.bfloat16)
    corr = jnp.sum(jnp.sum(
        p4.astype(jnp.float32) * plane(3), axis=3, keepdims=True), axis=2,
        keepdims=True)[:, :, 0]
    acc = jnp.zeros((H, REP, D), jnp.float32)
    for i in range(G):
        acc = acc + jax.lax.dot_general(
            p4[:, :, i, :], v_pages[i][:, 0],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    scale = 1.0 / jnp.maximum(l, 1e-10)
    o_ref[0] = (acc - corr) * scale


def v_pgmaj(q, kp, vp, sc, sel, lens):
    # sc: pool layout [P, 4, H, PAGE] f32
    return pl.pallas_call(
        _pgmaj_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, H, ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, H, ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, 4, H, PAGE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp, sc)


def _pgmaj_dma_kernel(sel_ref, len_ref, q_ref, k_hbm, v_hbm, sc_hbm, o_ref,
                      k_buf, v_buf, sc_buf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def issue(bb, sl):
        bbc = jnp.minimum(bb, nb - 1)

        @pl.when(bb < nb)
        def _():
            for i in range(G):
                idx = sel_ref[bbc, i]
                pltpu.make_async_copy(
                    k_hbm.at[idx], k_buf.at[sl, i], sem.at[sl, i, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[idx], v_buf.at[sl, i], sem.at[sl, i, 1]).start()
                pltpu.make_async_copy(
                    sc_hbm.at[idx], sc_buf.at[sl, i], sem.at[sl, i, 2]).start()

    @pl.when(b == 0)
    def _():
        issue(b, slot)
    issue(b + 1, 1 - slot)
    for i in range(G):
        idx = sel_ref[b, i]
        pltpu.make_async_copy(
            k_hbm.at[idx], k_buf.at[slot, i], sem.at[slot, i, 0]).wait()
        pltpu.make_async_copy(
            v_hbm.at[idx], v_buf.at[slot, i], sem.at[slot, i, 1]).wait()
        pltpu.make_async_copy(
            sc_hbm.at[idx], sc_buf.at[slot, i], sem.at[slot, i, 2]).wait()
    kw = pltpu.bitcast(k_buf[slot, 0, 0], jnp.int32)   # [ROWS, D]
    o_ref[0] = kw[:REP][None].astype(jnp.float32).repeat(H, 0).reshape(
        H, REP, D)


def v_pgmaj_dma(q, kp, vp, sc, sel, lens):
    return pl.pallas_call(
        _pgmaj_dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, REP, D), lambda b, *p: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, H, ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, H, ROWS, D), jnp.uint8),
                pltpu.VMEM((2, G, 4, H, PAGE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, REP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(sel, lens, q, kp, vp, sc)


def main():
    rng = np.random.default_rng(0)
    n_pages = B * G + 1
    kp = jnp.asarray(rng.integers(0, 255, (n_pages, H, ROWS, D)), jnp.uint8)
    vp = jnp.asarray(rng.integers(0, 255, (n_pages, H, ROWS, D)), jnp.uint8)
    sc_pool = jnp.asarray(
        rng.uniform(0.01, 1.0, (n_pages, H, 4 * PAGE)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, H, REP, D)), jnp.float32)
    sel = jnp.asarray(
        rng.permutation(B * G).reshape(B, G), jnp.int32)
    lens = jnp.full((B,), CTX, jnp.int32)
    # pre-gathered scales for v_cur (charged separately)
    sc_g = sc_pool[sel].reshape(B, G, H, 4, PAGE).transpose(
        0, 2, 3, 1, 4).reshape(B, H, 4, LANES)
    # page-plane-major: gather + (Tp <-> H) swap only
    sc_g4 = sc_pool[sel].transpose(0, 2, 1, 3).reshape(B, H, G * 4 * PAGE)

    rec_rows, sc_rows = _fused_layout()
    fused_pool = jnp.concatenate([
        kp.reshape(n_pages, H * ROWS, D),
        vp.reshape(n_pages, H * ROWS, D),
        # planes in [4, H, PAGE] f32 order, bitcast to u8 with the byte
        # index as a SUBLANE (matches the kernel's u8->f32 sublane packing:
        # f32 row r column d = u8 rows 4r..4r+3 column d)
        jax.lax.bitcast_convert_type(
            sc_pool.reshape(n_pages, H, 4, PAGE).transpose(0, 2, 1, 3),
            jnp.uint8,
        ).transpose(0, 1, 2, 4, 3).reshape(n_pages, sc_rows, D)
        if sc_rows else jnp.zeros((n_pages, 0, D), jnp.uint8),
    ], axis=1)

    variants = {
        "v_dma": (v_dma, sc_pool),
        "v_scdma": (v_scdma, sc_pool.reshape(n_pages, H, 4, PAGE).transpose(0, 2, 1, 3).copy()),
        "v_pgmaj": (v_pgmaj, sc_pool.reshape(n_pages, H, 4, PAGE).transpose(0, 2, 1, 3).copy()),
        "v_pgmaj_dma": (v_pgmaj_dma, sc_pool.reshape(n_pages, H, 4, PAGE).transpose(0, 2, 1, 3).copy()),
        "v_fused": (v_fused, fused_pool),
        "v_fused_dma": (v_fused_dma, fused_pool),
        "v_cur": (v_cur, sc_g),
        "v_cur_pt": (v_cur_pt, sc_pool),
        "v_noconcat": (v_noconcat, sc_pool),
        "v_tok3d": (v_tok3d, sc_pool),
        "v_batch": (v_batch, sc_g),
        "v_batch4d": (v_batch4d, sc_g4),
        "v_stream": (v_stream, sc_pool),
    }
    names = os.environ.get("MB_VARIANTS", ",".join(variants)).split(",")
    kv_bytes = B * G * (2 * H * ROWS * D + 0)  # packed K+V bytes per call
    R = int(os.environ.get("MB_CHAIN", "8"))  # kernel calls per program
    for name in names:
        fn, sc = variants[name]

        @jax.jit
        def chained(q, kp, vp, sc, sel, lens):
            out = jnp.zeros((B, H, REP, D), jnp.float32)
            for _ in range(R):
                # serialize iterations with a value-preserving dependency
                out = fn(q + out * 1e-30, kp, vp, sc, sel, lens)
            return out

        fetch = jax.jit(lambda t: t[0, 0, 0, :2])
        out = chained(q, kp, vp, sc, sel, lens)
        np.asarray(fetch(out))
        if os.environ.get("MB_TRACE"):
            with jax.profiler.trace(os.environ["MB_TRACE"]):
                out = chained(q, kp, vp, sc, sel, lens)
                np.asarray(fetch(out))
            import sys
            sys.path.insert(0, os.path.dirname(__file__))
            from profile_decode import parse
            parse(os.environ["MB_TRACE"], R)
            return
        # measure the host<->device fetch roundtrip to subtract it; queueing
        # many un-fetched programs hits severe backpressure on the tunnel
        t0 = time.time()
        for _ in range(4):
            np.asarray(fetch(out))
        rt = (time.time() - t0) / 4
        n_it = 5
        t0 = time.time()
        for _ in range(n_it):
            out = chained(q, kp, vp, sc, sel, lens)
            np.asarray(fetch(out))
        dt = ((time.time() - t0) / n_it - rt) / R
        gbps = kv_bytes / dt / 1e9
        print(f"{name:10s} {dt * 1e6:9.1f} us/call  "
              f"{dt / B * 1e6:6.3f} us/seq  KV {gbps:6.0f} GB/s  "
              f"(roundtrip {rt * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
