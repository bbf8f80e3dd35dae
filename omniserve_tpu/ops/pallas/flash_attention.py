"""Pallas TPU flash attention for packed-varlen prefill.

Replaces the reference's flash-attn + Block-Sparse-Attention wheels
(omniserve/modeling/layers/ctx_attn/ctx_attn_func.py:9-74): causal
attention over PACKED sequences (segment ids) with a per-q-head mode —
dense causal vs streaming sink+local band (DuoAttention heads).

Packing invariant: sequences occupy consecutive token ranges and positions
increase within a segment, so (same segment AND global causal) equals the
per-sequence causal mask; blocks strictly above the diagonal are skipped.
For streaming heads, kv blocks entirely outside the sink window and the
local band of the current q block are also skipped (block-sparse prefill —
the LServe up-to-2.9x prefill win).

Grid: (q_blocks, kv_blocks) with ALL kv heads processed inside each step.
Each GQA group's n_rep query heads are PRE-MERGED into the row axis
outside the kernel (q laid out [Hkv, T*n_rep, D]), so the per-group dot is
[bq*n_rep, D] x [D, bk] — full MXU tiles — and the segment/causal/band
masks are built once per tile pair (an earlier (head, q, kv) grid spent
most of its time on per-head mask rebuilds and tiny matmul issues).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e37


def _flash_kernel(
    # scalar prefetch
    head_flags_ref,   # [Hkv] int32: 1 = retrieval (dense), 0 = streaming
    kblk_minpos_ref,  # [n_kv_blocks] int32 min position in each kv block
    kblk_maxpos_ref,  # [n_kv_blocks] int32 max REAL position per kv block
    qblk_minpos_ref,  # [n_q_blocks] int32 min position in each q block
    # blocks
    q_ref,            # [Hkv, bq*n_rep, D] (GQA rows pre-merged)
    k_ref,            # [Hkv, bk, D]
    v_ref,            # [Hkv, bk, D]
    qseg_ref,         # [1, bq*n_rep] int32 (row-level, pre-repeated)
    kseg_ref,         # [1, bk] int32
    qpos_ref,         # [1, bq*n_rep] int32
    kpos_ref,         # [1, bk] int32
    o_ref,            # [Hkv, bq*n_rep, D]
    m_ref, l_ref, acc_ref,   # [Hkv*bq*n_rep, 128] x2 / [..., D]
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    sink_size: int,
    local_size: int,
    sparse_heads: bool,
    n_kv_blocks: int,
    n_rep: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    hkv, rows, d = q_ref.shape
    bq = rows // n_rep

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # global-causal block-level skip: kv block strictly above the diagonal
    below_diag = j * block_k <= i * block_q + block_q - 1

    # streaming-head coarse skip (the LServe block-sparse prefill win): a
    # kv block contributes nothing to streaming heads when it lies fully
    # past the sink AND fully below this q block's local band. Conservative
    # across packed segments (cross-segment pairs are masked anyway).
    if sparse_heads:
        stream_dead = (kblk_minpos_ref[j] >= sink_size) & (
            kblk_maxpos_ref[j] + local_size <= qblk_minpos_ref[i]
        )
    else:
        stream_dead = False

    @pl.when(below_diag)
    def _compute():
        qseg = qseg_ref[0][:, None]               # [rows, 1]
        kseg = kseg_ref[0][None, :]               # [1, bk]
        qpos = qpos_ref[0][:, None]
        kpos = kpos_ref[0][None, :]
        mask = (qseg == kseg) & (qpos >= kpos)    # [rows, bk] built ONCE
        if sparse_heads:
            band = (kpos < sink_size) | (qpos - kpos < local_size)
            mask_stream = mask & band

        for h in range(hkv):
            if sparse_heads:
                # scalar-pred jnp.where doesn't legalize in Mosaic;
                # broadcast the head flag into the mask instead
                mask_h = mask_stream | (mask & (head_flags_ref[h] == 1))
            else:
                mask_h = mask

            def head_body(mask_h=mask_h, h=h):
                rs = slice(h * rows, (h + 1) * rows)
                q = q_ref[h].astype(jnp.bfloat16)     # [rows, D]
                k = k_ref[h].astype(jnp.bfloat16)     # [bk, D]
                qk = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                          # [rows, bk]
                qk = jnp.where(mask_h, qk, MASK_VALUE)

                m_prev = m_ref[rs, 0][:, None]
                l_prev = l_ref[rs, 0][:, None]
                m_curr = jnp.max(qk, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(qk - m_next)
                p = jnp.where(mask_h, p, 0.0)
                l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                m_ref[rs, :] = jnp.broadcast_to(m_next, (rows, 128))
                l_ref[rs, :] = jnp.broadcast_to(l_next, (rows, 128))

                v = v_ref[h].astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_ref[rs, :] = acc_ref[rs, :] * alpha + pv

            if sparse_heads:
                # skip streaming heads on out-of-band blocks entirely
                pl.when(
                    (head_flags_ref[h] == 1) | jnp.logical_not(stream_dead)
                )(head_body)
            else:
                head_body()

    @pl.when(j == n_kv_blocks - 1)
    def _finalize():
        for h in range(hkv):
            rs = slice(h * rows, (h + 1) * rows)
            l = jnp.maximum(l_ref[rs, 0][:, None], 1e-10)
            o_ref[h] = (acc_ref[rs, :] / l).astype(o_ref.dtype)


def flash_prefill(
    q: jnp.ndarray,            # [T, Hq, D]
    k: jnp.ndarray,            # [T, Hkv, D]
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [T] int32 (-1 for padding)
    positions: jnp.ndarray,    # [T] int32
    sm_scale: float,
    head_flags: jnp.ndarray,   # [Hq] int32 (1 retrieval / 0 streaming)
    sink_size: int,
    local_size: int,
    sparse_heads: bool,
    block_q: int = 128,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    t, hq, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    # K/V blocks are [hkv, block_k, d]: the GQA-tuned default (hkv 8,
    # block_k 256) is 4x larger for MHA models (llama2: hkv 32) and blows
    # the 16 MB scoped-VMEM limit — scale block_k with the kv head count
    block_k = min(block_k, max(128, block_k * 8 // hkv))
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0

    # pre-merge the GQA group rows: q [Hkv, T*n_rep, D]; kv head-major
    qh = q.reshape(t, hkv, n_rep, d).transpose(1, 0, 2, 3).reshape(
        hkv, t * n_rep, d
    )
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)

    seg2 = segment_ids.astype(jnp.int32)[None, :]   # [1, T]
    pos2 = positions.astype(jnp.int32)[None, :]
    # row-level (element-repeated) segment/position for the q axis
    qseg_rows = jnp.repeat(segment_ids.astype(jnp.int32), n_rep)[None, :]
    qpos_rows = jnp.repeat(positions.astype(jnp.int32), n_rep)[None, :]

    grid = (t // block_q, t // block_k)
    rows = block_q * n_rep

    # per-KV-head flags (q-head flags repeat within a GQA group)
    flags_kv = head_flags.reshape(hkv, n_rep)[:, 0]

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        sink_size=sink_size,
        local_size=local_size,
        sparse_heads=sparse_heads,
        n_kv_blocks=t // block_k,
        n_rep=n_rep,
    )
    # per-block position summaries for the streaming coarse skip; padding
    # rows get +inf-ish for mins and -1 for maxes (conservative both ways)
    pos_min = jnp.where(segment_ids >= 0, positions, jnp.int32(2**30))
    pos_max = jnp.where(segment_ids >= 0, positions, jnp.int32(-1))
    kblk_minpos = jnp.min(
        pos_min.reshape(t // block_k, block_k), axis=1
    ).astype(jnp.int32)
    kblk_maxpos = jnp.max(
        pos_max.reshape(t // block_k, block_k), axis=1
    ).astype(jnp.int32)
    qblk_minpos = jnp.min(
        pos_min.reshape(t // block_q, block_q), axis=1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((hkv, rows, d), lambda i, j, *p: (0, i, 0)),
            pl.BlockSpec((hkv, block_k, d), lambda i, j, *p: (0, j, 0)),
            pl.BlockSpec((hkv, block_k, d), lambda i, j, *p: (0, j, 0)),
            pl.BlockSpec((1, rows), lambda i, j, *p: (0, i)),
            pl.BlockSpec((1, block_k), lambda i, j, *p: (0, j)),
            pl.BlockSpec((1, rows), lambda i, j, *p: (0, i)),
            pl.BlockSpec((1, block_k), lambda i, j, *p: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (hkv, rows, d), lambda i, j, *p: (0, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, t * n_rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(flags_kv.astype(jnp.int32), kblk_minpos, kblk_maxpos, qblk_minpos,
      qh, kh, vh, qseg_rows, seg2, qpos_rows, pos2)
    # [Hkv, T*n_rep, D] -> [T, Hq, D]
    return out.reshape(hkv, t, n_rep, d).transpose(1, 0, 2, 3).reshape(
        t, hq, d
    )


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,
    positions: jnp.ndarray,
    sm_scale: float,
    head_is_retrieval=None,
    sink_size: int = 0,
    local_size: int = 0,
    valid=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas replacement for attention_ref.prefill_attention.

    ``valid`` is implied by segment_ids == -1 (the engine encodes padding
    that way); an explicit valid mask folds into the segment ids.
    """
    hq = q.shape[1]
    if valid is not None:
        segment_ids = jnp.where(valid, segment_ids, -1)
    sparse = head_is_retrieval is not None and (sink_size or local_size)
    if sparse:
        head_flags = head_is_retrieval.astype(jnp.int32)
    else:
        head_flags = jnp.ones((hq,), jnp.int32)
    return flash_prefill(
        q, k, v, segment_ids, positions, sm_scale, head_flags,
        int(sink_size), int(local_size), bool(sparse),
        interpret=interpret,
    )
