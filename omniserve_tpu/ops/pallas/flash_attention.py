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

Grid: (q_heads, q_blocks, kv_blocks) with online softmax across the kv
block dimension.
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
    head_flags_ref,   # [Hq] int32: 1 = retrieval (dense), 0 = streaming
    kblk_minpos_ref,  # [n_kv_blocks] int32 min position in each kv block
    q_ref,            # [1, bq, D]
    k_ref,            # [1, bk, D]
    v_ref,            # [1, bk, D]
    qseg_ref,         # [1, bq] int32
    kseg_ref,         # [1, bk] int32
    qpos_ref,         # [1, bq] int32
    kpos_ref,         # [1, bk] int32
    o_ref,            # [1, bq, D]
    m_ref, l_ref, acc_ref,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    sink_size: int,
    local_size: int,
    sparse_heads: bool,
    n_kv_blocks: int,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # global-causal block-level skip: kv block strictly above the diagonal
    below_diag = j * block_k <= i * block_q + block_q - 1

    if sparse_heads:
        is_retrieval = head_flags_ref[h] == 1
        # Streaming-head block skip: a kv block is needed iff it may hold a
        # sink token (its min within-segment position < sink) or a token
        # within `local` of some q row of this block. Within one segment,
        # position distance equals packed global-index distance, so the
        # band test on global block indices is exact for same-segment
        # pairs (cross-segment pairs are masked anyway).
        may_hold_sink = kblk_minpos_ref[j] < sink_size
        min_dist = i * block_q - (j + 1) * block_k + 1
        coarse_keep = is_retrieval | may_hold_sink | (min_dist < local_size)
    else:
        coarse_keep = True

    @pl.when(below_diag & coarse_keep)
    def _compute():
        q = q_ref[0].astype(jnp.float32)         # [bq, D]
        k = k_ref[0].astype(jnp.float32)
        qk = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                              # [bq, bk]

        qseg = qseg_ref[0][:, None]               # [bq, 1]
        kseg = kseg_ref[0][None, :]               # [1, bk]
        qpos = qpos_ref[0][:, None]
        kpos = kpos_ref[0][None, :]
        mask = (qseg == kseg) & (qpos >= kpos)
        if sparse_heads:
            band = (kpos < sink_size) | (qpos - kpos < local_size)
            mask = mask & jnp.where(head_flags_ref[h] == 1, True, band)
        qk = jnp.where(mask, qk, MASK_VALUE)

        m_prev = m_ref[...]                       # [bq, 128]
        l_prev = l_ref[...]
        m_curr = jnp.max(qk, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(qk - m_next)
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == n_kv_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-10)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


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
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    t, hq, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0

    qt = q.transpose(1, 0, 2)   # [Hq, T, D]
    kt = k.transpose(1, 0, 2)   # [Hkv, T, D]
    vt = v.transpose(1, 0, 2)
    seg2 = segment_ids.astype(jnp.int32)[None, :]   # [1, T]
    pos2 = positions.astype(jnp.int32)[None, :]

    grid = (hq, t // block_q, t // block_k)

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        sink_size=sink_size,
        local_size=local_size,
        sparse_heads=sparse_heads,
        n_kv_blocks=t // block_k,
    )
    # min within-segment position per kv block (for the sink-block skip);
    # padding rows (seg -1) get a huge position so they never force a load.
    pos_eff = jnp.where(segment_ids >= 0, positions, jnp.int32(2**30))
    kblk_minpos = jnp.min(
        pos_eff.reshape(t // block_k, block_k), axis=1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j, f, mp: (h, i, 0)),
            pl.BlockSpec(
                (1, block_k, d), lambda h, i, j, f, mp: (h // n_rep, j, 0)
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda h, i, j, f, mp: (h // n_rep, j, 0)
            ),
            pl.BlockSpec((1, block_q), lambda h, i, j, f, mp: (0, i)),
            pl.BlockSpec((1, block_k), lambda h, i, j, f, mp: (0, j)),
            pl.BlockSpec((1, block_q), lambda h, i, j, f, mp: (0, i)),
            pl.BlockSpec((1, block_k), lambda h, i, j, f, mp: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda h, i, j, f, mp: (h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hq, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(head_flags.astype(jnp.int32), kblk_minpos, qt, kt, vt, seg2, seg2,
      pos2, pos2)
    return out.transpose(1, 0, 2)


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
