"""Kernel dispatch: Pallas TPU kernels vs jnp reference implementations.

Every op has a jnp reference (the semantic contract, tests run against it)
and may have a Pallas TPU kernel. Selection: Pallas on TPU backends unless
disabled via ``OMNISERVE_TPU_DISABLE_PALLAS=1``; reference elsewhere
(CPU tests, debugging).
"""

from __future__ import annotations

import os

import jax

from omniserve_tpu.ops import attention_ref

_FORCE_REFERENCE = os.environ.get("OMNISERVE_TPU_DISABLE_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    if _FORCE_REFERENCE:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def prefill_attention(*args, **kwargs):
    if _on_tpu():
        try:
            from omniserve_tpu.ops.pallas import flash_attention

            return flash_attention.prefill_attention(*args, **kwargs)
        except ImportError:
            pass
    return attention_ref.prefill_attention(*args, **kwargs)


def paged_decode_attention(*args, **kwargs):
    if _on_tpu():
        try:
            from omniserve_tpu.ops.pallas import paged_attention

            return paged_attention.paged_decode_attention(*args, **kwargs)
        except ImportError:
            pass
    return attention_ref.paged_decode_attention(*args, **kwargs)


def paged_decode_attention_fused(
    q, pool, streaming_pool, layer, block_tables, context_lens,
    k_new, v_new, pages_r, slots_r, pages_s, slots_s, *,
    sm_scale, page_size, kv_bits, kv_zeros,
    streaming_block_tables=None, head_is_retrieval=None, head_rank=None,
    sink_blocks=0, local_blocks=0,
    dec_sink_tokens=None, dec_local_tokens=None,
):
    """Decode attention WITH the step's KV append, one call.

    ``context_lens`` INCLUDE the new token. On TPU with the single-pass
    kernel the append fuses into the attention pass (extra exact lane +
    in-kernel page write-back — the reference MMHA structure, replacing
    the separate per-token append kernel's ~2.7 ms/step at batch 160).
    Elsewhere it splits into append_kv_decode + paged_decode_attention
    with identical semantics. Returns (out, pool, streaming_pool)."""
    fused = False
    if _on_tpu() and os.environ.get("OMNISERVE_FUSED_APPEND", "1") == "1":
        from omniserve_tpu.ops.pallas.decode_attention import supports

        fused = supports(kv_bits, page_size, q.shape[-1])
    if fused:
        from omniserve_tpu.ops.pallas import paged_attention

        return paged_attention.paged_decode_attention(
            q, pool, layer, block_tables, context_lens, sm_scale,
            page_size, kv_bits, kv_zeros,
            streaming_pool=streaming_pool,
            streaming_block_tables=streaming_block_tables,
            head_is_retrieval=head_is_retrieval, head_rank=head_rank,
            sink_blocks=sink_blocks, local_blocks=local_blocks,
            dec_sink_tokens=dec_sink_tokens,
            dec_local_tokens=dec_local_tokens,
            append_kv=(k_new, v_new),
        )
    # split path: append first, then attend the updated pools
    import jax.numpy as jnp

    from omniserve_tpu.ops.pallas.paged_attention import _pool_head_sources

    if head_is_retrieval is None:
        src_r = jnp.arange(pool.num_heads)
    else:
        src_r = _pool_head_sources(
            head_rank, head_is_retrieval, pool.num_heads, True
        )
    pool = append_kv_decode(
        pool, layer, k_new[:, src_r], v_new[:, src_r], pages_r, slots_r,
        page_size, kv_bits, kv_zeros,
    )
    if streaming_pool is not None:
        src_s = _pool_head_sources(
            head_rank, head_is_retrieval, streaming_pool.num_heads, False
        )
        streaming_pool = append_kv_decode(
            streaming_pool, layer, k_new[:, src_s], v_new[:, src_s],
            pages_s, slots_s, page_size, kv_bits, kv_zeros,
        )
    out = paged_decode_attention(
        q, pool, layer, block_tables, context_lens, sm_scale, page_size,
        kv_bits, kv_zeros,
        streaming_pool=streaming_pool,
        streaming_block_tables=streaming_block_tables,
        head_is_retrieval=head_is_retrieval, head_rank=head_rank,
        sink_blocks=sink_blocks, local_blocks=local_blocks,
        dec_sink_tokens=dec_sink_tokens, dec_local_tokens=dec_local_tokens,
    )
    return out, pool, streaming_pool


def append_kv_decode(pool, layer, k, v, page_ids, slots, page_size,
                     kv_bits, kv_zeros, update_stats=False, sub_chunks=4):
    """Decode-step KV append (+ optional stats). Pallas in-place kernel on
    TPU; jnp scatter fallback elsewhere. Tokens must target distinct pages
    (the decode invariant)."""
    if _on_tpu():
        try:
            from omniserve_tpu.ops.pallas import kv_append

            return kv_append.append_kv_decode(
                pool, layer, k, v, page_ids, slots, page_size, kv_bits,
                kv_zeros, update_stats=update_stats, sub_chunks=sub_chunks,
            )
        except ImportError:
            pass
    from omniserve_tpu.ops import paged_kv

    pool = paged_kv.append_kv(
        pool, layer, k, v, page_ids, slots, page_size, kv_bits, kv_zeros,
        unique_pages=True,
    )
    if update_stats and pool.k_stats is not None:
        pool = paged_kv.update_k_stats(
            pool, layer, k, page_ids, slots, page_size, sub_chunks
        )
    return pool


def embed_lookup(table, ids):
    """Decode-step embedding rows. The Pallas DMA gather sidesteps XLA's
    slow per-index loop lowering of large-row gathers inside scan bodies
    (the engine's multi-step decode window); prefill keeps the plain XLA
    gather (top-level programs lower it well and T can be tens of
    thousands of rows)."""
    # default off until validated on hardware (tpu_smoke.py gate), like
    # the single-pass prefill kernel below
    if _on_tpu() and os.environ.get("OMNISERVE_EMBED_DMA", "0") == "1":
        try:
            from omniserve_tpu.ops.pallas import embed_gather

            return embed_gather.embed_gather(table, ids)
        except ImportError:
            pass
    return table[ids]


def paged_prefill_attention(*args, **kwargs):
    """Chunked-prefill attention over the paged pool.

    Streaming-ring sources pass ``sel_logic`` + ``ring_span_pages`` +
    ``ring_sink_tokens``; the jnp reference consumes them as an explicit
    per-row position map instead.
    """
    if _on_tpu():
        kv_bits = kwargs.get("kv_bits", args[8] if len(args) > 8 else None)
        page_size = (kwargs["page_size"] if "page_size" in kwargs
                     else (args[7] if len(args) > 7 else 0))
        head_dim = (args[0] if args else kwargs["q"]).shape[-1]
        # default OFF by measurement, not caution: the r5 hardware A/B
        # (eval/prefill_single_pass_ab.json) has the single-pass kernel
        # 0.6% faster at 16K and 2.2% SLOWER at 64K — prefill attention
        # is compute-bound, so the gather's extra HBM pass it removes
        # overlaps with the chunk GEMMs anyway
        single_pass = (
            os.environ.get("OMNISERVE_PREFILL_SINGLE_PASS", "0") == "1"
            and not kwargs.get("return_lse")  # SP partials: two-stage only
        )
        if single_pass:
            if kv_bits in (4, 8):
                from omniserve_tpu.ops.pallas.decode_attention import (
                    supports,
                )

                single_pass = supports(
                    kv_bits, int(page_size), int(head_dim)
                )
            else:
                single_pass = False
        if single_pass:
            try:
                from omniserve_tpu.ops.pallas import prefill_single_pass

                return prefill_single_pass.paged_prefill_single_pass(
                    *args, **kwargs
                )
            except ImportError:
                pass
        try:
            from omniserve_tpu.ops.pallas import paged_prefill

            return paged_prefill.paged_prefill_attention(*args, **kwargs)
        except ImportError:
            pass
    sel_logic = kwargs.pop("sel_logic", None)
    ring_span = kwargs.pop("ring_span_pages", 0)
    ring_sink = kwargs.pop("ring_sink_tokens", 0)
    if sel_logic is not None and ring_span:
        from omniserve_tpu.ops.paged_kv import ring_token_positions

        # kwarg wins; positional index per the kernel signature. `x or
        # args[i]` would bool() an array (ambiguous-truth ValueError) and
        # index out of range when the arg arrived as a keyword.
        page_size = (kwargs["page_size"] if "page_size" in kwargs
                     else args[7])
        context_lens = (kwargs["context_lens"] if "context_lens" in kwargs
                        else args[5])
        kwargs["kv_positions"] = ring_token_positions(
            context_lens, sel_logic.shape[1], ring_sink // page_size,
            ring_span, page_size,
        )
    elif sel_logic is not None:
        # explicit page lists without a ring (sequence-parallel owned-page
        # subsets): slot s holds logical page sel_logic[b, s], -1 = dead
        import jax.numpy as jnp

        page_size = (kwargs["page_size"] if "page_size" in kwargs
                     else args[7])
        off = jnp.arange(page_size)[None, None, :]
        pos = sel_logic[:, :, None] * page_size + off
        pos = jnp.where(sel_logic[:, :, None] >= 0, pos, -1)
        kwargs["kv_positions"] = pos.reshape(
            sel_logic.shape[0], sel_logic.shape[1] * page_size
        )
    return attention_ref.paged_prefill_attention(*args, **kwargs)
