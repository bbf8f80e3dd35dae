"""Reference (pure-jnp) attention ops: the semantic contracts.

These define the exact behavior the Pallas kernels must reproduce:

- ``prefill_attention``: packed-varlen causal attention with per-head mode —
  dense causal vs streaming (sink + local band). Replaces the reference's
  flash_attn_varlen_func + Block-Sparse-Attention token_streaming_attn_func
  (omniserve/modeling/layers/ctx_attn/ctx_attn_func.py:9-74).
- ``paged_decode_attention``: single-query attention over the paged
  quantized KV pools with per-kv-head pool routing (retrieval vs streaming
  ring), optional dynamic-sparse page selection. Replaces the MMHA kernels
  (kernels/csrc/fused_attention/**, contract in SURVEY.md §2.3).
- ``page_selector``: query-aware upper-bound page scores from per-sub-chunk
  K min/max stats (KVPageSelectorTemplate.hpp:1180-1283):
  score = sum_d max(q_d * kmin_d, q_d * kmax_d), i.e. q⁺·kmax + q⁻·kmin.

Streaming-head validity at decode (ring pool, sink s tokens / local w
tokens, context length L): token t is attended iff
``t < s or t >= L - w`` — sinks are never overwritten; a local token
survives until the token ``t + w`` lands on its ring slot.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Reference ops use exact f32 contractions (tests compare against numpy;
# production kernels make their own precision choices).
_PREC = jax.lax.Precision.HIGHEST

from omniserve_tpu.ops.paged_kv import KVPool, gather_kv_for_seq

NEG_INF = float("-inf")


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[T, Hkv, D] -> [T, Hkv*n_rep, D] (GQA group expansion)."""
    if n_rep == 1:
        return x
    t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (t, h, n_rep, d)).reshape(
        t, h * n_rep, d
    )


# ---------------------------------------------------------------------------
# Prefill attention (packed varlen + per-head streaming masks)
# ---------------------------------------------------------------------------


def prefill_attention(
    q: jnp.ndarray,            # [T, Hq, D]
    k: jnp.ndarray,            # [T, Hkv, D] (post-RoPE)
    v: jnp.ndarray,            # [T, Hkv, D]
    segment_ids: jnp.ndarray,  # [T] int32, seq id per packed token
    positions: jnp.ndarray,    # [T] int32, position within its sequence
    sm_scale: float,
    head_is_retrieval: Optional[jnp.ndarray] = None,  # [Hq] bool
    sink_size: int = 0,
    local_size: int = 0,
    valid: Optional[jnp.ndarray] = None,  # [T] bool, False = padding token
) -> jnp.ndarray:
    """Causal self-attention over packed sequences.

    Streaming heads (``head_is_retrieval == False``) use the sink+local
    band: query at position i attends key at position j iff
    ``j <= i and (j < sink_size or i - j < local_size)``.
    """
    t, hq, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)

    scores = jnp.einsum(
        "thd,shd->hts", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=_PREC,
    ) * sm_scale

    same_seq = segment_ids[:, None] == segment_ids[None, :]
    causal = positions[:, None] >= positions[None, :]
    mask = same_seq & causal
    if valid is not None:
        mask = mask & valid[None, :] & valid[:, None]
    mask = jnp.broadcast_to(mask[None], (hq, t, t))

    if head_is_retrieval is not None and (sink_size or local_size):
        delta = positions[:, None] - positions[None, :]
        band = (positions[None, :] < sink_size) | (delta < local_size)
        streaming_mask = mask & jnp.broadcast_to(band[None], (hq, t, t))
        mask = jnp.where(
            head_is_retrieval[:, None, None], mask, streaming_mask
        )

    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # Rows with no valid key (padding) produce NaN-free zeros:
    probs = jnp.where(mask.any(axis=-1, keepdims=True), probs, 0.0)
    out = jnp.einsum("hts,shd->thd", probs, v.astype(jnp.float32),
                     precision=_PREC)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Decode (single-query) paged attention
# ---------------------------------------------------------------------------


def _sdpa(
    q: jnp.ndarray,      # [B, Hq, D]
    k: jnp.ndarray,      # [B, S, Hkv, D] (dequantized)
    v: jnp.ndarray,      # [B, S, Hkv, D]
    valid: jnp.ndarray,  # [B, Hkv, S] bool
    sm_scale: float,
    n_rep: int,
    return_lse: bool = False,
):
    """Batched single-query GQA attention with a per-(seq, head) key mask.

    ``return_lse=True`` additionally returns the softmax statistics
    (m = masked row max, l = sum exp(score - m)), both [B, Hq] — the
    partial-attention contract for cross-device sequence-parallel
    combines (parallel/sp.py). Rows with no valid keys give
    (out=0, m=NEG_INF, l=0), which combine as a no-op.
    """
    b, s, hkv, d = k.shape
    hq = q.shape[1]
    qf = q.astype(jnp.float32).reshape(b, hkv, n_rep, d)
    scores = (
        jnp.einsum("bhrd,bshd->bhrs", qf, k, precision=_PREC) * sm_scale
    )
    mask = valid[:, :, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    any_valid = mask.any(axis=-1, keepdims=True)
    m = jnp.max(scores, axis=-1, keepdims=True)          # [B,Hkv,r,1]
    m_safe = jnp.where(any_valid, m, 0.0)
    p = jnp.where(mask, jnp.exp(scores - m_safe), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = jnp.where(any_valid, p / jnp.maximum(l, 1e-30), 0.0)
    out = jnp.einsum("bhrs,bshd->bhrd", probs, v, precision=_PREC)
    out = out.reshape(b, hq, d)
    if not return_lse:
        return out
    m_out = jnp.where(any_valid, m, NEG_INF).reshape(b, hq)
    return out, m_out, l.reshape(b, hq)


def paged_decode_attention(
    q: jnp.ndarray,               # [B, Hq, D] (post-RoPE)
    pool: KVPool,                 # retrieval pool
    layer: int,
    block_tables: jnp.ndarray,    # [B, max_blocks] int32
    context_lens: jnp.ndarray,    # [B] int32, tokens cached incl. current
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    streaming_pool: Optional[KVPool] = None,
    streaming_block_tables: Optional[jnp.ndarray] = None,  # [B, s+l blocks]
    head_is_retrieval: Optional[jnp.ndarray] = None,  # [Hkv] bool
    head_rank: Optional[jnp.ndarray] = None,          # [Hkv] rank in pool
    sink_blocks: int = 0,
    local_blocks: int = 0,
    page_idxes: Optional[jnp.ndarray] = None,  # [B, Hkv, n_sel] logical, -1 pad
    dec_sink_tokens: Optional[int] = None,
    dec_local_tokens: Optional[int] = None,
    return_lse: bool = False,
):
    """Reference paged decode attention with dual pools + dynamic sparsity.

    ``dec_sink_tokens``/``dec_local_tokens`` give the streaming decode
    band in TOKENS (defaults: the ring window) — the ring may be larger
    than the decode window when sized for chunked sparse prefill.

    Head routing (SURVEY.md §2.3): kv head h uses the retrieval pool at row
    ``head_rank[h]`` if ``head_is_retrieval[h]`` else the streaming ring
    pool at row ``head_rank[h]``. ``page_idxes`` (if given) restricts each
    retrieval head to the selected logical pages; the newest page must be
    included by the selector.
    """
    b, hq, d = q.shape
    max_blocks = block_tables.shape[1]
    s_max = max_blocks * page_size

    if head_is_retrieval is None:
        hkv = pool.num_heads
        head_is_retrieval = jnp.ones((hkv,), bool)
        head_rank = jnp.arange(hkv)
    else:
        hkv = head_is_retrieval.shape[0]
    n_rep = hq // hkv
    tok = jnp.arange(s_max)

    # -- retrieval pool path (all kv heads; streaming heads overwritten) --
    gather = jax.vmap(
        lambda tbl: gather_kv_for_seq(
            pool, layer, tbl, page_size, kv_bits, kv_zeros
        )
    )
    k_all, v_all = gather(block_tables)  # [B, S, Hr, D]
    dense_valid = tok[None, :] < context_lens[:, None]  # [B, S]
    valid_r = jnp.broadcast_to(dense_valid[:, None, :], (b, hkv, s_max))
    if page_idxes is not None:
        page_of_tok = tok // page_size
        sel = jnp.where(page_idxes < 0, -2, page_idxes)  # [B, Hkv, n_sel]
        selected = (
            page_of_tok[None, None, :, None] == sel[:, :, None, :]
        ).any(-1)
        valid_r = valid_r & selected
    ranks_r = jnp.clip(head_rank, 0, pool.num_heads - 1)
    out_r = _sdpa(
        q, k_all[:, :, ranks_r], v_all[:, :, ranks_r], valid_r, sm_scale,
        n_rep, return_lse=return_lse,
    )
    if streaming_pool is None:
        if return_lse:
            o, m, l = out_r
            return o.astype(q.dtype), m, l
        return out_r.astype(q.dtype)

    # -- streaming ring pool path --
    sgather = jax.vmap(
        lambda tbl: gather_kv_for_seq(
            streaming_pool, layer, tbl, page_size, kv_bits, kv_zeros
        )
    )
    sk_all, sv_all = sgather(streaming_block_tables)  # [B, Ss, Hs, D]
    n_ring_blocks = max(1, streaming_block_tables.shape[1] - sink_blocks)
    sink_tok = sink_blocks * page_size
    local_tok = n_ring_blocks * page_size          # ring capacity (tokens)
    band_sink = (
        sink_tok if dec_sink_tokens is None else dec_sink_tokens
    )
    band_local = (
        local_tok if dec_local_tokens is None else dec_local_tokens
    )
    stok = jnp.arange((sink_blocks + n_ring_blocks) * page_size)
    is_sink_slot = stok < sink_tok
    r = stok - sink_tok
    L = context_lens[:, None]  # [B, 1]
    # latest logical token currently held by each ring slot: the largest
    # t < L with (t - sink_tok) mod local_tok == r.
    n_written = L - sink_tok
    latest = jnp.where(
        n_written > r,
        sink_tok + r + ((n_written - 1 - r) // local_tok) * local_tok,
        -1,
    )
    slot_token = jnp.where(is_sink_slot[None, :], stok[None, :], latest)
    s_valid = (slot_token >= 0) & (slot_token < L)
    # decode band: sink tokens + the last band_local tokens only
    s_valid = s_valid & (
        (slot_token < band_sink) | (slot_token >= L - band_local)
    )
    valid_s = jnp.broadcast_to(
        s_valid[:, None, :], (b, hkv, s_valid.shape[1])
    )
    ranks_s = jnp.clip(head_rank, 0, streaming_pool.num_heads - 1)
    out_s = _sdpa(
        q, sk_all[:, :, ranks_s], sv_all[:, :, ranks_s], valid_s, sm_scale,
        n_rep, return_lse=return_lse,
    )
    retr_q = jnp.repeat(head_is_retrieval, n_rep)  # [Hq]
    if return_lse:
        (o_r, m_r, l_r), (o_s, m_s, l_s) = out_r, out_s
        o = jnp.where(retr_q[None, :, None], o_r, o_s).astype(q.dtype)
        m = jnp.where(retr_q[None, :], m_r, m_s)
        l = jnp.where(retr_q[None, :], l_r, l_s)
        return o, m, l
    return jnp.where(retr_q[None, :, None], out_r, out_s).astype(q.dtype)


# ---------------------------------------------------------------------------
# Query-aware page selector
# ---------------------------------------------------------------------------


def page_selector_scores(
    q: jnp.ndarray,           # [B, Hq, D] current queries (post-RoPE)
    k_stats: jnp.ndarray,     # [L, P, Hr, n_sub*2, D] pool stats
    layer: int,
    block_tables: jnp.ndarray,  # [B, max_blocks]
    head_is_retrieval: jnp.ndarray,  # [Hkv]
    head_rank: jnp.ndarray,          # [Hkv]
) -> jnp.ndarray:
    """Upper-bound score per (batch, kv_head, logical page).

    score(page) = max over sub-chunks of
        max over the head's GQA queries of sum_d max(q_d*kmin_d, q_d*kmax_d).
    Streaming heads get -inf (they never select pages).
    """
    b, hq, d = q.shape
    hkv = head_is_retrieval.shape[0]
    n_rep = hq // hkv
    # Score the WHOLE pool slab, then pick each sequence's logical pages
    # as a tiny scalar gather: on TPU, gathers whose slices are big
    # (16 KB stats rows) lower to while-loops that cost ~0.3 ms per index,
    # while the slab einsum is a contiguous read the MXU eats for free.
    n_pages = k_stats.shape[1]
    hr = k_stats.shape[2]
    slab = jax.lax.dynamic_slice_in_dim(
        k_stats.reshape((-1,) + k_stats.shape[2:]), layer * n_pages,
        n_pages,
    )                                     # [P, Hr, n_sub*2, D]
    kmin = slab[:, :, 0::2, :]            # [P, Hr, n_sub, D]
    kmax = slab[:, :, 1::2, :]
    qf = q.astype(jnp.float32).reshape(b, hkv, n_rep, d)
    # one q head per retrieval pool row (rank is a bijection there)
    rows = jnp.arange(hr)
    src = jnp.argmax(
        (head_rank[None, :] == rows[:, None]) & head_is_retrieval[None, :],
        axis=1,
    )                                     # [Hr] kv head feeding pool row r
    q_r = qf[:, src]                      # [B, Hr, n_rep, D]
    ub = jnp.einsum(
        "bhrd,phsd->bphrs", jnp.maximum(q_r, 0.0), kmax,
    ) + jnp.einsum(
        "bhrd,phsd->bphrs", jnp.minimum(q_r, 0.0), kmin,
    )                                     # [B, P, Hr, n_rep, n_sub]
    pool_scores = ub.max(axis=(3, 4))     # [B, P, Hr]
    # per-sequence logical pages + kv-head rank routing: scalar gather
    rank_c = jnp.clip(head_rank, 0, hr - 1)
    sel = jnp.take_along_axis(
        pool_scores[:, :, rank_c],        # [B, P, Hkv]
        jnp.clip(block_tables, 0, n_pages - 1)[:, :, None],
        axis=1,
    )                                     # [B, max_b, Hkv]
    scores = jnp.where(head_is_retrieval[None, None, :], sel, NEG_INF)
    return scores.transpose(0, 2, 1)      # [B, Hkv, max_blocks]


def select_topk_pages(
    scores: jnp.ndarray,        # [B, Hkv, max_blocks]
    context_lens: jnp.ndarray,  # [B]
    budget_pages: int,
    page_size: int,
) -> jnp.ndarray:
    """Top-(budget-1) pages by score + always the newest page.

    Reference decoding_attention.py:132-141. If history fits in the budget,
    all pages are selected. Returns logical page indices, -1 padded,
    shape [B, Hkv, budget_pages].
    """
    b, hkv, max_blocks = scores.shape
    n_pages = (context_lens + page_size - 1) // page_size  # [B]
    newest = n_pages - 1
    page_ids = jnp.arange(max_blocks)
    in_range = page_ids[None, :] < n_pages[:, None]  # [B, max_blocks]
    # Exclude the newest page from scoring; re-add it as slot 0.
    scored = jnp.where(
        in_range[:, None, :] & (page_ids[None, None, :] != newest[:, None, None]),
        scores,
        NEG_INF,
    )
    k = min(budget_pages - 1, max_blocks)  # table may be narrower early on
    # approx_max_k: TPU-native partial reduction — lax.top_k lowers to a
    # full bitonic sort whose while-loops dominated long-context decode
    # (~40 ms/step at 64K). Recall 0.99 on heuristic upper-bound scores.
    top_scores, top_idx = jax.lax.approx_max_k(
        scored, k, recall_target=0.99
    )                                              # [B, Hkv, k]
    top_idx = jnp.where(top_scores > NEG_INF, top_idx, -1)
    sel = jnp.concatenate(
        [jnp.broadcast_to(newest[:, None, None], (b, hkv, 1)), top_idx],
        axis=2,
    )
    if sel.shape[2] < budget_pages:
        sel = jnp.pad(sel, ((0, 0), (0, 0),
                            (0, budget_pages - sel.shape[2])),
                      constant_values=-1)
    # If everything fits in budget, select all pages instead.
    fits = n_pages <= budget_pages  # [B]
    all_pages = jnp.where(
        in_range[:, None, :], page_ids[None, None, :], -1
    )  # [B, 1, max_blocks]
    all_pages = jnp.broadcast_to(all_pages, (b, hkv, max_blocks))
    if max_blocks >= budget_pages:
        all_sel = all_pages[:, :, :budget_pages]
    else:
        all_sel = jnp.pad(
            all_pages,
            ((0, 0), (0, 0), (0, budget_pages - max_blocks)),
            constant_values=-1,
        )
    return jnp.where(fits[:, None, None], all_sel, sel)


def paged_prefill_attention(
    q: jnp.ndarray,               # [B, Tq, Hq, D] current-chunk queries
    pool,
    layer,
    block_tables: jnp.ndarray,    # [B, max_blocks]
    q_positions: jnp.ndarray,     # [B, Tq] absolute position (-1 = pad)
    context_lens: jnp.ndarray,    # [B] tokens in pool incl. current chunk
    sm_scale: float,
    page_size: int,
    kv_bits: int,
    kv_zeros: bool,
    head_is_retrieval=None,
    sink_size: int = 0,
    local_size: int = 0,
    kv_positions: Optional[jnp.ndarray] = None,  # [B, max_blocks*page]
    return_lse: bool = False,
) -> jnp.ndarray:
    """Chunked-prefill attention: queries attend CAUSALLY over the paged
    pool (history + the current chunk, which the caller appends before
    calling). jnp reference for the Pallas kernel; per-q-head streaming
    (sink+local band) masks supported like the flash prefill path.

    ``kv_positions`` overrides the identity position map (needed when the
    "pool" is the streaming ring: rows hold non-sequential positions; see
    paged_kv.ring_token_positions). -1 marks invalid rows.

    The reference has no paged prefill (it runs flash over the whole
    in-register prompt and only chunks the MLP, llama_w4a8_unpad.py:89-112);
    chunked prefill with paged history is how the TPU build bounds
    activation memory at 256K context.
    """
    from omniserve_tpu.ops.paged_kv import gather_kv_for_seq

    b, tq, hq, d = q.shape
    max_blocks = block_tables.shape[1]
    t_kv = max_blocks * page_size
    outs = []
    for i in range(b):
        k, v = gather_kv_for_seq(
            pool, layer, block_tables[i], page_size, kv_bits, kv_zeros
        )                                       # [t_kv, Hkv, D] dequantized
        hkv = k.shape[1]
        n_rep = hq // hkv
        kf = _repeat_kv(k.astype(jnp.float32), n_rep)   # [t_kv, Hq, D]
        vf = _repeat_kv(v.astype(jnp.float32), n_rep)
        qf = q[i].astype(jnp.float32)                   # [Tq, Hq, D]
        logits = jnp.einsum("qhd,khd->hqk", qf, kf) * sm_scale
        if kv_positions is None:
            kv_pos = jnp.arange(t_kv)
        else:
            kv_pos = kv_positions[i]
        qpos = q_positions[i]
        mask = (
            (kv_pos[None, :] <= qpos[:, None])
            & (kv_pos[None, :] >= 0)
            & (kv_pos[None, :] < context_lens[i])
            & (qpos[:, None] >= 0)
        )                                              # [Tq, t_kv]
        if head_is_retrieval is not None and (sink_size or local_size):
            band = (kv_pos[None, :] < sink_size) | (
                qpos[:, None] - kv_pos[None, :] < local_size
            )
            mask_h = jnp.where(
                head_is_retrieval[:, None, None], mask[None], (mask & band)[None]
            )                                          # [Hq, Tq, t_kv]
        else:
            mask_h = jnp.broadcast_to(mask[None], logits.shape)
        logits = jnp.where(mask_h, logits, -1e30)
        if return_lse:
            # sequence-parallel partials: locally-normalized output plus
            # (m, l) for the cross-rank LSE combine (parallel/sp.py)
            m = jnp.max(logits, axis=-1)               # [Hq, Tq]
            pexp = jnp.where(
                mask_h, jnp.exp(logits - m[..., None]), 0.0
            )
            l = jnp.sum(pexp, axis=-1)                 # [Hq, Tq]
            out = jnp.einsum(
                "hqk,khd->qhd", pexp / jnp.maximum(l, 1e-30)[..., None], vf
            )
            outs.append((out, m.T, l.T))
        else:
            p = jax.nn.softmax(logits, axis=-1)
            p = jnp.where(mask_h, p, 0.0)
            out = jnp.einsum("hqk,khd->qhd", p, vf)
            outs.append(out)
    if return_lse:
        o = jnp.stack([x[0] for x in outs]).astype(q.dtype)
        m = jnp.stack([x[1] for x in outs])
        l = jnp.stack([x[2] for x in outs])
        return o, m, l
    return jnp.stack(outs).astype(q.dtype)
