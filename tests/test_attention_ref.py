"""Tests for the reference attention semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops.attention_ref import (
    page_selector_scores,
    paged_decode_attention,
    prefill_attention,
    select_topk_pages,
)
from omniserve_tpu.ops.paged_kv import (
    append_kv,
    make_kv_pool,
    reset_page_stats,
    update_k_stats,
)

rng = np.random.default_rng(4)

PAGE = 8
DIM = 16


def naive_attention(q, k, v, mask, scale):
    """q [T,H,D], k/v [S,H,D], mask [T,S] -> [T,H,D]"""
    scores = np.einsum("thd,shd->hts", q, k) * scale
    scores = np.where(mask[None], scores, -np.inf)
    scores = scores - scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v)


class TestPrefillAttention:
    def test_single_seq_causal(self):
        t, h = 12, 2
        q = rng.normal(size=(t, h, DIM)).astype(np.float32)
        k = rng.normal(size=(t, h, DIM)).astype(np.float32)
        v = rng.normal(size=(t, h, DIM)).astype(np.float32)
        seg = jnp.zeros(t, jnp.int32)
        pos = jnp.arange(t, dtype=jnp.int32)
        out = prefill_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, pos,
            sm_scale=0.25,
        )
        mask = np.tril(np.ones((t, t), bool))
        expected = naive_attention(q, k, v, mask, 0.25)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                                   atol=1e-5)

    def test_packed_sequences_do_not_attend_across(self):
        # two sequences of 4 and 6 tokens packed
        t = 10
        q = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        k = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        v = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        seg = jnp.asarray([0] * 4 + [1] * 6, jnp.int32)
        pos = jnp.asarray(list(range(4)) + list(range(6)), jnp.int32)
        out = np.asarray(
            prefill_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, pos, 0.25
            )
        )
        # second sequence computed standalone must match
        out2 = np.asarray(
            prefill_attention(
                jnp.asarray(q[4:]), jnp.asarray(k[4:]), jnp.asarray(v[4:]),
                jnp.zeros(6, jnp.int32), jnp.arange(6, dtype=jnp.int32), 0.25,
            )
        )
        np.testing.assert_allclose(out[4:], out2, rtol=2e-4, atol=1e-5)

    def test_gqa_expansion(self):
        t, hq, hkv = 6, 4, 2
        q = rng.normal(size=(t, hq, DIM)).astype(np.float32)
        k = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        v = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        out = np.asarray(
            prefill_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.zeros(t, jnp.int32), jnp.arange(t, dtype=jnp.int32), 0.25,
            )
        )
        k_rep = np.repeat(k, 2, axis=1)
        v_rep = np.repeat(v, 2, axis=1)
        mask = np.tril(np.ones((t, t), bool))
        expected = naive_attention(q, k_rep, v_rep, mask, 0.25)
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=1e-5)

    def test_streaming_head_band_mask(self):
        t = 16
        sink, local = 2, 4
        q = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        k = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        v = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        # head 0 retrieval, head 1 streaming
        out = np.asarray(
            prefill_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.zeros(t, jnp.int32), jnp.arange(t, dtype=jnp.int32), 0.25,
                head_is_retrieval=jnp.asarray([True, False]),
                sink_size=sink, local_size=local,
            )
        )
        i = np.arange(t)[:, None]
        j = np.arange(t)[None, :]
        causal = j <= i
        band = causal & ((j < sink) | (i - j < local))
        exp_r = naive_attention(q[:, :1], k[:, :1], v[:, :1], causal, 0.25)
        exp_s = naive_attention(q[:, 1:], k[:, 1:], v[:, 1:], band, 0.25)
        np.testing.assert_allclose(out[:, :1], exp_r, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[:, 1:], exp_s, rtol=2e-4, atol=1e-5)


def build_pool_with_history(k_hist, v_hist, block_table, kv_bits=16):
    """k_hist [S, H, D] -> pool with history written."""
    s, h, d = k_hist.shape
    pool = make_kv_pool(
        1, len(block_table) + 1, h, PAGE, d, kv_bits=kv_bits,
        kv_zeros=(kv_bits < 16),
    )
    pos = np.arange(s)
    page_ids = np.asarray(block_table)[pos // PAGE]
    slots = pos % PAGE
    return append_kv(
        pool, 0, jnp.asarray(k_hist), jnp.asarray(v_hist),
        jnp.asarray(page_ids), jnp.asarray(slots), PAGE, kv_bits,
        kv_bits < 16,
    )


class TestPagedDecodeAttention:
    @pytest.mark.parametrize("kv_bits,tol", [(16, 1e-2), (8, 5e-2), (4, 2e-1)])
    def test_dense_matches_naive(self, kv_bits, tol):
        s, h = 21, 2
        k_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        v_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        block_table = [3, 1, 0]
        pool = build_pool_with_history(k_hist, v_hist, block_table, kv_bits)
        q = rng.normal(size=(1, h, DIM)).astype(np.float32)
        out = paged_decode_attention(
            jnp.asarray(q), pool, 0,
            jnp.asarray([block_table], jnp.int32),
            jnp.asarray([s], jnp.int32),
            sm_scale=0.25, page_size=PAGE, kv_bits=kv_bits,
            kv_zeros=kv_bits < 16,
        )
        mask = np.ones((1, s), bool)
        expected = naive_attention(q, k_hist, v_hist, mask, 0.25)
        np.testing.assert_allclose(np.asarray(out)[0], expected[:, 0].transpose(1, 0, 2)[0]
                                   if False else expected[0],
                                   atol=tol, rtol=tol)

    def test_respects_context_len(self):
        s, h = 16, 1
        k_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        v_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        pool = build_pool_with_history(k_hist, v_hist, [0, 1])
        q = rng.normal(size=(1, h, DIM)).astype(np.float32)
        out = paged_decode_attention(
            jnp.asarray(q), pool, 0, jnp.asarray([[0, 1]], jnp.int32),
            jnp.asarray([10], jnp.int32), 0.25, PAGE, 16, False,
        )
        expected = naive_attention(
            q, k_hist[:10], v_hist[:10], np.ones((1, 10), bool), 0.25
        )
        np.testing.assert_allclose(np.asarray(out)[0], expected[0], atol=1e-2)

    def test_gqa_heads(self):
        s, hkv, hq = 12, 2, 4
        k_hist = rng.normal(size=(s, hkv, DIM)).astype(np.float32)
        v_hist = rng.normal(size=(s, hkv, DIM)).astype(np.float32)
        pool = build_pool_with_history(k_hist, v_hist, [0, 1])
        q = rng.normal(size=(1, hq, DIM)).astype(np.float32)
        out = paged_decode_attention(
            jnp.asarray(q), pool, 0, jnp.asarray([[0, 1]], jnp.int32),
            jnp.asarray([s], jnp.int32), 0.25, PAGE, 16, False,
        )
        k_rep = np.repeat(k_hist, 2, axis=1)
        v_rep = np.repeat(v_hist, 2, axis=1)
        expected = naive_attention(q, k_rep, v_rep, np.ones((1, s), bool), 0.25)
        np.testing.assert_allclose(np.asarray(out)[0], expected[0], atol=1e-2)

    def test_dynamic_sparse_page_selection(self):
        s, h = 24, 1  # 3 pages
        k_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        v_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        pool = build_pool_with_history(k_hist, v_hist, [0, 1, 2])
        q = rng.normal(size=(1, h, DIM)).astype(np.float32)
        # select pages 0 and 2 only
        page_idxes = jnp.asarray([[[0, 2, -1]]], jnp.int32)
        out = paged_decode_attention(
            jnp.asarray(q), pool, 0, jnp.asarray([[0, 1, 2]], jnp.int32),
            jnp.asarray([s], jnp.int32), 0.25, PAGE, 16, False,
            page_idxes=page_idxes,
        )
        valid = np.zeros((1, s), bool)
        valid[:, 0:PAGE] = True
        valid[:, 2 * PAGE:] = True
        expected = naive_attention(q, k_hist, v_hist, valid, 0.25)
        np.testing.assert_allclose(np.asarray(out)[0], expected[0], atol=1e-2)


class TestStreamingDecode:
    def test_ring_validity(self):
        # sink=1 block, local=2 blocks; context L=40 tokens (5 blocks).
        sink_b, local_b = 1, 2
        h = 1
        L = 40
        k_hist = rng.normal(size=(L, h, DIM)).astype(np.float32)
        v_hist = rng.normal(size=(L, h, DIM)).astype(np.float32)
        # retrieval pool holds everything (head 0 streaming so unused)
        pool = build_pool_with_history(k_hist, v_hist, [0, 1, 2, 3, 4])
        # streaming pool: ring slots = 3 blocks; write tokens through ring
        spool = make_kv_pool(1, 4, h, PAGE, DIM, kv_bits=16, kv_zeros=False)
        stable = [0, 1, 2]
        pos = np.arange(L)
        blk = pos // PAGE
        ring = np.where(
            blk < sink_b, blk, sink_b + (blk - sink_b) % local_b
        )
        page_ids = np.asarray(stable)[ring]
        slots = pos % PAGE
        spool = append_kv(
            spool, 0, jnp.asarray(k_hist), jnp.asarray(v_hist),
            jnp.asarray(page_ids), jnp.asarray(slots), PAGE, 16, False,
        )
        q = rng.normal(size=(1, h, DIM)).astype(np.float32)
        out = paged_decode_attention(
            jnp.asarray(q), pool, 0, jnp.asarray([[0, 1, 2, 3, 4]], jnp.int32),
            jnp.asarray([L], jnp.int32), 0.25, PAGE, 16, False,
            streaming_pool=spool,
            streaming_block_tables=jnp.asarray([stable], jnp.int32),
            head_is_retrieval=jnp.asarray([False]),
            head_rank=jnp.asarray([0]),
            sink_blocks=sink_b, local_blocks=local_b,
        )
        # valid tokens: t < 8 (sink) or t >= 40 - 16 = 24
        valid = np.zeros((1, L), bool)
        valid[:, :PAGE] = True
        valid[:, L - local_b * PAGE:] = True
        expected = naive_attention(q, k_hist, v_hist, valid, 0.25)
        np.testing.assert_allclose(np.asarray(out)[0], expected[0], atol=1e-2)


class TestPageSelector:
    def test_scores_are_upper_bounds(self):
        h, n_sub = 1, 2
        s = 2 * PAGE  # 2 pages
        k_hist = rng.normal(size=(s, h, DIM)).astype(np.float32)
        pool = make_kv_pool(
            1, 3, h, PAGE, DIM, kv_bits=16, with_stats=True,
            sub_chunks=n_sub,
        )
        pool = reset_page_stats(pool, 0, jnp.asarray([0, 1]))
        pos = np.arange(s)
        pool = update_k_stats(
            pool, 0, jnp.asarray(k_hist), jnp.asarray(pos // PAGE),
            jnp.asarray(pos % PAGE), PAGE, n_sub,
        )
        q = rng.normal(size=(1, h, DIM)).astype(np.float32)
        scores = np.asarray(
            page_selector_scores(
                jnp.asarray(q), pool.k_stats, 0,
                jnp.asarray([[0, 1]], jnp.int32),
                jnp.asarray([True]), jnp.asarray([0]),
            )
        )  # [1, 1, 2]
        # each page's score >= max true dot product within the page
        true_scores = (q[0, 0] * k_hist[:, 0]).sum(-1)
        assert scores[0, 0, 0] >= true_scores[:PAGE].max() - 1e-3
        assert scores[0, 0, 1] >= true_scores[PAGE:].max() - 1e-3

    def test_topk_includes_newest_page(self):
        scores = jnp.asarray(
            [[[9.0, 1.0, 5.0, 2.0]]]
        )  # [1, 1, 4 pages]
        sel = np.asarray(
            select_topk_pages(
                scores, jnp.asarray([4 * PAGE]), budget_pages=2,
                page_size=PAGE,
            )
        )
        # budget 2: newest page (3) + best scored other (0)
        assert sel[0, 0, 0] == 3
        assert sel[0, 0, 1] == 0

    def test_all_pages_when_fits_budget(self):
        scores = jnp.asarray([[[1.0, 2.0, 3.0]]])
        sel = np.asarray(
            select_topk_pages(
                scores, jnp.asarray([2 * PAGE]), budget_pages=4,
                page_size=PAGE,
            )
        )
        assert sel[0, 0, 0] == 0 and sel[0, 0, 1] == 1
        assert (sel[0, 0, 2:] == -1).all()
