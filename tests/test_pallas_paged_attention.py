"""Pallas paged decode attention vs jnp reference (interpreter mode, CPU)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import append_kv, make_kv_pool
from omniserve_tpu.ops.pallas.paged_attention import paged_decode_attention

rng = np.random.default_rng(11)

PAGE = 16
DIM = 32


def build_pool(k_hist, v_hist, block_table, kv_bits, kv_zeros=True,
               num_pages=8, pt_scale=0.02):
    s, h, d = k_hist.shape
    pool = make_kv_pool(1, num_pages, h, PAGE, d, kv_bits=kv_bits,
                        kv_zeros=kv_zeros)
    if not kv_zeros and kv_bits < 16:
        pool = pool._replace(
            k_scale_per_tensor=jnp.full((1,), pt_scale),
            v_scale_per_tensor=jnp.full((1,), pt_scale),
        )
    pos = np.arange(s)
    page_ids = np.asarray(block_table)[pos // PAGE]
    slots = pos % PAGE
    return append_kv(pool, 0, jnp.asarray(k_hist), jnp.asarray(v_hist),
                     jnp.asarray(page_ids), jnp.asarray(slots), PAGE,
                     kv_bits, kv_zeros)


def run_both(q, pool, tables, lens, kv_bits, kv_zeros, **kw):
    common = dict(
        sm_scale=DIM ** -0.5, page_size=PAGE, kv_bits=kv_bits,
        kv_zeros=kv_zeros,
    )
    ref = attention_ref.paged_decode_attention(
        jnp.asarray(q), pool, 0, jnp.asarray(tables, jnp.int32),
        jnp.asarray(lens, jnp.int32),
        common["sm_scale"], PAGE, kv_bits, kv_zeros, **kw,
    )
    out = paged_decode_attention(
        jnp.asarray(q), pool, 0, jnp.asarray(tables, jnp.int32),
        jnp.asarray(lens, jnp.int32),
        common["sm_scale"], PAGE, kv_bits, kv_zeros, interpret=True, **kw,
    )
    return np.asarray(ref, np.float32), np.asarray(out, np.float32)


class TestDense:
    @pytest.mark.parametrize("kv_bits", [16, 8, 4])
    def test_matches_reference_fine_grained(self, kv_bits):
        b, hkv, n_rep = 2, 2, 2
        lens = [21, 37]
        max_blocks = 3
        q = rng.normal(size=(b, hkv * n_rep, DIM)).astype(np.float32)
        k = rng.normal(size=(48, hkv, DIM)).astype(np.float32) * 0.5
        v = rng.normal(size=(48, hkv, DIM)).astype(np.float32) * 0.5
        pool = build_pool(k, v, [0, 1, 2], kv_bits,
                          kv_zeros=kv_bits < 16)
        tables = np.tile(np.array([[0, 1, 2]], np.int32), (b, 1))
        ref, out = run_both(q, pool, tables, lens, kv_bits,
                            kv_zeros=kv_bits < 16)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("kv_bits", [8, 4])
    def test_matches_reference_per_tensor(self, kv_bits):
        b, hkv, n_rep = 1, 1, 4
        lens = [30]
        q = rng.normal(size=(b, hkv * n_rep, DIM)).astype(np.float32)
        k = rng.normal(size=(30, hkv, DIM)).astype(np.float32) * 0.05
        v = rng.normal(size=(30, hkv, DIM)).astype(np.float32) * 0.05
        pt = float(max(np.abs(k).max(), np.abs(v).max())) / (
            7 if kv_bits == 4 else 127
        )
        pool = build_pool(k, v, [0, 1], kv_bits, kv_zeros=False,
                          pt_scale=pt)
        tables = np.array([[0, 1]], np.int32)
        ref, out = run_both(q, pool, tables, lens, kv_bits, kv_zeros=False)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


class TestSparse:
    def test_page_selection_indirection(self):
        b, hkv, n_rep = 1, 2, 1
        s = 48  # 3 pages
        q = rng.normal(size=(b, hkv * n_rep, DIM)).astype(np.float32)
        k = rng.normal(size=(s, hkv, DIM)).astype(np.float32) * 0.5
        v = rng.normal(size=(s, hkv, DIM)).astype(np.float32) * 0.5
        pool = build_pool(k, v, [2, 0, 1], 8)
        tables = np.array([[2, 0, 1]], np.int32)
        # head 0 sees pages {2, 0}, head 1 sees {2, 1}
        page_idxes = jnp.asarray([[[2, 0, -1], [2, 1, -1]]], jnp.int32)
        ref, out = run_both(
            q, pool, tables, [s], 8, True, page_idxes=page_idxes
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


class TestStreaming:
    def test_dual_pool_routing(self):
        b, hkv, n_rep = 1, 2, 2
        sink_b, local_b = 1, 2
        L = 70
        q = rng.normal(size=(b, hkv * n_rep, DIM)).astype(np.float32)
        k = rng.normal(size=(L, hkv, DIM)).astype(np.float32) * 0.5
        v = rng.normal(size=(L, hkv, DIM)).astype(np.float32) * 0.5
        # head 0 retrieval (pool rank 0), head 1 streaming (pool rank 0)
        flags = jnp.asarray([True, False])
        ranks = jnp.asarray([0, 0])
        # retrieval pool: only head 0's data
        rpool = build_pool(k[:, :1], v[:, :1], [0, 1, 2, 3, 4], 8)
        # streaming pool: head 1's data through the ring
        spool = make_kv_pool(1, 4, 1, PAGE, DIM, kv_bits=8)
        pos = np.arange(L)
        blk = pos // PAGE
        ring = np.where(blk < sink_b, blk, sink_b + (blk - sink_b) % local_b)
        stable = [0, 1, 2]
        spool = append_kv(
            spool, 0, jnp.asarray(k[:, 1:]), jnp.asarray(v[:, 1:]),
            jnp.asarray(np.asarray(stable)[ring]), jnp.asarray(pos % PAGE),
            PAGE, 8, True,
        )
        tables = np.array([[0, 1, 2, 3, 4]], np.int32)
        stables = np.array([stable], np.int32)
        ref, out = run_both(
            q, rpool, tables, [L], 8, True,
            streaming_pool=spool,
            streaming_block_tables=jnp.asarray(stables),
            head_is_retrieval=flags, head_rank=ranks,
            sink_blocks=sink_b, local_blocks=local_b,
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
