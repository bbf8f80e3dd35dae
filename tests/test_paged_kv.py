"""Tests for paged KV pool append/gather round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops.paged_kv import (
    append_kv,
    gather_kv_for_seq,
    make_kv_pool,
    reset_page_stats,
    update_k_stats,
)

rng = np.random.default_rng(3)

PAGE = 8
HEADS = 2
DIM = 16


def roundtrip(kv_bits, kv_zeros=True, n_tokens=13):
    pool = make_kv_pool(
        num_layers=1, num_pages=4, num_heads=HEADS, page_size=PAGE,
        head_dim=DIM, kv_bits=kv_bits, kv_zeros=kv_zeros,
    )
    k = rng.normal(size=(n_tokens, HEADS, DIM)).astype(np.float32) * 0.3
    v = rng.normal(size=(n_tokens, HEADS, DIM)).astype(np.float32) * 0.3
    if not kv_zeros and kv_bits < 16:
        qmax = 7 if kv_bits == 4 else 127
        amax = float(max(np.abs(k).max(), np.abs(v).max()))
        pool = pool._replace(
            k_scale_per_tensor=jnp.full((1,), amax / qmax),
            v_scale_per_tensor=jnp.full((1,), amax / qmax),
        )
    block_table = np.array([2, 0, 3, 1], dtype=np.int32)
    pos = np.arange(n_tokens)
    page_ids = block_table[pos // PAGE]
    slots = pos % PAGE
    pool = append_kv(
        pool, 0, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(page_ids), jnp.asarray(slots),
        page_size=PAGE, kv_bits=kv_bits, kv_zeros=kv_zeros,
    )
    k_out, v_out = gather_kv_for_seq(
        pool, 0, jnp.asarray(block_table), PAGE, kv_bits, kv_zeros
    )
    return k, v, np.asarray(k_out)[:n_tokens], np.asarray(v_out)[:n_tokens]


class TestAppendGatherRoundtrip:
    # kv8 tol: the scale planes are stored bf16 (r5, paged_kv), adding up
    # to 2^-8 relative on top of the 1/255 quant step -> ~1.2e-2 worst case
    @pytest.mark.parametrize("kv_bits,tol", [(16, 1e-2), (8, 1.2e-2), (4, 1e-1)])
    def test_fine_grained(self, kv_bits, tol):
        k, v, k_hat, v_hat = roundtrip(kv_bits)
        np.testing.assert_allclose(k_hat, k, atol=tol)
        np.testing.assert_allclose(v_hat, v, atol=tol)

    @pytest.mark.parametrize("kv_bits,tol", [(8, 3e-2), (4, 3e-1)])
    def test_per_tensor(self, kv_bits, tol):
        k, v, k_hat, v_hat = roundtrip(kv_bits, kv_zeros=False)
        np.testing.assert_allclose(k_hat, k, atol=tol)
        np.testing.assert_allclose(v_hat, v, atol=tol)

    def test_negative_page_ids_are_dropped(self):
        pool = make_kv_pool(1, 2, 1, PAGE, DIM, kv_bits=8)
        k = jnp.ones((2, 1, DIM))
        pool2 = append_kv(
            pool, 0, k, k,
            jnp.asarray([-1, 0]), jnp.asarray([0, 0]),
            page_size=PAGE, kv_bits=8, kv_zeros=True,
        )
        # page 1 untouched, page 0 slot 0 written
        assert np.asarray(pool2.k_data)[0, 1].sum() == 0
        assert np.asarray(pool2.k_scale)[0, 0, 0, 0] > 0

    def test_int4_packing_overwrite_keeps_other_nibble(self):
        # Write token in low half then high half of the same packed row.
        pool = make_kv_pool(1, 1, 1, PAGE, DIM, kv_bits=4)
        k1 = jnp.full((1, 1, DIM), 0.5)
        pool = append_kv(pool, 0, k1, k1, jnp.asarray([0]), jnp.asarray([0]),
                         PAGE, 4, True)
        byte_before = int(np.asarray(pool.k_data)[0, 0, 0, 0, 0])
        k2 = jnp.full((1, 1, DIM), -0.5)
        pool = append_kv(pool, 0, k2, k2, jnp.asarray([0]),
                         jnp.asarray([PAGE // 2]), PAGE, 4, True)
        byte_after = int(np.asarray(pool.k_data)[0, 0, 0, 0, 0])
        assert (byte_before & 0x0F) == (byte_after & 0x0F)


class TestPageAlignedScaleWrite:
    @pytest.mark.parametrize("kv_bits", [4, 8])
    def test_matches_element_scatter(self, kv_bits):
        # 3 full groups: group 0 all valid, group 1 mixed (valid head +
        # dropped tail, as at a chunk end), group 2 all dropped. The
        # grouped whole-row RMW must equal the element-scatter result,
        # preserving pre-existing scales in dropped lanes.
        n_tok = 3 * PAGE
        pool0 = make_kv_pool(1, 4, HEADS, PAGE, DIM, kv_bits=kv_bits)
        # pre-populate page 1 (the page group 1 targets) so dropped lanes
        # have non-trivial content to preserve
        pre = rng.normal(size=(PAGE, HEADS, DIM)).astype(np.float32)
        pool0 = append_kv(
            pool0, 0, jnp.asarray(pre), jnp.asarray(pre),
            jnp.full(PAGE, 1, np.int32), jnp.arange(PAGE, dtype=np.int32),
            PAGE, kv_bits, True,
        )
        k = rng.normal(size=(n_tok, HEADS, DIM)).astype(np.float32)
        v = rng.normal(size=(n_tok, HEADS, DIM)).astype(np.float32)
        page_ids = np.concatenate([
            np.full(PAGE, 2, np.int32),
            np.where(np.arange(PAGE) < 3, 1, -1).astype(np.int32),
            np.full(PAGE, -1, np.int32),
        ])
        slots = np.tile(np.arange(PAGE, dtype=np.int32), 3)
        outs = [
            append_kv(
                pool0, 0, jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(page_ids), jnp.asarray(slots),
                PAGE, kv_bits, True, page_aligned=aligned,
            )
            for aligned in (False, True)
        ]
        np.testing.assert_allclose(
            np.asarray(outs[0].kv_scales), np.asarray(outs[1].kv_scales),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(outs[0].k_data), np.asarray(outs[1].k_data)
        )


class TestKStats:
    def test_minmax_pooling(self):
        sub_chunks = 2
        pool = make_kv_pool(
            1, 2, 1, PAGE, DIM, kv_bits=8, with_stats=True,
            sub_chunks=sub_chunks,
        )
        pool = reset_page_stats(pool, 0, jnp.asarray([0, 1]))
        k = rng.normal(size=(PAGE, 1, DIM)).astype(np.float32)
        pos = np.arange(PAGE)
        pool = update_k_stats(
            pool, 0, jnp.asarray(k), jnp.zeros(PAGE, jnp.int32),
            jnp.asarray(pos), PAGE, sub_chunks,
        )
        stats = np.asarray(pool.k_stats)[0, 0, 0]  # [n_sub*2, D]
        stats = stats.reshape(sub_chunks, 2, -1)
        half = PAGE // sub_chunks
        np.testing.assert_allclose(
            stats[0, 0], k[:half, 0].min(axis=0), rtol=1e-3
        )
        np.testing.assert_allclose(
            stats[0, 1], k[:half, 0].max(axis=0), rtol=1e-3
        )
        np.testing.assert_allclose(
            stats[1, 0], k[half:, 0].min(axis=0), rtol=1e-3
        )
