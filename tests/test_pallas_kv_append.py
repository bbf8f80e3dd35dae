"""Pallas decode KV append vs the jnp scatter reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops.paged_kv import (
    append_kv,
    make_kv_pool,
    reset_page_stats,
    update_k_stats,
)
from omniserve_tpu.ops.pallas.kv_append import append_kv_decode

L, P, H, PAGE, D = 2, 6, 2, 16, 128
rng = np.random.default_rng(0)


def _inputs(t):
    k = rng.normal(size=(t, H, D)).astype(np.float32)
    v = rng.normal(size=(t, H, D)).astype(np.float32)
    pages = np.array([0, 2, 4, -1][:t], np.int32)
    slots = np.array([3, 9, 0, 5][:t], np.int32)
    return jnp.asarray(k), jnp.asarray(v), jnp.asarray(pages), \
        jnp.asarray(slots)


@pytest.mark.parametrize("kv_bits,kv_zeros", [(4, True), (8, True),
                                              (8, False), (16, False)])
def test_matches_jnp_append(kv_bits, kv_zeros):
    k, v, pages, slots = _inputs(4)
    layer = 1

    def mk():
        return make_kv_pool(L, P, H, PAGE, D, kv_bits=kv_bits,
                            kv_zeros=kv_zeros)

    want = append_kv(mk(), layer, k, v, pages, slots, PAGE, kv_bits,
                     kv_zeros, unique_pages=True)
    got = append_kv_decode(mk(), layer, k, v, pages, slots, PAGE, kv_bits,
                           kv_zeros, interpret=True)
    # page P-1 is the trash page (inactive tokens land there) — exclude
    np.testing.assert_array_equal(np.asarray(got.k_data)[:, :P - 1],
                                  np.asarray(want.k_data)[:, :P - 1])
    np.testing.assert_array_equal(np.asarray(got.v_data)[:, :P - 1],
                                  np.asarray(want.v_data)[:, :P - 1])
    if want.kv_scales is not None:
        np.testing.assert_allclose(np.asarray(got.kv_scales)[:, :P - 1],
                                   np.asarray(want.kv_scales)[:, :P - 1],
                                   rtol=1e-6)


def test_stats_update_matches():
    k, v, pages, slots = _inputs(3)
    layer = 0
    sub = 4

    def mk():
        pool = make_kv_pool(L, P, H, PAGE, D, kv_bits=4, with_stats=True,
                            sub_chunks=sub)
        for pg in range(P):
            pool = reset_page_stats(pool, layer, jnp.asarray([pg]))
        return pool

    want = append_kv(mk(), layer, k, v, pages, slots, PAGE, 4, True,
                     unique_pages=True)
    want = update_k_stats(want, layer, k, pages, slots, PAGE, sub)
    got = append_kv_decode(mk(), layer, k, v, pages, slots, PAGE, 4, True,
                           update_stats=True, sub_chunks=sub,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got.k_stats)[:, :P - 1],
                               np.asarray(want.k_stats)[:, :P - 1],
                               rtol=1e-5)


def test_rmw_preserves_other_slots():
    """Writing slot 9 must not clobber slot 3 written earlier."""
    pool = make_kv_pool(1, 3, H, PAGE, D, kv_bits=4, kv_zeros=True)
    k1 = jnp.asarray(rng.normal(size=(1, H, D)), jnp.float32)
    pool = append_kv_decode(pool, 0, k1, k1, jnp.asarray([1]),
                            jnp.asarray([3]), PAGE, 4, True, interpret=True)
    before = np.asarray(pool.k_data).copy()
    k2 = jnp.asarray(rng.normal(size=(1, H, D)), jnp.float32)
    pool = append_kv_decode(pool, 0, k2, k2, jnp.asarray([1]),
                            jnp.asarray([9]), PAGE, 4, True, interpret=True)
    after = np.asarray(pool.k_data)
    # slot 3's (row, nibble) under the interleaved layout must be unchanged
    from omniserve_tpu.ops.paged_kv import kv4_slot_to_row_nibble

    row3, hi3 = kv4_slot_to_row_nibble(3, PAGE)
    mask = 0xF0 if hi3 else 0x0F
    np.testing.assert_array_equal(before[0, 1, :, row3, :] & mask,
                                  after[0, 1, :, row3, :] & mask)
