"""Single-pass (HBM-direct) kv4/kv8 decode attention vs the jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import append_kv, make_kv_pool
from omniserve_tpu.ops.pallas import decode_attention as sp

rng = np.random.default_rng(7)


def build_pool(page, n_pages, h, d, lengths, tables, kv_zeros, layers=2,
               kv_bits=4):
    pool = make_kv_pool(layers, n_pages, h, page, d, kv_bits=kv_bits,
                        kv_zeros=kv_zeros)
    ks, vs = [], []
    for lay in range(layers):
        k_all, v_all = [], []
        for s, ln in enumerate(lengths):
            k = rng.normal(size=(ln, h, d)).astype(np.float32)
            v = rng.normal(size=(ln, h, d)).astype(np.float32)
            pos = np.arange(ln)
            pages = tables[s][pos // page]
            pool = append_kv(
                pool, lay, jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(pages), jnp.asarray(pos % page),
                page_size=page, kv_bits=kv_bits, kv_zeros=kv_zeros,
            )
            k_all.append(k)
            v_all.append(v)
        ks.append(k_all)
        vs.append(v_all)
    return pool, ks, vs


@pytest.mark.parametrize("kv_bits", [4, 8])
@pytest.mark.parametrize("page", [64, 128])
@pytest.mark.parametrize("kv_zeros", [True, False])
@pytest.mark.parametrize("n_rep", [1, 4])   # 1 = MHA (llama-2-7b/13b)
def test_single_pass_matches_reference(page, kv_zeros, kv_bits, n_rep):
    h, d = 2, 128
    lengths = [page * 3 + 7, page, 1]
    b = len(lengths)
    max_blocks = 4
    n_pages = b * max_blocks + 1
    tables = np.arange(b * max_blocks, dtype=np.int32).reshape(b, max_blocks)
    pool, _, _ = build_pool(page, n_pages, h, d, lengths, tables, kv_zeros,
                            kv_bits=kv_bits)

    q = rng.normal(size=(b, h * n_rep, d)).astype(np.float32)
    layer = 1
    sm = 1.0 / np.sqrt(d)

    want = attention_ref.paged_decode_attention(
        jnp.asarray(q), pool, layer, jnp.asarray(tables),
        jnp.asarray(lengths, jnp.int32), sm, page, kv_bits, kv_zeros,
    )

    n_pg = (np.asarray(lengths) + page - 1) // page
    tile = np.arange(max_blocks)
    sel_logic = np.where(tile[None, :] < n_pg[:, None], tile[None, :], -1)
    sel_phys = np.where(sel_logic >= 0, tables, 0)
    got = sp.paged_mqa_attention_single_pass(
        jnp.asarray(q).reshape(b, h, n_rep, d), pool, layer,
        jnp.asarray(sel_phys), jnp.asarray(sel_logic),
        jnp.asarray(lengths, jnp.int32),
        sm_scale=sm, page_size=page, kv_zeros=kv_zeros,
        pt_scales=(
            None if kv_zeros
            else (pool.k_scale_per_tensor[layer],
                  pool.v_scale_per_tensor[layer])
        ),
        interpret=True,
    ).reshape(b, h * n_rep, d)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("kv_bits", [4, 8])
@pytest.mark.parametrize("kv_zeros", [True, False])
def test_fused_append_matches_append_then_attend(kv_bits, kv_zeros):
    """append=(k,v,pos,slot) must equal append_kv + attention on the
    updated pool, and leave the pool in the same state."""
    page, h, d, n_rep = 128, 2, 128, 2
    lengths_old = [page * 2 + 17, page - 1, 3 * page]  # mid / page-cross / new page
    b = len(lengths_old)
    max_blocks = 4
    n_pages = b * max_blocks + 1
    tables = np.arange(b * max_blocks, dtype=np.int32).reshape(b, max_blocks)
    pool, _, _ = build_pool(page, n_pages, h, d, lengths_old, tables,
                            kv_zeros, kv_bits=kv_bits)
    layer = 1
    sm = 1.0 / np.sqrt(d)
    q = rng.normal(size=(b, h * n_rep, d)).astype(np.float32)
    k_new = rng.normal(size=(b, h, d)).astype(np.float32)
    v_new = rng.normal(size=(b, h, d)).astype(np.float32)

    lengths_new = np.asarray(lengths_old, np.int32) + 1
    pos_new = lengths_new - 1
    tgt_logic = pos_new // page
    tgt_slot = pos_new % page
    tgt_phys = tables[np.arange(b), tgt_logic]

    # reference: append each token, then attend the updated pool
    pool_ref = pool
    from omniserve_tpu.ops.paged_kv import append_kv as _append
    pool_ref = _append(
        pool_ref, layer, jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(tgt_phys), jnp.asarray(tgt_slot),
        page_size=page, kv_bits=kv_bits, kv_zeros=kv_zeros,
    )
    want = attention_ref.paged_decode_attention(
        jnp.asarray(q), pool_ref, layer, jnp.asarray(tables),
        jnp.asarray(lengths_new), sm, page, kv_bits, kv_zeros,
    )

    n_pg = (lengths_new + page - 1) // page
    tile = np.arange(max_blocks)
    sel_logic = np.where(tile[None, :] < n_pg[:, None], tile[None, :], -1)
    sel_phys = np.where(sel_logic >= 0, tables, 0)
    got, pool_out = sp.paged_mqa_attention_single_pass(
        jnp.asarray(q).reshape(b, h, n_rep, d), pool, layer,
        jnp.asarray(sel_phys), jnp.asarray(sel_logic),
        jnp.asarray(lengths_new),
        sm_scale=sm, page_size=page, kv_zeros=kv_zeros,
        pt_scales=(
            None if kv_zeros
            else (pool.k_scale_per_tensor[layer],
                  pool.v_scale_per_tensor[layer])
        ),
        append=(
            jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(tgt_logic, np.int32),
            jnp.asarray(tgt_slot, np.int32),
        ),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.reshape(b, h * n_rep, d)), np.asarray(want),
        rtol=5e-2, atol=5e-2,
    )
    # pool state must match the separate-append pool exactly
    np.testing.assert_array_equal(
        np.asarray(pool_out.k_data), np.asarray(pool_ref.k_data)
    )
    np.testing.assert_array_equal(
        np.asarray(pool_out.v_data), np.asarray(pool_ref.v_data)
    )
    if kv_zeros:
        np.testing.assert_allclose(
            np.asarray(pool_out.kv_scales),
            np.asarray(pool_ref.kv_scales), rtol=1e-5, atol=1e-6,
        )


def test_supports_matrix():
    assert sp.supports(4, 128, 128)
    assert sp.supports(8, 128, 128)
    assert sp.supports(4, 256, 128)
    # sub-128 pages: the scale-plane DMAs would slice f32 lanes at
    # non-128 offsets -> Mosaic rejects on hardware; two-stage fallback
    assert not sp.supports(4, 64, 128)
    assert not sp.supports(8, 64, 128)
    assert not sp.supports(8, 48, 128)
    assert not sp.supports(4, 48, 128)
    assert not sp.supports(16, 128, 128)
    assert not sp.supports(4, 128, 64)


@pytest.mark.parametrize("kv_bits", [4, 8])
def test_per_head_single_pass_matches_reference(kv_bits):
    """Dynamic-sparse (per-head page lists) single-pass kernel."""
    page, kv_zeros = 128, True
    h, d, n_rep = 2, 128, 4
    lengths = [page * 4, page * 2 + 9]
    b = len(lengths)
    max_blocks = 4
    n_pages = b * max_blocks + 1
    tables = np.arange(b * max_blocks, dtype=np.int32).reshape(b, max_blocks)
    pool, _, _ = build_pool(page, n_pages, h, d, lengths, tables, kv_zeros,
                            kv_bits=kv_bits)

    q = rng.normal(size=(b, h * n_rep, d)).astype(np.float32)
    layer = 0
    sm = 1.0 / np.sqrt(d)
    # per-head selections: subset of logical pages, head-dependent, -1 pad
    page_idxes = np.array([
        [[0, 2, 3, -1], [1, 3, -1, -1]],
        [[2, 0, -1, -1], [0, 1, 2, -1]],
    ], np.int32)                                   # [B, H, n_sel]

    want = attention_ref.paged_decode_attention(
        jnp.asarray(q), pool, layer, jnp.asarray(tables),
        jnp.asarray(lengths, jnp.int32), sm, page, kv_bits, kv_zeros,
        page_idxes=jnp.asarray(np.repeat(page_idxes, 1, axis=1)),
        head_is_retrieval=jnp.ones((h,), bool),
        head_rank=jnp.arange(h),
    )

    safe = np.clip(page_idxes, 0, max_blocks - 1)
    sel_phys = np.take_along_axis(
        np.repeat(tables[:, None, :], h, 1), safe, axis=2
    )
    sel_phys = np.where(page_idxes >= 0, sel_phys, 0)
    got = sp.paged_mqa_attention_single_pass_ph(
        jnp.asarray(q).reshape(b, h, n_rep, d), pool, layer,
        jnp.asarray(sel_phys), jnp.asarray(page_idxes),
        jnp.asarray(lengths, jnp.int32),
        sm_scale=sm, page_size=page, kv_zeros=kv_zeros,
        interpret=True,
    ).reshape(b, h * n_rep, d)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("kv_zeros", [True, False])
def test_single_pass_return_lse_partials_combine(kv_zeros):
    """return_lse partials over disjoint page subsets LSE-combine to the
    full-sequence output (the SP contract, parallel/sp.sp_combine)."""
    page, h, d, n_rep = 64, 2, 128, 2
    lengths = [page * 3 + 9, page + 3]
    b = len(lengths)
    max_blocks = 4
    n_pages = b * max_blocks + 1
    tables = np.arange(b * max_blocks, dtype=np.int32).reshape(b, max_blocks)
    pool, _, _ = build_pool(page, n_pages, h, d, lengths, tables, kv_zeros)

    q = rng.normal(size=(b, h * n_rep, d)).astype(np.float32)
    layer = 0
    sm = 1.0 / np.sqrt(d)
    pt = (
        None if kv_zeros else
        (pool.k_scale_per_tensor[layer], pool.v_scale_per_tensor[layer])
    )

    want = attention_ref.paged_decode_attention(
        jnp.asarray(q), pool, layer, jnp.asarray(tables),
        jnp.asarray(lengths, jnp.int32), sm, page, 4, kv_zeros,
    )

    n_pg = (np.asarray(lengths) + page - 1) // page
    tile = np.arange(max_blocks)
    live = tile[None, :] < n_pg[:, None]
    parts = []
    # "rank" r owns the even/odd logical pages — disjoint, non-contiguous
    for r in range(2):
        owned = live & (tile[None, :] % 2 == r)
        # front-compact: the kernel's liveness checks assume page lists
        # fill front-to-back (models/llama._sp_paged_decode_attention
        # compacts the same way)
        order = np.argsort(~owned, axis=1, kind="stable")
        sel_logic = np.take_along_axis(
            np.where(owned, tile[None, :], -1), order, axis=1)
        sel_phys = np.take_along_axis(
            np.where(owned, tables, 0), order, axis=1)
        out, m, l = sp.paged_mqa_attention_single_pass(
            jnp.asarray(q).reshape(b, h, n_rep, d), pool, layer,
            jnp.asarray(sel_phys.astype(np.int32)),
            jnp.asarray(sel_logic.astype(np.int32)),
            jnp.asarray(lengths, jnp.int32),
            sm_scale=sm, page_size=page, kv_zeros=kv_zeros,
            pt_scales=pt, return_lse=True, interpret=True,
        )
        parts.append((
            np.asarray(out).reshape(b, h * n_rep, d),
            np.asarray(m).reshape(b, h * n_rep),
            np.asarray(l).reshape(b, h * n_rep),
        ))

    m_star = np.maximum(parts[0][1], parts[1][1])
    num = np.zeros((b, h * n_rep, d), np.float64)
    den = np.zeros((b, h * n_rep), np.float64)
    for out, m, l in parts:
        w = l * np.exp(m - m_star)
        num += out.astype(np.float64) * w[..., None]
        den += w
    got = num / np.maximum(den, 1e-30)[..., None]
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-2, atol=5e-2)
