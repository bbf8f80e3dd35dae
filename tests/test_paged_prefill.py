"""Chunked-prefill paged attention: Pallas (interpret) vs jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import append_kv, make_kv_pool
from omniserve_tpu.ops.pallas.paged_prefill import paged_prefill_attention

B, HKV, NREP, D, PAGE = 2, 2, 2, 128, 16
HQ = HKV * NREP
rng = np.random.default_rng(0)


def _setup(kv_bits, kv_zeros, history, chunk):
    """Fill pools with `history + chunk` tokens per seq; query the chunk."""
    total = history + chunk
    n_blocks = -(-total // PAGE) + 1
    pool = make_kv_pool(1, B * n_blocks + 1, HKV, PAGE, D, kv_bits=kv_bits,
                        kv_zeros=kv_zeros)
    tables = np.arange(B * n_blocks, dtype=np.int32).reshape(B, n_blocks)
    k_all = rng.normal(size=(B, total, HKV, D)).astype(np.float32)
    v_all = rng.normal(size=(B, total, HKV, D)).astype(np.float32)
    for i in range(B):
        pages = tables[i][np.arange(total) // PAGE]
        slots = np.arange(total) % PAGE
        pool = append_kv(pool, 0, jnp.asarray(k_all[i]),
                         jnp.asarray(v_all[i]), jnp.asarray(pages),
                         jnp.asarray(slots), PAGE, kv_bits, kv_zeros)
    q = rng.normal(size=(B, chunk, HQ, D)).astype(np.float32)
    q_pos = np.tile(history + np.arange(chunk), (B, 1)).astype(np.int32)
    ctx = np.full(B, total, np.int32)
    return (pool, jnp.asarray(tables), jnp.asarray(q, jnp.float32),
            jnp.asarray(q_pos), jnp.asarray(ctx))


@pytest.mark.parametrize("kv_bits,kv_zeros", [(4, True), (8, True),
                                              (16, False)])
@pytest.mark.parametrize("history,chunk", [(0, 24), (40, 24)])
def test_matches_reference(kv_bits, kv_zeros, history, chunk):
    pool, tables, q, q_pos, ctx = _setup(kv_bits, kv_zeros, history, chunk)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros,
    )
    got = paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros,
        tile_q=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_streaming_heads_band():
    pool, tables, q, q_pos, ctx = _setup(4, True, 48, 16)
    flags = jnp.asarray([True, False]).repeat(NREP)  # head1 streaming
    kwargs = dict(sm_scale=0.088, page_size=PAGE, kv_bits=4, kv_zeros=True,
                  head_is_retrieval=flags, sink_size=16, local_size=16)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, **kwargs)
    got = paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, tile_q=8, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ragged_query_padding():
    """Second seq's chunk is shorter; its pad rows must not poison out."""
    pool, tables, q, q_pos, ctx = _setup(4, True, 16, 16)
    q_pos = np.asarray(q_pos).copy()
    q_pos[1, 8:] = -1
    ctx2 = np.asarray(ctx).copy()
    ctx2[1] = 16 + 8
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, jnp.asarray(q_pos), jnp.asarray(ctx2),
        0.088, PAGE, 4, True,
    )
    got = paged_prefill_attention(
        q, pool, 0, tables, jnp.asarray(q_pos), jnp.asarray(ctx2),
        0.088, PAGE, 4, True, tile_q=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got)[:, :8],
                               np.asarray(want)[:, :8], rtol=2e-2,
                               atol=2e-2)


def test_return_lse_partials_combine_to_full_attention():
    """r5 SP chunked prefill: owned-page partials with (m, l) from BOTH
    the Pallas kernel and the jnp reference must LSE-combine to the full
    dense answer (the per-rank computation `sp_combine` merges)."""
    pool, tables, q, q_pos, ctx = _setup(4, True, 40, 24)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, 4, True,
    )
    w = tables.shape[1]
    tile = np.arange(w)
    # split pages between two fake "ranks" (even/odd table slots)
    parts = []
    for r in range(2):
        owned = (tile % 2) == r
        sel_logic = jnp.asarray(np.where(owned, tile, -1), jnp.int32)
        sel_b = jnp.broadcast_to(sel_logic[None], (B, w))
        out, m, l = paged_prefill_attention(
            q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, 4, True,
            sel_logic=sel_b, return_lse=True, tile_q=8, interpret=True,
        )
        out_r, m_r, l_r = attention_ref.paged_prefill_attention(
            q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, 4, True,
            kv_positions=jnp.where(
                sel_b[:, :, None] >= 0,
                sel_b[:, :, None] * PAGE + jnp.arange(PAGE)[None, None],
                -1,
            ).reshape(B, w * PAGE),
            return_lse=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=3e-2, atol=3e-2)
        parts.append((np.asarray(out, np.float64), np.asarray(m),
                      np.asarray(l)))
    # host-side LSE combine (sp_combine math without the mesh)
    m_star = np.maximum(parts[0][1], parts[1][1])
    num = sum(o * (li * np.exp(mi - m_star))[..., None]
              for o, mi, li in parts)
    den = sum(li * np.exp(mi - m_star) for _, mi, li in parts)
    combined = num / np.maximum(den, 1e-30)[..., None]
    np.testing.assert_allclose(combined, np.asarray(want, np.float64),
                               rtol=3e-2, atol=3e-2)
