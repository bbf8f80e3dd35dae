"""Single-pass (HBM-direct) kv4/kv8 prefill attention vs the jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import append_kv, make_kv_pool
from omniserve_tpu.ops.pallas.prefill_single_pass import (
    paged_prefill_single_pass,
)

B, HKV, NREP, D, PAGE = 2, 2, 2, 128, 16
HQ = HKV * NREP
rng = np.random.default_rng(3)


def _setup(kv_zeros, history, chunk, total_lens=None, kv_bits=4):
    lens = total_lens or [history + chunk] * B
    total = max(lens)
    n_blocks = -(-total // PAGE) + 1
    pool = make_kv_pool(1, B * n_blocks + 1, HKV, PAGE, D, kv_bits=kv_bits,
                        kv_zeros=kv_zeros)
    tables = np.arange(B * n_blocks, dtype=np.int32).reshape(B, n_blocks)
    for i in range(B):
        t = lens[i]
        k = rng.normal(size=(t, HKV, D)).astype(np.float32)
        v = rng.normal(size=(t, HKV, D)).astype(np.float32)
        pages = tables[i][np.arange(t) // PAGE]
        slots = np.arange(t) % PAGE
        pool = append_kv(pool, 0, jnp.asarray(k), jnp.asarray(v),
                         jnp.asarray(pages), jnp.asarray(slots),
                         PAGE, kv_bits, kv_zeros)
    q = rng.normal(size=(B, chunk, HQ, D)).astype(np.float32)
    q_pos = np.stack([
        np.where(np.arange(chunk) < lens[i] - (lens[i] - chunk),
                 lens[i] - chunk + np.arange(chunk), -1)
        for i in range(B)
    ]).astype(np.int32)
    ctx = np.asarray(lens, np.int32)
    return (pool, jnp.asarray(tables), jnp.asarray(q, jnp.float32),
            jnp.asarray(q_pos), jnp.asarray(ctx))


@pytest.mark.parametrize("kv_bits", [4, 8])
@pytest.mark.parametrize("kv_zeros", [True, False])
@pytest.mark.parametrize("history,chunk", [(0, 24), (40, 24), (96, 16)])
def test_matches_reference(kv_bits, kv_zeros, history, chunk):
    pool, tables, q, q_pos, ctx = _setup(kv_zeros, history, chunk,
                                         kv_bits=kv_bits)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros,
    )
    got = paged_prefill_single_pass(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros,
        tile_q=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_streaming_heads_band():
    pool, tables, q, q_pos, ctx = _setup(True, 48, 16)
    flags = jnp.asarray([True, False]).repeat(NREP)  # head1 streaming
    kwargs = dict(sm_scale=0.088, page_size=PAGE, kv_bits=4, kv_zeros=True,
                  head_is_retrieval=flags, sink_size=16, local_size=16)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, **kwargs)
    got = paged_prefill_single_pass(
        q, pool, 0, tables, q_pos, ctx, tile_q=8, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_uneven_chunks_and_tiles():
    """Ragged q counts across the batch + tile_q not dividing the chunk:
    padded q rows must not perturb valid rows, and the causal frontier
    trip counts must cover exactly the attended pages."""
    pool, tables, q, q_pos, ctx = _setup(True, 0, 24,
                                         total_lens=[24, 11])
    # seq 1 has only 11 valid queries
    q_pos = jnp.asarray(np.stack([
        np.arange(24, dtype=np.int32),
        np.where(np.arange(24) < 11, np.arange(24), -1).astype(np.int32),
    ]))
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, 4, True,
    )
    got = paged_prefill_single_pass(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, 4, True,
        tile_q=8, interpret=True,
    )
    w = np.asarray(want)
    g_ = np.asarray(got)
    np.testing.assert_allclose(g_[0], w[0], rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(g_[1, :11], w[1, :11], rtol=2e-2, atol=2e-2)
