"""Ring reconstruction + banded decode/prefill over enlarged rings."""

import numpy as np
import jax.numpy as jnp
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import (
    append_kv,
    make_kv_pool,
    ring_logical_blocks,
    ring_token_positions,
)
from omniserve_tpu.ops.pallas import paged_prefill

rng = np.random.default_rng(11)
PAGE = 8


def ring_slot(b, sink_b, local_b):
    return b if b < sink_b else sink_b + (b - sink_b) % local_b


def fill_ring(L, h, d, sink_b, local_b, kv_bits=8):
    """Append L tokens through the ring; returns (pool, k, v, table)."""
    n_slots = sink_b + local_b
    pool = make_kv_pool(1, n_slots + 1, h, PAGE, d, kv_bits=kv_bits)
    k = rng.normal(size=(L, h, d)).astype(np.float32) * 0.5
    v = rng.normal(size=(L, h, d)).astype(np.float32) * 0.5
    pos = np.arange(L)
    blk = pos // PAGE
    slots = np.array([ring_slot(b, sink_b, local_b) for b in blk])
    table = list(range(n_slots))
    pool = append_kv(
        pool, 0, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(np.asarray(table)[slots]), jnp.asarray(pos % PAGE),
        PAGE, kv_bits, True,
    )
    return pool, k, v, np.asarray([table], np.int32)


def test_ring_token_positions_match_bruteforce():
    sink_b, local_b, L = 1, 3, 61
    n_slots = sink_b + local_b
    got = np.asarray(ring_token_positions(
        jnp.asarray([L]), n_slots, sink_b, local_b, PAGE
    ))[0]
    # brute force: replay the appends
    want = np.full(n_slots * PAGE, -1, np.int64)
    for t in range(L):
        b = t // PAGE
        want[ring_slot(b, sink_b, local_b) * PAGE + t % PAGE] = t
    np.testing.assert_array_equal(got, want)


def test_ring_logical_prefix_dense():
    # -1s must only appear as a suffix per slot ordering assumption
    for L in (3, 8, 17, 40, 200):
        lg = np.asarray(ring_logical_blocks(
            jnp.asarray([L]), 6, 2, 4, PAGE
        ))[0]
        seen_invalid = False
        for x in lg:
            if x < 0:
                seen_invalid = True
            else:
                assert not seen_invalid, (L, lg)


@pytest.mark.parametrize("L", [30, 61, 90])
def test_ring_prefill_kernel_matches_reference(L):
    """paged_prefill over the ring source (band masks + ring positions)."""
    h, d, n_rep = 1, 128, 2
    sink_b, local_b = 1, 4
    n_slots = sink_b + local_b
    ctx_sink, ctx_local = PAGE, 2 * PAGE
    pool, _, _, table = fill_ring(L, h, d, sink_b, local_b)

    tq = 8
    q = rng.normal(size=(1, tq, h * n_rep, d)).astype(np.float32)
    q_positions = np.arange(L - tq, L, dtype=np.int32)[None, :]
    ctx = jnp.asarray([L], jnp.int32)
    sel_logic = ring_logical_blocks(ctx, n_slots, sink_b, local_b, PAGE)
    flags = jnp.zeros((h * n_rep,), bool)   # all streaming: band applies

    kv_positions = ring_token_positions(ctx, n_slots, sink_b, local_b, PAGE)
    want = attention_ref.paged_prefill_attention(
        jnp.asarray(q), pool, 0, jnp.asarray(table),
        jnp.asarray(q_positions), ctx, d ** -0.5, PAGE, 8, True,
        head_is_retrieval=flags, sink_size=ctx_sink, local_size=ctx_local,
        kv_positions=kv_positions,
    )
    got = paged_prefill.paged_prefill_attention(
        jnp.asarray(q), pool, 0, jnp.asarray(table),
        jnp.asarray(q_positions), ctx, d ** -0.5, PAGE, 8, True,
        head_is_retrieval=flags, sink_size=ctx_sink, local_size=ctx_local,
        sel_logic=sel_logic, ring_span_pages=local_b,
        ring_sink_tokens=sink_b * PAGE, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-2, rtol=3e-2
    )
