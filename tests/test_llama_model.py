"""Integration tests for the functional Llama model (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.models.llama import (
    DecodeBatch,
    LlamaSpec,
    PrefillBatch,
    llama_forward,
    make_attn_meta,
    make_random_params,
)
from omniserve_tpu.ops.paged_kv import make_kv_pool

PAGE = 8
MAXB = 4  # max blocks per seq


def tiny_spec(**kw):
    defaults = dict(
        num_layers=2, hidden=64, intermediate=128, num_q_heads=4,
        num_kv_heads=2, head_dim=16, vocab=128, page_size=PAGE,
        weight_bits=16, act_bits=16, kv_bits=16, kv_zeros=False,
    )
    defaults.update(kw)
    return LlamaSpec(**defaults)


def make_pools(spec, num_pages=16, streaming=False):
    retrieval = make_kv_pool(
        spec.num_layers, num_pages, spec.num_kv_heads, spec.page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
        with_stats=spec.with_stats, sub_chunks=spec.sub_chunks,
    )
    spool = None
    if streaming:
        spool = make_kv_pool(
            spec.num_layers, num_pages, spec.num_kv_heads, spec.page_size,
            spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
        )
    return retrieval, spool


def prefill_batch(tokens, block_table, spec, t_pad=32):
    n = len(tokens)
    token_ids = np.zeros(t_pad, np.int32)
    token_ids[:n] = tokens
    positions = np.zeros(t_pad, np.int32)
    positions[:n] = np.arange(n)
    seg = np.full(t_pad, -1, np.int32)
    seg[:n] = 0
    bt = np.zeros((1, MAXB), np.int32)
    bt[0, : len(block_table)] = block_table
    return PrefillBatch(
        token_ids=jnp.asarray(token_ids),
        positions=jnp.asarray(positions),
        segment_ids=jnp.asarray(seg),
        block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
        last_token_idx=jnp.asarray([n - 1], jnp.int32),
        seq_lens=jnp.asarray([n], jnp.int32),
        new_page_ids=jnp.asarray(
            list(block_table) + [-1] * (MAXB - len(block_table)), jnp.int32
        ),
    )


def decode_batch(token, position, block_table, spec, budget=MAXB):
    bt = np.zeros((1, MAXB), np.int32)
    bt[0, : len(block_table)] = block_table
    return DecodeBatch(
        token_ids=jnp.asarray([token], jnp.int32),
        positions=jnp.asarray([position], jnp.int32),
        block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
        active=jnp.asarray([True]),
        new_page_ids=jnp.asarray([-1], jnp.int32),
        refresh_selection=jnp.asarray(True),
        cached_page_idxes=jnp.full(
            (spec.num_layers, 1, spec.num_kv_heads, budget), -1, jnp.int32
        ),
    )


rng = np.random.default_rng(7)


class TestPrefillDecodeConsistency:
    @pytest.mark.parametrize(
        "wbits,abits,kvbits,kvz,atol",
        [
            (16, 16, 16, False, 0.35),
            (4, 8, 16, False, 0.35),
            # quantized-KV rows: path A attends the in-register fresh KV,
            # path B re-reads the pool's kv8/kv4 round-trip, so the
            # tolerance absorbs the KV quantization error on top of bf16
            (4, 8, 8, True, 0.45),
            (4, 8, 4, True, 0.80),
        ],
    )
    def test_decode_matches_extended_prefill(self, wbits, abits, kvbits,
                                             kvz, atol):
        spec = tiny_spec(weight_bits=wbits, act_bits=abits,
                         kv_bits=kvbits, kv_zeros=kvz)
        params = make_random_params(spec, seed=0)
        tokens = rng.integers(0, spec.vocab, size=10).tolist()
        table = [3, 1]

        # Path A: prefill all 11 tokens at once.
        pools_a = make_pools(spec)
        batch_a = prefill_batch(tokens + [42], table, spec)
        logits_a, *_ = llama_forward(
            params, pools_a[0], pools_a[1], batch_a, spec, is_prefill=True
        )

        # Path B: prefill 10 tokens, then decode token 42 at position 10.
        pools_b = make_pools(spec)
        batch_b = prefill_batch(tokens, table, spec)
        _, rpool, spool, _ = llama_forward(
            params, pools_b[0], pools_b[1], batch_b, spec, is_prefill=True
        )
        dbatch = decode_batch(42, 10, table, spec)
        logits_b, *_ = llama_forward(
            params, rpool, spool, dbatch, spec, is_prefill=False
        )

        a = np.asarray(logits_a[0], np.float32)
        b = np.asarray(logits_b[0], np.float32)
        # bf16 residual stream + cache round-trip: compare top-1 + values
        assert np.argmax(a) == np.argmax(b)
        np.testing.assert_allclose(a, b, atol=atol, rtol=0.1)

    def test_w4a8kv4_runs_and_is_finite(self):
        spec = tiny_spec(weight_bits=4, act_bits=8, kv_bits=4, kv_zeros=True)
        params = make_random_params(spec, seed=1)
        pools = make_pools(spec)
        batch = prefill_batch([1, 2, 3, 4, 5], [0], spec)
        logits, rpool, spool, _ = llama_forward(
            params, pools[0], pools[1], batch, spec, is_prefill=True
        )
        assert np.isfinite(np.asarray(logits)).all()
        dbatch = decode_batch(7, 5, [0], spec)
        logits2, *_ = llama_forward(
            params, rpool, spool, dbatch, spec, is_prefill=False
        )
        assert np.isfinite(np.asarray(logits2)).all()

    def test_per_group_w4(self):
        spec = tiny_spec(weight_bits=4, act_bits=8, kv_bits=8,
                         group_size=32)
        params = make_random_params(spec, seed=2)
        pools = make_pools(spec)
        batch = prefill_batch([1, 2, 3], [0], spec)
        logits, *_ = llama_forward(
            params, pools[0], pools[1], batch, spec, is_prefill=True
        )
        assert np.isfinite(np.asarray(logits)).all()


class TestSparseDecode:
    def test_full_budget_matches_dense(self):
        # sparse decode with budget >= all pages must equal dense decode
        spec_d = tiny_spec(weight_bits=16, act_bits=16, kv_bits=16)
        spec_s = tiny_spec(
            weight_bits=16, act_bits=16, kv_bits=16,
            sparse_decode=True, budget_pages=MAXB,
            sink_blocks=1, local_blocks=2,
        )
        params = make_random_params(spec_d, seed=3)
        tokens = rng.integers(0, 128, size=12).tolist()
        table = [0, 1]

        outs = {}
        for name, spec in [("dense", spec_d), ("sparse", spec_s)]:
            pools = make_pools(spec, streaming=spec.sparse_decode)
            batch = prefill_batch(tokens, table, spec)
            _, rpool, spool, _ = llama_forward(
                params, pools[0], pools[1], batch, spec, is_prefill=True
            )
            dbatch = decode_batch(9, 12, table, spec)
            if spec.sparse_decode:
                bt = np.zeros((1, spec.sink_blocks + spec.local_blocks),
                              np.int32)
                bt[0, :3] = [0, 1, 2]
                dbatch = dbatch._replace(
                    streaming_block_tables=jnp.asarray(bt)
                )
                # streaming tables must also exist at prefill
                batch = batch._replace(
                    streaming_block_tables=jnp.asarray(bt)
                )
                pools = make_pools(spec, streaming=True)
                _, rpool, spool, _ = llama_forward(
                    params, pools[0], pools[1], batch, spec,
                    is_prefill=True,
                )
            logits, _, _, new_sel = llama_forward(
                params, rpool, spool, dbatch, spec, is_prefill=False
            )
            outs[name] = np.asarray(logits[0], np.float32)
            if name == "sparse":
                assert new_sel is not None
                assert new_sel.shape == (spec.num_layers, 1, 2, MAXB)

        # all heads retrieval (default meta) + full budget -> same result
        np.testing.assert_allclose(
            outs["sparse"], outs["dense"], atol=0.3, rtol=0.1
        )
