"""Tensor/data parallel correctness on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.config import ParallelConfig
from omniserve_tpu.models.llama import (
    DecodeBatch,
    LlamaSpec,
    PrefillBatch,
    llama_forward,
    make_random_params,
)
from omniserve_tpu.ops.paged_kv import make_kv_pool
from omniserve_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, build_mesh
from omniserve_tpu.parallel.sharding import make_sharded_forward

PAGE = 16
KV_GLOBAL = 4
HQ_GLOBAL = 8
HEAD_DIM = 32
HIDDEN = 256
INTER = 512


def spec_for(tp, **kw):
    defaults = dict(
        num_layers=2, hidden=HIDDEN, intermediate=INTER // tp,
        num_q_heads=HQ_GLOBAL // tp, num_kv_heads=KV_GLOBAL // tp,
        head_dim=HEAD_DIM, vocab=512, page_size=PAGE,
        weight_bits=4, act_bits=8, kv_bits=8, kv_zeros=True,
        tp_axis=MODEL_AXIS if tp > 1 else None,
        dp_axis=DATA_AXIS if tp > 1 else None,
    )
    defaults.update(kw)
    return LlamaSpec(**defaults)


def build_prefill(tokens, dp=1, t_pad=32, n_blocks=4):
    """One identical sequence per data shard."""
    T = t_pad * dp
    tok = np.zeros(T, np.int32)
    pos = np.zeros(T, np.int32)
    seg = np.full(T, -1, np.int32)
    bt = np.zeros((dp, n_blocks), np.int32)
    last = np.zeros(dp, np.int32)
    seqlens = np.zeros(dp, np.int32)
    n = len(tokens)
    for d in range(dp):
        tok[d * t_pad: d * t_pad + n] = tokens
        pos[d * t_pad: d * t_pad + n] = np.arange(n)
        seg[d * t_pad: d * t_pad + n] = 0
        bt[d] = np.arange(n_blocks)
        last[d] = n - 1
        seqlens[d] = n
    return PrefillBatch(
        token_ids=jnp.asarray(tok), positions=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg), block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((dp, 1), jnp.int32),
        last_token_idx=jnp.asarray(last), seq_lens=jnp.asarray(seqlens),
        new_page_ids=jnp.full((8 * dp,), -1, jnp.int32),
    )


def build_decode(token, position, dp=1, n_blocks=4):
    bt = np.tile(np.arange(n_blocks, dtype=np.int32)[None], (dp, 1))
    return DecodeBatch(
        token_ids=jnp.full((dp,), token, jnp.int32),
        positions=jnp.full((dp,), position, jnp.int32),
        block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((dp, 1), jnp.int32),
        active=jnp.ones((dp,), bool),
        new_page_ids=jnp.full((dp,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full((2, dp, 1, 1), -1, jnp.int32),
    )


class TestTensorParallelEquivalence:
    @pytest.mark.parametrize("tp,dp", [(2, 1), (4, 2)])
    def test_tp_matches_single_chip(self, tp, dp):
        tokens = list(range(1, 13))
        # single chip
        spec1 = spec_for(1)
        params1 = make_random_params(spec1, seed=0)
        pool1 = make_kv_pool(2, 8, KV_GLOBAL, PAGE, HEAD_DIM, kv_bits=8)
        batch1 = build_prefill(tokens)
        logits1, rpool1, _, _ = llama_forward(
            params1, pool1, None, batch1, spec=spec1, is_prefill=True
        )
        d1 = build_decode(7, len(tokens))
        dlogits1, *_ = llama_forward(
            params1, rpool1, None, d1, spec=spec1, is_prefill=False
        )

        # sharded: same global weights (same seed and global shapes)
        spec_n = spec_for(tp)
        params_n = make_random_params(spec_n, seed=0, tp_size=tp)
        mesh = build_mesh(
            ParallelConfig(tensor_parallel_size=tp, data_parallel_size=dp)
        )
        pool_n = make_kv_pool(2, 8 * dp, KV_GLOBAL, PAGE, HEAD_DIM,
                              kv_bits=8)
        batch_n = build_prefill(tokens, dp=dp)
        fwd, sh = make_sharded_forward(
            spec_n, mesh, True, params_n, pool_n, None
        )
        params_n = jax.device_put(params_n, sh["params"])
        pool_n = jax.device_put(pool_n, sh["retrieval_pool"])
        logits_n, rpool_n, _, _ = fwd(params_n, pool_n, None, batch_n)

        a = np.asarray(logits1, np.float32)[0]
        for d in range(dp):
            b = np.asarray(logits_n, np.float32)[d]
            np.testing.assert_allclose(a, b, atol=0.08, rtol=0.05)
        assert np.argmax(a) == np.argmax(np.asarray(logits_n)[0])

        d_n = build_decode(7, len(tokens), dp=dp)
        dfwd, _ = make_sharded_forward(
            spec_n, mesh, False, params_n, rpool_n, None
        )
        dlogits_n, *_ = dfwd(params_n, rpool_n, None, d_n)
        a = np.asarray(dlogits1, np.float32)[0]
        for d in range(dp):
            b = np.asarray(dlogits_n, np.float32)[d]
            np.testing.assert_allclose(a, b, atol=0.08, rtol=0.05)


class TestLlama70BGeometry:
    def test_tp8_one_kv_head_per_rank(self):
        """Llama-2-70B sharded config (SURVEY §7.2 step 7): 64 q / 8 kv
        heads GQA over tp=8 leaves exactly ONE kv head per rank — the
        kv-head-split edge case (head_dim shrunk to keep CPU draw cheap)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        tp = 8
        hq, kv, hd = 64, 8, 32
        tokens = list(range(1, 10))

        def spec70(tp_):
            return LlamaSpec(
                num_layers=2, hidden=hq * hd, intermediate=1024 // tp_,
                num_q_heads=hq // tp_, num_kv_heads=max(1, kv // tp_),
                head_dim=hd, vocab=256, page_size=PAGE,
                weight_bits=4, act_bits=8, kv_bits=8, kv_zeros=True,
                tp_axis=MODEL_AXIS if tp_ > 1 else None,
                dp_axis=DATA_AXIS if tp_ > 1 else None,
            )

        spec1 = spec70(1)
        params1 = make_random_params(spec1, seed=0)
        pool1 = make_kv_pool(2, 8, kv, PAGE, hd, kv_bits=8)
        batch1 = build_prefill(tokens)
        logits1, rpool1, _, _ = llama_forward(
            params1, pool1, None, batch1, spec=spec1, is_prefill=True
        )
        d1 = build_decode(7, len(tokens))
        dlogits1, *_ = llama_forward(
            params1, rpool1, None, d1, spec=spec1, is_prefill=False
        )

        spec_n = spec70(tp)
        assert spec_n.num_kv_heads == 1
        params_n = make_random_params(spec_n, seed=0, tp_size=tp)
        mesh = build_mesh(ParallelConfig(tensor_parallel_size=tp))
        pool_n = make_kv_pool(2, 8, kv, PAGE, hd, kv_bits=8)
        fwd, sh = make_sharded_forward(
            spec_n, mesh, True, params_n, pool_n, None
        )
        params_n = jax.device_put(params_n, sh["params"])
        pool_n = jax.device_put(pool_n, sh["retrieval_pool"])
        logits_n, rpool_n, _, _ = fwd(params_n, pool_n, None, batch1)
        np.testing.assert_allclose(
            np.asarray(logits1, np.float32)[0],
            np.asarray(logits_n, np.float32)[0], atol=0.08, rtol=0.05,
        )
        dfwd, _ = make_sharded_forward(
            spec_n, mesh, False, params_n, rpool_n, None
        )
        dlogits_n, *_ = dfwd(params_n, rpool_n, None, d1)
        np.testing.assert_allclose(
            np.asarray(dlogits1, np.float32)[0],
            np.asarray(dlogits_n, np.float32)[0], atol=0.08, rtol=0.05,
        )


class TestDryrun:
    def test_graft_dryrun(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
