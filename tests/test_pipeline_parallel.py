"""Pipeline-parallel correctness on the virtual 8-device CPU mesh.

The reference rejects pp>1 outright (omniserve/config.py:284-285);
parallel/pp.py implements it (stage-sharded stacked layers + GPipe
microbatch rotation), so equivalence is checked against the single-chip
llama_forward on identical global weights.
"""

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
from omniserve_tpu.parallel.pp import make_pipeline_forward

PAGE = 16
KV = 4
HQ = 8
HEAD_DIM = 32
HIDDEN = 256
INTER = 512
LAYERS = 4


def spec_for(tp=1, **kw):
    defaults = dict(
        num_layers=LAYERS, hidden=HIDDEN, intermediate=INTER // tp,
        num_q_heads=HQ // tp, num_kv_heads=KV // tp,
        head_dim=HEAD_DIM, vocab=512, page_size=PAGE,
        weight_bits=4, act_bits=8, kv_bits=8, kv_zeros=True,
        tp_axis=MODEL_AXIS if tp > 1 else None,
        dp_axis=DATA_AXIS if tp > 1 else None,
    )
    defaults.update(kw)
    return LlamaSpec(**defaults)


def build_prefill(tokens_per_seq, t_pad=32, n_blocks=4):
    """n sequences, each with its OWN pages of one shared pool."""
    n_seq = len(tokens_per_seq)
    T = t_pad * n_seq
    tok = np.zeros(T, np.int32)
    pos = np.zeros(T, np.int32)
    seg = np.full(T, -1, np.int32)
    bt = np.zeros((n_seq, n_blocks), np.int32)
    last = np.zeros(n_seq, np.int32)
    seqlens = np.zeros(n_seq, np.int32)
    for s, tokens in enumerate(tokens_per_seq):
        n = len(tokens)
        tok[s * t_pad: s * t_pad + n] = tokens
        pos[s * t_pad: s * t_pad + n] = np.arange(n)
        seg[s * t_pad: s * t_pad + n] = s
        bt[s] = np.arange(s * n_blocks, (s + 1) * n_blocks)
        last[s] = s * t_pad + n - 1
        seqlens[s] = n
    return PrefillBatch(
        token_ids=jnp.asarray(tok), positions=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg), block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((n_seq, 1), jnp.int32),
        last_token_idx=jnp.asarray(last), seq_lens=jnp.asarray(seqlens),
        new_page_ids=jnp.full((8,), -1, jnp.int32),
    )


def build_decode(tokens, positions, n_blocks=4, layers=LAYERS):
    n_seq = len(tokens)
    bt = np.stack([
        np.arange(s * n_blocks, (s + 1) * n_blocks, dtype=np.int32)
        for s in range(n_seq)
    ])
    return DecodeBatch(
        token_ids=jnp.asarray(tokens, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((n_seq, 1), jnp.int32),
        active=jnp.ones((n_seq,), bool),
        new_page_ids=jnp.full((n_seq,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full((layers, n_seq, 1, 1), -1, jnp.int32),
    )


TOKENS = [list(range(1, 13)), list(range(20, 29))]


def _single_chip():
    spec = spec_for()
    params = make_random_params(spec, seed=0)
    pool = make_kv_pool(LAYERS, 16, KV, PAGE, HEAD_DIM, kv_bits=8)
    batch = build_prefill(TOKENS)
    logits, rpool, _, _ = llama_forward(
        params, pool, None, batch, spec=spec, is_prefill=True
    )
    d = build_decode([7, 9], [len(TOKENS[0]), len(TOKENS[1])])
    dlogits, *_ = llama_forward(
        params, rpool, None, d, spec=spec, is_prefill=False
    )
    return np.asarray(logits, np.float32), np.asarray(dlogits, np.float32)


@pytest.mark.parametrize("pp,tp,microbatches", [(2, 1, 1), (2, 1, 2),
                                                (4, 1, 2), (2, 2, 2)])
def test_pp_matches_single_chip(pp, tp, microbatches):
    want_p, want_d = _single_chip()

    spec = spec_for(tp)
    params = make_random_params(spec, seed=0, tp_size=tp)
    mesh = build_mesh(ParallelConfig(
        pipeline_parallel_size=pp, tensor_parallel_size=tp
    ))
    pool = make_kv_pool(LAYERS, 16, KV, PAGE, HEAD_DIM, kv_bits=8)
    batch = build_prefill(TOKENS)

    pfwd, sh = make_pipeline_forward(
        spec, mesh, True, params, pool, None, pp_size=pp,
    )
    params = jax.device_put(params, sh["params"])
    pool = jax.device_put(pool, sh["retrieval_pool"])
    logits, rpool, _, _ = pfwd(params, pool, None, batch)
    np.testing.assert_allclose(
        np.asarray(logits, np.float32), want_p, atol=0.08, rtol=0.05
    )

    d = build_decode([7, 9], [len(TOKENS[0]), len(TOKENS[1])])
    dfwd, _ = make_pipeline_forward(
        spec, mesh, False, params, rpool, None, pp_size=pp,
        microbatches=microbatches,
    )
    dlogits, *_ = dfwd(params, rpool, None, d)
    np.testing.assert_allclose(
        np.asarray(dlogits, np.float32), want_d, atol=0.08, rtol=0.05
    )


def test_pp_decode_kv_writes_once():
    """Pipeline fill/drain ticks must not corrupt the KV pools: two decode
    steps through pp=2 match two single-chip steps token for token."""
    spec = spec_for()
    params = make_random_params(spec, seed=0)
    pool = make_kv_pool(LAYERS, 16, KV, PAGE, HEAD_DIM, kv_bits=8)
    batch = build_prefill(TOKENS)
    _, rpool1, _, _ = llama_forward(
        params, pool, None, batch, spec=spec, is_prefill=True
    )
    mesh = build_mesh(ParallelConfig(pipeline_parallel_size=2))
    pfwd, sh = make_pipeline_forward(
        spec, mesh, True, params, pool, None, pp_size=2
    )
    params_s = jax.device_put(params, sh["params"])
    pool_s = jax.device_put(pool, sh["retrieval_pool"])
    _, rpool2, _, _ = pfwd(params_s, pool_s, None, batch)

    dfwd, _ = make_pipeline_forward(
        spec, mesh, False, params_s, rpool2, None, pp_size=2,
        microbatches=2,
    )
    pos = [len(TOKENS[0]), len(TOKENS[1])]
    toks = [7, 9]
    for step in range(2):
        d = build_decode(toks, pos)
        want, rpool1, *_ = llama_forward(
            params, rpool1, None, d, spec=spec, is_prefill=False
        )
        got, rpool2, *_ = dfwd(params_s, rpool2, None, d)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.08, rtol=0.05,
        )
        toks = list(np.argmax(np.asarray(want), axis=1) % 512)
        pos = [p + 1 for p in pos]
