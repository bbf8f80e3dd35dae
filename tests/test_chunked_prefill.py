"""Chunked prefill must be token-identical to single-shot prefill."""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_chunk")
    LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_hidden_layers=2,
        vocab_size=256,
        max_position_embeddings=4096,
    ).save_pretrained(d)
    return str(d)


def _run(tiny_model_dir, chunk_prefill_size, prompts, gen=4,
         precision="w16a16kv16"):
    # Unquantized path: chunked and single-shot prefill are numerically
    # equivalent (the chunked path attends to POOL KV; with kv4/kv8 the
    # current chunk is read back quantized, so greedy decode can diverge
    # after a few steps — that quant-noise path is covered with tolerances
    # in tests/test_paged_prefill.py).
    args = EngineArgs(
        model=tiny_model_dir,
        precision=precision,
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=8192,
        num_retrieval_blocks=128,
        chunk_prefill_size=chunk_prefill_size,
    )
    engine = LLMEngine.from_engine_args(args)
    for i, p in enumerate(prompts):
        engine.add_request(
            f"r{i}", prompt_token_ids=p,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=gen,
                                           ignore_eos=True),
        )
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
        steps += 1
        assert steps < 80
    return outs


def test_chunked_matches_single_shot(tiny_model_dir):
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, 255, size=n).tolist() for n in (150, 90, 40)
    ]
    # single-shot (budget far above total) vs chunked (64-token chunks)
    want = _run(tiny_model_dir, 32000, prompts)
    got = _run(tiny_model_dir, 64, prompts)
    assert want.keys() == got.keys()
    for k in want:
        assert want[k] == got[k], f"{k}: {want[k]} vs {got[k]}"


def test_single_long_prompt_chunked(tiny_model_dir):
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 255, size=500).tolist()]
    want = _run(tiny_model_dir, 32000, prompts)
    got = _run(tiny_model_dir, 128, prompts)
    assert want["r0"] == got["r0"]


def test_quantized_chunked_first_token(tiny_model_dir):
    """With kv4 the chunked path reads back quantized current-chunk KV;
    the first greedy token must still agree with single-shot."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 255, size=150).tolist()]
    want = _run(tiny_model_dir, 32000, prompts, gen=1, precision="w4a8kv4")
    got = _run(tiny_model_dir, 64, prompts, gen=1, precision="w4a8kv4")
    assert want["r0"] == got["r0"]


def _run_sparse(tiny_model_dir, chunk_prefill_size, prompts, gen=4):
    """Streaming + sparse-context config (w16a16kv16 for exactness)."""
    args = EngineArgs(
        model=tiny_model_dir,
        precision="w16a16kv16",
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=8192,
        num_retrieval_blocks=128,
        chunk_prefill_size=chunk_prefill_size,
        sparse_context_mode=True,
        sparse_decode_mode=True,
        static_sparsity=0.5,
        ctx_sink_size=16,
        ctx_local_size=64,
        dec_sink_size=16,
        dec_local_size=32,
        sparse_kv_cache_budget=64,
        max_model_len=1024,
    )
    engine = LLMEngine.from_engine_args(args)
    for i, p in enumerate(prompts):
        engine.add_request(
            f"r{i}", prompt_token_ids=p,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=gen,
                                           ignore_eos=True),
        )
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
        steps += 1
        assert steps < 80
    return outs


def test_sparse_chunked_matches_single_shot(tiny_model_dir):
    """LServe config: chunked prefill with dual-pool head routing must
    match the single-shot flash path (streaming band + retrieval dense)."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 255, size=n).tolist() for n in (200, 120)]
    want = _run_sparse(tiny_model_dir, 32000, prompts)   # single shot
    got = _run_sparse(tiny_model_dir, 96, prompts)       # chunked
    assert want.keys() == got.keys()
    for k in want:
        assert want[k] == got[k], f"{k}: {want[k]} vs {got[k]}"


def test_sparse_chunked_logits_exact(tiny_model_dir):
    """Chunked sparse prefill must reproduce the single-shot LAST-TOKEN
    LOGITS exactly (w16a16kv16): the greedy-token comparison above once
    passed while the ring's dead-token skip (measured against the full
    prompt instead of the running context) corrupted hidden states."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    prompt = rng.integers(1, 255, size=200).tolist()

    def prefill_logits(chunk):
        args = EngineArgs(
            model=tiny_model_dir, precision="w16a16kv16",
            load_format="dummy", block_size=16, max_num_seqs=8,
            max_num_batched_tokens=8192, num_retrieval_blocks=128,
            chunk_prefill_size=chunk, sparse_context_mode=True,
            sparse_decode_mode=True, static_sparsity=0.5,
            ctx_sink_size=16, ctx_local_size=64, dec_sink_size=16,
            dec_local_size=32, sparse_kv_cache_budget=64,
            max_model_len=1024,
        )
        engine = LLMEngine.from_engine_args(args)
        engine.add_request(
            "r0", prompt_token_ids=list(prompt),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=1,
                                           ignore_eos=True),
        )
        metadata, _ = engine.scheduler.schedule()
        runner = engine.worker.model_runner
        ce = runner.cache_engine
        if chunk < len(prompt):
            logits, _, _ = runner._execute_chunked_prefill(metadata, chunk)
            return np.asarray(logits[0], np.float32)
        batch, _, _ = runner._prepare_prefill(metadata)
        logits, *_ = runner._forward[True](
            runner.params, ce.retrieval_pool, ce.streaming_pool, batch
        )
        return np.asarray(logits[0], np.float32)

    want = prefill_logits(32000)
    got = prefill_logits(96)
    # bf16 pool roundtrip of K/V bounds the legitimate gap at ~8.5e-4;
    # the dead-skip bug produced 2.6e-3 (and dropped whole KV rows)
    np.testing.assert_allclose(got, want, rtol=0, atol=1.5e-3)
    assert int(np.argmax(got)) == int(np.argmax(want))
