"""Engine-level pipeline parallelism on the 8-device virtual CPU mesh.

The serving stack (LLMEngine -> Worker -> ModelRunner) must run the
pipeline forward when -pp > 1 and produce the same tokens as the
single-chip engine (the reference raises for pp>1, config.py:284-285;
parallel/pp.py implements it).
"""

import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_pp")
    LlamaConfig(
        hidden_size=128,
        intermediate_size=256,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=4,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def run_engine(tiny_model_dir, pp, tp=1):
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=tiny_model_dir,
        precision="w4a8kv4",
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
        pipeline_parallel_size=pp,
        tensor_parallel_size=tp,
    ))
    for rid, prompt in (("a", [3, 1, 4, 1, 5, 9, 2, 6]),
                        ("b", [2, 7, 1, 8, 2, 8])):
        engine.add_request(
            rid, prompt_token_ids=list(prompt),
            sampling_params=SamplingParams(max_tokens=6, ignore_eos=True),
        )
    outs = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            outs[out.request_id] = out
    return {
        rid: out.outputs[0].token_ids for rid, out in outs.items()
    }


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2)])
def test_pp_engine_matches_single_chip(tiny_model_dir, pp, tp):
    import jax

    if len(jax.devices()) < pp * tp:
        pytest.skip(f"needs {pp * tp} virtual devices")
    # reference shares the TP psum reduction order so the only delta is
    # the pipeline decomposition itself
    want = run_engine(tiny_model_dir, pp=1, tp=tp)
    got = run_engine(tiny_model_dir, pp=pp, tp=tp)
    assert set(got) == set(want)
    # near-tie greedy flips on random tiny weights (see test_engine_tp);
    # logits-level PP equivalence is tests/test_pipeline_parallel.py's job
    for rid in want:
        a, b = got[rid], want[rid]
        assert len(a) == len(b), (rid, a, b)
        mismatches = sum(x != y for x, y in zip(a, b))
        assert mismatches <= 1, (rid, a, b)


def test_pp_moe_engine_matches_single_chip(tmp_path):
    """Mixtral through the engine with -pp 2: stage-sharded expert stacks
    (the MoE MLP rides llama's mlp_fn hook through the pipeline trunk)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from transformers import MixtralConfig

    d = tmp_path / "tiny_mixtral_pp"
    MixtralConfig(
        hidden_size=128,
        intermediate_size=192,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=4,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    want = run_engine(str(d), pp=1)
    got = run_engine(str(d), pp=2)
    assert set(got) == set(want)
    for rid in want:
        a, b = got[rid], want[rid]
        assert len(a) == len(b), (rid, a, b)
        mismatches = sum(x != y for x, y in zip(a, b))
        assert mismatches <= 1, (rid, a, b)


def test_pp_chunked_prefill_matches(tiny_model_dir):
    """Chunked prefill under -pp 2: the rectangular chunk batches flow
    through the pipeline forward (page-aligned pool writes must drop
    cleanly on pipeline fill/drain ticks)."""
    import jax
    import numpy as np

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")

    def run(pp, chunk):
        engine = LLMEngine.from_engine_args(EngineArgs(
            model=tiny_model_dir,
            precision="w16a16kv16",
            load_format="dummy",
            block_size=16,
            max_num_seqs=8,
            max_num_batched_tokens=8192,
            num_retrieval_blocks=128,
            chunk_prefill_size=chunk,
            pipeline_parallel_size=pp,
        ))
        rng = np.random.default_rng(3)
        for i, n in enumerate((150, 90)):
            engine.add_request(
                f"r{i}", prompt_token_ids=rng.integers(1, 255, size=n).tolist(),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=4, ignore_eos=True),
            )
        outs = {}
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    outs[o.request_id] = o.outputs[0].token_ids
        return outs

    want = run(1, 64)
    got = run(2, 64)
    assert want == got, (want, got)


def test_pp_requires_divisible_layers(tiny_model_dir):
    import jax

    if len(jax.devices()) < 3:
        pytest.skip("needs 3 virtual devices")
    with pytest.raises(ValueError, match="not divisible"):
        run_engine(tiny_model_dir, pp=3)
