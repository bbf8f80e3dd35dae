"""Engine-level tensor parallelism on the 8-device virtual CPU mesh.

The serving stack (LLMEngine -> Worker -> ModelRunner) must actually run
the shard_map'd forward when -tp > 1 and produce the same tokens as the
single-chip engine.
"""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_tp")
    LlamaConfig(
        hidden_size=128,
        intermediate_size=256,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=2,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def run_engine(tiny_model_dir, tp):
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=tiny_model_dir,
        precision="w4a8kv4",
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
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


def test_moe_ep_engine_matches_single_chip(tmp_path):
    """Mixtral through the engine with -tp: attention TP + expert
    parallelism over the model axis."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from transformers import MixtralConfig

    d = tmp_path / "tiny_mixtral_tp"
    MixtralConfig(
        hidden_size=128,
        intermediate_size=192,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    want = run_engine(str(d), tp=1)
    got = run_engine(str(d), tp=2)
    assert set(got) == set(want)
    # Once a near-tie greedy flip happens (random tiny models have
    # near-uniform logits; psum order differs), the contexts legitimately
    # diverge — so only the window up to one flip is comparable. Tight
    # logits-level EP equivalence is tests/test_mixtral.py's job.
    for rid in want:
        a, b = got[rid][:4], want[rid][:4]
        assert len(a) == len(b), (rid, a, b)
        mismatches = sum(x != y for x, y in zip(a, b))
        assert mismatches <= 1, (rid, got[rid], want[rid])


def test_tp_engine_matches_single_chip(tiny_model_dir):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    want = run_engine(tiny_model_dir, tp=1)
    got = run_engine(tiny_model_dir, tp=4)
    assert set(got) == set(want)
    # psum reduction order can flip a near-tie greedy argmax on random
    # weights (tiny random models have near-uniform logits); logits-level
    # TP equivalence is covered by tests/test_parallel.py. Here require
    # position-wise agreement up to one near-tie flip.
    for rid in want:
        a, b = got[rid], want[rid]
        assert len(a) == len(b), (rid, a, b)
        mismatches = sum(x != y for x, y in zip(a, b))
        assert mismatches <= 1, (rid, a, b)
