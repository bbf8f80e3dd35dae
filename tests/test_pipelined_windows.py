"""Pipelined multi-step windows must reproduce single-step greedy tokens."""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_pipe")
    LlamaConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def run(tiny_model_dir, multi_step, gen=13):
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=tiny_model_dir, precision="w4a8kv4", load_format="dummy",
        block_size=16, max_num_seqs=4, max_num_batched_tokens=2048,
        num_retrieval_blocks=64, ifb_mode=False, benchmarking_mode=True,
        decode_multi_step=multi_step,
    ))
    held = []
    for i, prompt in enumerate(([5, 9, 2, 6], [3, 1, 4])):
        engine.add_request(
            f"r{i}", prompt_token_ids=list(prompt),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=gen, ignore_eos=True
            ),
        )
    held = [g for g in engine.scheduler.waiting]
    steps = 0
    while engine.has_unfinished_requests():
        engine.step()
        steps += 1
        assert steps < 10 * gen, "engine did not converge"
    return [list(g.get_seqs()[0].data.output_token_ids) for g in held]


def test_pipelined_matches_single_step(tiny_model_dir):
    want = run(tiny_model_dir, multi_step=1)
    got = run(tiny_model_dir, multi_step=4)   # gen=13: speculation + tail
    assert [len(t) for t in got] == [13, 13]
    assert got == want, (got, want)


def test_ifb_multi_step_matches_single_step(tiny_model_dir):
    """IFB windows engage on pure greedy decode batches and reproduce
    per-step tokens exactly."""
    from omniserve_tpu import EngineArgs, LLMEngine

    def run_ifb(multi_step):
        engine = LLMEngine.from_engine_args(EngineArgs(
            model=tiny_model_dir, precision="w4a8kv4", load_format="dummy",
            block_size=16, max_num_seqs=4, max_num_batched_tokens=2048,
            num_retrieval_blocks=64, ifb_mode=True,
            decode_multi_step=multi_step,
        ))
        for i, prompt in enumerate(([5, 9, 2, 6], [3, 1, 4])):
            engine.add_request(
                f"r{i}", prompt_token_ids=list(prompt),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=11, ignore_eos=True
                ),
            )
        held = [g for g in engine.scheduler.waiting]
        steps = 0
        while engine.has_unfinished_requests():
            engine.step()
            steps += 1
            assert steps < 200
        return [list(g.get_seqs()[0].data.output_token_ids) for g in held]

    want = run_ifb(1)
    got = run_ifb(4)
    assert [len(t) for t in got] == [11, 11]
    assert got == want, (got, want)
