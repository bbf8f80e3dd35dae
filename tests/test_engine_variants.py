"""Engine e2e over the precision/architecture matrix (tiny models, CPU)."""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_var")
    LlamaConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def tiny_mixtral_dir(tmp_path_factory):
    from transformers import MixtralConfig

    d = tmp_path_factory.mktemp("tiny_mixtral")
    MixtralConfig(
        hidden_size=64, intermediate_size=96, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def _generate(model_dir, precision, gen=4, **kw):
    args = EngineArgs(
        model=model_dir, precision=precision, load_format="dummy",
        block_size=16, max_num_seqs=4, max_num_batched_tokens=2048,
        num_retrieval_blocks=64, **kw,
    )
    engine = LLMEngine.from_engine_args(args)
    engine.add_request(
        "r0", prompt_token_ids=[3, 1, 4, 1, 5, 9, 2, 6],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=gen,
                                       ignore_eos=True),
    )
    steps = 0
    while engine.has_unfinished_requests():
        outs = engine.step()
        steps += 1
        assert steps < 30
    final = outs[-1]
    toks = final.outputs[0].token_ids
    assert len(toks) == gen
    assert all(0 <= t < 256 for t in toks)
    return toks


@pytest.mark.parametrize("precision,extra", [
    ("w4a8kv4", {}),
    ("w4a8kv8", {}),
    ("w4a8kv4", {"group_size": 32}),
    ("w8a8kv8", {"kv_quant_granularity": "per_tensor"}),
    ("w16a16kv16", {}),
])
def test_llama_precision_matrix(tiny_llama_dir, precision, extra):
    _generate(tiny_llama_dir, precision, **extra)


def test_mixtral_engine(tiny_mixtral_dir):
    _generate(tiny_mixtral_dir, "w4a8kv4")


def test_mistral_arch_engine(tmp_path):
    """MistralForCausalLM rides the llama graph (GQA, silu) — the arch
    name the QServe family sweep serves must resolve end to end."""
    from transformers import MistralConfig

    d = tmp_path / "tiny_mistral"
    MistralConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=2048, sliding_window=None,
    ).save_pretrained(d)
    _generate(str(d), "w4a8kv4")


def test_mixtral_w16(tiny_mixtral_dir):
    _generate(tiny_mixtral_dir, "w16a16kv16")
