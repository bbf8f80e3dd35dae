"""Golden tests vs the Hugging Face torch Qwen2 implementation.

Qwen-1.5 is in the reference's headline serving table
(/root/reference/README.md:269: Qwen-1.5-72B on A100). Architecturally it
is Llama + QKV projection bias (o_proj bias-free), served here by the same
precision-polymorphic graph with ``LlamaSpec.attn_bias``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_golden_hf import (  # noqa: E402
    PROMPT,
    hf_reference,
    model_logits,
    run_engine,
)


@pytest.fixture(scope="module")
def qwen2_checkpoint(tmp_path_factory):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        hidden_size=128,
        intermediate_size=256,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=4,
        vocab_size=512,
        max_position_embeddings=2048,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        use_sliding_window=False,
    )
    model = Qwen2ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_qwen2")
    model.save_pretrained(d)
    return str(d), model


def test_spec_detects_bias(qwen2_checkpoint):
    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import LlamaSpec

    path, _ = qwen2_checkpoint
    spec = LlamaSpec.from_model_config(ModelConfig(model=path))
    assert spec.attn_bias


def test_prefill_logits_match_fp16(qwen2_checkpoint):
    path, model = qwen2_checkpoint
    want, _ = hf_reference(model, PROMPT, 1)
    got = model_logits(path, PROMPT, "w16a16kv16")
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    assert int(got.argmax()) == int(want.argmax())


def test_greedy_tokens_match_fp16(qwen2_checkpoint):
    path, model = qwen2_checkpoint
    _, want = hf_reference(model, PROMPT, 8)
    got = run_engine(path, PROMPT, 8, "w16a16kv16")
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 6, (got, want)


def test_quantized_first_tokens_track_fp16(qwen2_checkpoint):
    path, model = qwen2_checkpoint
    want_logits, want = hf_reference(model, PROMPT, 4)
    got_logits = model_logits(path, PROMPT, "w4a8kv4")
    assert int(got_logits.argmax()) == int(want_logits.argmax())
    got = run_engine(path, PROMPT, 4, "w4a8kv4")
    assert got[0] == want[0], (got, want)


def test_tp_engine_matches_single_chip(qwen2_checkpoint):
    """Real Qwen2 weights served -tp 2 on the virtual mesh: exercises the
    rank-major QKV-bias fusion and its column-parallel sharding spec."""
    import jax

    from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    path, _ = qwen2_checkpoint

    def run(tp):
        engine = LLMEngine.from_engine_args(EngineArgs(
            model=path, precision="w4a8kv4", block_size=16, max_num_seqs=4,
            max_num_batched_tokens=2048, num_retrieval_blocks=64,
            tensor_parallel_size=tp,
        ))
        engine.add_request(
            "q", prompt_token_ids=list(PROMPT),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6, ignore_eos=True
            ),
        )
        out = None
        while engine.has_unfinished_requests():
            for o in engine.step():
                out = o
        return out.outputs[0].token_ids

    want = run(1)
    got = run(2)
    mismatches = sum(a != b for a, b in zip(got, want))
    assert mismatches <= 1, (got, want)
