"""Golden tests vs the Hugging Face torch Mixtral implementation.

The reference STUBS its Mixtral forward (mixtral_w4a8_unpad.py:309), so
accuracy here is validated directly against the canonical HF MoE: top-2
softmax routing with renormalized weights, per-expert SwiGLU, GQA
attention — a real save_pretrained checkpoint through the full loader ->
engine path (same protocol as tests/test_golden_hf.py for Llama).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

PROMPT = [3, 17, 94, 255, 12, 7, 400, 31, 2, 68, 101, 5]


@pytest.fixture(scope="module")
def hf_mixtral(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        hidden_size=128,
        intermediate_size=192,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=3,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=512,
        max_position_embeddings=2048,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_mixtral_golden")
    model.save_pretrained(d)
    return str(d), model


def hf_reference(model, prompt, n_new):
    with torch.no_grad():
        ids = torch.tensor([prompt])
        out = model(ids)
        logits = out.logits[0, -1].float().numpy()
        gen = model.generate(
            ids, max_new_tokens=n_new, do_sample=False, pad_token_id=0,
        )[0, len(prompt):].tolist()
    return logits, gen


def run_engine(path, prompt, n_new, precision):
    from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams

    engine = LLMEngine.from_engine_args(EngineArgs(
        model=path, precision=precision, block_size=16, max_num_seqs=4,
        max_num_batched_tokens=4096, num_retrieval_blocks=64,
    ))
    engine.add_request(
        "g", prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=n_new, ignore_eos=True
        ),
    )
    outs = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            outs = o
    return outs.outputs[0].token_ids


def model_logits(path, prompt, precision):
    import jax.numpy as jnp

    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import PrefillBatch
    from omniserve_tpu.models.mixtral import (
        MixtralSpec,
        load_mixtral_params,
        mixtral_forward,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    mc = ModelConfig(model=path, precision=precision)
    spec = MixtralSpec.from_model_config(mc, page_size=16)
    params, _ = load_mixtral_params(mc, spec)
    t = len(prompt)
    tp = 16 * ((t + 15) // 16)
    pool = make_kv_pool(spec.num_layers, 8, spec.num_kv_heads, 16,
                        spec.head_dim, kv_bits=spec.kv_bits,
                        kv_zeros=spec.kv_zeros)
    batch = PrefillBatch(
        token_ids=jnp.asarray(np.pad(prompt, (0, tp - t))),
        positions=jnp.asarray(
            np.pad(np.arange(t), (0, tp - t), constant_values=-1)
        ),
        segment_ids=jnp.asarray(
            np.pad(np.zeros(t, np.int32), (0, tp - t), constant_values=-1)
        ),
        block_tables=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
        last_token_idx=jnp.asarray([t - 1]),
        seq_lens=jnp.asarray([t]),
        new_page_ids=jnp.asarray([0, 1, 2, 3, -1, -1, -1, -1]),
    )
    logits, _, _, _ = mixtral_forward(
        params, pool, None, batch, spec=spec, is_prefill=True
    )
    return np.asarray(logits[0], np.float32)


class TestGoldenMixtralVsHF:
    def test_prefill_logits_match_fp16(self, hf_mixtral):
        path, model = hf_mixtral
        want, _ = hf_reference(model, PROMPT, 1)
        got = model_logits(path, PROMPT, "w16a16kv16")
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
        assert int(got.argmax()) == int(want.argmax())

    def test_greedy_tokens_match_fp16(self, hf_mixtral):
        path, model = hf_mixtral
        _, want = hf_reference(model, PROMPT, 8)
        got = run_engine(path, PROMPT, 8, "w16a16kv16")
        agree = 0
        for a, b in zip(got, want):
            if a != b:
                break
            agree += 1
        # bf16 + capacity-slot dispatch vs torch f32: near-ties may flip
        # late in the rollout
        assert agree >= 6, (got, want)

    def test_quantized_first_tokens_track_fp16(self, hf_mixtral):
        path, model = hf_mixtral
        want_logits, want = hf_reference(model, PROMPT, 4)
        got_logits = model_logits(path, PROMPT, "w4a8kv4")
        assert int(got_logits.argmax()) == int(want_logits.argmax())
        got = run_engine(path, PROMPT, 4, "w4a8kv4")
        assert got[0] == want[0], (got, want)
