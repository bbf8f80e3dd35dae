"""Golden tests vs the Hugging Face torch Llama implementation.

The reference's correctness story is accuracy parity on real checkpoints
(README.md:283-301). With no network egress, the "real checkpoint" is a
genuine HF LlamaForCausalLM built locally and saved with save_pretrained —
exercising the real weight files, the HF config conventions (RoPE, norm
eps, GQA head layout), and the full loader -> engine path against the
canonical torch implementation.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
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
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_golden")
    model.save_pretrained(d)
    return str(d), model


PROMPT = [3, 17, 94, 255, 12, 7, 400, 31, 2, 68, 101, 5]


def hf_reference(model, prompt, n_new):
    with torch.no_grad():
        ids = torch.tensor([prompt])
        out = model(ids)
        logits = out.logits[0, -1].float().numpy()
        gen = model.generate(
            ids, max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
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
    """Last-token prefill logits through the model-level forward."""
    import jax.numpy as jnp

    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import (
        LlamaSpec,
        PrefillBatch,
        llama_forward,
    )
    from omniserve_tpu.models.weight_loader import load_llama_params
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    mc = ModelConfig(model=path, precision=precision)
    spec = LlamaSpec.from_model_config(mc, page_size=16)
    params, _ = load_llama_params(mc, spec)
    t = len(PROMPT)
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
            np.pad(np.zeros(t, np.int32), (0, tp - t),
                   constant_values=-1)
        ),
        block_tables=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
        last_token_idx=jnp.asarray([t - 1]),
        seq_lens=jnp.asarray([t]),
        new_page_ids=jnp.asarray([0, 1, 2, 3, -1, -1, -1, -1]),
    )
    logits, _, _, _ = llama_forward(
        params, pool, None, batch, spec=spec, is_prefill=True
    )
    return np.asarray(logits[0], np.float32)


class TestGoldenVsHF:
    def test_prefill_logits_match_fp16(self, hf_checkpoint):
        path, model = hf_checkpoint
        want, _ = hf_reference(model, PROMPT, 1)
        got = model_logits(path, PROMPT, "w16a16kv16")
        # bf16 matmuls vs torch f32: compare normalized logits closely
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
        assert int(got.argmax()) == int(want.argmax())

    def test_greedy_tokens_match_fp16(self, hf_checkpoint):
        path, model = hf_checkpoint
        _, want = hf_reference(model, PROMPT, 8)
        got = run_engine(path, PROMPT, 8, "w16a16kv16")
        agree = 0
        for a, b in zip(got, want):
            if a != b:
                break
            agree += 1
        # bf16 rounding may flip one near-tie late in the rollout
        assert agree >= 6, (got, want)

    def test_quantized_first_tokens_track_fp16(self, hf_checkpoint):
        """W4A8KV4 on real weights: argmax of the prefill logits must
        survive quantization, and the greedy rollout should track the
        fp16 rollout for the first steps (QoQ-level degradation, not
        garbage)."""
        path, model = hf_checkpoint
        want_logits, want = hf_reference(model, PROMPT, 4)
        got_logits = model_logits(path, PROMPT, "w4a8kv4")
        assert int(got_logits.argmax()) == int(want_logits.argmax())
        got = run_engine(path, PROMPT, 4, "w4a8kv4")
        assert got[0] == want[0], (got, want)


def test_converter_end_to_end_serves(hf_checkpoint, tmp_path):
    """Real HF ckpt -> fake-quant dump -> convert.py -> packed -> engine:
    the full offline tooling path must serve tokens matching the
    direct-HF w4a8 load (same QoQ grid)."""
    import subprocess

    path, model = hf_checkpoint
    dump = tmp_path / "dump"
    packed = tmp_path / "packed"
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "scripts/ckpt_converter/make_fake_quant_dump.py",
         "--model", path, "--output", str(dump)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(
        [sys.executable, "scripts/ckpt_converter/convert.py",
         "--model-path", path, "--quant-path", str(dump),
         "--w-bit", "4", "--group-size", "-1",
         "--output-path", str(packed)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    # the converter writes <model>-w4a8-per-channel under output-path
    (packed_dir,) = list(packed.iterdir())

    got = run_engine(str(packed_dir), PROMPT, 4, "w4a8kv4")
    want = run_engine(path, PROMPT, 4, "w4a8kv4")
    assert got[:2] == want[:2], (got, want)


def test_llama3_rope_scaling_matches_hf(tmp_path):
    """Llama-3.1-style rope_scaling (type 'llama3'): the frequency remap
    must match HF's _compute_llama3_parameters — previously the type was
    silently ignored (unscaled rotary angles past the original window)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = LlamaConfig(
        hidden_size=128, intermediate_size=256, num_attention_heads=8,
        num_key_value_heads=4, num_hidden_layers=2, vocab_size=512,
        max_position_embeddings=256, rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path / "llama3_rope"
    model.save_pretrained(d)

    # long prompt (past the original 64-token window) so wrong angles bite
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 511, size=100).tolist()
    with torch.no_grad():
        want = model(torch.tensor([prompt])).logits[0, -1].float().numpy()
    # model_logits above is PROMPT-specific; inline the forward here
    import jax.numpy as jnp

    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import (
        LlamaSpec, PrefillBatch, llama_forward,
    )
    from omniserve_tpu.models.weight_loader import load_llama_params
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    mc = ModelConfig(model=str(d), precision="w16a16kv16")
    spec = LlamaSpec.from_model_config(mc, page_size=16)
    assert spec.rope_llama3 is not None
    params, _ = load_llama_params(mc, spec)
    t = len(prompt)
    tp = 16 * ((t + 15) // 16)
    n_pages = tp // 16
    pool = make_kv_pool(spec.num_layers, n_pages + 1, spec.num_kv_heads,
                        16, spec.head_dim, kv_bits=16, kv_zeros=True)
    batch = PrefillBatch(
        token_ids=jnp.asarray(np.pad(prompt, (0, tp - t))),
        positions=jnp.asarray(
            np.pad(np.arange(t), (0, tp - t), constant_values=-1)),
        segment_ids=jnp.asarray(
            np.pad(np.zeros(t, np.int32), (0, tp - t),
                   constant_values=-1)),
        block_tables=jnp.asarray([list(range(n_pages))], jnp.int32),
        streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
        last_token_idx=jnp.asarray([t - 1]),
        seq_lens=jnp.asarray([t]),
        new_page_ids=jnp.asarray(list(range(n_pages)) + [-1], jnp.int32),
    )
    logits, _, _, _ = llama_forward(
        params, pool, None, batch, spec=spec, is_prefill=True
    )
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    assert int(got.argmax()) == int(want.argmax())
