"""Perplexity harness vs the HF torch implementation on a real checkpoint."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ckpt_and_tokens(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("ppl_ckpt")
    LlamaForCausalLM(LlamaConfig(
        hidden_size=128, intermediate_size=256, num_attention_heads=8,
        num_key_value_heads=4, num_hidden_layers=2, vocab_size=512,
        max_position_embeddings=2048,
    )).save_pretrained(d)
    toks = np.random.default_rng(3).integers(1, 511, size=513)
    tok_path = d / "tokens.npy"
    np.save(tok_path, toks)
    return str(d), str(tok_path)


def run_ppl(ckpt, tokens, precision):
    out = subprocess.run(
        [sys.executable, "scripts/ppl_eval.py", "--model", ckpt,
         "--precision", precision, "--text", tokens, "--seqlen", "256",
         "--page-size", "16", "--compare-hf"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    ours = float([ln for ln in lines if ln.startswith("FINAL")][0]
                 .split(":")[1])
    hf = float([ln for ln in lines if ln.startswith("HF torch")][0]
               .split("ppl:")[1].split()[0])
    return ours, hf


def test_fp16_ppl_matches_torch(ckpt_and_tokens):
    ours, hf = run_ppl(*ckpt_and_tokens, precision="w16a16kv16")
    assert abs(ours - hf) / hf < 0.02, (ours, hf)


def test_quantized_ppl_close_to_fp16(ckpt_and_tokens):
    ours, hf = run_ppl(*ckpt_and_tokens, precision="w4a8kv4")
    # QoQ-level degradation, not garbage (random weights: ppl ~ vocab)
    assert ours < hf * 1.5, (ours, hf)
    assert ours > hf * 0.7, (ours, hf)
