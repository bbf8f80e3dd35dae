"""Build local HF config dirs for the QServe benchmark model families.

The reference fetches config-only model stubs from HF
`mit-han-lab/QServe-benchmarks` (scripts/qserve_benchmark/benchmark_a100.sh:3-8)
and serves them with --load-format dummy. This environment has no egress,
so the same stubs are generated locally from the families' public
geometries. Weights are random (dummy); the benchmark measures kernels,
not accuracy.

Usage:
    python scripts/make_bench_config.py [--out-dir /tmp/omniserve_bench_cfgs]
    python scripts/make_bench_config.py --only llama3-8b mistral-7b
"""

import argparse
import json
import os

# (family key) -> HF config. Geometries are the public model card values.
FAMILIES = {
    "llama3-8b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=4096,
        intermediate_size=14336, num_attention_heads=32,
        num_key_value_heads=8, num_hidden_layers=32, vocab_size=128256,
        rope_theta=500000.0, max_position_embeddings=8192,
        rms_norm_eps=1e-5, model_type="llama",
    ),
    "llama2-7b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=4096,
        intermediate_size=11008, num_attention_heads=32,
        num_key_value_heads=32, num_hidden_layers=32, vocab_size=32000,
        rope_theta=10000.0, max_position_embeddings=4096,
        rms_norm_eps=1e-5, model_type="llama",
    ),
    "mistral-7b": dict(
        architectures=["MistralForCausalLM"], hidden_size=4096,
        intermediate_size=14336, num_attention_heads=32,
        num_key_value_heads=8, num_hidden_layers=32, vocab_size=32000,
        rope_theta=10000.0, max_position_embeddings=32768,
        rms_norm_eps=1e-5, model_type="mistral",
    ),
    "llama2-13b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=5120,
        intermediate_size=13824, num_attention_heads=40,
        num_key_value_heads=40, num_hidden_layers=40, vocab_size=32000,
        rope_theta=10000.0, max_position_embeddings=4096,
        rms_norm_eps=1e-5, model_type="llama",
    ),
    "llama1-30b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=6656,
        intermediate_size=17920, num_attention_heads=52,
        num_key_value_heads=52, num_hidden_layers=60, vocab_size=32000,
        rope_theta=10000.0, max_position_embeddings=2048,
        rms_norm_eps=1e-6, model_type="llama",
    ),
    "yi-34b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=7168,
        intermediate_size=20480, num_attention_heads=56,
        num_key_value_heads=8, num_hidden_layers=60, vocab_size=64000,
        rope_theta=5000000.0, max_position_embeddings=4096,
        rms_norm_eps=1e-5, model_type="llama",
    ),
    "llama2-70b": dict(
        architectures=["LlamaForCausalLM"], hidden_size=8192,
        intermediate_size=28672, num_attention_heads=64,
        num_key_value_heads=8, num_hidden_layers=80, vocab_size=32000,
        rope_theta=10000.0, max_position_embeddings=4096,
        rms_norm_eps=1e-5, model_type="llama",
    ),
    # LServe long-context benchmark model (Llama-3-8B-Instruct-Gradient-
    # 1048k geometry: llama3-8b with the context-extended rope base)
    "llama3-8b-1048k": dict(
        architectures=["LlamaForCausalLM"], hidden_size=4096,
        intermediate_size=14336, num_attention_heads=32,
        num_key_value_heads=8, num_hidden_layers=32, vocab_size=128256,
        rope_theta=283461213.0, max_position_embeddings=1048576,
        rms_norm_eps=1e-6, model_type="llama",
    ),
    # Scaled Mixtral for one 16 GB chip: the 8-expert top-2 MoE graph at
    # reduced width/depth (8.5B MoE params -> ~4.3 GB int4 dummy weights).
    # The reference stubs the Mixtral forward (mixtral_w4a8_unpad.py:309);
    # this row measures our working MoE path (ops/moe.py, models/mixtral.py).
    "mixtral-scaled": dict(
        architectures=["MixtralForCausalLM"], hidden_size=2048,
        intermediate_size=7168, num_attention_heads=32,
        num_key_value_heads=8, num_hidden_layers=24, vocab_size=32000,
        num_local_experts=8, num_experts_per_tok=2,
        rope_theta=1000000.0, max_position_embeddings=32768,
        rms_norm_eps=1e-5, model_type="mixtral",
    ),
    "qwen1.5-72b": dict(
        architectures=["Qwen2ForCausalLM"], hidden_size=8192,
        intermediate_size=24576, num_attention_heads=64,
        num_key_value_heads=64, num_hidden_layers=80, vocab_size=152064,
        rope_theta=1000000.0, max_position_embeddings=32768,
        rms_norm_eps=1e-6, model_type="qwen2",
    ),
}

COMMON = dict(
    torch_dtype="float16", hidden_act="silu", tie_word_embeddings=False,
    bos_token_id=1, eos_token_id=2,
)


def write_family(name: str, out_dir: str) -> str:
    """Write one family's config stub; returns the model dir."""
    cfg = dict(COMMON)
    cfg.update(FAMILIES[name])
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/omniserve_bench_cfgs")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of family keys")
    args = ap.parse_args()
    for name in args.only or list(FAMILIES):
        print(write_family(name, args.out_dir))


if __name__ == "__main__":
    main()
