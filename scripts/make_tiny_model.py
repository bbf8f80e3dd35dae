"""Create a fully self-contained tiny Llama checkpoint + tokenizer.

Zero-egress helper: trains a small byte-level BPE on the shipped NIAH
essay corpus, builds a random-weight HF LlamaForCausalLM, and saves both
to one directory usable by every entry script (generation, NIAH,
LongBench, ppl_eval) without any network access.

    python scripts/make_tiny_model.py --output /tmp/tiny_real [--vocab 2048]
"""

import argparse
import glob
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", required=True)
    parser.add_argument("--vocab", type=int, default=2048)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--intermediate", type=int, default=0,
                        help="MLP width (default 2*hidden)")
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--kv-heads", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import torch
    from tokenizers import ByteLevelBPETokenizer
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    corpus = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "eval", "needle",
        "PaulGrahamEssays", "*.txt",
    )))
    assert corpus, "essay corpus missing (eval/needle/PaulGrahamEssays)"

    tok = ByteLevelBPETokenizer()
    tok.train(
        corpus, vocab_size=args.vocab, min_frequency=2,
        special_tokens=["<s>", "</s>", "<unk>"],
    )
    os.makedirs(args.output, exist_ok=True)
    tok_path = os.path.join(args.output, "tokenizer.json")
    tok.save(tok_path)
    fast = PreTrainedTokenizerFast(
        tokenizer_file=tok_path, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>",
    )
    fast.save_pretrained(args.output)

    torch.manual_seed(args.seed)
    model = LlamaForCausalLM(LlamaConfig(
        hidden_size=args.hidden,
        intermediate_size=args.intermediate or args.hidden * 2,
        num_attention_heads=args.heads,
        num_key_value_heads=args.kv_heads,
        num_hidden_layers=args.layers,
        vocab_size=args.vocab,
        max_position_embeddings=131072,
        rope_theta=500000.0,
    ))
    n_params = sum(p.numel() for p in model.parameters())
    print(f"parameters: {n_params / 1e6:.1f}M")
    model.save_pretrained(args.output)
    print(f"tiny model + tokenizer (vocab {args.vocab}) -> {args.output}")


if __name__ == "__main__":
    main()
