"""Long-context generation demo (LServe path).

Same role as the reference ``lserve_e2e_generation.py``: read a long
context file, append a question, run the engine with unified sparse
attention, and print the answer. With the default needle prompt this is
the 'simplified NIAH' smoke test (reference README.md:321-327).

    python lserve_e2e_generation.py --model <path> --precision w8a8kv8 \
        --kv-quant-granularity per_tensor \
        --sparse-context-mode --sparse-decode-mode --static-sparsity 0.5 \
        --attn-pattern-path attn_patterns/<model> \
        --input-file context.txt --question "What is the magic number?"
"""

import argparse
import time

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams
from omniserve_tpu.conversation import (
    get_conv_template,
    get_conv_template_name,
)

NEEDLE = (
    "\nRemember this: the magic number is 42. It is hidden here on "
    "purpose.\n"
)
FILLER = (
    "The sky was clear and the wind was gentle that day. People walked "
    "through the park, talking about everything and nothing at all. "
)


def build_default_context(n_tokens_approx: int) -> str:
    reps = max(1, n_tokens_approx // 40)
    half = reps // 2
    return FILLER * half + NEEDLE + FILLER * (reps - half)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    EngineArgs.add_cli_args(parser)
    parser.add_argument("--input-file", type=str, default=None)
    parser.add_argument("--question", type=str,
                        default="What is the magic number mentioned in the "
                                "context? Answer with just the number.")
    parser.add_argument("--context-tokens", type=int, default=8192,
                        help="approx filler length when no input file")
    parser.add_argument("--max-tokens", type=int, default=64)
    args = parser.parse_args()

    if args.input_file:
        with open(args.input_file) as f:
            context = f.read()
    else:
        context = build_default_context(args.context_tokens)

    engine = LLMEngine.from_engine_args(EngineArgs.from_cli_args(args))
    conv = get_conv_template(get_conv_template_name(args.model))
    conv.append_message(
        conv.roles[0], f"{context}\n\nQuestion: {args.question}"
    )
    conv.append_message(conv.roles[1], None)

    t0 = time.time()
    engine.add_request(
        "lserve-0",
        conv.get_prompt(),
        SamplingParams(
            temperature=0.0, max_tokens=args.max_tokens,
            stop=[conv.stop_str] if conv.stop_str else None,
            stop_token_ids=conv.stop_token_ids,
        ),
    )
    first_token_t = None
    answer = None
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.outputs[0].token_ids and first_token_t is None:
                first_token_t = time.time()
            if out.finished:
                answer = out
    assert answer is not None
    n_out = len(answer.outputs[0].token_ids)
    print(f"\033[33mContext:\033[0m ~{len(context)} chars")
    print(f"\033[33mQuestion:\033[0m {args.question}")
    print(f"\033[32mAnswer:\033[0m {answer.outputs[0].text.strip()}")
    print(
        f"TTFT {first_token_t - t0:.2f}s, "
        f"decode {n_out / max(time.time() - first_token_t, 1e-9):.1f} tok/s"
    )


if __name__ == "__main__":
    main()
