"""End-to-end generation demo (QServe path).

Same role/CLI as the reference ``qserve_e2e_generation.py``: build an
engine from CLI args, wrap prompts in the model's conversation template,
run continuous batching to completion, print outputs.

Example:
    python qserve_e2e_generation.py --model <hf-path-or-dir> \
        --precision w4a8kv4 --ifb-mode
"""

import argparse
import time
from typing import List, Tuple

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams
from omniserve_tpu.conversation import (
    get_conv_template,
    get_conv_template_name,
)

DEFAULT_PROMPTS = [
    "Give a brief explanation of how a paged KV cache works.",
    "Write a haiku about tensor processing units.",
    "What is the capital of France, and why is it famous?",
    "Explain the difference between prefill and decode in LLM serving.",
]


def create_test_prompts(model_path: str, prompts: List[str]):
    template_name = get_conv_template_name(model_path)
    out = []
    for p in prompts:
        conv = get_conv_template(template_name)
        conv.append_message(conv.roles[0], p)
        conv.append_message(conv.roles[1], None)
        out.append(
            (
                conv.get_prompt(),
                SamplingParams(
                    temperature=0.7, top_p=0.95, max_tokens=256,
                    stop=[conv.stop_str] if conv.stop_str else None,
                    stop_token_ids=conv.stop_token_ids,
                ),
            )
        )
    return out


def process_requests(
    engine: LLMEngine, test_prompts: List[Tuple[str, SamplingParams]]
) -> None:
    request_id = 0
    finished = 0
    t0 = time.time()
    while test_prompts or engine.has_unfinished_requests():
        while test_prompts:
            prompt, params = test_prompts.pop(0)
            engine.add_request(str(request_id), prompt, params)
            request_id += 1
        for out in engine.step():
            if out.finished:
                finished += 1
                print(f"\n\033[1;36m=== Request {out.request_id} ===\033[0m")
                print(f"\033[33mPrompt:\033[0m {out.prompt!r}")
                print(f"\033[32mOutput:\033[0m {out.outputs[0].text}")
    dt = time.time() - t0
    print(f"\n{finished} requests finished in {dt:.1f}s")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    EngineArgs.add_cli_args(parser)
    parser.add_argument("--prompt", action="append", default=None,
                        help="custom prompt(s); repeatable")
    args = parser.parse_args()
    engine = LLMEngine.from_engine_args(EngineArgs.from_cli_args(args))
    prompts = args.prompt or DEFAULT_PROMPTS
    process_requests(engine, create_test_prompts(args.model, prompts))


if __name__ == "__main__":
    main()
