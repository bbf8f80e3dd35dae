"""Prompt-inspection debug variant of pred.py.

Reference parity: ``/root/reference/eval/LongBench/pred_test.py:73-78``
builds prompts exactly like pred.py but, on reaching a chosen sample
index, dumps the fully-formatted (post-truncation) prompt to
``prompt.txt`` and exits without generating — a quick way to eyeball
what the model actually sees after middle-truncation and templating.

    python eval/LongBench/pred_test.py --model <path> \
        --datasets hotpotqa --index 61 [--data-dir DIR]

Unlike the reference (which hardcodes index 61), ``--index`` is a flag.
No engine is constructed: only the tokenizer is needed, so this runs
without TPU/weights when given a tokenizer path.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pred import DATASET_PROMPTS, MAX_GEN, middle_truncate  # noqa: E402

from omniserve_tpu.utils.tokenizer import get_tokenizer  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", type=str, required=True,
                        help="model/tokenizer path (tokenizer only)")
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--datasets", nargs="+",
                        default=list(DATASET_PROMPTS))
    parser.add_argument("--index", type=int, default=61,
                        help="sample index whose prompt to dump "
                        "(reference pred_test.py:73 hardcodes 61)")
    parser.add_argument("--max-prompt-len", type=int, default=None)
    parser.add_argument("--max-model-len", type=int, default=None,
                        help="MUST match the eval run's engine "
                        "max_model_len or the dumped prompt differs from "
                        "what the model saw; default reads the model's "
                        "config.json (max_position_embeddings), falling "
                        "back to 32768")
    parser.add_argument("--out", type=str, default="prompt.txt")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="load {task}.jsonl locally (offline runs)")
    args = parser.parse_args()

    tokenizer = get_tokenizer(args.tokenizer or args.model)
    if args.max_model_len is None:
        args.max_model_len = 32768
        cfg_path = os.path.join(args.model, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            args.max_model_len = int(
                cfg.get("max_position_embeddings", args.max_model_len)
            )
    max_gen_all = max(MAX_GEN.values())
    if args.max_prompt_len is None:
        args.max_prompt_len = args.max_model_len - max_gen_all - 8

    for name in args.datasets:
        if args.data_dir is not None:
            with open(os.path.join(args.data_dir, f"{name}.jsonl")) as f:
                data = [json.loads(line) for line in f if line.strip()]
        else:
            from datasets import load_dataset
            data = load_dataset("THUDM/LongBench", name, split="test")
        for i, sample in enumerate(data):
            if i != args.index:
                continue
            prompt = DATASET_PROMPTS[name].format(**sample)
            prompt = middle_truncate(tokenizer, prompt,
                                     args.max_prompt_len)
            print(f"Prompt ({name}[{i}], "
                  f"{len(tokenizer.encode(prompt))} tokens):\n{prompt}")
            with open(args.out, "w") as f:
                f.write(prompt)
            return
        print(f"{name}: index {args.index} out of range "
              f"({sum(1 for _ in data)} samples); trying next dataset")
    # no prompt dumped: fail loudly so scripted callers don't read a
    # stale prompt.txt from an earlier run
    raise SystemExit(
        f"--index {args.index} out of range for every dataset; "
        f"nothing written to {args.out}"
    )


if __name__ == "__main__":
    main()
