"""Teacher-forced sparse-vs-dense decode agreement at depth (model-level).

The reference's LServe claim is accuracy parity between dense attention
and the query-aware sparse path at long context
(/root/reference/README.md:391-396). Greedy-rollout agreement cannot test
this on a model whose long-context logit margins are chaotic: a
dense-vs-dense control (kv8 vs kv4) already collapses to ~9% agreement
from error compounding alone. This harness removes the compounding: both
configurations prefill the SAME ctx-token document, then decode S steps
fed the SAME teacher tokens (the document's continuation), and each
step's prediction is compared position by position:

  - top-1 agreement: argmax(dense logits) == argmax(sparse logits)
  - mean KL(dense || sparse) per step

so only the attention approximation itself is measured.

    python scripts/sparse_tf_agreement.py --model /tmp/m290_trained \
        --contexts 8192 16384 32768 --steps 64 \
        --output eval/needle/sparse_tf_agreement_0p29b.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def corpus_tokens(tokenizer, n_tokens):
    parts = []
    for path in sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "eval", "needle",
            "PaulGrahamEssays", "*.txt"))):
        with open(path, errors="ignore") as f:
            parts.append(f.read())
    ids = tokenizer.encode("\n".join(parts))
    assert len(ids) >= n_tokens, (len(ids), n_tokens)
    return ids[:n_tokens]


def run_config(model, precision, sparse, ctx_tokens, teacher, *,
               page_size, chunk, budget, interval):
    """Prefill ctx_tokens, then len(teacher) teacher-forced decode steps.
    Returns [S, V] log-softmax per step."""
    import jax
    import jax.numpy as jnp

    from omniserve_tpu.attn_config import sparse_attn_init
    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        PrefillBatch,
        llama_forward,
    )
    from omniserve_tpu.models.weight_loader import load_llama_params
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    mc = ModelConfig(model=model, precision=precision)
    sp_cfg = None
    if sparse:
        sp_cfg = sparse_attn_init(
            sparse_decode_mode=True,
            sparse_kv_cache_budget=budget,
            selector_update_interval=interval,
            page_size=page_size,
            num_layers=mc.get_num_layers(),
            num_kv_heads=mc.get_num_kv_heads(),
            max_model_len=len(ctx_tokens) + len(teacher) + page_size,
        )
    spec = LlamaSpec.from_model_config(mc, sp_cfg, page_size=page_size)
    params, kv_scales = load_llama_params(mc, spec)

    total = len(ctx_tokens) + len(teacher) + 1
    n_pages = -(-total // page_size) + 1
    pool = make_kv_pool(
        spec.num_layers, n_pages + 1, spec.num_kv_heads, page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
        with_stats=spec.with_stats, sub_chunks=spec.sub_chunks,
        k_scale_per_tensor=None if kv_scales is None else kv_scales[0],
        v_scale_per_tensor=None if kv_scales is None else kv_scales[1],
    )
    tables = jnp.arange(n_pages, dtype=jnp.int32)[None, :]

    # ---- chunked prefill (pool-writing path) ----
    @jax.jit
    def prefill_chunk(params, pool, tokens, positions, ctx_len, npg):
        t = tokens.shape[0]
        batch = PrefillBatch(
            token_ids=tokens,
            positions=positions,
            segment_ids=jnp.zeros((t,), jnp.int32),
            block_tables=tables,
            streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
            last_token_idx=jnp.asarray([t - 1]),
            seq_lens=ctx_len,
            new_page_ids=npg,
            context_lens=ctx_len,
        )
        _, pool, _, _ = llama_forward(
            params, pool, None, batch, spec=spec, is_prefill=True,
        )
        return pool

    ctx = np.asarray(ctx_tokens, np.int32)
    for lo in range(0, len(ctx), chunk):
        hi = min(len(ctx), lo + chunk)
        npg = np.full(chunk // page_size + 2, -1, np.int32)
        pgs = list(range(lo // page_size, (hi - 1) // page_size + 1))
        npg[: len(pgs)] = pgs
        pool = prefill_chunk(
            params, pool,
            jnp.asarray(ctx[lo:hi]),
            jnp.arange(lo, hi, dtype=jnp.int32),
            jnp.asarray([hi], jnp.int32),
            jnp.asarray(npg),
        )

    # ---- teacher-forced decode ----
    budget_p = spec.budget_pages if spec.sparse_decode else 1
    hsel = spec.num_kv_heads if spec.sparse_decode else 1
    sel_cache = jnp.full(
        (spec.num_layers, 1, hsel, budget_p), -1, jnp.int32
    )

    @jax.jit
    def decode_step(params, pool, token, pos, refresh, sel_cache):
        page = jnp.where(
            pos % page_size == 0, tables[0, pos // page_size], -1
        )
        batch = DecodeBatch(
            token_ids=token[None],
            positions=pos[None],
            block_tables=tables,
            streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
            active=jnp.ones((1,), bool),
            new_page_ids=page[None],
            refresh_selection=refresh,
            cached_page_idxes=sel_cache,
        )
        logits, pool, _, new_sel = llama_forward(
            params, pool, None, batch, spec=spec, is_prefill=False,
        )
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        return logp, pool, (sel_cache if new_sel is None else new_sel)

    out = []
    for s, tok in enumerate(teacher):
        logp, pool, sel_cache = decode_step(
            params, pool,
            jnp.asarray(tok, jnp.int32),
            jnp.asarray(len(ctx) + s, jnp.int32),
            jnp.asarray(sparse and s % interval == 0),
            sel_cache,
        )
        out.append(np.asarray(logp, np.float32))
    return np.stack(out)                                # [S, V]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--precision", default="w4a8kv4")
    ap.add_argument("--contexts", type=int, nargs="+",
                    default=[8192, 16384, 32768])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--budget", type=int, default=4096,
                    help="sparse KV budget in tokens")
    ap.add_argument("--budget-frac", type=float, default=None,
                    help="budget = frac * context (matched sparsity per "
                    "cell, e.g. 0.5 = the reference's headline setting)")
    ap.add_argument("--interval", type=int, default=4)
    ap.add_argument("--control-precision", type=str, default=None,
                    help="calibration row: compare dense @ --precision "
                    "vs DENSE @ this precision instead of vs sparse — "
                    "the model's own sensitivity to a quantization-sized "
                    "perturbation")
    ap.add_argument("--output", type=str,
                    default="eval/needle/sparse_tf_agreement_0p29b.json")
    args = ap.parse_args()

    from omniserve_tpu.utils.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(args.model)
    max_ctx = max(args.contexts)
    stream = corpus_tokens(tokenizer, max_ctx + args.steps + 1)

    cells = []
    for ctx in args.contexts:
        budget = (
            int(ctx * args.budget_frac) if args.budget_frac
            else args.budget
        )
        ctx_tokens = stream[:ctx]
        teacher = stream[ctx: ctx + args.steps]
        print(f"=== ctx {ctx}: dense ===", flush=True)
        dense = run_config(
            args.model, args.precision, False, ctx_tokens, teacher,
            page_size=args.page_size, chunk=args.chunk,
            budget=budget, interval=args.interval,
        )
        if args.control_precision:
            print(f"=== ctx {ctx}: control dense "
                  f"@{args.control_precision} ===", flush=True)
            other = run_config(
                args.model, args.control_precision, False, ctx_tokens,
                teacher, page_size=args.page_size, chunk=args.chunk,
                budget=budget, interval=args.interval,
            )
        else:
            print(f"=== ctx {ctx}: sparse (budget {budget} tok, "
                  f"interval {args.interval}) ===", flush=True)
            other = run_config(
                args.model, args.precision, True, ctx_tokens, teacher,
                page_size=args.page_size, chunk=args.chunk,
                budget=budget, interval=args.interval,
            )
        agree = float(
            (dense.argmax(axis=1) == other.argmax(axis=1)).mean()
        )
        kl = float((np.exp(dense) * (dense - other)).sum(axis=1).mean())
        cells.append({
            "context": ctx, "steps": args.steps,
            "top1_agreement": round(agree, 4),
            "mean_kl_dense_sparse": round(kl, 6),
            "sparsity": (
                None if args.control_precision
                else round(1.0 - budget / ctx, 4)
            ),
            "budget_tokens": None if args.control_precision else budget,
        })
        print(f"ctx {ctx}: top-1 agreement {agree:.3f}, KL {kl:.5f}")

    mean = sum(c["top1_agreement"] for c in cells) / len(cells)
    result = {
        "model": args.model,
        "precision": args.precision,
        "protocol": "teacher-forced decode over identical pools",
        "compare": (
            f"dense vs dense @{args.control_precision} (control)"
            if args.control_precision else "dense vs dynamic-sparse"
        ),
        "selector_update_interval": args.interval,
        "mean_top1_agreement": round(mean, 4),
        "cells": cells,
    }
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nmean teacher-forced agreement: {mean:.3f} -> {args.output}")


if __name__ == "__main__":
    main()
