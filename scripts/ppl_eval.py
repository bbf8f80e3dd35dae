"""Teacher-forced perplexity (WikiText-2 protocol, reference README:283-301).

Evaluates any HF or packed checkpoint through the model-level forward:
non-overlapping seqlen-2048 windows, next-token NLL averaged over all
predicted positions — the protocol behind the reference's QoQ table
(fp16 6.14 vs W4A8KV4 6.89 for Llama-3-8B).

    python scripts/ppl_eval.py --model <ckpt> --precision w4a8kv4 \
        --text wikitext2.raw [--seqlen 2048] [--max-windows N]

``--text`` takes a raw text file (e.g. WikiText-2's wiki.test.raw).
``--compare-hf`` additionally runs the torch implementation on the same
windows (tractable for small models) and prints the delta.
"""

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def token_windows(path, tokenizer, seqlen, max_windows):
    if path.endswith(".npy"):
        ids = np.load(path).astype(np.int64).tolist()  # pre-tokenized
    else:
        with open(path, "r", errors="ignore") as f:
            text = f.read()
        ids = tokenizer.encode(text)
    n = (len(ids) - 1) // seqlen
    if max_windows:
        n = min(n, max_windows)
    if n == 0:
        raise SystemExit(
            f"text too short: {len(ids)} tokens < seqlen+1 ({seqlen + 1})"
        )
    return [ids[i * seqlen: (i + 1) * seqlen + 1] for i in range(n)]


def build_eval_fn(spec, page_size):
    import jax
    import jax.numpy as jnp

    from omniserve_tpu.models.llama import PrefillBatch, llama_forward

    @functools.partial(jax.jit, donate_argnums=(1,))
    def window_nll(params, pool, tokens, targets):
        t = tokens.shape[0]
        n_blocks = t // page_size
        batch = PrefillBatch(
            token_ids=tokens,
            positions=jnp.arange(t, dtype=jnp.int32),
            segment_ids=jnp.zeros((t,), jnp.int32),
            block_tables=jnp.arange(n_blocks, dtype=jnp.int32)[None, :],
            streaming_block_tables=jnp.zeros((1, 1), jnp.int32),
            last_token_idx=jnp.asarray([t - 1]),
            seq_lens=jnp.asarray([t]),
            new_page_ids=jnp.arange(n_blocks, dtype=jnp.int32),
        )
        h, pool, _, _ = llama_forward(
            params, pool, None, batch, spec=spec, is_prefill=True,
            return_hidden=True,
        )                                           # [T, D]
        # vocab-chunked NLL to cap the [T, V] logits footprint
        # lm_head is padded to a chunk multiple by main(); padding columns
        # are masked via col < vocab
        lm = params["lm_head"]                      # [D, Vpad]
        v = spec.vocab
        chunk = min(16384, lm.shape[1])
        n_chunks = lm.shape[1] // chunk

        def body(carry, i):
            m_prev, s_prev, tgt_prev = carry
            sl = jax.lax.dynamic_slice_in_dim(
                lm, i * chunk, chunk, axis=1
            )
            lg = jnp.dot(
                h.astype(jnp.bfloat16), sl,
                preferred_element_type=jnp.float32,
            )                                       # [T, chunk]
            col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) \
                + i * chunk
            valid_col = col < v
            lg = jnp.where(valid_col, lg, -jnp.inf)
            m_new = jnp.maximum(m_prev, lg.max(axis=1))
            s_new = s_prev * jnp.exp(m_prev - m_new) + jnp.where(
                jnp.isneginf(m_new), 0.0,
                jnp.exp(lg - m_new[:, None]).sum(axis=1),
            )
            hit = (col == targets[:, None]) & valid_col
            tgt_new = tgt_prev + jnp.where(hit, lg, 0.0).sum(axis=1)
            return (m_new, s_new, tgt_new), None

        t_rows = h.shape[0]
        init = (
            jnp.full((t_rows,), -jnp.inf, jnp.float32),
            jnp.zeros((t_rows,), jnp.float32),
            jnp.zeros((t_rows,), jnp.float32),
        )
        (m, s, tgt), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks)
        )
        log_z = m + jnp.log(s)
        nll = log_z - tgt                           # [T]
        return nll.sum(), pool

    return window_nll


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--precision", default="w4a8kv4")
    parser.add_argument("--kv-quant-granularity", default="fine_grained")
    parser.add_argument("--group-size", type=int, default=-1)
    parser.add_argument("--text", required=True)
    parser.add_argument("--seqlen", type=int, default=2048)
    parser.add_argument("--max-windows", type=int, default=0)
    parser.add_argument("--page-size", type=int, default=128)
    parser.add_argument("--compare-hf", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from omniserve_tpu.config import ModelConfig
    from omniserve_tpu.models.llama import LlamaSpec
    from omniserve_tpu.models.weight_loader import load_llama_params
    from omniserve_tpu.ops.paged_kv import make_kv_pool
    from omniserve_tpu.utils.tokenizer import get_tokenizer

    mc = ModelConfig(
        model=args.model, precision=args.precision,
        kv_quant_granularity=args.kv_quant_granularity,
        group_size=args.group_size,
    )
    tokenizer = (
        None if args.text.endswith(".npy") else get_tokenizer(args.model)
    )
    windows = token_windows(
        args.text, tokenizer, args.seqlen, args.max_windows
    )
    spec = LlamaSpec.from_model_config(mc, page_size=args.page_size)
    params, kv_scales = load_llama_params(mc, spec)
    v = params["lm_head"].shape[1]
    chunk = min(16384, v)
    if v % chunk:
        params["lm_head"] = jnp.pad(
            params["lm_head"], ((0, 0), (0, chunk - v % chunk))
        )
    n_blocks = args.seqlen // args.page_size
    pool = make_kv_pool(
        spec.num_layers, n_blocks + 1, spec.num_kv_heads, args.page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
        k_scale_per_tensor=None if kv_scales is None else kv_scales[0],
        v_scale_per_tensor=None if kv_scales is None else kv_scales[1],
    )
    fn = build_eval_fn(spec, args.page_size)
    total_nll, total_tok = 0.0, 0
    for i, w in enumerate(windows):
        tokens = jnp.asarray(np.asarray(w[:-1], np.int32))
        targets = jnp.asarray(np.asarray(w[1:], np.int32))
        nll, pool = fn(params, pool, tokens, targets)
        total_nll += float(nll)
        total_tok += len(w) - 1
        print(f"window {i + 1}/{len(windows)}: "
              f"ppl so far {np.exp(total_nll / total_tok):.4f}",
              flush=True)
    ppl = float(np.exp(total_nll / total_tok))
    print(f"FINAL ppl ({args.precision}, seqlen {args.seqlen}, "
          f"{total_tok} tokens): {ppl:.4f}")

    if args.compare_hf:
        import torch
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(args.model)
        model.eval()
        nll_t, tok_t = 0.0, 0
        with torch.no_grad():
            for w in windows:
                ids = torch.tensor([w[:-1]])
                tg = torch.tensor(w[1:])
                logits = model(ids).logits[0].float()
                lsm = torch.log_softmax(logits, dim=-1)
                nll_t += float(-lsm[torch.arange(len(tg)), tg].sum())
                tok_t += len(tg)
        hppl = float(np.exp(nll_t / tok_t))
        print(f"HF torch fp32 ppl: {hppl:.4f} (delta {ppl - hppl:+.4f})")


if __name__ == "__main__":
    main()
