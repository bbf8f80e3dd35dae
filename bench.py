"""Benchmark: Llama-3-8B W4A8KV4 serving throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline number is the ENGINE protocol — the reference's
qserve_benchmark.py:81-125 measurement: GLOBAL_BATCH_SIZE random-token
requests of GLOBAL_PROMPT_LEN through engine.step() in a static batch,
decode GLOBAL_GENERATE_LEN tokens, 3 rounds, best round's decode tok/s.
Baseline: QServe on A100-80G, Llama-3-8B W4A8KV4, batch 256, 1024 in /
512 out -> 3005 tok/s (reference README.md:262-270; BASELINE.md).

Env knobs: GLOBAL_BATCH_SIZE (160), GLOBAL_PROMPT_LEN (1024),
GLOBAL_GENERATE_LEN (512), BENCH_MULTI_STEP (32, tokens per jitted decode
window), BENCH_ROUNDS (4; round 1 is compile warmup and is DISCARDED —
the headline is the median of the measured rounds), BENCH_SMALL=1
(tiny-model smoke mode), BENCH_RAW=1 (raw jitted forward loop instead of
the engine — kernel probe, round-2 behaviour).
"""

import json
import os
import time

A100_BASELINE_TOKS = 3005.0


def engine_bench() -> None:
    from omniserve_tpu import EngineArgs, LLMEngine
    from qserve_benchmark import run_round

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    # batch 128 is the largest that fits the FULL 1536-token KV pool next
    # to the weights on one 16 GB chip (batch 160 needs 9.3 GB of pool +
    # 5.1 GB of params + prefill temps > 15.75 GB)
    batch = int(os.environ.get("GLOBAL_BATCH_SIZE", "16" if small else "128"))
    prompt_len = int(
        os.environ.get("GLOBAL_PROMPT_LEN", "128" if small else "1024")
    )
    gen_len = int(
        os.environ.get("GLOBAL_GENERATE_LEN", "32" if small else "512")
    )
    rounds = int(os.environ.get("BENCH_ROUNDS", "4"))
    multi_step = int(os.environ.get("BENCH_MULTI_STEP", "32"))

    if small:
        import json as _json
        import tempfile

        cfg_dir = tempfile.mkdtemp(prefix="omniserve_bench_small_")
        with open(os.path.join(cfg_dir, "config.json"), "w") as f:
            _json.dump(dict(
                architectures=["LlamaForCausalLM"], hidden_size=512,
                intermediate_size=1024, num_attention_heads=8,
                num_key_value_heads=2, num_hidden_layers=4,
                vocab_size=32000, rope_theta=10000.0,
                max_position_embeddings=4096, rms_norm_eps=1e-5,
                model_type="llama",
            ), f)
        model_dir = cfg_dir
    else:
        import importlib.util

        spec_ = importlib.util.spec_from_file_location(
            "make_bench_config",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "make_bench_config.py"),
        )
        mbc = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(mbc)
        model_dir = mbc.write_family("llama3-8b", "/tmp/omniserve_bench_cfgs")

    blocks_per_seq = (prompt_len + gen_len + 127) // 128 + 1
    t0 = time.time()
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=model_dir,
        precision="w4a8kv4",
        load_format="dummy",
        ifb_mode=False,
        benchmarking_mode=True,
        disable_log_stats=True,   # keep stdout to the one JSON line
        # bound prefill activations: a 32k-token chunk's gate_up output is
        # 1.75 GB bf16, which OOMs next to the KV pool on a 16 GB chip
        chunk_prefill_size=int(os.environ.get("BENCH_CHUNK", "8192")),
        decode_multi_step=multi_step,
        max_num_seqs=batch,
        max_num_batched_tokens=max(262144, batch * prompt_len),
        num_retrieval_blocks=blocks_per_seq * batch + 2,
        # w8a8 halves the 1.05 GB/step bf16 head read (~0.6 ms at batch
        # 128); accuracy delta quantified in eval/quant_fidelity (the
        # reference keeps the head fp16 — set BENCH_LM_HEAD=fp16 to match)
        lm_head_precision=os.environ.get("BENCH_LM_HEAD", "w8a8"),
    ))
    t_build = time.time() - t0

    results = []
    t0 = time.time()
    for _ in range(rounds):
        results.append(run_round(engine, batch, prompt_len, gen_len))
    t_total = time.time() - t0
    # round 1 is compile warmup: discard it, headline = MEDIAN of the
    # measured rounds (round-3 verdict: best-of-N overstates)
    import statistics

    measured = results[1:] if len(results) > 1 else results
    headline = statistics.median(measured)
    result = {
        "metric": "llama3_8b_w4a8kv4_engine_throughput"
        + ("_small" if small else ""),
        "value": round(headline, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(headline / A100_BASELINE_TOKS, 3),
        "batch": batch,
        "prompt_len": prompt_len,
        "gen_len": gen_len,
        "rounds": [round(r, 1) for r in results],
        "best": round(max(results), 1),
        "headline_stat": "median of rounds[1:] (round 1 = warmup)",
        "multi_step": multi_step,
        "backend": __import__("jax").default_backend(),
        "build_s": round(t_build, 1),
        "bench_s": round(t_total, 1),
        "step_ms": round(batch * 1000.0 / headline, 2),
        "protocol": "engine qserve_benchmark (1024in/512out static batch)",
    }
    print(json.dumps(result))


def raw_bench() -> None:
    """Round-2 raw jitted forward-loop probe (kernel-level ceiling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        llama_forward,
        make_random_packed_params,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    batch = int(os.environ.get("GLOBAL_BATCH_SIZE", "16" if small else "160"))
    ctx = int(os.environ.get("GLOBAL_PROMPT_LEN", "128" if small else "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "8" if small else "32"))

    if small:
        spec = LlamaSpec(
            num_layers=4, hidden=512, intermediate=1024, num_q_heads=8,
            num_kv_heads=2, head_dim=128, vocab=32000, weight_bits=4,
            act_bits=8, kv_bits=4, kv_zeros=True, page_size=128,
        )
    else:
        spec = LlamaSpec(
            num_layers=32, hidden=4096, intermediate=14336, num_q_heads=32,
            num_kv_heads=8, head_dim=128, vocab=128256,
            rope_base=500000.0, weight_bits=4, act_bits=8, kv_bits=4,
            kv_zeros=True, page_size=128,
        )

    max_len = ctx + steps + spec.page_size
    blocks_per_seq = (max_len + spec.page_size - 1) // spec.page_size
    num_pages = batch * blocks_per_seq + 1

    t0 = time.time()
    params = make_random_packed_params(spec, seed=0)
    pool = make_kv_pool(
        spec.num_layers, num_pages, spec.num_kv_heads, spec.page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
    )
    jax.block_until_ready(params["layers"]["qkv"])
    t_params = time.time() - t0

    tables = np.arange(batch * blocks_per_seq, dtype=np.int32).reshape(
        batch, blocks_per_seq
    )

    batch_dev = DecodeBatch(
        token_ids=jnp.ones((batch,), jnp.int32),
        positions=jnp.full((batch,), ctx, jnp.int32),
        block_tables=jnp.asarray(tables),
        streaming_block_tables=jnp.zeros((batch, 1), jnp.int32),
        active=jnp.ones((batch,), bool),
        new_page_ids=jnp.full((8,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full(
            (spec.num_layers, batch, 1, 1), jnp.int32(-1)
        ),
    )

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, pool, batch_dev):
        logits, pool, _, _ = llama_forward(
            params, pool, None, batch_dev, spec=spec, is_prefill=False
        )
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = batch_dev._replace(
            token_ids=toks, positions=batch_dev.positions + 1
        )
        return nxt, pool

    fetch = jax.jit(lambda t: t[:4])
    t0 = time.time()
    batch_dev, pool = step(params, pool, batch_dev)
    np.asarray(fetch(batch_dev.token_ids))
    t_compile = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        batch_dev, pool = step(params, pool, batch_dev)
    np.asarray(fetch(batch_dev.token_ids))
    dt = time.time() - t0

    toks_per_s = batch * steps / dt
    result = {
        "metric": "llama3_8b_w4a8kv4_decode_throughput_raw"
        + ("_small" if small else ""),
        "value": round(toks_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(toks_per_s / A100_BASELINE_TOKS, 3),
        "batch": batch,
        "ctx": ctx,
        "steps": steps,
        "backend": jax.default_backend(),
        "params_s": round(t_params, 1),
        "compile_s": round(t_compile, 1),
        "step_ms": round(dt / steps * 1000, 2),
    }
    print(json.dumps(result))


def main() -> None:
    from omniserve_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if os.environ.get("BENCH_RAW", "0") == "1":
        raw_bench()
    else:
        engine_bench()


if __name__ == "__main__":
    main()
