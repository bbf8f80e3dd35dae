"""Benchmark: Llama-3-8B W4A8KV4 decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: QServe on A100-80G, Llama-3-8B W4A8KV4, batch 256, 1024 in / 512
out -> 3005 tok/s (reference README.md:262-270; BASELINE.md).

Env knobs: GLOBAL_BATCH_SIZE (128), GLOBAL_PROMPT_LEN (1024),
BENCH_STEPS (32), BENCH_SMALL=1 (tiny model smoke mode).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_TOKS = 3005.0


def main() -> None:
    from omniserve_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        llama_forward,
        make_random_packed_params,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    # 160 is the measured single-chip sweet spot (4367 tok/s vs 4228 at
    # 128 and 4312 at 192; the reference reports max-throughput batch too)
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

    def make_batch(pos):
        return DecodeBatch(
            token_ids=jnp.ones((batch,), jnp.int32),
            positions=jnp.full((batch,), pos, jnp.int32),
            block_tables=jnp.asarray(tables),
            streaming_block_tables=jnp.zeros((batch, 1), jnp.int32),
            active=jnp.ones((batch,), bool),
            new_page_ids=jnp.full((8,), -1, jnp.int32),
            refresh_selection=jnp.asarray(False),
            cached_page_idxes=jnp.full(
                (spec.num_layers, batch, 1, 1), -1, jnp.int32
            ),
        )

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, pool, batch_dev):
        # Everything device-side lives INSIDE one jitted program: eager ops
        # between steps cost ~20 ms each on a remote-attached TPU.
        logits, pool, _, _ = llama_forward(
            params, pool, None, batch_dev, spec=spec, is_prefill=False
        )
        # FULL-vocab greedy argmax: slicing logits here would let XLA
        # narrow the lm_head matmul and under-measure the real step
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = batch_dev._replace(
            token_ids=toks, positions=batch_dev.positions + 1
        )
        return nxt, pool

    # warmup / compile. NOTE: block_until_ready can return before the
    # device actually finishes on remote-attached TPUs — a device->host
    # fetch is the only reliable completion barrier.
    fetch = jax.jit(lambda t: t[:4])
    t0 = time.time()
    batch_dev = make_batch(ctx)
    batch_dev, pool = step(params, pool, batch_dev)
    np.asarray(fetch(batch_dev.token_ids))
    t_compile = time.time() - t0

    # timed decode loop (positions advance; same compiled program)
    t0 = time.time()
    for i in range(steps):
        batch_dev, pool = step(params, pool, batch_dev)
    np.asarray(fetch(batch_dev.token_ids))
    dt = time.time() - t0

    toks_per_s = batch * steps / dt
    result = {
        "metric": "llama3_8b_w4a8kv4_decode_throughput"
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


if __name__ == "__main__":
    main()
