"""Profile the decode step on the real TPU and print per-op device time.

Usage: python scripts/profile_decode.py [out_dir]
Env: GLOBAL_BATCH_SIZE, GLOBAL_PROMPT_LEN, PROFILE_STEPS (default 3).

Parses the jax.profiler trace (pid named /device:TPU:0), aggregates event
duration by op name, prints the top entries with their source lines.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def run_steps(out_dir: str, steps: int) -> None:
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        llama_forward,
        make_random_packed_params,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool
    import functools

    batch = int(os.environ.get("GLOBAL_BATCH_SIZE", "128"))
    ctx = int(os.environ.get("GLOBAL_PROMPT_LEN", "1024"))
    layers = int(os.environ.get("PROFILE_LAYERS", "32"))
    spec = LlamaSpec(
        num_layers=layers, hidden=4096, intermediate=14336, num_q_heads=32,
        num_kv_heads=8, head_dim=128, vocab=128256, rope_base=500000.0,
        weight_bits=4, act_bits=8, kv_bits=4, kv_zeros=True, page_size=128,
    )
    max_len = ctx + steps + 8 + spec.page_size
    blocks_per_seq = (max_len + spec.page_size - 1) // spec.page_size
    # engine parity: block tables are padded to a 2-bit-mantissa ceiling
    # (model_runner._table_width: 4,6,8,...,12,14,16,20,...); at the bench
    # shapes live pages grow 9->13 over the 512-token decode, so widths
    # run 10->14 — PROFILE_TABLE_W=14 reproduces the end-of-run padding
    blocks_per_seq = int(
        os.environ.get("PROFILE_TABLE_W", str(blocks_per_seq))
    )
    num_pages = batch * blocks_per_seq + 1
    params = make_random_packed_params(spec, seed=0)
    pool = make_kv_pool(
        spec.num_layers, num_pages, spec.num_kv_heads, spec.page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
    )
    tables = np.arange(batch * blocks_per_seq, dtype=np.int32).reshape(
        batch, blocks_per_seq
    )
    bd = DecodeBatch(
        token_ids=jnp.ones((batch,), jnp.int32),
        positions=jnp.full((batch,), ctx, jnp.int32),
        block_tables=jnp.asarray(tables),
        streaming_block_tables=jnp.zeros((batch, 1), jnp.int32),
        active=jnp.ones((batch,), bool),
        new_page_ids=jnp.full((8,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full(
            (spec.num_layers, batch, 1, 1), -1, jnp.int32
        ),
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, pool, b):
        logits, pool, _, _ = llama_forward(
            params, pool, None, b, spec=spec, is_prefill=False
        )
        # FULL-vocab argmax: logits[:, :1000] let XLA dead-code-eliminate
        # most of the lm_head read and hid ~1 ms/step (r5 finding)
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return b._replace(token_ids=toks, positions=b.positions + 1), pool

    fetch = jax.jit(lambda t: t[:4])
    bd, pool = step(params, pool, bd)           # compile + warm
    np.asarray(fetch(bd.token_ids))
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            bd, pool = step(params, pool, bd)
        np.asarray(fetch(bd.token_ids))


def parse(out_dir: str, steps: int) -> None:
    paths = glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = defaultdict(float)
    src = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            total += dur
            s = e.get("args", {}).get("source", "")
            if s and name not in src:
                src[name] = s
    print(f"total device time: {total:.1f} ms over {steps} steps "
          f"({total / steps:.2f} ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / steps:8.3f} ms/step  {name}   {src.get(name, '')}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_decode"
    steps = int(os.environ.get("PROFILE_STEPS", "3"))
    run_steps(out, steps)
    parse(out, steps)
