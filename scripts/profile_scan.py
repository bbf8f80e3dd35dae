"""Compare unrolled per-step dispatch vs the engine's lax.scan decode window.

bench.py dispatches one jitted program per decode step; the engine's
multi-step path scans the same forward N times inside one program
(worker/model_runner.py:_multi_step_fns). Round-2 measurements showed the
scan ~5 ms/step slower at identical geometry — this script reproduces both
modes side by side and attributes the difference with the device profiler.

Usage: python scripts/profile_scan.py [out_dir]
Env: GLOBAL_BATCH_SIZE (128), GLOBAL_PROMPT_LEN (1024), PROFILE_LAYERS (8),
     SCAN_STEPS (16).
"""

import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        llama_forward,
        make_random_packed_params,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool

    batch = int(os.environ.get("GLOBAL_BATCH_SIZE", "128"))
    ctx = int(os.environ.get("GLOBAL_PROMPT_LEN", "1024"))
    layers = int(os.environ.get("PROFILE_LAYERS", "8"))
    n_steps = int(os.environ.get("SCAN_STEPS", "16"))
    spec = LlamaSpec(
        num_layers=layers, hidden=4096, intermediate=14336, num_q_heads=32,
        num_kv_heads=8, head_dim=128, vocab=128256, rope_base=500000.0,
        weight_bits=4, act_bits=8, kv_bits=4, kv_zeros=True,
        page_size=128,
    )
    max_len = ctx + 4 * n_steps + 8 + spec.page_size
    blocks_per_seq = (max_len + spec.page_size - 1) // spec.page_size
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
        new_page_ids=jnp.full((batch,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full(
            (spec.num_layers, batch, 1, 1), -1, jnp.int32
        ),
    )
    page = spec.page_size

    def step0_pages(b):
        n = b.positions.shape[0]
        return jnp.where(
            (b.positions % page == 0) & b.active,
            b.block_tables[
                jnp.arange(n),
                jnp.minimum(b.positions // page, b.block_tables.shape[1] - 1),
            ],
            -1,
        )

    def body_fn(params, rpool, b):
        logits, rpool, _, _ = llama_forward(
            params, rpool, None, b, spec=spec, is_prefill=False
        )
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        b2 = b._replace(token_ids=toks, positions=b.positions + 1)
        b2 = b2._replace(new_page_ids=step0_pages(b2))
        return b2, rpool

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, pool, b):
        return body_fn(params, pool, b)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def window(params, pool, b):
        def sbody(carry, i):
            rpool, bd = carry
            bd2, rpool = body_fn(params, rpool, bd)
            return (rpool, bd2), bd2.token_ids

        (pool, b), toks = jax.lax.scan(
            sbody, (pool, b), jnp.arange(n_steps)
        )
        return b, pool, toks

    return params, pool, bd, step, window, n_steps, batch


def fetch_sync(x):
    return np.asarray(jax.jit(lambda t: t[:4])(x))


def main(out_dir):
    params, pool, bd, step, window, n_steps, batch = build()

    # compile + warm both programs
    t0 = time.time()
    bd, pool = step(params, pool, bd)
    fetch_sync(bd.token_ids)
    print(f"unrolled compile {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    bd, pool, toks = window(params, pool, bd)
    fetch_sync(toks)
    print(f"scan compile {time.time() - t0:.1f}s", flush=True)

    # wall-clock, differential
    t0 = time.time()
    for _ in range(n_steps):
        bd, pool = step(params, pool, bd)
    fetch_sync(bd.token_ids)
    t_unroll = time.time() - t0
    t0 = time.time()
    bd, pool, toks = window(params, pool, bd)
    fetch_sync(toks)
    t_scan = time.time() - t0
    print(f"wall: unrolled {t_unroll / n_steps * 1e3:.2f} ms/step, "
          f"scan {t_scan / n_steps * 1e3:.2f} ms/step", flush=True)

    # profile one of each
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            bd, pool = step(params, pool, bd)
        fetch_sync(bd.token_ids)
        bd, pool, toks = window(params, pool, bd)
        fetch_sync(toks)
    parse(out_dir, n_steps)


def parse(out_dir, n_steps):
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
    # split events into unrolled-phase vs scan-phase by enclosing program.
    # The program name lives in different args keys across profiler
    # versions — probe every string-valued arg for jit_window / jit_step.
    agg = {"step": defaultdict(float), "window": defaultdict(float)}
    tot = {"step": 0.0, "window": 0.0}
    src = {}
    unmatched = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        a = e.get("args", {})
        blob = name + " " + " ".join(
            str(v) for v in a.values() if isinstance(v, str)
        )
        if "jit_window" in blob:
            key = "window"
        elif "jit_step" in blob:
            key = "step"
        else:
            unmatched[name] += e.get("dur", 0) / 1e3
            continue
        dur = e.get("dur", 0) / 1e3
        agg[key][name] += dur
        tot[key] += dur
        s = a.get("source", "")
        if s and name not in src:
            src[name] = s
    if not tot["step"] and not tot["window"]:
        print("!! no events matched jit_step/jit_window — top ops overall:")
        for name, ms in sorted(unmatched.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{ms / n_steps:8.3f} ms/step  {name}")
        return
    if unmatched:
        um = sum(unmatched.values())
        print(f"(unmatched device time: {um / n_steps:.2f} ms/step over "
              f"{len(unmatched)} op names)")
    for key in ("step", "window"):
        print(f"\n== {key}: total {tot[key]:.1f} ms "
              f"({tot[key] / n_steps:.2f} ms/step) ==")
        for name, ms in sorted(agg[key].items(), key=lambda kv: -kv[1])[:20]:
            print(f"{ms / n_steps:8.3f} ms/step  {name}  {src.get(name, '')}")
    # diff by op name
    names = set(agg["step"]) | set(agg["window"])
    diffs = sorted(
        ((agg["window"].get(n, 0.0) - agg["step"].get(n, 0.0), n)
         for n in names), key=lambda kv: -abs(kv[0])
    )
    print("\n== scan minus unrolled (ms/step) ==")
    for d, n in diffs[:20]:
        print(f"{d / n_steps:+8.3f}  {n}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_scan"
    main(out)
