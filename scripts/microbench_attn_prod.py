"""Differential-timed microbench of the PRODUCTION decode-attention kernel.

Times omniserve_tpu.ops.pallas.decode_attention.paged_mqa_attention_single_pass
at the engine's bench shapes with knobs:
  MB_BATCH (128), MB_PAGES (14) table width, MB_LIVE (13) live pages,
  MB_FUSED (0/1) fused append, MB_DMA_GROUP override, MB_CHAIN1/2.

Per-call = (t(chain r2) - t(chain r1)) / (r2 - r1): fixed axon-relay
overhead cancels (single-chain host timing is ~2x noisy run-to-run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops.pallas import decode_attention as da
from omniserve_tpu.ops.paged_kv import make_kv_pool

B = int(os.environ.get("MB_BATCH", "128"))
W = int(os.environ.get("MB_PAGES", "14"))     # table width (padded)
LIVE = int(os.environ.get("MB_LIVE", "13"))   # live pages per seq
H, REP, D, PAGE = 8, 4, 128, 128
FUSED = os.environ.get("MB_FUSED", "0") == "1"

if os.environ.get("MB_DMA_GROUP"):
    da.DMA_GROUP = int(os.environ["MB_DMA_GROUP"])


def main():
    rng = np.random.default_rng(0)
    n_pages = B * W + 1
    pool = make_kv_pool(1, n_pages, H, PAGE, D, kv_bits=4, kv_zeros=True)
    pool = pool._replace(
        k_data=jnp.asarray(
            rng.integers(0, 255, pool.k_data.shape), jnp.uint8),
        v_data=jnp.asarray(
            rng.integers(0, 255, pool.v_data.shape), jnp.uint8),
        kv_scales=jnp.asarray(
            rng.uniform(0.01, 0.5, pool.kv_scales.shape),
            pool.kv_scales.dtype),
    )
    q = jnp.asarray(rng.normal(size=(B, H, REP, D)), jnp.float32)
    sel_phys = jnp.asarray(
        rng.permutation(B * W).reshape(B, W), jnp.int32)
    tile = np.arange(W)[None, :].repeat(B, 0)
    sel_logic = jnp.asarray(np.where(tile < LIVE, tile, -1), jnp.int32)
    lengths = jnp.full((B,), LIVE * PAGE - 37, jnp.int32)

    def call(q, pool):
        kw = dict(
            sm_scale=0.0883, page_size=PAGE, kv_zeros=True,
            contiguous_logic=True,
        )
        if FUSED:
            k_new = q[:, :, 0] * 0.1
            v_new = q[:, :, 1] * 0.1
            tgt_pos = jnp.full((B,), LIVE - 1, jnp.int32)
            tgt_slot = jnp.full((B,), PAGE - 37, jnp.int32)
            out, pool = da.paged_mqa_attention_single_pass(
                q, pool, 0, sel_phys, sel_logic, lengths,
                append=(k_new, v_new, tgt_pos, tgt_slot), **kw,
            )
            return out, pool
        out = da.paged_mqa_attention_single_pass(
            q, pool, 0, sel_phys, sel_logic, lengths, **kw,
        )
        return out, pool

    def make_chain(r):
        @jax.jit
        def chained(q, pool):
            out = jnp.zeros((B, H, REP, D), q.dtype)
            for _ in range(r):
                out, pool = call(q + out * 1e-30, pool)
            return out, pool
        return chained

    # Host-clock timing on the axon relay is hopeless (±10 ms dispatch
    # noise vs ~6 ms of device work); trace the device instead and take
    # the aggregated pallas-call device time.
    r = int(os.environ.get("MB_CHAIN", "16"))
    chained = make_chain(r)
    fetch = jax.jit(lambda t: t[0, 0, 0, :2])
    np.asarray(fetch(chained(q, pool)[0]))          # compile + warm
    trace_dir = os.environ.get("MB_TRACE", "/tmp/mb_attn_prod")
    with jax.profiler.trace(trace_dir):
        np.asarray(fetch(chained(q, pool)[0]))

    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e.get("name", "?")] += e.get("dur", 0) / 1e3
    total = max(
        (v for k, v in agg.items() if k.startswith("jit_chained")),
        default=0.0,
    )
    dt = total / r / 1e3                            # ms -> s per call
    kv_bytes = B * LIVE * (2 * H * (PAGE // 2) * D + 4 * H * PAGE * 4)
    print(f"B={B} W={W} live={LIVE} fused={int(FUSED)} "
          f"dma_group={da.DMA_GROUP}: {dt * 1e6:8.1f} us/call  "
          f"{dt * 32 * 1e3:6.2f} ms/32-layer-step  "
          f"live-KV {kv_bytes / dt / 1e9:5.0f} GB/s")


if __name__ == "__main__":
    main()
