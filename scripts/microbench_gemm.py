"""Tile-config sweep for the W4A8 per-channel GEMM at decode shapes.

Times w4a8_matmul_per_channel over (bn, bk2) for the four Llama-3-8B
decode GEMMs at M=GLOBAL_BATCH_SIZE (default 160) and prints us/call plus
the achieved weight-side GB/s (packed bytes / time). Used to pick the
production tile defaults in ops/pallas/quant_matmul.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_gemm.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops.pallas.quant_matmul import w4a8_matmul_per_channel

M = int(os.environ.get("GLOBAL_BATCH_SIZE", "160"))
SHAPES = {          # (K, N) of the four decode GEMMs, Llama-3-8B
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}
TILES = [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
         (2048, 512), (512, 2048), (2048, 1024), (1024, 2048),
         (2048, 2048)]


def main() -> None:
    rng = np.random.default_rng(0)
    fetch = jax.jit(lambda t: t[:1, :2])
    # DIFFERENTIAL timing: per-call = (t(r2 chained) - t(r1)) / (r2 - r1);
    # fixed dispatch/fetch overhead on the axon relay cancels exactly
    # (single-chain host timing was 2x noisy run-to-run)
    r2 = int(os.environ.get("MB_CHAIN2", "16"))
    for name, (k, n) in SHAPES.items():
        a = jnp.asarray(rng.integers(-127, 127, (M, k)), jnp.int8)
        qw = jnp.asarray(rng.integers(0, 255, (k // 2, n)), jnp.uint8)
        s1 = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
        sz = jnp.asarray(rng.uniform(-0.1, 0.1, (n,)), jnp.float32)
        asc = jnp.asarray(rng.uniform(0.001, 0.01, (M,)), jnp.float32)
        asum = jnp.asarray(rng.uniform(-10, 10, (M,)), jnp.float32)
        wbytes = k // 2 * n
        best = None
        for bn, bk2 in TILES:
            if bn > n or bk2 > k // 2:
                continue

            def make_chain(r, bn=bn, bk2=bk2):
                @jax.jit
                def chained(a, qw, s1, sz, asc, asum):
                    out = jnp.zeros((M, n), jnp.bfloat16)
                    a_it = a
                    for _ in range(r):
                        # real data dependency a[0,0] += out[0,0]: XLA
                        # cannot CSE the chain (a `* 0` dep constant-folds
                        # and the loop collapses to one matmul)
                        a_it = jax.lax.dynamic_update_slice(
                            a_it,
                            a_it[:1, :1] + out[:1, :1].astype(jnp.int8),
                            (0, 0),
                        )
                        out = w4a8_matmul_per_channel(
                            a_it, qw, s1, sz, asc, asum, bn=bn, bk2=bk2,
                        )
                    return out
                return chained

            c2 = make_chain(r2)

            # device-side timing via profiler trace: host clocks on the
            # axon relay carry ~10 ms dispatch noise and even differential
            # chains came out negative
            np.asarray(fetch(c2(a, qw, s1, sz, asc, asum)))  # compile
            tdir = f"/tmp/mb_gemm/{name}_{bn}_{bk2}"
            with jax.profiler.trace(tdir):
                np.asarray(fetch(c2(a, qw, s1, sz, asc, asum)))
            import glob
            import gzip
            import json
            paths = glob.glob(
                tdir + "/plugins/profile/*/*.trace.json.gz")
            with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
                events = json.load(f)["traceEvents"]
            tpu_pids = {
                e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:TPU" in str(e.get("args", {}).get("name", ""))
            }
            total = 0.0
            for e in events:
                if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                        and e.get("name", "").startswith("jit_chained")):
                    total += e.get("dur", 0) / 1e6
            dt = total / r2
            gbps = wbytes / dt / 1e9
            tag = f"{name:8s} bn={bn:5d} bk2={bk2:5d}"
            print(f"{tag}  {dt * 1e6:8.1f} us  W {gbps:6.0f} GB/s",
                  flush=True)
            if best is None or dt < best[0]:
                best = (dt, bn, bk2)
        print(f"{name:8s} BEST bn={best[1]} bk2={best[2]} "
              f"{best[0] * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
