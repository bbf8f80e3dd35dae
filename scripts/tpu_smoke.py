"""Hardware smoke matrix for the single-pass kernels (run on real TPU).

Compiles + runs each kernel config on the chip and checks against the jnp
reference on small shapes — the gate between interpret-mode green and
enabling a path in dispatch (Mosaic rejects patterns interpret mode
accepts; see decode_attention.py history).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_smoke.py
Prints one PASS/FAIL line per config; exit code 0 iff all pass.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import append_kv, make_kv_pool
from omniserve_tpu.ops.pallas import decode_attention as sp
from omniserve_tpu.ops.pallas.prefill_single_pass import (
    paged_prefill_single_pass,
)

rng = np.random.default_rng(11)
PAGE, HKV, NREP, D = 128, 2, 2, 128
HQ = HKV * NREP
RESULTS = []


def check(name, got, want, atol=6e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    ok = np.isfinite(got).all() and err <= atol
    RESULTS.append(ok)
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_err={err:.4g}")


def build(kv_bits, kv_zeros, lens):
    n_blocks = max(-(-max(lens) // PAGE) + 1, 2)
    b = len(lens)
    pool = make_kv_pool(1, b * n_blocks + 1, HKV, PAGE, D,
                        kv_bits=kv_bits, kv_zeros=kv_zeros)
    tables = np.arange(b * n_blocks, dtype=np.int32).reshape(b, n_blocks)
    for i, t in enumerate(lens):
        k = rng.normal(size=(t, HKV, D)).astype(np.float32)
        v = rng.normal(size=(t, HKV, D)).astype(np.float32)
        pages = tables[i][np.arange(t) // PAGE]
        pool = append_kv(pool, 0, jnp.asarray(k), jnp.asarray(v),
                         jnp.asarray(pages), jnp.asarray(np.arange(t) % PAGE),
                         PAGE, kv_bits, kv_zeros)
    return pool, jnp.asarray(tables)


def smoke_decode(kv_bits, kv_zeros):
    lens = [PAGE * 3 + 7, PAGE, 1]
    pool, tables = build(kv_bits, kv_zeros, lens)
    q = jnp.asarray(rng.normal(size=(len(lens), HQ, D)), jnp.float32)
    ctx = jnp.asarray(lens, jnp.int32)
    want = attention_ref.paged_decode_attention(
        q, pool, 0, tables, ctx, 0.088, PAGE, kv_bits, kv_zeros)
    n_pg = (np.asarray(lens) + PAGE - 1) // PAGE
    tile = np.arange(tables.shape[1])
    logic = np.where(tile[None] < n_pg[:, None], tile[None], -1)
    phys = np.where(logic >= 0, np.asarray(tables), 0)
    got = sp.paged_mqa_attention_single_pass(
        q.reshape(len(lens), HKV, NREP, D), pool, 0,
        jnp.asarray(phys), jnp.asarray(logic), ctx,
        sm_scale=0.088, page_size=PAGE, kv_zeros=kv_zeros,
        pt_scales=(None if kv_zeros else
                   (pool.k_scale_per_tensor[0], pool.v_scale_per_tensor[0])),
    ).reshape(len(lens), HQ, D)
    check(f"decode_sp kv{kv_bits} zeros={kv_zeros}", got, want)


def smoke_prefill(kv_bits, kv_zeros):
    hist, chunk = 200, 128
    lens = [hist + chunk] * 2
    pool, tables = build(kv_bits, kv_zeros, lens)
    q = jnp.asarray(rng.normal(size=(2, chunk, HQ, D)), jnp.float32)
    q_pos = jnp.asarray(np.tile(hist + np.arange(chunk), (2, 1)), jnp.int32)
    ctx = jnp.asarray(lens, jnp.int32)
    want = attention_ref.paged_prefill_attention(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros)
    got = paged_prefill_single_pass(
        q, pool, 0, tables, q_pos, ctx, 0.088, PAGE, kv_bits, kv_zeros)
    check(f"prefill_sp kv{kv_bits} zeros={kv_zeros}", got, want)


def smoke_embed_gather():
    from omniserve_tpu.ops.pallas.embed_gather import embed_gather

    tbl = jnp.asarray(rng.normal(size=(1024, 4096)), jnp.float32).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray(rng.integers(0, 1024, size=128), jnp.int32)
    got = jax.jit(embed_gather)(tbl, ids)
    check("embed_gather", got.astype(jnp.float32), tbl[ids].astype(jnp.float32),
          atol=0.0)

    # the motivating context: inside a lax.scan body
    def body(ids, _):
        return (ids + 1) % 1024, embed_gather(tbl, ids)

    _, hs = jax.jit(lambda i: jax.lax.scan(body, i, None, length=3))(ids)
    check("embed_gather_in_scan", hs[2].astype(jnp.float32),
          tbl[(ids + 2) % 1024].astype(jnp.float32), atol=0.0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for bits in (4, 8):
        for zeros in (True, False):
            smoke_decode(bits, zeros)
            smoke_prefill(bits, zeros)
    smoke_embed_gather()
    ok = all(RESULTS)
    print("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)
