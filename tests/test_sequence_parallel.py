"""Sequence parallelism: KV pages sharded over the `sequence` mesh axis,
per-rank partial attention merged with the LSE combine (parallel/sp.py).

The reference is single-GPU and has no SP (SURVEY §2.5); the contract here
is self-consistency: the sharded result must match single-device full
attention over the whole sequence.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from omniserve_tpu.config import ParallelConfig
from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.paged_kv import KVPool, append_kv, make_kv_pool
from omniserve_tpu.parallel.mesh import SEQ_AXIS, build_mesh
from omniserve_tpu.parallel.sp import (
    sequence_parallel_decode_attention,
    sp_combine,
)

rng = np.random.default_rng(11)

PAGE = 16
H = 2        # kv heads
N_REP = 2
D = 32
LAYERS = 2


def _fill_pool(n_pages, lengths, tables):
    """Pool with absolute-position content: token t gets deterministic k/v
    so shards built from the same recipe hold identical bytes."""
    pool = make_kv_pool(LAYERS, n_pages, H, PAGE, D, kv_bits=8,
                        kv_zeros=True)
    kv = {}
    for lay in range(LAYERS):
        for s, ln in enumerate(lengths):
            r = np.random.default_rng(1000 + 31 * lay + s)
            k = r.normal(size=(ln, H, D)).astype(np.float32)
            v = r.normal(size=(ln, H, D)).astype(np.float32)
            kv[lay, s] = (k, v)
            pos = np.arange(ln)
            pages = tables[s][pos // PAGE]
            pool = append_kv(
                pool, lay, jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(pages), jnp.asarray(pos % PAGE),
                page_size=PAGE, kv_bits=8, kv_zeros=True,
            )
    return pool, kv


class TestSPCombine:
    def test_two_way_split_matches_full_softmax(self):
        """Splitting keys into two windows and LSE-combining == one pass."""
        b, hq, s, d = 2, 4, 48, 16
        q = jnp.asarray(rng.normal(size=(b, hq, 1, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, hq, s, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, hq, s, d)), jnp.float32)

        def attend(ks, vs):
            sc = jnp.einsum("bhqd,bhsd->bhqs", q, ks)[:, :, 0]
            m = sc.max(-1)
            p = jnp.exp(sc - m[..., None])
            l = p.sum(-1)
            out = jnp.einsum("bhs,bhsd->bhd", p / l[..., None], vs)
            return out, m, l

        full, _, _ = attend(k, v)

        outs = [attend(k[:, :, i * 24:(i + 1) * 24],
                       v[:, :, i * 24:(i + 1) * 24]) for i in range(2)]

        mesh = build_mesh(ParallelConfig(sequence_parallel_size=2))
        stack = lambda xs: jnp.stack(xs)  # [sp, ...]
        o = stack([o for o, _, _ in outs])
        m = stack([m for _, m, _ in outs])
        l = stack([l for _, _, l in outs])

        f = shard_map(
            lambda o, m, l: sp_combine(o[0], m[0], l[0])[None],
            mesh=mesh,
            in_specs=(P(SEQ_AXIS), P(SEQ_AXIS), P(SEQ_AXIS)),
            out_specs=P(SEQ_AXIS),
        )
        got = np.asarray(f(o, m, l))
        np.testing.assert_allclose(got[0], np.asarray(full), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(got[0], got[1], rtol=1e-6, atol=1e-6)

    def test_empty_rank_is_noop(self):
        """A rank with no valid keys (m=NEG_INF, l=0) must not perturb."""
        b, hq, d = 1, 2, 8
        o1 = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
        m1 = jnp.asarray(rng.normal(size=(b, hq)), jnp.float32)
        l1 = jnp.abs(jnp.asarray(rng.normal(size=(b, hq)), jnp.float32)) + 1

        mesh = build_mesh(ParallelConfig(sequence_parallel_size=2))
        o = jnp.stack([o1, jnp.zeros_like(o1)])
        m = jnp.stack([m1, jnp.full_like(m1, attention_ref.NEG_INF)])
        l = jnp.stack([l1, jnp.zeros_like(l1)])
        f = shard_map(
            lambda o, m, l: sp_combine(o[0], m[0], l[0])[None],
            mesh=mesh,
            in_specs=(P(SEQ_AXIS), P(SEQ_AXIS), P(SEQ_AXIS)),
            out_specs=P(SEQ_AXIS),
        )
        got = np.asarray(f(o, m, l))
        np.testing.assert_allclose(got[0], np.asarray(o1), rtol=1e-5,
                                   atol=1e-5)


class TestSequenceParallelDecode:
    @pytest.mark.parametrize("sp", [2, 4])
    def test_sharded_kv_matches_single_device(self, sp):
        if len(jax.devices()) < sp:
            pytest.skip("needs virtual devices")
        # Global: one sequence of 117 tokens + one of 40, pages per rank
        # window = 4 pages (64 tokens); sp=4 leaves rank tails empty for
        # the short sequence — exercises the empty-window no-op.
        blocks_per_rank = 4
        win = blocks_per_rank * PAGE
        lengths = [min(117, sp * win), 40]
        b = len(lengths)
        max_blocks = sp * blocks_per_rank
        tables = np.arange(b * max_blocks, dtype=np.int32).reshape(
            b, max_blocks
        )
        n_pages_global = b * max_blocks
        pool, _ = _fill_pool(n_pages_global, lengths, tables)

        q = jnp.asarray(rng.normal(size=(b, H * N_REP, D)), jnp.float32)
        layer = 1
        sm = 1.0 / np.sqrt(D)

        want = attention_ref.paged_decode_attention(
            q, pool, layer, jnp.asarray(tables),
            jnp.asarray(lengths, jnp.int32), sm, PAGE, 8, True,
        )

        # --- shard pages over `sequence`: permute the pool so each rank's
        # slab holds its own window's pages, tables become rank-local ---
        # global page p of seq s lives on rank (p_idx // blocks_per_rank);
        # build perm so that shard r = [seq0 window r pages, seq1 window r]
        perm = np.concatenate([
            tables[s, r * blocks_per_rank:(r + 1) * blocks_per_rank]
            for r in range(sp) for s in range(b)
        ])
        pool_perm = pool._replace(
            k_data=pool.k_data[:, perm],
            v_data=pool.v_data[:, perm],
            kv_scales=pool.kv_scales[:, perm],
            k_stats=(None if pool.k_stats is None
                     else pool.k_stats[:, perm]),
        )
        # local tables: within a rank's slab, seq s owns pages
        # [s*blocks_per_rank, (s+1)*blocks_per_rank)
        local_tables = np.tile(
            np.arange(b * blocks_per_rank, dtype=np.int32).reshape(
                b, blocks_per_rank
            )[None],
            (sp, 1, 1),
        )
        # rank r holds tokens [r*win, min(len, (r+1)*win)) of each seq
        local_lens = np.stack([
            np.clip(np.asarray(lengths) - r * win, 0, win)
            for r in range(sp)
        ]).astype(np.int32)

        mesh = build_mesh(ParallelConfig(sequence_parallel_size=sp))
        s_axis = SEQ_AXIS
        pool_spec = KVPool(
            k_data=P(None, s_axis, None, None, None),
            v_data=P(None, s_axis, None, None, None),
            kv_scales=P(None, s_axis, None, None),
            k_stats=(None if pool_perm.k_stats is None
                     else P(None, s_axis, None, None, None)),
            k_scale_per_tensor=None,
            v_scale_per_tensor=None,
        )

        def local_fn(q, pool, tbl, lens):
            out = sequence_parallel_decode_attention(
                q, pool, layer, tbl[0], lens[0], sm, PAGE, 8, True,
            )
            return out[None]

        f = shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), pool_spec, P(s_axis, None, None),
                      P(s_axis, None)),
            out_specs=P(s_axis, None, None, None),
        )
        got = np.asarray(f(
            q, pool_perm, jnp.asarray(local_tables),
            jnp.asarray(local_lens),
        ))
        for r in range(sp):
            np.testing.assert_allclose(
                got[r], np.asarray(want), rtol=2e-3, atol=2e-3,
                err_msg=f"rank {r}",
            )
