"""Mixtral MoE: routing/dispatch/combine exactness + end-to-end forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.models import mixtral
from omniserve_tpu.models.llama import DecodeBatch, PrefillBatch
from omniserve_tpu.ops import moe as moe_ops
from omniserve_tpu.ops.paged_kv import make_kv_pool


def _spec(**kw):
    defaults = dict(
        num_layers=2, hidden=64, intermediate=96, num_q_heads=4,
        num_kv_heads=2, head_dim=16, vocab=128, weight_bits=16, act_bits=16,
        kv_bits=16, kv_zeros=False, page_size=16, num_experts=4, top_k=2,
    )
    defaults.update(kw)
    return mixtral.MixtralSpec(**defaults)


def test_moe_block_matches_dense_reference():
    """With capacity >= T*k (no drops), the MoE block must equal the
    per-token loop: y[t] = sum_k p_k * expert_k(x[t])."""
    rng = np.random.default_rng(0)
    t, d, i, e, k = 16, 32, 48, 4, 2
    spec = _spec(hidden=d, intermediate=i, num_experts=e, top_k=k,
                 capacity_factor=float(e))  # capacity = t*k
    h = rng.standard_normal((t, d)).astype(np.float32) * 0.5
    lp = {
        "mlp_ln": jnp.ones((d,), jnp.float32),
        "gate": jnp.asarray(rng.standard_normal((d, e)), jnp.bfloat16),
        "w13": jnp.asarray(
            rng.standard_normal((e, d, 2 * i)) * 0.1, jnp.bfloat16
        ),
        "w2": jnp.asarray(rng.standard_normal((e, i, d)) * 0.1,
                          jnp.bfloat16),
    }
    out = np.asarray(
        mixtral.moe_mlp(jnp.asarray(h, jnp.bfloat16), lp, spec)
    )

    # numpy reference
    from omniserve_tpu.ops.norms import rms_norm

    x_n = np.asarray(
        rms_norm(jnp.asarray(h, jnp.bfloat16), lp["mlp_ln"], spec.rms_eps)
    ).astype(np.float32)
    gate = np.asarray(lp["gate"], np.float32)
    w13 = np.asarray(lp["w13"], np.float32)
    w2 = np.asarray(lp["w2"], np.float32)
    logits = x_n @ gate
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = h.copy().astype(np.float32)
    for tt in range(t):
        top = np.argsort(-probs[tt])[:k]
        pv = probs[tt, top]
        pv = pv / pv.sum()
        acc = np.zeros(d)
        for j, ex in enumerate(top):
            gu = x_n[tt] @ w13[ex]
            g, u = gu[:i], gu[i:]
            act = (g / (1 + np.exp(-g))) * u
            acc += pv[j] * (act @ w2[ex])
        want[tt] += acc
    np.testing.assert_allclose(out, want, rtol=0.1, atol=0.15)


def test_routing_capacity_drops():
    logits = jnp.asarray(
        np.tile(np.array([10.0, 0.0, 0.0, 0.0]), (12, 1)), jnp.float32
    )
    routing = moe_ops.route_topk(logits, top_k=1, capacity=8)
    # all 12 tokens pick expert 0; only 8 fit
    assert int(routing.keep.sum()) == 8


def test_mixtral_forward_prefill_decode():
    spec = _spec(weight_bits=4, act_bits=8, kv_bits=4, kv_zeros=True)
    params = mixtral.make_random_params(spec, seed=0)
    pool = make_kv_pool(spec.num_layers, 16, spec.num_kv_heads,
                        spec.page_size, spec.head_dim, kv_bits=4,
                        kv_zeros=True)
    t, b = 32, 2
    seq_len = 12
    tok = np.zeros(t, np.int32)
    pos = np.zeros(t, np.int32)
    seg = np.full(t, -1, np.int32)
    for s in range(b):
        tok[s * 16: s * 16 + seq_len] = 1 + np.arange(seq_len)
        pos[s * 16: s * 16 + seq_len] = np.arange(seq_len)
        seg[s * 16: s * 16 + seq_len] = s
    bt = np.array([[0, 1], [2, 3]], np.int32)
    pbatch = PrefillBatch(
        token_ids=jnp.asarray(tok), positions=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg), block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((b, 1), jnp.int32),
        last_token_idx=jnp.asarray([seq_len - 1, 16 + seq_len - 1]),
        seq_lens=jnp.full((b,), seq_len, jnp.int32),
        new_page_ids=jnp.full((4,), -1, jnp.int32),
    )
    logits, pool, _, _ = mixtral.mixtral_forward(
        params, pool, None, pbatch, spec, is_prefill=True
    )
    assert logits.shape == (b, spec.vocab)
    assert np.isfinite(np.asarray(logits)).all()

    dbatch = DecodeBatch(
        token_ids=jnp.ones((b,), jnp.int32),
        positions=jnp.full((b,), seq_len, jnp.int32),
        block_tables=jnp.asarray(bt),
        streaming_block_tables=jnp.zeros((b, 1), jnp.int32),
        active=jnp.ones((b,), bool),
        new_page_ids=jnp.full((4,), -1, jnp.int32),
        refresh_selection=jnp.asarray(False),
        cached_page_idxes=jnp.full((spec.num_layers, b, 1, 1), -1,
                                   jnp.int32),
    )
    logits2, pool, _, _ = mixtral.mixtral_forward(
        params, pool, None, dbatch, spec, is_prefill=False
    )
    assert logits2.shape == (b, spec.vocab)
    assert np.isfinite(np.asarray(logits2)).all()


def test_local_routing_partitions_tokens():
    """Across EP ranks, every kept global slot lands on exactly one rank."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((24, 8)), jnp.float32)
    cap = 8
    routing = moe_ops.route_topk(logits, top_k=2, capacity=cap)
    kept_total = 0
    for rank in range(4):
        local = moe_ops.local_routing(routing, rank * 2, 2, cap)
        kept_total += int(local.keep.sum())
        assert int(local.slot.max()) <= 2 * cap
    assert kept_total == int(routing.keep.sum())


class TestExpertParallelEquivalence:
    """EP over the virtual mesh must reproduce the single-chip forward.

    Mirrors tests/test_parallel.py's TP test: identical global weights
    (same seed), experts sharded [L, E/ep, ...] over the model axis,
    attention head-sharded TP on the same axis (SURVEY §7.2 step 8's
    'optional expert parallelism over the model axis')."""

    @pytest.mark.parametrize("tp", [2, 4])
    def test_ep_matches_single_chip(self, tp):
        from omniserve_tpu.config import ParallelConfig
        from omniserve_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            build_mesh,
        )
        from omniserve_tpu.parallel.sharding import make_sharded_forward
        from test_parallel import build_prefill, build_decode

        if len(jax.devices()) < tp:
            pytest.skip("needs virtual devices")
        page, hq, hkv, d_head = 16, 8, 4, 32
        base = dict(
            num_layers=2, hidden=256, intermediate=96, num_q_heads=hq,
            num_kv_heads=hkv, head_dim=d_head, vocab=512, page_size=page,
            weight_bits=4, act_bits=8, kv_bits=8, kv_zeros=True,
            num_experts=4, top_k=2, capacity_factor=4.0,
        )
        spec1 = mixtral.MixtralSpec(**base)
        params1 = mixtral.make_random_params(spec1, seed=0)
        pool1 = make_kv_pool(2, 8, hkv, page, d_head, kv_bits=8)
        tokens = list(range(1, 13))
        batch1 = build_prefill(tokens)
        logits1, rpool1, _, _ = mixtral.mixtral_forward(
            params1, pool1, None, batch1, spec1, is_prefill=True
        )
        dlogits1, *_ = mixtral.mixtral_forward(
            params1, rpool1, None, build_decode(7, len(tokens)), spec1,
            is_prefill=False,
        )

        spec_n = mixtral.MixtralSpec(**dict(
            base, num_q_heads=hq // tp, num_kv_heads=hkv // tp,
            ep_size=tp, tp_axis=MODEL_AXIS, dp_axis=DATA_AXIS,
        ))
        params_n = mixtral.make_random_params(spec_n, seed=0, tp_size=tp)
        mesh = build_mesh(ParallelConfig(tensor_parallel_size=tp))
        pool_n = make_kv_pool(2, 8, hkv, page, d_head, kv_bits=8)
        fwd, sh = make_sharded_forward(
            spec_n, mesh, True, params_n, pool_n, None,
            forward_fn=mixtral.mixtral_forward,
        )
        params_n = jax.device_put(params_n, sh["params"])
        pool_n = jax.device_put(pool_n, sh["retrieval_pool"])
        logits_n, rpool_n, _, _ = fwd(params_n, pool_n, None, batch1)

        a = np.asarray(logits1, np.float32)[0]
        b = np.asarray(logits_n, np.float32)[0]
        np.testing.assert_allclose(a, b, atol=0.08, rtol=0.05)

        dfwd, _ = make_sharded_forward(
            spec_n, mesh, False, params_n, rpool_n, None,
            forward_fn=mixtral.mixtral_forward,
        )
        dlogits_n, *_ = dfwd(
            params_n, rpool_n, None, build_decode(7, len(tokens))
        )
        np.testing.assert_allclose(
            np.asarray(dlogits1, np.float32)[0],
            np.asarray(dlogits_n, np.float32)[0], atol=0.08, rtol=0.05,
        )


def test_padding_rows_do_not_consume_capacity():
    """Padding rows (identical embeddings, identical routing) precede
    later sequences' real tokens in the rect chunk layout; unmasked they
    fill the preferred expert's capacity and evict every real token."""
    import jax.numpy as jnp

    t, e, k, cap = 16, 8, 2, 8
    logits = np.full((t, e), -10.0, np.float32)
    logits[:, 0] = 5.0          # everyone's top-1 = expert 0
    logits[:, 1] = 1.0
    valid = np.zeros((t,), bool)
    valid[12:] = True           # 12 padding rows BEFORE 4 real tokens

    masked = moe_ops.route_topk(
        jnp.asarray(logits), k, cap, valid=jnp.asarray(valid)
    )
    keep = np.asarray(masked.keep).reshape(t, k)
    assert keep[12:].all(), "real tokens were evicted by padding rows"
    assert not keep[:12].any(), "padding rows occupied expert slots"

    unmasked = moe_ops.route_topk(jnp.asarray(logits), k, cap)
    keep_u = np.asarray(unmasked.keep).reshape(t, k)
    assert not keep_u[12:, 0].any()   # demonstrates the failure mode
