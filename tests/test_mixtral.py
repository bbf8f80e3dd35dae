"""Mixtral MoE: routing/dispatch/combine exactness + end-to-end forward."""

import jax.numpy as jnp
import numpy as np

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
