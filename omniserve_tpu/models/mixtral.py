"""Mixtral (sparse MoE) family, quantized TPU-native.

Implements what the reference only stubs: its MixtralSparseMoeBlockOurs
raises NotImplementedError at mixtral_w4a8_unpad.py:309 and the grouped
W4A8 GEMM is unreleased (w4a8_moe_linear.py:83-94). We keep the reference's
routing semantics (fp16 router -> top-k -> renormalize,
mixtral_w4a8_unpad.py:257-330) and the reference's per-expert weight
layout/loader contract (w1=gate, w3=up fused like gate_up; w2=down,
mixtral_w4a8_unpad.py:709+), but execute experts with static-capacity
batched int8 contractions (ops/moe.py) instead of CUTLASS grouped GEMM.

The transformer trunk (attention, paged quantized KV, scan-over-layers) is
shared with the Llama module — only the MLP block differs (llama_forward's
``mlp_fn`` hook).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.models import llama as llama_mod
from omniserve_tpu.models.llama import (
    LlamaSpec,
    make_attn_meta,
)
from omniserve_tpu.ops import moe as moe_ops
from omniserve_tpu.ops.activation import silu_and_mul, silu_and_mul_quant
from omniserve_tpu.ops.norms import rms_norm
from omniserve_tpu.ops.quantization import (
    quantize_activations,
    quantize_weight_per_channel,
    quantize_weight_per_group,
    quantize_weight_w8,
)


@dataclasses.dataclass(frozen=True)
class MixtralSpec(LlamaSpec):
    num_experts: int = 8          # GLOBAL expert count
    top_k: int = 2
    # capacity per expert = ceil(T * top_k / E * factor), multiple of 8
    capacity_factor: float = 2.0
    # expert parallelism: experts sharded over the model axis (each rank
    # holds num_experts // ep_size FULL-width experts); attention stays
    # head-sharded TP on the same axis. 1 = experts replicated/unsharded.
    ep_size: int = 1

    @classmethod
    def from_model_config(cls, model_config, sp_attn_config=None,
                          tp_size: int = 1, page_size: int = 64):
        base = LlamaSpec.from_model_config(
            model_config, sp_attn_config, tp_size, page_size
        )
        hf = model_config.hf_config
        num_experts = getattr(hf, "num_local_experts", 8)
        if tp_size > 1 and num_experts % tp_size:
            raise ValueError(
                f"num_local_experts {num_experts} not divisible by "
                f"tensor_parallel_size {tp_size} (MoE runs expert-parallel "
                f"over the model axis)"
            )
        kw = dataclasses.asdict(base)
        # experts keep FULL intermediate width; parallelism shards the
        # EXPERT axis (ep), not the per-expert MLP width
        kw["intermediate"] = hf.intermediate_size
        return cls(
            **kw,
            num_experts=num_experts,
            top_k=getattr(hf, "num_experts_per_tok", 2),
            ep_size=tp_size,
        )

    @property
    def local_experts(self) -> int:
        return self.num_experts // self.ep_size


def moe_capacity(spec: MixtralSpec, t: int) -> int:
    c = int(np.ceil(t * spec.top_k / spec.num_experts
                    * spec.capacity_factor))
    return max(8, -(-c // 8) * 8)


def _expert_bmm(weight, spec: MixtralSpec, x_q, x_scale=None, x_sum=None,
                layer=None):
    """Batched per-expert linear; mirrors llama._apply_linear.

    With ``layer`` (traced), ``weight`` leaves are STACKED [L, E, ...]:
    flatten the leading dims (a free metadata reshape) and run the 2-D
    quantized GEMM once per expert with in-kernel index layer*E + e — a
    per-layer ``tree.map(x[layer])`` slice would copy the whole layer's
    expert stack (~700 MB for Mixtral-8x7B int4) every scan step.
    """
    if layer is not None:
        e = x_q.shape[0]
        wm = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), weight)
        outs = [
            llama_mod._apply_linear(
                wm, spec, x_q[ex],
                None if x_scale is None else x_scale[ex],
                None if x_sum is None else x_sum[ex],
                layer=layer * e + ex,
            )
            for ex in range(e)
        ]
        return jnp.stack(outs)
    if spec.weight_bits == 4 and spec.group_size == -1:
        return moe_ops.w4a8_bmm_per_channel(
            x_q, weight.qweight, weight.s1_scales, weight.s1_szeros,
            x_scale, x_sum,
        )
    if spec.weight_bits == 4:
        return moe_ops.w4a8_bmm_per_group(
            x_q, weight.qweight, weight.s1_scales, weight.s2_scales,
            weight.s2_zeros, x_scale, group_size=spec.group_size,
        )
    if spec.weight_bits == 8:
        return moe_ops.w8a8_bmm(x_q, weight.qweight, weight.scales, x_scale)
    return moe_ops.bf16_bmm(x_q, weight)


def moe_mlp(h: jnp.ndarray, lp: Dict[str, Any], spec: MixtralSpec,
            layer=None, valid=None):
    """Pre-norm MoE block: route -> dispatch -> expert SwiGLU -> combine.

    ``lp`` arrives STACKED over layers (llama_forward keeps the weights
    out of the scan xs). Only the small leaves (mlp_ln [L,D], gate
    [L,D,E]) are sliced per layer; the expert weight stacks stay [L,E,...]
    and are indexed inside the quantized-GEMM kernels via _expert_bmm's
    ``layer`` path, so the scan never copies a layer's expert slab.
    """
    expert_layer = None
    if layer is not None:
        expert_layer = layer
        lp = dict(
            lp,
            mlp_ln=lp["mlp_ln"][layer],
            gate=lp["gate"][layer],
        )
    t = h.shape[0]
    e, k = spec.num_experts, spec.top_k
    capacity = moe_capacity(spec, t)

    x_n = rms_norm(h, lp["mlp_ln"], spec.rms_eps).astype(jnp.bfloat16)
    logits = jnp.dot(x_n, lp["gate"], preferred_element_type=jnp.float32)
    # padding/inactive rows must not consume expert capacity slots
    routing = moe_ops.route_topk(logits, k, capacity, valid=valid)

    if spec.ep_size > 1 and spec.tp_axis is not None:
        # Expert parallelism: the router (replicated) computes GLOBAL
        # routing, each rank dispatches/computes only its local experts,
        # and the tp_axis psum below combines across ranks. Weight stacks
        # arrive pre-sharded [L, E/ep, ...] under shard_map.
        e = spec.local_experts
        rank = jax.lax.axis_index(spec.tp_axis)
        routing = moe_ops.local_routing(routing, rank * e, e, capacity)

    if spec.quantized_acts:
        a_i8, a_scale, a_sum = quantize_activations(
            x_n, fuse_sum=spec.needs_act_sums
        )
        x_d = moe_ops.dispatch(a_i8, routing, e, capacity)
        s_d = moe_ops.dispatch_rows(a_scale, routing, e, capacity)
        sum_d = (moe_ops.dispatch_rows(a_sum, routing, e, capacity)
                 if a_sum is not None else None)
    else:
        x_d = moe_ops.dispatch(x_n, routing, e, capacity)
        s_d = sum_d = None

    gate_up = _expert_bmm(lp["w13"], spec, x_d, s_d, sum_d,
                          layer=expert_layer)  # [E, C, 2I']
    ec = e * capacity
    gu_flat = gate_up.reshape(ec, -1)
    if spec.quantized_acts:
        g_q, g_scale, g_sum = silu_and_mul_quant(
            gu_flat, fuse_sum=spec.needs_act_sums
        )
        g_q = g_q.reshape(e, capacity, -1)
        g_scale = g_scale.reshape(e, capacity)
        g_sum = g_sum.reshape(e, capacity) if g_sum is not None else None
    else:
        g_q = silu_and_mul(gu_flat).astype(jnp.bfloat16).reshape(
            e, capacity, -1
        )
        g_scale = g_sum = None
    down = _expert_bmm(lp["w2"], spec, g_q, g_scale, g_sum,
                       layer=expert_layer)  # [E, C, D]
    y = moe_ops.combine(down, routing, t)
    if spec.tp_axis is not None:
        y = jax.lax.psum(y, spec.tp_axis)
    return h + y.astype(h.dtype)


def mixtral_forward(params, retrieval_pool, streaming_pool, batch,
                    spec: MixtralSpec, is_prefill: bool):
    return llama_mod.llama_forward(
        params, retrieval_pool, streaming_pool, batch, spec=spec,
        is_prefill=is_prefill, mlp_fn=moe_mlp,
    )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _quantize_expert_stack(w_fp: np.ndarray, spec: MixtralSpec):
    """[L, E, N, K] fp -> quantized container with leading [L, E] dims."""
    per = []
    for layer in range(w_fp.shape[0]):
        row = []
        for ex in range(w_fp.shape[1]):
            w = jnp.asarray(w_fp[layer, ex])
            if spec.weight_bits == 4 and spec.group_size == -1:
                row.append(quantize_weight_per_channel(w))
            elif spec.weight_bits == 4:
                row.append(
                    quantize_weight_per_group(w, group_size=spec.group_size)
                )
            elif spec.weight_bits == 8:
                row.append(quantize_weight_w8(w))
            else:
                row.append(w.T.astype(jnp.bfloat16))
        if isinstance(row[0], jnp.ndarray):
            per.append(jnp.stack(row))
        else:
            per.append(jax.tree.map(lambda *xs: jnp.stack(xs), *row))
    if isinstance(per[0], jnp.ndarray):
        return jnp.stack(per)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def make_random_params(
    spec: MixtralSpec, seed: int = 0,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
    tp_size: int = 1,
) -> Dict[str, Any]:
    """``spec`` holds PER-RANK attention sizes when tp_size > 1. Expert
    stacks stay GLOBAL [L, E, ...]: EP shards the expert axis naturally
    (no rank-major interleave needed, unlike qkv/o)."""
    rng = np.random.default_rng(seed)
    L, D, I, E = (spec.num_layers, spec.hidden, spec.intermediate,
                  spec.num_experts)
    q_size = spec.q_size * tp_size
    kv_size = spec.kv_size * tp_size

    def w(*shape, scale=0.02):
        return (rng.standard_normal(size=shape, dtype=np.float32) * scale)

    dense = {
        "attn_ln": np.ones((L, D), np.float32),
        "mlp_ln": np.ones((L, D), np.float32),
        "qkv": llama_mod.fuse_qkv_rank_major(
            w(L, q_size, D), w(L, kv_size, D), w(L, kv_size, D), tp_size
        ),
        "o": w(L, D, q_size),
    }
    layers = llama_mod.quantize_layer_weights(
        {k: v for k, v in dense.items() if k in ("qkv", "o")}, spec,
        tp_size,
    )
    layers["attn_ln"] = jnp.asarray(dense["attn_ln"])
    layers["mlp_ln"] = jnp.asarray(dense["mlp_ln"])
    layers["gate"] = jnp.asarray(w(L, D, E), jnp.bfloat16)
    layers["w13"] = _quantize_expert_stack(w(L, E, 2 * I, D), spec)
    layers["w2"] = _quantize_expert_stack(w(L, E, D, I), spec)
    params = {
        "embed": jnp.asarray(w(spec.vocab, D), jnp.bfloat16),
        "final_ln": jnp.ones((D,), jnp.float32),
        "lm_head": jnp.asarray(w(D, spec.vocab), jnp.bfloat16),
        "layers": layers,
        "attn_meta": make_attn_meta(spec, retrieval_flags, head_rank,
                                    tp_size),
    }
    return params


def load_mixtral_params(model_config, spec: MixtralSpec,
                        retrieval_flags=None, head_rank=None,
                        tp_size: int = 1):
    """HF Mixtral checkpoint -> quantized stacked params.

    Expert weights live at
    ``model.layers.{i}.block_sparse_moe.experts.{e}.w{1,2,3}.weight`` and the
    router at ``...block_sparse_moe.gate.weight`` (same contract the
    reference loader walks, mixtral_w4a8_unpad.py:709+); w1=gate / w3=up are
    fused into w13 = [gate; up] like the dense gate_up fusion. ``spec``
    holds PER-RANK attention sizes when tp_size > 1; expert stacks stay
    global (sharded on the expert axis by EP).
    """
    from omniserve_tpu.models.weight_loader import (
        _iter_hf_weights,
        _resolve_path,
    )

    path = _resolve_path(model_config.quant_path or model_config.model)
    L, D, I, E = (spec.num_layers, spec.hidden, spec.intermediate,
                  spec.num_experts)
    q_size = spec.q_size * tp_size
    kv_size = spec.kv_size * tp_size
    q = np.zeros((L, q_size, D), np.float32)
    k = np.zeros((L, kv_size, D), np.float32)
    v = np.zeros((L, kv_size, D), np.float32)
    o = np.zeros((L, D, q_size), np.float32)
    gate_r = np.zeros((L, D, E), np.float32)
    w1 = np.zeros((L, E, I, D), np.float32)
    w2 = np.zeros((L, E, D, I), np.float32)
    w3 = np.zeros((L, E, I, D), np.float32)
    attn_ln = np.ones((L, D), np.float32)
    mlp_ln = np.ones((L, D), np.float32)
    embed = lm_head = None
    final_ln = np.ones((D,), np.float32)
    k_pt = np.ones((L,), np.float32)
    v_pt = np.ones((L,), np.float32)
    has_pt_scales = False

    def layer_of(name):
        return int(name.split("layers.")[1].split(".")[0])

    def expert_of(name):
        return int(name.split("experts.")[1].split(".")[0])

    for name, wt in _iter_hf_weights(path):
        wt = np.asarray(wt, np.float32)
        if "embed_tokens" in name:
            embed = wt
        elif "lm_head" in name:
            lm_head = wt
        elif name.endswith("model.norm.weight"):
            final_ln = wt
        elif "input_layernorm" in name:
            attn_ln[layer_of(name)] = wt
        elif "post_attention_layernorm" in name:
            mlp_ln[layer_of(name)] = wt
        elif "q_proj.weight" in name:
            q[layer_of(name)] = wt
        elif "k_proj.weight" in name:
            k[layer_of(name)] = wt
        elif "v_proj.weight" in name:
            v[layer_of(name)] = wt
        elif "o_proj.weight" in name:
            o[layer_of(name)] = wt
        elif "block_sparse_moe.gate.weight" in name:
            gate_r[layer_of(name)] = wt.T
        elif ".w1.weight" in name:
            w1[layer_of(name), expert_of(name)] = wt
        elif ".w2.weight" in name:
            w2[layer_of(name), expert_of(name)] = wt
        elif ".w3.weight" in name:
            w3[layer_of(name), expert_of(name)] = wt
        elif "kv_scale_quant_orig" in name or "kv_scale" in name:
            # per-tensor KV calib scales (same contract as the llama
            # loader); dropping them served scale-1.0 KV quantization
            li = layer_of(name)
            flat = np.atleast_1d(wt)
            k_pt[li] = float(flat[0])
            v_pt[li] = float(flat[1] if flat.size > 1 else flat[0])
            has_pt_scales = True
    assert embed is not None
    if lm_head is None:
        lm_head = embed

    layers = llama_mod.quantize_layer_weights(
        {"qkv": llama_mod.fuse_qkv_rank_major(q, k, v, tp_size), "o": o},
        spec, tp_size,
    )
    layers["attn_ln"] = jnp.asarray(attn_ln)
    layers["mlp_ln"] = jnp.asarray(mlp_ln)
    layers["gate"] = jnp.asarray(gate_r, jnp.bfloat16)
    layers["w13"] = _quantize_expert_stack(
        np.concatenate([w1, w3], axis=2), spec
    )
    layers["w2"] = _quantize_expert_stack(w2, spec)
    params = {
        "embed": jnp.asarray(embed).astype(jnp.bfloat16),
        "final_ln": jnp.asarray(final_ln),
        "lm_head": jnp.asarray(lm_head.T).astype(jnp.bfloat16),
        "layers": layers,
        "attn_meta": make_attn_meta(spec, retrieval_flags, head_rank,
                                    tp_size),
    }
    kv_scales = None
    if has_pt_scales and not model_config.kv_zeros:
        kv_scales = (jnp.asarray(k_pt), jnp.asarray(v_pt))
    return params, kv_scales
