"""Partition specs + shard_map'd forward for TP/DP execution.

The sharding recipe (scaling-book style, derived from the reference's
column/row split points, llama_w4a8_unpad.py:520-521 and
weight_utils.py:179-220):

- column-parallel (qkv, gate_up): output channels over ``model`` — arrays
  are built rank-major so one shard = one rank's fused slice
- row-parallel (o, down): input channels over ``model``; outputs partial,
  psum'ed inside the layer (llama.py applies lax.psum when spec.tp_axis)
- KV pools: kv-head axis over ``model``, page axis over ``data``
- batch arrays: token/seq axis over ``data``
- embed / lm_head / norms: replicated

The model code itself is written for LOCAL shapes (the spec holds per-rank
sizes), so the same function runs single-chip and under shard_map.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from omniserve_tpu.models.llama import LlamaSpec
from omniserve_tpu.ops.paged_kv import KVPool
from omniserve_tpu.ops.quantization import (
    QuantizedWeightPerChannel,
    QuantizedWeightPerGroup,
    QuantizedWeightW8,
)
from omniserve_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS


def _linear_pspec(container, row_parallel: bool):
    """Pspec pytree matching a stacked quantized-weight container [L, ...]."""
    m = MODEL_AXIS
    if isinstance(container, QuantizedWeightPerChannel):
        if row_parallel:
            return QuantizedWeightPerChannel(
                qweight=P(None, m, None), s1_scales=P(None, None),
                s1_szeros=P(None, None),
            )
        return QuantizedWeightPerChannel(
            qweight=P(None, None, m), s1_scales=P(None, m),
            s1_szeros=P(None, m),
        )
    if isinstance(container, QuantizedWeightPerGroup):
        if row_parallel:
            return QuantizedWeightPerGroup(
                qweight=P(None, m, None), s1_scales=P(None, None),
                s2_scales=P(None, m, None), s2_zeros=P(None, m, None),
            )
        return QuantizedWeightPerGroup(
            qweight=P(None, None, m), s1_scales=P(None, m),
            s2_scales=P(None, None, m), s2_zeros=P(None, None, m),
        )
    if isinstance(container, QuantizedWeightW8):
        if row_parallel:
            return QuantizedWeightW8(
                qweight=P(None, m, None), scales=P(None, None)
            )
        return QuantizedWeightW8(
            qweight=P(None, None, m), scales=P(None, m)
        )
    # w16: plain [L, K, N] bf16
    return P(None, m, None) if row_parallel else P(None, None, m)


def _expert_pspec(container):
    """Pspec for a [L, E, ...] stacked expert weight: EXPERT axis over
    ``model`` (expert parallelism — each rank holds full-width experts)."""
    m = MODEL_AXIS
    if isinstance(container, QuantizedWeightPerChannel):
        return QuantizedWeightPerChannel(
            qweight=P(None, m, None, None), s1_scales=P(None, m, None),
            s1_szeros=P(None, m, None),
        )
    if isinstance(container, QuantizedWeightPerGroup):
        return QuantizedWeightPerGroup(
            qweight=P(None, m, None, None), s1_scales=P(None, m, None),
            s2_scales=P(None, m, None, None),
            s2_zeros=P(None, m, None, None),
        )
    if isinstance(container, QuantizedWeightW8):
        return QuantizedWeightW8(
            qweight=P(None, m, None, None), scales=P(None, m, None)
        )
    return P(None, m, None, None)  # w16 [L, E, K, N] bf16


def params_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    layers = params["layers"]
    layer_specs = {
        "attn_ln": P(None, None),
        "mlp_ln": P(None, None),
        "qkv": _linear_pspec(layers["qkv"], row_parallel=False),
        "o": _linear_pspec(layers["o"], row_parallel=True),
    }
    if "qkv_bias" in layers:  # column-parallel like the qkv weight
        layer_specs["qkv_bias"] = P(None, MODEL_AXIS)
    if "w13" in layers:  # MoE (Mixtral): router replicated, experts EP
        layer_specs["gate"] = P(None, None, None)
        layer_specs["w13"] = _expert_pspec(layers["w13"])
        layer_specs["w2"] = _expert_pspec(layers["w2"])
    else:
        layer_specs["gate_up"] = _linear_pspec(
            layers["gate_up"], row_parallel=False
        )
        layer_specs["down"] = _linear_pspec(layers["down"], row_parallel=True)
    return {
        "embed": P(None, None),
        "final_ln": P(None),
        "lm_head": P(None, None),
        "layers": layer_specs,
        "attn_meta": {
            "retrieval_flags": P(None, MODEL_AXIS),
            "head_rank": P(None, MODEL_AXIS),
        },
    }


def pool_pspecs(pool: Optional[KVPool]) -> Optional[KVPool]:
    if pool is None:
        return None
    m = MODEL_AXIS
    # Page axis over (data, sequence): the sequence factor is the SP page
    # shard (parallel/sp.py; rank p // p_local owns global page p); both
    # axes are size 1 when the corresponding parallelism is off, making
    # this spec a no-op there.
    d = (DATA_AXIS, SEQ_AXIS)
    data_spec = P(None, d, m, None, None)
    # kv_scales is plane-major [L, P, 4, H, page]: heads on dim 3
    scale_spec = P(None, d, None, m, None)
    return KVPool(
        k_data=data_spec,
        v_data=data_spec,
        kv_scales=None if pool.kv_scales is None else scale_spec,
        k_stats=(
            None if pool.k_stats is None else P(None, d, m, None, None)
        ),
        k_scale_per_tensor=(
            None if pool.k_scale_per_tensor is None else P(None)
        ),
        v_scale_per_tensor=(
            None if pool.v_scale_per_tensor is None else P(None)
        ),
    )


def prefill_batch_pspecs(cls):
    d = DATA_AXIS
    return cls(
        token_ids=P(d),
        positions=P(d),
        segment_ids=P(d),
        block_tables=P(d, None),
        streaming_block_tables=P(d, None),
        last_token_idx=P(d),
        seq_lens=P(d),
        new_page_ids=P(d),
    )


def decode_batch_pspecs(cls, use_sparse: bool):
    d, m = DATA_AXIS, MODEL_AXIS
    return cls(
        token_ids=P(d),
        positions=P(d),
        block_tables=P(d, None),
        streaming_block_tables=P(d, None),
        active=P(d),
        new_page_ids=P(d),
        refresh_selection=P(),
        # dummy [L, B, 1, 1] when sparse decode is off — replicate heads
        cached_page_idxes=P(None, d, m if use_sparse else None, None),
    )


def make_sharded_forward(
    spec: LlamaSpec,
    mesh,
    is_prefill: bool,
    params: Dict[str, Any],
    retrieval_pool: KVPool,
    streaming_pool: Optional[KVPool],
    forward_fn=None,
    return_raw: bool = False,
):
    """shard_map'd llama_forward over (data, model); returns (fn, shardings).

    ``spec`` must carry per-rank sizes and tp_axis/dp_axis set to the mesh
    axis names. The returned fn has the same signature as llama_forward
    minus spec/is_prefill. ``return_raw=True`` appends the UNJITTED
    shard_map callable (embeddable inside an outer jit, e.g. the
    multi-step decode scan).
    """
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        PrefillBatch,
        llama_forward,
    )

    if forward_fn is None:
        forward_fn = llama_forward
    use_sparse = (not is_prefill) and spec.sparse_decode
    p_specs = params_pspecs(params)
    r_specs = pool_pspecs(retrieval_pool)
    s_specs = pool_pspecs(streaming_pool)
    b_specs = (
        prefill_batch_pspecs(PrefillBatch)
        if is_prefill
        else decode_batch_pspecs(DecodeBatch, use_sparse)
    )
    sel_spec = (
        P(None, DATA_AXIS, MODEL_AXIS, None) if use_sparse else None
    )
    logits_spec = P(DATA_AXIS, None)

    fn = shard_map(
        functools.partial(forward_fn, spec=spec, is_prefill=is_prefill),
        mesh=mesh,
        in_specs=(p_specs, r_specs, s_specs, b_specs),
        out_specs=(logits_spec, r_specs, s_specs, sel_spec),
        check_vma=False,
    )
    shardings = {
        "params": jax.tree.map(
            lambda s: NamedSharding(mesh, s), p_specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
        "retrieval_pool": jax.tree.map(
            lambda s: NamedSharding(mesh, s), r_specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
        "streaming_pool": (
            None if s_specs is None else jax.tree.map(
                lambda s: NamedSharding(mesh, s), s_specs,
                is_leaf=lambda x: isinstance(x, P),
            )
        ),
    }
    if return_raw:
        return jax.jit(fn, donate_argnums=(1, 2)), shardings, fn
    return jax.jit(fn, donate_argnums=(1, 2)), shardings
