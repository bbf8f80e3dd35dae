"""Llama model family, quantized TPU-native (W4A8 / W8A8 / W16A16 x KV4/8/16).

Functional rebuild of the reference model graphs
(omniserve/modeling/models/llama_{w4a8,w8a8,w16a16}_unpad.py) as one
precision-polymorphic module:

- One stacked parameter pytree; the transformer trunk is a ``lax.scan`` over
  layers (compile time independent of depth), with the paged KV pools
  carried functionally and updated in place by XLA.
- Prefill runs on packed tokens (segment ids) like the reference's unpadded
  layout (llama_w4a8_unpad.py:406-438), padded to a static bucket.
- Per layer: fused RMSNorm->int8 quant (+act sums), quantized qkv GEMM,
  RoPE, KV quant+append (+K min/max stats), attention (dense or per-head
  streaming), quantized o_proj, fused residual-RMSNorm-quant, fused
  gate_up GEMM -> SiLU*mul -> int8 quant, down GEMM.
- lm_head only on each sequence's last token at prefill
  (llama_w4a8_unpad.py:557-560).

Attention ops come from ``omniserve_tpu.ops.dispatch`` which picks Pallas
kernels on TPU and the jnp reference elsewhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops import dispatch
from omniserve_tpu.ops.activation import silu_and_mul, silu_and_mul_quant
from omniserve_tpu.ops.matmul import (
    w4a8_matmul_per_channel,
    w4a8_matmul_per_group,
    w8a8_matmul,
)
from omniserve_tpu.ops.norms import rms_norm, rms_norm_quant
from omniserve_tpu.ops.paged_kv import (
    KVPool,
    append_kv,
    reset_page_stats_all_layers,
    update_k_stats,
)
from omniserve_tpu.ops.quantization import (
    quantize_activations,
    quantize_weight_per_channel,
    quantize_weight_per_group,
    quantize_weight_w8,
)
from omniserve_tpu.ops.rope import apply_rope, rope_freqs


@dataclasses.dataclass(frozen=True)
class LlamaSpec:
    """Static model + quantization + attention geometry (hashable)."""

    num_layers: int
    hidden: int
    intermediate: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    vocab: int
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_scaling: float = 1.0
    # llama3 context-extension remap: (factor, low_freq_factor,
    # high_freq_factor, original_max_position) or None
    rope_llama3: tuple = None
    weight_bits: int = 4
    act_bits: int = 8
    kv_bits: int = 4
    kv_zeros: bool = True
    group_size: int = -1
    page_size: int = 64
    # LServe decode sparsity. sink_blocks/local_blocks are the RING
    # geometry (physical streaming capacity); dec_*_tokens are the decode
    # attention band (-1 = the whole ring, the pre-ring-enlargement
    # behavior). The ring may exceed the decode band when sized for
    # chunked sparse prefill (attn_config.DecAttnConfig.ring_local_blocks).
    sparse_decode: bool = False
    sink_blocks: int = 2
    local_blocks: int = 4
    dec_sink_tokens: int = -1
    dec_local_tokens: int = -1
    sub_chunks: int = 4
    budget_pages: int = 64
    selector_interval: int = 4
    # LServe prefill sparsity
    sparse_prefill: bool = False
    ctx_sink: int = 128
    ctx_local: int = 8192
    tie_word_embeddings: bool = False
    # 8 = W8A8 lm_head (per-channel int8 weights, per-token int8 acts):
    # halves the decode step's 1.05 GB bf16 head read (~0.6 ms at batch
    # 128). The reference keeps the head fp16, so default stays 16; flip
    # with --lm-head-precision w8a8 (accuracy delta quantified in
    # eval/quant_fidelity — the head is the last GEMM before softmax and
    # int8 logit noise ~0.5% is far below the 4-bit body's)
    lm_head_bits: int = 16
    # QKV projection bias (Qwen-1.5/Qwen2 family; o_proj stays bias-free,
    # reference serves Qwen-1.5-72B in its headline table README.md:269)
    attn_bias: bool = False
    # Parallelism: when tp_axis is set the spec describes the PER-RANK model
    # (local head/channel counts); row-parallel (o/down) outputs are
    # psum'ed over tp_axis inside shard_map.
    tp_axis: Optional[str] = None
    dp_axis: Optional[str] = None
    # Sequence parallelism (no reference analogue — single-GPU, SURVEY
    # §2.5): KV pages shard over this mesh axis; each rank attends its
    # local pages and partials merge with an LSE combine (parallel/sp.py).
    sp_axis: Optional[str] = None

    @property
    def n_rep(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    @property
    def qkv_out(self) -> int:
        return (self.num_q_heads + 2 * self.num_kv_heads) * self.head_dim

    @property
    def q_size(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def sm_scale(self) -> float:
        return self.head_dim ** -0.5

    @property
    def quantized_acts(self) -> bool:
        return self.act_bits == 8

    @property
    def needs_act_sums(self) -> bool:
        return self.weight_bits == 4 and self.group_size == -1

    @property
    def with_stats(self) -> bool:
        return self.sparse_decode

    @classmethod
    def from_model_config(cls, model_config, sp_attn_config=None,
                          tp_size: int = 1,
                          page_size: int = 64) -> "LlamaSpec":
        hf = model_config.hf_config
        kwargs: Dict[str, Any] = {"page_size": page_size}
        if sp_attn_config is not None:
            dec = sp_attn_config.dec
            ctx = sp_attn_config.ctx
            kwargs.update(
                sparse_decode=dec.sparse_decode_mode,
                sink_blocks=dec.sink_blocks,
                local_blocks=dec.ring_local_blocks,
                dec_sink_tokens=dec.dec_sink_size,
                dec_local_tokens=dec.dec_local_size,
                sub_chunks=dec.sub_chunk_per_block,
                budget_pages=dec.budget_pages,
                selector_interval=dec.selector_update_interval,
                sparse_prefill=ctx.sparse_context_mode,
                ctx_sink=ctx.ctx_sink_size,
                ctx_local=ctx.ctx_local_size,
            )
        rope_scaling = 1.0
        rope_llama3 = None
        scaling_cfg = getattr(hf, "rope_scaling", None)
        if scaling_cfg:
            stype = scaling_cfg.get("type", scaling_cfg.get("rope_type"))
            if stype == "linear":
                rope_scaling = float(scaling_cfg["factor"])
            elif stype == "llama3":
                rope_llama3 = (
                    float(scaling_cfg["factor"]),
                    float(scaling_cfg["low_freq_factor"]),
                    float(scaling_cfg["high_freq_factor"]),
                    float(scaling_cfg["original_max_position_embeddings"]),
                )
            elif stype in (None, "default"):
                pass
            else:
                # silently ignoring yarn/dynamic would serve wrong rotary
                # angles past the original window
                raise NotImplementedError(
                    f"rope_scaling type {stype!r} not supported"
                )
        if hf.intermediate_size % tp_size:
            raise ValueError(
                f"intermediate_size {hf.intermediate_size} not divisible "
                f"by tensor_parallel_size {tp_size}"
            )
        return cls(
            num_layers=hf.num_hidden_layers,
            hidden=hf.hidden_size,
            # PER-RANK sizes when tp_size > 1 (like num_q_heads below);
            # loaders rebuild the global width as spec.intermediate * tp
            intermediate=hf.intermediate_size // tp_size,
            num_q_heads=hf.num_attention_heads // tp_size,
            num_kv_heads=model_config.get_num_kv_heads(tp_size),
            head_dim=model_config.get_head_size(),
            vocab=hf.vocab_size,
            rms_eps=getattr(hf, "rms_norm_eps", 1e-5),
            rope_base=getattr(hf, "rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            rope_llama3=rope_llama3,
            weight_bits=model_config.weight_bits,
            act_bits=model_config.act_bits,
            kv_bits=model_config.kv_cache_bits,
            kv_zeros=model_config.kv_zeros,
            group_size=model_config.group_size,
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
            lm_head_bits=getattr(model_config, "lm_head_bits", 16),
            attn_bias=(
                bool(getattr(hf, "attention_bias", False))
                or getattr(hf, "model_type", "") == "qwen2"
            ),
            **kwargs,
        )


class PrefillBatch(NamedTuple):
    token_ids: jnp.ndarray          # [T] int32 (padded)
    positions: jnp.ndarray          # [T] int32
    segment_ids: jnp.ndarray        # [T] int32, padding rows = -1
    block_tables: jnp.ndarray       # [B, max_blocks] int32
    streaming_block_tables: jnp.ndarray  # [B, sb+lb] int32 (dummy if unused)
    last_token_idx: jnp.ndarray     # [B] int32 index into T (0 if inactive)
    seq_lens: jnp.ndarray           # [B] int32 prompt length (0 if inactive)
    new_page_ids: jnp.ndarray       # [Npg] int32, -1 padded (stats reset)
    # Chunked-prefill mode only (rectangular [B, Tc] token layout):
    # tokens in the pool incl. this chunk, per seq. None = single-shot.
    context_lens: Optional[jnp.ndarray] = None


class DecodeBatch(NamedTuple):
    token_ids: jnp.ndarray          # [B] int32
    positions: jnp.ndarray          # [B] int32 (index of this token)
    block_tables: jnp.ndarray       # [B, max_blocks]
    streaming_block_tables: jnp.ndarray
    active: jnp.ndarray             # [B] bool
    new_page_ids: jnp.ndarray       # [Npg] int32, -1 padded
    refresh_selection: jnp.ndarray  # [] bool — recompute page selection
    cached_page_idxes: jnp.ndarray  # [L, B, Hkv, budget] int32 (-1 pad)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _quantize_linear(w_fp: jnp.ndarray, spec: LlamaSpec, k_shards: int = 1):
    """[N_out, K_in] fp -> quantized container per spec."""
    if spec.weight_bits == 4 and spec.group_size == -1:
        return quantize_weight_per_channel(w_fp, k_shards=k_shards)
    if spec.weight_bits == 4:
        return quantize_weight_per_group(
            w_fp, group_size=spec.group_size, k_shards=k_shards
        )
    if spec.weight_bits == 8:
        return quantize_weight_w8(w_fp)
    return w_fp.T.astype(jnp.bfloat16)  # [K, N] for direct matmul


# Row-parallel layers: input channels sharded over tp; their int4 packing
# must be per-shard so each rank's slice unpacks locally (the reference's
# _row_parallel_layers = ["o_proj", "down_proj"], llama_w4a8_unpad.py:520).
_ROW_PARALLEL = ("o", "down")
_COL_PARALLEL = ("qkv", "gate_up")


def quantize_layer_weights(
    fp_layers: Dict[str, Any], spec: LlamaSpec, tp_size: int = 1
) -> Dict[str, Any]:
    """Per-layer fp dict (each [L, N, K] stacked) -> quantized stacked.

    Quantizes one layer at a time (host arrays sliced lazily) so the full
    fp32 weight stack never materializes on device — only the packed
    results are kept (8B params: ~60 GB fp32 vs ~4.5 GB packed).
    """
    import functools

    out = {}
    for name, w in fp_layers.items():
        if name in _ROW_PARALLEL:
            shards = tp_size
        elif name in _COL_PARALLEL:
            shards = 1
        else:
            out[name] = jnp.asarray(w)
            continue
        fn = jax.jit(
            functools.partial(_quantize_linear, spec=spec, k_shards=shards)
        )
        per_layer = [fn(jnp.asarray(w[layer])) for layer in range(len(w))]
        if isinstance(per_layer[0], jnp.ndarray):
            out[name] = jnp.stack(per_layer)
        else:
            out[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return out


def fuse_qkv_rank_major(q, k, v, tp_size: int = 1) -> np.ndarray:
    """Fuse per-layer q/k/v [L, N_*, K] into [L, N_qkv, K] with output
    channels ordered [q_0|k_0|v_0|q_1|k_1|v_1|...] so a tp shard of the
    fused output axis is exactly one rank's (q, k, v) slice.
    Host-side (numpy) — the result feeds the per-layer quantizer."""
    if tp_size == 1:
        return np.concatenate([q, k, v], axis=1)
    qs = np.split(q, tp_size, axis=1)
    ks = np.split(k, tp_size, axis=1)
    vs = np.split(v, tp_size, axis=1)
    parts = []
    for r in range(tp_size):
        parts.extend([qs[r], ks[r], vs[r]])
    return np.concatenate(parts, axis=1)


def fuse_gate_up_rank_major(gate, up, tp_size: int = 1) -> np.ndarray:
    if tp_size == 1:
        return np.concatenate([gate, up], axis=1)
    gs = np.split(gate, tp_size, axis=1)
    us = np.split(up, tp_size, axis=1)
    parts = []
    for r in range(tp_size):
        parts.extend([gs[r], us[r]])
    return np.concatenate(parts, axis=1)


def _random_packed_linear(key, n_out: int, k_in: int, spec: LlamaSpec):
    """Random weights directly in PACKED quantized form, on device.

    The 'dummy' load format only needs plausible magnitudes, so skip the
    fp32 draw + quantize pass entirely (an 8B model takes ~30 GB of host
    draws otherwise). Scale chosen so dequantized weights have std ~0.02.
    """
    from omniserve_tpu.ops.quantization import (
        QuantizedWeightPerChannel,
        QuantizedWeightPerGroup,
        QuantizedWeightW8,
    )

    k1, k2_, k3 = jax.random.split(key, 3)
    if spec.weight_bits == 4:
        qweight = jax.random.randint(
            k1, (k_in // 2, n_out), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        s1 = jax.random.uniform(k2_, (n_out,), jnp.float32, 0.003, 0.006)
        if spec.group_size == -1:
            return QuantizedWeightPerChannel(
                qweight=qweight, s1_scales=s1, s1_szeros=8.0 * s1
            )
        g = k_in // spec.group_size
        s2 = jax.random.randint(k3, (g, n_out), 1, 4, jnp.int32).astype(
            jnp.int8
        )
        return QuantizedWeightPerGroup(
            qweight=qweight, s1_scales=s1, s2_scales=s2,
            s2_zeros=(-8 * s2.astype(jnp.int32)).astype(jnp.int8),
        )
    if spec.weight_bits == 8:
        qweight = jax.random.randint(
            k1, (k_in, n_out), -128, 128, jnp.int32
        ).astype(jnp.int8)
        s1 = jax.random.uniform(k2_, (n_out,), jnp.float32, 0.0003, 0.0006)
        return QuantizedWeightW8(qweight=qweight, scales=s1)
    return (jax.random.normal(k1, (k_in, n_out), jnp.bfloat16) * 0.02)


def make_random_packed_params(
    spec: LlamaSpec, seed: int = 0,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
    tp_size: int = 1,
) -> Dict[str, Any]:
    """Device-side random packed params — seconds instead of tens of
    minutes for an 8B model. Semantics-free (benchmarks only)."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)
    L, D = spec.num_layers, spec.hidden
    I = spec.intermediate * tp_size
    q_size, kv_size = spec.q_size * tp_size, spec.kv_size * tp_size
    qkv_out = q_size + 2 * kv_size

    def stack(key_, n_out, k_in):
        ks = jax.random.split(key_, L)
        mk = jax.jit(
            _random_packed_linear, static_argnums=(1, 2),
            static_argnames=("spec",),
        )
        per = [mk(ks[i], n_out, k_in, spec=spec) for i in range(L)]
        if isinstance(per[0], jnp.ndarray):
            return jnp.stack(per)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

    layers = {
        "attn_ln": jnp.ones((L, D), jnp.float32),
        "mlp_ln": jnp.ones((L, D), jnp.float32),
        "qkv": stack(keys[0], qkv_out, D),
        "o": stack(keys[1], D, q_size),
        "gate_up": stack(keys[2], 2 * I, D),
        "down": stack(keys[3], D, I),
    }
    if spec.attn_bias:
        layers["qkv_bias"] = (
            jax.random.normal(keys[6], (L, qkv_out), jnp.float32) * 0.02
        )
    params = {
        "embed": jax.random.normal(keys[4], (spec.vocab, D), jnp.bfloat16)
        * 0.02,
        "final_ln": jnp.ones((D,), jnp.float32),
        "lm_head": jax.random.normal(keys[5], (D, spec.vocab), jnp.bfloat16)
        * 0.02,
        "layers": layers,
        "attn_meta": make_attn_meta(spec, retrieval_flags, head_rank,
                                    tp_size),
    }
    if spec.lm_head_bits == 8:
        params["lm_head"], params["lm_head_scale"] = _quantize_lm_head(
            params["lm_head"]
        )
    return params


def make_random_params(
    spec: LlamaSpec, seed: int = 0,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
    tp_size: int = 1,
) -> Dict[str, Any]:
    """Random quantized params (the 'dummy load format' for benchmarks).

    ``spec`` holds PER-RANK sizes when tp_size > 1; the produced arrays are
    the GLOBAL (tp_size x wider) weights in rank-major order, to be sharded
    over the model axis.
    """
    rng = np.random.default_rng(seed)
    L, D = spec.num_layers, spec.hidden
    I = spec.intermediate * tp_size
    q_size = spec.q_size * tp_size
    kv_size = spec.kv_size * tp_size

    def w(*shape, scale=0.02):
        # float32 numpy draws, kept on host; quantize_layer_weights moves
        # one layer at a time to device (float64/full-stack would blow
        # host+device memory at 8B params)
        out = rng.standard_normal(size=shape, dtype=np.float32)
        out *= scale
        return out

    fp_layers = {
        "attn_ln": np.ones((L, D), np.float32),
        "mlp_ln": np.ones((L, D), np.float32),
        "qkv": fuse_qkv_rank_major(
            w(L, q_size, D), w(L, kv_size, D), w(L, kv_size, D), tp_size
        ),
        "o": w(L, D, q_size),
        "gate_up": fuse_gate_up_rank_major(
            w(L, I, D), w(L, I, D), tp_size
        ),
        "down": w(L, D, I),
    }
    params = {
        "embed": jnp.asarray(w(spec.vocab, D), jnp.bfloat16),
        "final_ln": jnp.ones((D,), jnp.float32),
        "lm_head": jnp.asarray(w(D, spec.vocab), jnp.bfloat16),
        "layers": quantize_layer_weights(fp_layers, spec, tp_size),
    }
    if spec.lm_head_bits == 8:
        params["lm_head"], params["lm_head_scale"] = _quantize_lm_head(
            params["lm_head"]
        )
    params["attn_meta"] = make_attn_meta(
        spec, retrieval_flags, head_rank, tp_size
    )
    return params


def _quantize_lm_head(w_bf16):
    """[D, V] bf16 -> (int8 [D, V], f32 scale [V]) per-channel symmetric."""
    wf = w_bf16.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.rint(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def make_attn_meta(
    spec: LlamaSpec,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
    tp_size: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Per-(layer, kv head) pool routing (reference ctx_attn_init.py).

    With tp > 1 the GLOBAL [L, H_global] arrays are built but ranks are
    computed independently within each tp block of heads (pools are sharded
    by head, so ranks index the LOCAL pool). Requires retrieval heads to
    split evenly across tp blocks.
    """
    L = spec.num_layers
    H = spec.num_kv_heads * tp_size  # global kv heads
    if retrieval_flags is None:
        retrieval_flags = np.ones((L, H), bool)
    retrieval_flags = np.asarray(retrieval_flags, bool)
    assert retrieval_flags.shape == (L, H)
    if tp_size > 1:
        per_block = retrieval_flags.reshape(L, tp_size, -1).sum(axis=2)
        if not (per_block == per_block[:, :1]).all():
            raise ValueError(
                "retrieval heads must split evenly across tensor-parallel "
                "ranks; re-order heads or lower tp"
            )
    if head_rank is None or tp_size > 1:
        block = H // tp_size
        head_rank = np.zeros((L, H), np.int32)
        for layer in range(L):
            for b in range(tp_size):
                r = s = 0
                for h in range(b * block, (b + 1) * block):
                    if retrieval_flags[layer, h]:
                        head_rank[layer, h] = r
                        r += 1
                    else:
                        head_rank[layer, h] = s
                        s += 1
    return {
        "retrieval_flags": jnp.asarray(retrieval_flags),
        "head_rank": jnp.asarray(head_rank, jnp.int32),
    }


# ---------------------------------------------------------------------------
# Linear application
# ---------------------------------------------------------------------------


def _apply_linear(weight, spec: LlamaSpec, x_q, x_scale=None, x_sum=None,
                  layer=None):
    """Quantized (or bf16) linear. x_q is int8 acts or bf16 input.

    ``layer`` (traced) indexes STACKED [L, ...] weights — the Pallas GEMMs
    select the layer inside their BlockSpec index maps so the scan over
    layers never materializes a per-layer weight copy (~4 GB/step of pure
    copy traffic for an 8B model otherwise)."""
    if spec.weight_bits == 4 and spec.group_size == -1:
        return w4a8_matmul_per_channel(
            x_q, weight.qweight, weight.s1_scales, weight.s1_szeros,
            x_scale, x_sum, layer=layer,
        )
    if spec.weight_bits == 4:
        return w4a8_matmul_per_group(
            x_q, weight.qweight, weight.s1_scales, weight.s2_scales,
            weight.s2_zeros, x_scale, group_size=spec.group_size,
            layer=layer,
        )
    if spec.weight_bits == 8:
        return w8a8_matmul(x_q, weight.qweight, weight.scales, x_scale,
                           layer=layer)
    if layer is not None:
        weight = weight[layer]
    return jnp.dot(
        x_q.astype(jnp.bfloat16), weight,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def _norm_quant(x, ln_w, spec: LlamaSpec):
    """RMSNorm (+ per-token quant when acts are int8)."""
    if spec.quantized_acts:
        return rms_norm_quant(x, ln_w, spec.rms_eps,
                              fuse_sum=spec.needs_act_sums)
    return rms_norm(x, ln_w, spec.rms_eps), None, None


def _act_quant(x, spec: LlamaSpec):
    if spec.quantized_acts:
        return quantize_activations(x, fuse_sum=spec.needs_act_sums)
    return x.astype(jnp.bfloat16), None, None


# ---------------------------------------------------------------------------
# KV page index computation (in-jit; block tables are plain page-id arrays)
# ---------------------------------------------------------------------------


def _ring_slot(blk: jnp.ndarray, sink_b: int, local_b: int) -> jnp.ndarray:
    return jnp.where(blk < sink_b, blk, sink_b + (blk - sink_b) % local_b)


def _prefill_page_ids(batch: PrefillBatch, spec: LlamaSpec):
    """Token -> (retrieval page, slot, streaming page, slot)."""
    seg = jnp.maximum(batch.segment_ids, 0)
    blk = batch.positions // spec.page_size
    slot = batch.positions % spec.page_size
    n_blocks = batch.block_tables.shape[1]
    pages_r = batch.block_tables[seg, jnp.minimum(blk, n_blocks - 1)]
    invalid = batch.segment_ids < 0
    pages_r = jnp.where(invalid, -1, pages_r)
    # streaming: ring mapping; skip tokens that would be overwritten within
    # this same prefill (not in sink and older than the local window).
    ring = _ring_slot(blk, spec.sink_blocks, spec.local_blocks)
    pages_s = batch.streaming_block_tables[
        seg, jnp.minimum(ring, batch.streaming_block_tables.shape[1] - 1)
    ]
    # Dead-token skip horizon: tokens below the ring window are never
    # read again, so their write is dropped. For RECTANGULAR chunked
    # batches the horizon is the RUNNING context after this chunk
    # (context_lens) — intermediate chunks' streaming attention still
    # reads the window; measuring against the full prompt length would
    # silently skip writing in-band KV that later chunks attend.
    # Varlen single-shot batches write the ring only for decode, so the
    # full length is the right horizon (and masks intra-batch ring-slot
    # collisions).
    horizon = (
        batch.context_lens if batch.context_lens is not None
        else batch.seq_lens
    )[seg]
    sink_tok = spec.sink_blocks * spec.page_size
    local_tok = spec.local_blocks * spec.page_size
    dead = (batch.positions >= sink_tok) & (
        batch.positions < horizon - local_tok
    )
    pages_s = jnp.where(invalid | dead, -1, pages_s)
    return pages_r, slot, pages_s, slot


def _decode_page_ids(batch: DecodeBatch, spec: LlamaSpec):
    b = batch.token_ids.shape[0]
    bi = jnp.arange(b)
    blk = batch.positions // spec.page_size
    slot = batch.positions % spec.page_size
    n_blocks = batch.block_tables.shape[1]
    pages_r = batch.block_tables[bi, jnp.minimum(blk, n_blocks - 1)]
    pages_r = jnp.where(batch.active, pages_r, -1)
    ring = _ring_slot(blk, spec.sink_blocks, spec.local_blocks)
    pages_s = batch.streaming_block_tables[
        bi, jnp.minimum(ring, batch.streaming_block_tables.shape[1] - 1)
    ]
    pages_s = jnp.where(batch.active, pages_s, -1)
    return pages_r, slot, pages_s, slot


# ---------------------------------------------------------------------------
# Transformer forward
# ---------------------------------------------------------------------------


def _split_qkv(qkv, spec: LlamaSpec, t):
    q = qkv[:, : spec.q_size].reshape(t, spec.num_q_heads, spec.head_dim)
    k = qkv[:, spec.q_size : spec.q_size + spec.kv_size].reshape(
        t, spec.num_kv_heads, spec.head_dim
    )
    v = qkv[:, spec.q_size + spec.kv_size :].reshape(
        t, spec.num_kv_heads, spec.head_dim
    )
    return q, k, v


def _write_kv(
    pools, layer, k, v, pages_r, slots_r, pages_s, slots_s, meta_l, spec,
    update_stats: bool, unique_pages: bool = False,
    page_aligned: bool = False,
):
    """Quantize + scatter K/V into both pools for one layer."""
    retrieval_pool, streaming_pool = pools
    flags = meta_l["retrieval_flags"]  # [Hkv]
    rank = meta_l["head_rank"]         # [Hkv]
    # Map pool rows -> source kv head (inverse permutation; padding rows
    # repeat head 0 — never read because rank < per-layer pool head count).
    hr = retrieval_pool.num_heads
    pool_rows = jnp.arange(hr)
    # row r holds the kv head h with flags[h] & rank[h]==r
    match_r = (rank[None, :] == pool_rows[:, None]) & flags[None, :]
    src_r = jnp.argmax(match_r, axis=1)  # [Hr]
    if unique_pages:
        retrieval_pool = dispatch.append_kv_decode(
            retrieval_pool, layer, k[:, src_r], v[:, src_r], pages_r,
            slots_r, spec.page_size, spec.kv_bits, spec.kv_zeros,
            update_stats=update_stats, sub_chunks=spec.sub_chunks,
        )
    else:
        retrieval_pool = append_kv(
            retrieval_pool, layer, k[:, src_r], v[:, src_r], pages_r,
            slots_r, spec.page_size, spec.kv_bits, spec.kv_zeros,
            page_aligned=page_aligned,
        )
        if update_stats and retrieval_pool.k_stats is not None:
            retrieval_pool = update_k_stats(
                retrieval_pool, layer, k[:, src_r], pages_r, slots_r,
                spec.page_size, spec.sub_chunks,
            )
    if streaming_pool is not None:
        hs = streaming_pool.num_heads
        srows = jnp.arange(hs)
        match_s = (rank[None, :] == srows[:, None]) & (~flags[None, :])
        src_s = jnp.argmax(match_s, axis=1)
        if unique_pages:
            streaming_pool = dispatch.append_kv_decode(
                streaming_pool, layer, k[:, src_s], v[:, src_s], pages_s,
                slots_s, spec.page_size, spec.kv_bits, spec.kv_zeros,
            )
        else:
            streaming_pool = append_kv(
                streaming_pool, layer, k[:, src_s], v[:, src_s], pages_s,
                slots_s, spec.page_size, spec.kv_bits, spec.kv_zeros,
                page_aligned=page_aligned,
            )
    return retrieval_pool, streaming_pool


def _dense_mlp(h, lp, spec: LlamaSpec, layer=None, valid=None):
    """The standard Llama SwiGLU MLP (pre-norm, quantized, residual).

    ``lp`` holds STACKED [L, ...] weights; ``layer`` selects the layer.
    ``valid`` (row mask) is unused here — MoE MLPs consume it so padding
    rows don't occupy expert capacity."""
    mlp_ln = lp["mlp_ln"] if layer is None else lp["mlp_ln"][layer]
    x_q, x_scale, x_sum = _norm_quant(h, mlp_ln, spec)
    gate_up = _apply_linear(lp["gate_up"], spec, x_q, x_scale, x_sum,
                            layer=layer)
    if spec.quantized_acts:
        g_q, g_scale, g_sum = silu_and_mul_quant(
            gate_up, fuse_sum=spec.needs_act_sums
        )
    else:
        g_q, g_scale, g_sum = (
            silu_and_mul(gate_up).astype(jnp.bfloat16), None, None
        )
    d_out = _apply_linear(lp["down"], spec, g_q, g_scale, g_sum,
                          layer=layer)
    if spec.tp_axis is not None:
        d_out = jax.lax.psum(d_out, spec.tp_axis)
    return h + d_out.astype(h.dtype)


def _sp_paged_decode_attention(q, pool, layer, block_tables, context_lens,
                               spec: LlamaSpec):
    """Dense decode attention with KV pages sharded over ``spec.sp_axis``.

    Runs inside shard_map: ``block_tables`` hold GLOBAL page ids and the
    pool holds this rank's contiguous page slice (global page p lives on
    rank p // p_local at local index p % p_local). Each rank attends its
    owned pages through the single-pass kernel's return_lse mode (the
    attention_ref page_idxes path off-TPU) and the locally-normalized
    partials merge with the flash-decoding LSE combine over the axis.
    No reference analogue (single-GPU); the merge math matches
    parallel/sp.sp_combine.
    """
    import jax as _jax

    from omniserve_tpu.parallel.sp import sp_combine

    b, hq, d = q.shape
    rank = _jax.lax.axis_index(spec.sp_axis)
    p_local = pool.k_data.shape[1]
    w = block_tables.shape[1]
    tile = jnp.arange(w, dtype=jnp.int32)
    n_pages = (context_lens + spec.page_size - 1) // spec.page_size
    live = tile[None, :] < n_pages[:, None]
    owned = live & ((block_tables // p_local) == rank)

    use_sp_kernel = False
    if not dispatch._FORCE_REFERENCE:
        try:
            from omniserve_tpu.ops.pallas import decode_attention as spk

            use_sp_kernel = (
                jax.default_backend() == "tpu"
                and spk.supports(spec.kv_bits, spec.page_size, d)
            )
        except ImportError:
            pass

    if use_sp_kernel:
        from omniserve_tpu.ops.pallas import decode_attention as spk

        hkv = pool.num_heads
        # COMPACT owned entries to the front: the single-pass kernel's
        # liveness checks (any_valid, group-predicated DMAs) assume page
        # lists fill front-to-back, and this rank's owned pages are an
        # arbitrary subset of the table
        order = jnp.argsort(
            jnp.logical_not(owned), axis=1, stable=True
        )
        sel_logic = jnp.take_along_axis(
            jnp.where(owned, tile[None, :], -1), order, axis=1
        )
        sel_phys = jnp.take_along_axis(
            jnp.where(owned, block_tables % p_local, 0), order, axis=1
        )
        q4 = q.reshape(b, hkv, hq // hkv, d)
        out4, m4, l4 = spk.paged_mqa_attention_single_pass(
            q4, pool, layer, sel_phys, sel_logic,
            context_lens.astype(jnp.int32),
            sm_scale=spec.sm_scale, page_size=spec.page_size,
            kv_zeros=spec.kv_zeros,
            pt_scales=(
                None if pool.k_scale_per_tensor is None else
                (pool.k_scale_per_tensor[layer],
                 pool.v_scale_per_tensor[layer])
            ),
            return_lse=True,
        )
        out = out4.reshape(b, hq, d)
        m = m4.reshape(b, hq)
        lse = l4.reshape(b, hq)
    else:
        from omniserve_tpu.ops import attention_ref

        hkv = pool.num_heads
        local_bt = jnp.where(owned, block_tables % p_local, 0)
        page_idxes = jnp.broadcast_to(
            jnp.where(owned, tile[None, :], -1)[:, None, :], (b, hkv, w)
        )
        out, m, lse = attention_ref.paged_decode_attention(
            q, pool, layer, local_bt, context_lens, spec.sm_scale,
            spec.page_size, spec.kv_bits, spec.kv_zeros,
            page_idxes=page_idxes, return_lse=True,
        )
    return sp_combine(out, m, lse, spec.sp_axis)


def _layer_step(
    h, pools, layer_idx, lp, meta_l, inv_freq, spec: LlamaSpec,
    is_prefill: bool, batch, page_io, use_sparse: bool = False,
    mlp_fn=_dense_mlp,
):
    """One transformer layer. h: [T, D] bf16 residual stream.

    Returns (h, pools, page_idxes_l) — page_idxes_l is the (possibly
    refreshed) dynamic page selection for this layer, or None.
    """
    t = h.shape[0]
    pages_r, slots_r, pages_s, slots_s = page_io

    # -- attention block -- (lp is STACKED; big weights are indexed inside
    # the GEMM kernels via layer_idx, tiny norm weights sliced here)
    x_q, x_scale, x_sum = _norm_quant(h, lp["attn_ln"][layer_idx], spec)
    qkv = _apply_linear(lp["qkv"], spec, x_q, x_scale, x_sum,
                        layer=layer_idx)
    if spec.attn_bias:
        qkv = (
            qkv.astype(jnp.float32) + lp["qkv_bias"][layer_idx]
        ).astype(qkv.dtype)
    q, k, v = _split_qkv(qkv, spec, t)
    q = apply_rope(q, batch.positions, inv_freq)
    k = apply_rope(k, batch.positions, inv_freq)

    page_idxes_l = None
    if use_sparse:
        # Refresh the per-layer page selection from this layer's current q
        # every selector_interval steps, else reuse the cached selection
        # (reference decoding_attention.py:239-306). Runs BEFORE the KV
        # append like the reference selector (scores exclude the newest
        # page, which is force-included).
        cached = batch.cached_page_idxes[layer_idx]
        page_idxes_l = jax.lax.cond(
            batch.refresh_selection,
            lambda: _run_selector(q, pools[0], layer_idx, batch, meta_l, spec),
            lambda: cached,
        )

    # Decode appends fuse into the attention kernel (dispatch splits them
    # back apart off-TPU / for unsupported configs); the dynamic-sparse
    # path keeps the separate append (it must also update the K min/max
    # selector stats, and attends through the per-head-page-list kernel).
    # SP always splits: the append targets exactly one rank's page (the
    # page_io localization routes it) and attention runs return_lse.
    fuse_decode_append = (
        (not is_prefill) and not spec.sparse_decode
        and spec.sp_axis is None
    )
    if not fuse_decode_append:
        pools = _write_kv(
            pools, layer_idx, k, v, pages_r, slots_r, pages_s, slots_s,
            meta_l, spec, update_stats=spec.sparse_decode,
            unique_pages=not is_prefill,
            # chunked prefill is page-aligned by construction: chunk size
            # is a page multiple and each [B, Tc] row starts at ci*Tc
            page_aligned=is_prefill and batch.context_lens is not None,
        )
    retrieval_pool, streaming_pool = pools

    if is_prefill and batch.context_lens is not None:
        # Chunked prefill: attend causally over the paged pool (history +
        # this chunk, appended above). Rectangular [B, Tc] layout.
        nb = batch.block_tables.shape[0]
        tc = t // nb
        q4 = q.reshape(nb, tc, spec.num_q_heads, spec.head_dim)
        seg2 = batch.segment_ids.reshape(nb, tc)
        qpos = jnp.where(seg2 >= 0, batch.positions.reshape(nb, tc), -1)
        if streaming_pool is None and spec.sp_axis is not None:
            # SP chunked prefill: this rank attends its OWNED pages of
            # (history + the chunk just appended), emitting locally
            # normalized output + (m, l); ranks merge via the flash LSE
            # combine (parallel/sp.sp_combine) — the same math as the SP
            # decode path at models/llama._sp_paged_decode_attention.
            from omniserve_tpu.parallel.sp import sp_combine

            sp_rank2 = jax.lax.axis_index(spec.sp_axis)
            p_loc = retrieval_pool.k_data.shape[1]
            bt = batch.block_tables
            w_ = bt.shape[1]
            tile_w = jnp.arange(w_, dtype=jnp.int32)
            n_pg = (
                batch.context_lens + spec.page_size - 1
            ) // spec.page_size
            live = tile_w[None, :] < n_pg[:, None]
            owned = live & ((bt // p_loc) == sp_rank2)
            sel_logic_sp = jnp.where(owned, tile_w[None, :], -1)
            local_bt = jnp.where(owned, bt % p_loc, 0)
            attn, m_sp, l_sp = dispatch.paged_prefill_attention(
                q4, retrieval_pool, layer_idx, local_bt,
                qpos, batch.context_lens,
                sm_scale=spec.sm_scale, page_size=spec.page_size,
                kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
                sel_logic=sel_logic_sp, return_lse=True,
            )
            attn = sp_combine(attn, m_sp, l_sp, spec.sp_axis)
        elif streaming_pool is None:
            attn = dispatch.paged_prefill_attention(
                q4, retrieval_pool, layer_idx, batch.block_tables,
                qpos, batch.context_lens,
                sm_scale=spec.sm_scale, page_size=spec.page_size,
                kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
            )
        else:
            attn = _dual_pool_chunk_attn(
                q4, retrieval_pool, streaming_pool, layer_idx, batch,
                qpos, meta_l, spec,
            )
        attn = attn.reshape(t, spec.num_q_heads, spec.head_dim)
    elif is_prefill:
        head_flags_q = (
            jnp.repeat(meta_l["retrieval_flags"], spec.n_rep)
            if spec.sparse_prefill
            else None
        )
        attn = dispatch.prefill_attention(
            q, k, v,
            segment_ids=batch.segment_ids,
            positions=batch.positions,
            sm_scale=spec.sm_scale,
            head_is_retrieval=head_flags_q,
            sink_size=spec.ctx_sink,
            local_size=spec.ctx_local,
            valid=batch.segment_ids >= 0,
        )
    else:
        context_lens = jnp.where(batch.active, batch.positions + 1, 0)
        if fuse_decode_append:
            attn, retrieval_pool, streaming_pool = (
                dispatch.paged_decode_attention_fused(
                    q, retrieval_pool, streaming_pool, layer_idx,
                    batch.block_tables, context_lens, k, v,
                    pages_r, slots_r, pages_s, slots_s,
                    sm_scale=spec.sm_scale, page_size=spec.page_size,
                    kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
                    streaming_block_tables=batch.streaming_block_tables,
                    head_is_retrieval=(
                        meta_l["retrieval_flags"]
                        if streaming_pool is not None else None
                    ),
                    head_rank=(
                        meta_l["head_rank"]
                        if streaming_pool is not None else None
                    ),
                    sink_blocks=spec.sink_blocks,
                    local_blocks=spec.local_blocks,
                    dec_sink_tokens=(
                        None if spec.dec_sink_tokens < 0
                        else spec.dec_sink_tokens
                    ),
                    dec_local_tokens=(
                        None if spec.dec_local_tokens < 0
                        else spec.dec_local_tokens
                    ),
                )
            )
            pools = (retrieval_pool, streaming_pool)
        elif spec.sp_axis is not None:
            attn = _sp_paged_decode_attention(
                q, retrieval_pool, layer_idx, batch.block_tables,
                context_lens, spec,
            )
        else:
            attn = dispatch.paged_decode_attention(
                q, retrieval_pool, layer_idx, batch.block_tables,
                context_lens,
                spec.sm_scale, spec.page_size, spec.kv_bits, spec.kv_zeros,
                streaming_pool=streaming_pool,
                streaming_block_tables=batch.streaming_block_tables,
                head_is_retrieval=(
                    meta_l["retrieval_flags"] if streaming_pool is not None
                    else None
                ),
                head_rank=(
                    meta_l["head_rank"] if streaming_pool is not None
                    else None
                ),
                sink_blocks=spec.sink_blocks,
                local_blocks=spec.local_blocks,
                page_idxes=page_idxes_l,
                dec_sink_tokens=(
                    None if spec.dec_sink_tokens < 0
                    else spec.dec_sink_tokens
                ),
                dec_local_tokens=(
                    None if spec.dec_local_tokens < 0
                    else spec.dec_local_tokens
                ),
            )
    attn = attn.reshape(t, spec.q_size)
    a_q, a_scale, a_sum = _act_quant(attn, spec)
    o_out = _apply_linear(lp["o"], spec, a_q, a_scale, a_sum,
                          layer=layer_idx)
    if spec.tp_axis is not None:
        o_out = jax.lax.psum(o_out, spec.tp_axis)
    h = h + o_out.astype(h.dtype)

    # -- MLP block (dense SwiGLU, or MoE when mlp_fn is overridden) --
    valid_rows = (
        batch.segment_ids >= 0 if is_prefill else batch.active
    )
    h = mlp_fn(h, lp, spec, layer_idx, valid=valid_rows)
    return h, pools, page_idxes_l


def _dual_pool_chunk_attn(q4, rpool, spool, layer, batch, qpos, meta_l,
                          spec: LlamaSpec):
    """Chunked-prefill attention with LServe head routing: retrieval
    heads attend the full paged history (dense causal), streaming heads
    attend their sink + ctx-local band out of the ring pool (whose slots
    are resolved to logical blocks; the ring is sized to cover the ctx
    window plus one chunk — see DecAttnConfig.ring_local_blocks)."""
    from omniserve_tpu.ops.paged_kv import ring_logical_blocks
    from omniserve_tpu.ops.pallas.paged_attention import _pool_head_sources

    nb, tc = q4.shape[:2]
    hkv, n_rep, d = spec.num_kv_heads, spec.n_rep, spec.head_dim
    flags = meta_l["retrieval_flags"]
    rank = meta_l["head_rank"]
    ctx = batch.context_lens
    q_g = q4.reshape(nb, tc, hkv, n_rep, d)

    hr = rpool.num_heads
    src_r = _pool_head_sources(rank, flags, hr, True)
    q_r = jnp.take(q_g, src_r, axis=2).reshape(nb, tc, hr * n_rep, d)
    out_r = dispatch.paged_prefill_attention(
        q_r, rpool, layer, batch.block_tables, qpos, ctx,
        sm_scale=spec.sm_scale, page_size=spec.page_size,
        kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
    ).reshape(nb, tc, hr, n_rep, d)

    hs = spool.num_heads
    src_s = _pool_head_sources(rank, flags, hs, False)
    q_s = jnp.take(q_g, src_s, axis=2).reshape(nb, tc, hs * n_rep, d)
    st = batch.streaming_block_tables
    n_slots = st.shape[1]
    ring_local = max(1, n_slots - spec.sink_blocks)
    sel_s = ring_logical_blocks(
        ctx, n_slots, spec.sink_blocks, ring_local, spec.page_size
    )
    out_s = dispatch.paged_prefill_attention(
        q_s, spool, layer, st, qpos, ctx,
        sm_scale=spec.sm_scale, page_size=spec.page_size,
        kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
        head_is_retrieval=jnp.zeros((hs * n_rep,), bool),
        sink_size=spec.ctx_sink, local_size=spec.ctx_local,
        sel_logic=sel_s, ring_span_pages=ring_local,
        ring_sink_tokens=spec.sink_blocks * spec.page_size,
    ).reshape(nb, tc, hs, n_rep, d)

    full_r = jnp.take(out_r, jnp.clip(rank, 0, hr - 1), axis=2)
    full_s = jnp.take(out_s, jnp.clip(rank, 0, hs - 1), axis=2)
    out = jnp.where(flags[None, None, :, None, None], full_r, full_s)
    return out.reshape(nb, tc, hkv * n_rep, d)


def _run_selector(q, retrieval_pool, layer_idx, batch, meta_l, spec):
    """Refresh the dynamic page selection for this layer (lax.cond'd)."""
    from omniserve_tpu.ops.attention_ref import (
        page_selector_scores,
        select_topk_pages,
    )

    context_lens = jnp.where(batch.active, batch.positions + 1, 0)
    scores = page_selector_scores(
        q, retrieval_pool.k_stats, layer_idx, batch.block_tables,
        meta_l["retrieval_flags"], meta_l["head_rank"],
    )
    return select_topk_pages(
        scores, context_lens, spec.budget_pages, spec.page_size
    )


def llama_forward(
    params: Dict[str, Any],
    retrieval_pool: KVPool,
    streaming_pool: Optional[KVPool],
    batch,
    spec: LlamaSpec,
    is_prefill: bool,
    mlp_fn=_dense_mlp,
    return_hidden: bool = False,
) -> Tuple[jnp.ndarray, KVPool, Optional[KVPool], Optional[jnp.ndarray]]:
    """Returns (last-token logits [B, V], pools..., new_page_idxes|None).

    ``return_hidden=True`` returns the final-norm hidden states for ALL
    tokens instead of last-token logits (teacher-forced evaluation —
    perplexity harnesses apply the lm_head in vocab chunks themselves).
    """
    if is_prefill:
        h = params["embed"][batch.token_ids].astype(jnp.bfloat16)  # [T, D]
    else:
        h = dispatch.embed_lookup(
            params["embed"], batch.token_ids
        ).astype(jnp.bfloat16)

    if spec.with_stats:
        retrieval_pool = reset_page_stats_all_layers(
            retrieval_pool, batch.new_page_ids
        )

    if is_prefill:
        page_io = _prefill_page_ids(batch, spec)
    else:
        page_io = _decode_page_ids(batch, spec)

    if spec.sp_axis is not None:
        # Sequence parallelism: page ids in page_io are GLOBAL; each rank
        # writes only its owned slice (global page p -> rank p // p_local,
        # local index p % p_local; -1 pages are skipped by the writers).
        # Supported surface: dense attention — whole-prompt OR CHUNKED
        # prefill (r5: each rank attends its owned pages through the
        # paged-prefill kernel's return_lse mode and partials merge with
        # the same cross-rank LSE combine as decode). Dynamic-sparse
        # selection / streaming heads remain excluded: the page selector
        # would need a cross-rank global top-k over sharded K stats.
        assert not spec.sparse_decode and streaming_pool is None, (
            "sequence parallelism currently covers the dense path "
            "(no dynamic-sparse selection, no streaming heads)"
        )
        sp_rank = jax.lax.axis_index(spec.sp_axis)
        p_local = retrieval_pool.k_data.shape[1]

        def localize(pages):
            own = (pages >= 0) & ((pages // p_local) == sp_rank)
            return jnp.where(own, pages % p_local, -1)

        pages_r, slots_r, pages_s, slots_s = page_io
        page_io = (localize(pages_r), slots_r, pages_s, slots_s)

    meta = params["attn_meta"]
    use_sparse = (not is_prefill) and spec.sparse_decode

    # The stacked layer weights stay OUT of the scan xs: scan would
    # dynamic-slice (= copy) every layer's 100 MB+ of packed weights each
    # step. The GEMM kernels index the stacked arrays by layer_idx via
    # scalar-prefetched BlockSpecs instead; only tiny per-layer leaves
    # (norm weights, head flags) are sliced.
    layers_p = params["layers"]

    def body(carry, xs):
        h, rpool, spool = carry
        layer_idx, flags_l, rank_l = xs
        meta_l = {"retrieval_flags": flags_l, "head_rank": rank_l}
        h2, (rpool, spool), page_idxes_l = _layer_step(
            h, (rpool, spool), layer_idx, layers_p, meta_l, inv_freq, spec,
            is_prefill, batch, page_io, use_sparse, mlp_fn=mlp_fn,
        )
        return (h2, rpool, spool), page_idxes_l

    inv_freq = rope_freqs(spec.head_dim, spec.rope_base,
                          spec.rope_scaling, llama3_cfg=spec.rope_llama3)
    xs = (
        jnp.arange(spec.num_layers),
        meta["retrieval_flags"],
        meta["head_rank"],
    )
    (h, retrieval_pool, streaming_pool), new_page_idxes = jax.lax.scan(
        body, (h, retrieval_pool, streaming_pool), xs
    )

    h = rms_norm(h, params["final_ln"], spec.rms_eps)
    if return_hidden:
        return h, retrieval_pool, streaming_pool, None
    if is_prefill:
        h_last = h[batch.last_token_idx]  # [B, D]
    else:
        h_last = h
    if spec.lm_head_bits == 8:
        # W8A8 head: per-token dynamic act quant + per-channel int8
        # weights (same contract as the body GEMMs' W8A8 path)
        from omniserve_tpu.ops import quantization as qz

        h_i8, h_scale, _ = qz.quantize_activations(
            h_last.astype(jnp.float32)
        )
        logits = w8a8_matmul(
            h_i8, params["lm_head"], params["lm_head_scale"], h_scale,
            out_dtype=jnp.float32,
        )
    else:
        logits = jnp.dot(
            h_last.astype(jnp.bfloat16), params["lm_head"],
            preferred_element_type=jnp.float32,
        )
    if not use_sparse:
        new_page_idxes = None
    return logits, retrieval_pool, streaming_pool, new_page_idxes
