"""HF checkpoint -> quantized stacked params.

Loads safetensors/bin weights from a local path or HF hub snapshot,
fuses q/k/v -> qkv and gate/up -> gate_up (reference
llama_w4a8_unpad.py:581-724 does the same fusion at load), quantizes per
the model precision, and stacks layers for the scan trunk.

Also loads DeepCompressor QoQ checkpoints: when ``quant_path`` is set, the
fake-quant ``model.pt``/``scale.pt`` dumps are converted with the exact
QoQ math (see scripts/checkpoint_converter in the reference,
checkpoint_converter.py:18-164), including per-tensor KV scales
``kv_scale_quant_orig = calib_max / 127`` per layer (:134-152).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from omniserve_tpu.config import ModelConfig
from omniserve_tpu.models.llama import (
    LlamaSpec,
    make_attn_meta,
    quantize_layer_weights,
)
from omniserve_tpu.utils.logger import init_logger

logger = init_logger(__name__)


def _iter_hf_weights(path: str):
    """Yield (name, np.ndarray) from safetensors or torch .bin files."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(glob.glob(os.path.join(path, "*.bin"))) + sorted(
        glob.glob(os.path.join(path, "*.pt"))
    )
    if not bin_files:
        raise FileNotFoundError(f"no weight files under {path}")
    import torch

    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def _resolve_path(model: str) -> str:
    if os.path.isdir(model):
        return model
    from huggingface_hub import snapshot_download

    return snapshot_download(
        model, allow_patterns=["*.safetensors", "*.bin", "*.json", "*.model"]
    )


_QUANT_FIELDS = ("qweight", "s1_scales", "s1_szeros", "s2_scales",
                 "s2_zeros", "scales")


def load_packed_params(
    path: str,
    spec: LlamaSpec,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, Any], Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Load a packed.npz checkpoint produced by scripts/ckpt_converter.

    The arrays are already in the TPU packing; no re-quantization happens
    at load (the fast path for production startup).
    """
    from omniserve_tpu.ops.quantization import (
        QuantizedWeightPerChannel,
        QuantizedWeightPerGroup,
        QuantizedWeightW8,
    )

    z = np.load(os.path.join(path, "packed.npz"))
    meta = json.load(open(os.path.join(path, "omniserve_tpu.json")))
    layers: Dict[str, Any] = {
        "attn_ln": jnp.asarray(z["attn_ln"]),
        "mlp_ln": jnp.asarray(z["mlp_ln"]),
    }
    for name in ("qkv", "o", "gate_up", "down"):
        fields = {
            f: jnp.asarray(z[f"{name}.{f}"])
            for f in _QUANT_FIELDS if f"{name}.{f}" in z
        }
        if meta["weight_bits"] == 8:
            layers[name] = QuantizedWeightW8(**fields)
        elif meta["group_size"] == -1:
            layers[name] = QuantizedWeightPerChannel(**fields)
        else:
            layers[name] = QuantizedWeightPerGroup(**fields)
    if "qkv_bias" in z:
        layers["qkv_bias"] = jnp.asarray(z["qkv_bias"], np.float32)
    embed = jnp.asarray(z["embed"]).astype(jnp.bfloat16)
    lm_head = (jnp.asarray(z["lm_head"]) if "lm_head" in z
               else jnp.asarray(z["embed"])).T.astype(jnp.bfloat16)
    params = {
        "embed": embed,
        "final_ln": jnp.asarray(z["final_ln"]),
        "lm_head": lm_head,
        "layers": layers,
        "attn_meta": make_attn_meta(spec, retrieval_flags, head_rank),
    }
    if spec.lm_head_bits == 8:
        from omniserve_tpu.models.llama import _quantize_lm_head

        params["lm_head"], params["lm_head_scale"] = _quantize_lm_head(
            params["lm_head"]
        )
    kv_scales = None
    if "kv_pt_scales" in z:
        pt = jnp.asarray(z["kv_pt_scales"])  # [L, 2]
        kv_scales = (pt[:, 0], pt[:, 1])
    logger.info("loaded packed checkpoint from %s", path)
    return params, kv_scales


def load_llama_params(
    model_config: ModelConfig,
    spec: LlamaSpec,
    retrieval_flags: Optional[np.ndarray] = None,
    head_rank: Optional[np.ndarray] = None,
    tp_size: int = 1,
) -> Tuple[Dict[str, Any], Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Returns (params, (k_pt_scales, v_pt_scales) or None).

    ``spec`` carries PER-RANK sizes (like make_random_packed_params);
    global HF weights are fused RANK-MAJOR so sharding the fused output
    axis over ``model`` hands each rank its own (q, k, v) / (gate, up)
    slice (reference weight_utils.py:179-220's column split points)."""
    path = _resolve_path(model_config.quant_path or model_config.model)
    if os.path.exists(os.path.join(path, "packed.npz")):
        if tp_size > 1:
            raise NotImplementedError(
                "packed.npz checkpoints are packed for tp=1; re-run the "
                "converter with --tp-size to serve them tensor-parallel"
            )
        return load_packed_params(path, spec, retrieval_flags, head_rank)
    L, D = spec.num_layers, spec.hidden
    I = spec.intermediate * tp_size
    q_size = spec.q_size * tp_size
    kv_size = spec.kv_size * tp_size

    # collect per-layer fp weights
    q = np.zeros((L, q_size, D), np.float32)
    k = np.zeros((L, kv_size, D), np.float32)
    v = np.zeros((L, kv_size, D), np.float32)
    o = np.zeros((L, D, q_size), np.float32)
    gate = np.zeros((L, I, D), np.float32)
    up = np.zeros((L, I, D), np.float32)
    down = np.zeros((L, D, I), np.float32)
    attn_ln = np.ones((L, D), np.float32)
    mlp_ln = np.ones((L, D), np.float32)
    # QKV bias (Qwen2 / attention_bias configs); o_proj has no bias
    q_b = np.zeros((L, q_size), np.float32) if spec.attn_bias else None
    k_b = np.zeros((L, kv_size), np.float32) if spec.attn_bias else None
    v_b = np.zeros((L, kv_size), np.float32) if spec.attn_bias else None
    embed = None
    lm_head = None
    final_ln = np.ones((D,), np.float32)
    k_pt = np.ones((L,), np.float32)
    v_pt = np.ones((L,), np.float32)
    has_pt_scales = False

    def layer_of(name: str) -> int:
        return int(name.split("layers.")[1].split(".")[0])

    n_loaded = 0
    for name, w in _iter_hf_weights(path):
        w = np.asarray(w, np.float32) if w.dtype != np.float32 else w
        n_loaded += 1
        if "embed_tokens" in name:
            embed = w
        elif "lm_head" in name:
            lm_head = w
        elif name.endswith("model.norm.weight"):
            final_ln = w
        elif "input_layernorm" in name:
            attn_ln[layer_of(name)] = w
        elif "post_attention_layernorm" in name:
            mlp_ln[layer_of(name)] = w
        elif "q_proj.weight" in name:
            q[layer_of(name)] = w
        elif "k_proj.weight" in name:
            k[layer_of(name)] = w
        elif "v_proj.weight" in name:
            v[layer_of(name)] = w
        elif "q_proj.bias" in name and q_b is not None:
            q_b[layer_of(name)] = w
        elif "k_proj.bias" in name and k_b is not None:
            k_b[layer_of(name)] = w
        elif "v_proj.bias" in name and v_b is not None:
            v_b[layer_of(name)] = w
        elif "o_proj.weight" in name:
            o[layer_of(name)] = w
        elif "gate_proj.weight" in name:
            gate[layer_of(name)] = w
        elif "up_proj.weight" in name:
            up[layer_of(name)] = w
        elif "down_proj.weight" in name:
            down[layer_of(name)] = w
        elif "kv_scale_quant_orig" in name or "kv_scale" in name:
            li = layer_of(name)
            k_pt[li] = float(np.atleast_1d(w)[0])
            v_pt[li] = float(
                np.atleast_1d(w)[1] if np.atleast_1d(w).size > 1
                else np.atleast_1d(w)[0]
            )
            has_pt_scales = True
    logger.info("loaded %d tensors from %s", n_loaded, path)
    assert embed is not None, "embed_tokens missing"
    if lm_head is None:
        lm_head = embed  # tied embeddings

    from omniserve_tpu.models.llama import (
        fuse_gate_up_rank_major,
        fuse_qkv_rank_major,
    )

    fp_layers = {
        "attn_ln": jnp.asarray(attn_ln),
        "mlp_ln": jnp.asarray(mlp_ln),
        # big weight stacks stay HOST numpy: quantize_layer_weights slices
        # them one layer at a time — device-wrapping the full fp32 stacks
        # here would put ~32 GB on a 16 GB chip before quantization runs
        "qkv": np.ascontiguousarray(fuse_qkv_rank_major(q, k, v, tp_size)),
        "o": np.ascontiguousarray(o),
        "gate_up": np.ascontiguousarray(
            fuse_gate_up_rank_major(gate, up, tp_size)
        ),
        "down": np.ascontiguousarray(down),
    }
    if spec.attn_bias:
        # same rank-major channel order as the fused qkv weight ([L, N]
        # arrays split/concat on axis 1 like the [L, N, K] weights)
        fp_layers["qkv_bias"] = jnp.asarray(
            fuse_qkv_rank_major(q_b, k_b, v_b, tp_size)
        )
    params = {
        "embed": jnp.asarray(embed).astype(jnp.bfloat16),
        "final_ln": jnp.asarray(final_ln),
        "lm_head": jnp.asarray(lm_head.T).astype(jnp.bfloat16),
        "layers": quantize_layer_weights(fp_layers, spec, tp_size),
        "attn_meta": make_attn_meta(spec, retrieval_flags, head_rank,
                                    tp_size),
    }
    if spec.lm_head_bits == 8:
        from omniserve_tpu.models.llama import _quantize_lm_head

        params["lm_head"], params["lm_head_scale"] = _quantize_lm_head(
            params["lm_head"]
        )
    kv_scales = None
    if has_pt_scales and not model_config.kv_zeros:
        kv_scales = (jnp.asarray(k_pt), jnp.asarray(v_pt))
    return params, kv_scales
