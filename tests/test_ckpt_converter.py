"""Checkpoint converter round-trip: DeepCompressor dump -> packed.npz.

Builds a synthetic fake-quant dump whose weights lie exactly on the QoQ
grid, converts it, loads the packed checkpoint, and checks the dequantized
weights reproduce the fake-quant weights bit-exactly (the property the
reference converter relies on, checkpoint_converter.py:96-119)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omniserve_tpu.ops.quantization import (  # noqa: E402
    dequantize_per_channel,
    dequantize_per_group,
)

torch = pytest.importorskip("torch")

L, D, I, HEADS, KV_HEADS, HD = 2, 64, 128, 4, 2, 16


def _make_dump(tmp_path, group_size):
    rng = np.random.default_rng(0)
    model_dir = tmp_path / "hf"
    quant_dir = tmp_path / "dump"
    model_dir.mkdir()
    quant_dir.mkdir()
    cfg = {
        "num_hidden_layers": L, "hidden_size": D, "intermediate_size": I,
        "num_attention_heads": HEADS, "num_key_value_heads": KV_HEADS,
        "vocab_size": 256, "architectures": ["LlamaForCausalLM"],
    }
    json.dump(cfg, open(model_dir / "config.json", "w"))

    fake, scales, acts = {}, {}, {}
    shapes = {
        "self_attn.q_proj": (HEADS * HD, D),
        "self_attn.k_proj": (KV_HEADS * HD, D),
        "self_attn.v_proj": (KV_HEADS * HD, D),
        "self_attn.o_proj": (D, HEADS * HD),
        "mlp.gate_proj": (I, D),
        "mlp.up_proj": (I, D),
        "mlp.down_proj": (D, I),
    }
    for i in range(L):
        base = f"model.layers.{i}"
        for part, (oc, ic) in shapes.items():
            prefix = f"{base}.{part}"
            if group_size == -1:
                s1 = rng.uniform(0.01, 0.05, oc).astype(np.float32)
                zp = rng.integers(4, 12, oc).astype(np.float32)
                w_u4 = rng.integers(0, 16, (oc, ic)).astype(np.float32)
                w_fake = (w_u4 - zp[:, None]) * s1[:, None]
                scales[f"{prefix}.weight.scale.0"] = torch.tensor(s1)
                # signed dump convention: zero stored as zp - 8
                scales[f"{prefix}.weight.zero"] = torch.tensor(zp - 8)
            else:
                g = ic // group_size
                s1 = rng.uniform(0.01, 0.05, oc).astype(np.float32)
                s2 = rng.integers(1, 5, (oc, g)).astype(np.float32)
                zp = rng.integers(4, 12, (oc, g)).astype(np.float32)
                w_u4 = rng.integers(0, 16, (oc, g, group_size)).astype(
                    np.float32
                )
                w_i8 = (w_u4 - zp[..., None]) * s2[..., None]
                w_fake = (w_i8 * s1[:, None, None]).reshape(oc, ic)
                scales[f"{prefix}.weight.scale.0"] = torch.tensor(s1)
                scales[f"{prefix}.weight.scale.1"] = torch.tensor(s2)
                scales[f"{prefix}.weight.zero"] = torch.tensor(zp - 8)
            fake[f"{prefix}.weight"] = torch.tensor(w_fake)
        fake[f"{base}.input_layernorm.weight"] = torch.ones(D)
        fake[f"{base}.post_attention_layernorm.weight"] = torch.ones(D)
        acts[f"{base}.self_attn.k_rotary_emb.output"] = {
            "dynamic_range.0.max": torch.tensor(5.0 + i)
        }
        acts[f"{base}.self_attn.v_proj.output"] = {
            "dynamic_range.0.max": torch.tensor(3.0 + i)
        }
    fake["model.embed_tokens.weight"] = torch.randn(256, D)
    fake["model.norm.weight"] = torch.ones(D)
    fake["lm_head.weight"] = torch.randn(256, D)
    torch.save(fake, quant_dir / "model.pt")
    torch.save(scales, quant_dir / "scale.pt")
    torch.save(acts, quant_dir / "acts.pt")
    return str(model_dir), str(quant_dir), fake


@pytest.mark.parametrize("group_size", [-1, 32])
def test_convert_roundtrip(tmp_path, group_size):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "ckpt_converter"))
    import convert

    model_dir, quant_dir, fake = _make_dump(tmp_path, group_size)
    dest = convert.convert(model_dir, quant_dir, 4, group_size, True,
                           str(tmp_path / "out"))
    z = np.load(os.path.join(dest, "packed.npz"))

    # qkv fused: dequantize and compare against concat(q, k, v) fake weights
    from omniserve_tpu.ops.quantization import (
        QuantizedWeightPerChannel,
        QuantizedWeightPerGroup,
    )

    for i in range(L):
        want = np.concatenate([
            fake[f"model.layers.{i}.self_attn.{p}_proj.weight"].numpy()
            for p in ("q", "k", "v")
        ], axis=0).T  # [K, N]
        if group_size == -1:
            q = QuantizedWeightPerChannel(
                z["qkv.qweight"][i], z["qkv.s1_scales"][i],
                z["qkv.s1_szeros"][i],
            )
            got = np.asarray(dequantize_per_channel(q))
        else:
            q = QuantizedWeightPerGroup(
                z["qkv.qweight"][i], z["qkv.s1_scales"][i],
                z["qkv.s2_scales"][i], z["qkv.s2_zeros"][i],
            )
            got = np.asarray(dequantize_per_group(q, group_size))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # per-tensor KV scales present and correct
    np.testing.assert_allclose(
        z["kv_pt_scales"][:, 0], [(5.0 + i) / 127.0 for i in range(L)]
    )


def test_packed_loader(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "ckpt_converter"))
    import convert

    from omniserve_tpu.models.llama import LlamaSpec
    from omniserve_tpu.models.weight_loader import load_packed_params

    model_dir, quant_dir, fake = _make_dump(tmp_path, -1)
    dest = convert.convert(model_dir, quant_dir, 4, -1, True,
                           str(tmp_path / "out"))
    spec = LlamaSpec(
        num_layers=L, hidden=D, intermediate=I, num_q_heads=HEADS,
        num_kv_heads=KV_HEADS, head_dim=HD, vocab=256, weight_bits=4,
        act_bits=8, kv_bits=8, kv_zeros=False,
    )
    params, kv_scales = load_packed_params(dest, spec)
    assert params["layers"]["qkv"].qweight.shape == (L, D // 2,
                                                     (HEADS + 2 * KV_HEADS)
                                                     * HD)
    assert kv_scales is not None and kv_scales[0].shape == (L,)
