"""HF checkpoint -> DeepCompressor-format QoQ fake-quant dump.

Produces the (model.pt, scale.pt[, acts.pt]) triple that
scripts/ckpt_converter/convert.py consumes, by fake-quantizing a real HF
Llama checkpoint with the QoQ weight math (ops/quantization.py). This is
the same artifact DeepCompressor/lmquant emits after calibration — minus
the activation-aware scale search, so use real DeepCompressor dumps for
production accuracy; this tool exists to exercise the full
convert -> packed -> serve path end to end on any local checkpoint.

    python scripts/ckpt_converter/make_fake_quant_dump.py \
        --model <hf-dir> --output <dump-dir> [--group-size -1] \
        [--kv-per-tensor]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

_LINEARS = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--group-size", type=int, default=-1)
    parser.add_argument("--kv-per-tensor", action="store_true")
    args = parser.parse_args()

    import torch

    from omniserve_tpu.models.weight_loader import _iter_hf_weights

    os.makedirs(args.output, exist_ok=True)
    fake, scales, acts = {}, {}, {}
    n_lin = 0
    for name, w in _iter_hf_weights(args.model):
        w = np.asarray(w, np.float32)
        is_linear = any(name.endswith(f"{p}.weight") for p in _LINEARS)
        if not is_linear:
            fake[name] = torch.tensor(w)
            continue
        n_lin += 1
        prefix = name[: -len(".weight")]
        oc, ic = w.shape
        if args.group_size == -1:
            # per-channel asymmetric u4 (QoQ s1 + zero)
            w_max = w.max(axis=1)
            w_min = w.min(axis=1)
            s1 = np.maximum((w_max - w_min) / 15.0, 1e-8)
            zp = np.clip(np.round(-w_min / s1), 0, 15)
            q = np.clip(np.round(w / s1[:, None] + zp[:, None]), 0, 15)
            fake[name] = torch.tensor((q - zp[:, None]) * s1[:, None])
            scales[f"{prefix}.weight.scale.0"] = torch.tensor(
                s1.astype(np.float32)
            )
            # signed dump convention: stored zero = zp - 8
            scales[f"{prefix}.weight.zero"] = torch.tensor(
                (zp - 8).astype(np.float32)
            )
        else:
            g = args.group_size
            ng = ic // g
            w3 = w.reshape(oc, ng, g)
            # progressive: s2 (int) per group on top of per-channel s1
            amax = np.abs(w3).max(axis=2)
            s1 = np.maximum(amax.max(axis=1) / (127.0 * 7.0), 1e-8)
            s2 = np.clip(np.round(amax / s1[:, None] / 7.0), 1, 127)
            wg_max = w3.max(axis=2)
            wg_min = w3.min(axis=2)
            step = s2 * s1[:, None]
            zp = np.clip(np.round(-wg_min / step), 0, 15)
            q = np.clip(
                np.round(w3 / step[..., None] + zp[..., None]), 0, 15
            )
            fake[name] = torch.tensor(
                ((q - zp[..., None]) * step[..., None]).reshape(oc, ic)
            )
            scales[f"{prefix}.weight.scale.0"] = torch.tensor(
                s1.astype(np.float32)
            )
            scales[f"{prefix}.weight.scale.1"] = torch.tensor(
                s2.astype(np.float32)
            )
            scales[f"{prefix}.weight.zero"] = torch.tensor(
                (zp - 8).astype(np.float32)
            )
        if args.kv_per_tensor and prefix.endswith("self_attn.k_proj"):
            base = prefix[: -len(".self_attn.k_proj")]
            acts[f"{base}.self_attn.k_rotary_emb.output"] = {
                "dynamic_range.0.max": torch.tensor(4.0)
            }
            acts[f"{base}.self_attn.v_proj.output"] = {
                "dynamic_range.0.max": torch.tensor(4.0)
            }
    torch.save(fake, os.path.join(args.output, "model.pt"))
    torch.save(scales, os.path.join(args.output, "scale.pt"))
    if acts:
        torch.save(acts, os.path.join(args.output, "acts.pt"))
    print(f"fake-quantized {n_lin} linears -> {args.output}")


if __name__ == "__main__":
    main()
