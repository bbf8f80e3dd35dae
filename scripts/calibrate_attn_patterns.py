"""Calibrate DuoAttention head patterns for a trained checkpoint.

VERDICT r4 item 5c: the committed sparse-vs-dense artifacts demoted
ARBITRARY heads ("static sparsity 0.5" with no calibration), while the
reference only claims parity with *calibrated* patterns
(/root/reference/attn_patterns/). This produces the same artifact the
reference ships — ``full_attention_heads.tsv`` [layers x kv_heads], higher
= the head needs full attention — from a simplified DuoAttention
optimization: per (layer, kv-head) score = mean relative output delta
between FULL attention and the STREAMING (sink+local) band, measured over
a long held-out context through the model's own residual stream (the full
path is the mainline, so early-layer deltas don't compound).

    python scripts/calibrate_attn_patterns.py --model /tmp/m290_trained \
        --context 8192 --sink 128 --local 256 \
        --output attn_patterns/m290_trained/full_attention_heads.tsv
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from train_tiny import load_hf_params, stack_layers


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--sink", type=int, default=128)
    ap.add_argument("--local", type=int, default=256)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text", default=None,
                    help="calibration text (default <model>/heldout.txt)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    with open(os.path.join(args.model, "config.json")) as f:
        cfg = json.load(f)
    n_layers = cfg["num_hidden_layers"]
    n_q = cfg["num_attention_heads"]
    n_kv = cfg["num_key_value_heads"]
    h = cfg["hidden_size"]
    hd = h // n_q
    rep = n_q // n_kv
    eps = cfg.get("rms_norm_eps", 1e-5)
    theta = cfg.get("rope_theta", 10000.0)

    tok = AutoTokenizer.from_pretrained(args.model)
    text_path = args.text or os.path.join(args.model, "heldout.txt")
    with open(text_path, errors="ignore") as f:
        ids = tok.encode(f.read())
    t = min(args.context, (len(ids) // 128) * 128)
    ids = np.asarray(ids[:t], np.int32)[None]          # [1, T]
    print(f"calibrating on {t} tokens, {n_layers} layers x {n_kv} kv heads")

    params = {k: jnp.asarray(v) for k, v in
              stack_layers(load_hf_params(args.model), n_layers).items()}

    def rms(x, w):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w

    def rope(x, pos):
        half = hd // 2
        inv = 1.0 / (theta ** (jnp.arange(0, half, jnp.float32) / half))
        ang = pos[:, None].astype(jnp.float32) * inv[None, :]
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1
        ).astype(x.dtype)

    blk = 1024

    def attn_pair(q, k, v):
        """[B, H, T, d] -> (full_out, banded_out) via one blocked pass."""
        b, H, tt, d = q.shape
        nb = tt // blk
        qs = q.reshape(b, H, nb, blk, d)
        ks = k.reshape(b, H, nb, blk, d).transpose(2, 0, 1, 3, 4)
        vs = v.reshape(b, H, nb, blk, d).transpose(2, 0, 1, 3, 4)
        q_pos = jnp.arange(tt).reshape(nb, blk)

        def inner(carry, kv):
            mf, lf, af, mb, lb, ab = carry
            j, k_j, v_j = kv
            s_j = jnp.einsum("bhnqd,bhkd->bhnqk", qs, k_j
                             ).astype(jnp.float32) / np.sqrt(hd)
            kpos = j * blk + jnp.arange(blk)
            qq = q_pos[None, None, :, :, None]
            kk = kpos[None, None, None, None, :]
            causal = qq >= kk
            band = causal & ((kk < args.sink) | (qq - kk < args.local))

            def upd(m_run, l_run, acc, mask):
                sj = jnp.where(mask, s_j, -1e30)
                m_new = jnp.maximum(m_run, jnp.max(sj, -1))
                p = jnp.exp(sj - m_new[..., None])
                alpha = jnp.exp(m_run - m_new)
                l_new = l_run * alpha + jnp.sum(p, -1)
                acc = acc * alpha[..., None] + jnp.einsum(
                    "bhnqk,bhkd->bhnqd", p.astype(v_j.dtype), v_j
                ).astype(jnp.float32)
                return m_new, l_new, acc

            mf, lf, af = upd(mf, lf, af, causal)
            mb, lb, ab = upd(mb, lb, ab, band)
            return (mf, lf, af, mb, lb, ab), None

        z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
        neg = jnp.full((b, H, nb, blk), -1e30, jnp.float32)
        init = (neg, z(b, H, nb, blk), z(b, H, nb, blk, d),
                neg, z(b, H, nb, blk), z(b, H, nb, blk, d))
        (mf, lf, af, mb, lb, ab), _ = jax.lax.scan(
            inner, init, (jnp.arange(nb), ks, vs))
        full = (af / jnp.maximum(lf, 1e-20)[..., None]).reshape(b, H, tt, d)
        bandd = (ab / jnp.maximum(lb, 1e-20)[..., None]).reshape(b, H, tt, d)
        return full.astype(q.dtype), bandd.astype(q.dtype)

    @jax.jit
    def run(params, ids):
        x = params["embed"][ids].astype(jnp.bfloat16)
        pos = jnp.arange(ids.shape[1])
        scores = []
        for li in range(n_layers):
            w = {k: params[k][li].astype(jnp.bfloat16) for k in
                 ("q", "k", "v", "o", "gate", "up", "down", "ln1", "ln2")}
            b, tt, _ = x.shape
            y = rms(x, w["ln1"])
            q = (y @ w["q"].T).reshape(b, tt, n_q, hd)
            k = (y @ w["k"].T).reshape(b, tt, n_kv, hd)
            v = (y @ w["v"].T).reshape(b, tt, n_kv, hd)
            q = rope(q.transpose(0, 2, 1, 3), pos)
            k = rope(k.transpose(0, 2, 1, 3), pos)
            v = v.transpose(0, 2, 1, 3)
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
            full, band = attn_pair(q, k, v)
            # per-KV-HEAD mean relative output delta past the local window
            # (inside the window both paths agree by construction)
            tail = slice(args.sink + args.local, tt)
            diff = jnp.linalg.norm(
                (full - band)[:, :, tail].astype(jnp.float32), axis=-1)
            base = jnp.linalg.norm(
                full[:, :, tail].astype(jnp.float32), axis=-1) + 1e-6
            rel = jnp.mean(diff / base, axis=(0, 2))   # [Hq]
            scores.append(jnp.mean(rel.reshape(n_kv, rep), axis=1))
            a = full.transpose(0, 2, 1, 3).reshape(b, tt, h)
            x = x + a @ w["o"].T
            y = rms(x, w["ln2"])
            m = jax.nn.silu(y @ w["gate"].T) * (y @ w["up"].T)
            x = x + m @ w["down"].T
        return jnp.stack(scores)                       # [L, n_kv]

    scores = np.asarray(run(params, jnp.asarray(ids)), np.float32)
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    np.savetxt(args.output, scores, delimiter="\t", fmt="%.18e")
    med = float(np.median(scores))
    print(f"wrote {args.output}; score range "
          f"[{scores.min():.4f}, {scores.max():.4f}], median {med:.4f}")
    print("heads above median (would stay retrieval at sparsity 0.5):",
          int((scores > med).sum()), "/", scores.size)


if __name__ == "__main__":
    main()
