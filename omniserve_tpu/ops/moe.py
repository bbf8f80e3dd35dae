"""Mixture-of-experts ops: top-k routing, capacity dispatch, expert GEMMs.

The reference stubs its MoE path (mixtral_w4a8_unpad.py:309 raises
NotImplementedError, w4a8_moe_linear.py:84 "MoE release will come in the
future"); this module implements it for real, TPU-first:

- Routing follows the reference's intended design (fp16 router, top-k with
  renormalized probs, mixtral_w4a8_unpad.py:257-330).
- Instead of the reference's CUTLASS grouped-GEMM-over-ragged-problem-sizes
  plan (token permutation by expert, mixtral_w4a8_unpad.py:335-396), we use
  static-capacity dispatch: scatter tokens to an [E, C, D] buffer and run
  ONE batched int8 contraction over the expert axis — static shapes, MXU
  batching, no host-side problem-size lists. Tokens past capacity are
  dropped (standard MoE capacity semantics); capacity defaults high enough
  that serving batches never drop.

All quantized-domain math (per-token int8 acts, per-channel/per-group int4
weights with the act-sum zero-point trick) matches ops/matmul.py exactly,
just with a leading expert batch dim.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omniserve_tpu.ops.matmul import _unpack_halves


class MoERouting(NamedTuple):
    combine_weights: jnp.ndarray  # [T, k] f32 renormalized top-k probs
    slot: jnp.ndarray             # [T*k] int32 into E*C (+overflow slot E*C)
    keep: jnp.ndarray             # [T*k] bool


def route_topk(
    router_logits: jnp.ndarray,  # [T, E] f32
    top_k: int,
    capacity: int,
    valid: Optional[jnp.ndarray] = None,  # [T] bool; False = padding row
) -> MoERouting:
    """Top-k expert choice with position-in-expert capacity slots.

    ``valid`` excludes padding/inactive rows from the capacity count —
    padding rows all share one embedding, route identically, and would
    otherwise fill their expert's slots ahead of real tokens (rect
    chunked-prefill layouts put row i's padding before row i+1's tokens).
    """
    t, e = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, top_k)              # [T, k]
    topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-9)
    flat_e = topi.reshape(-1)                             # [T*k]
    onehot = jax.nn.one_hot(flat_e, e, dtype=jnp.int32)   # [T*k, E]
    if valid is not None:
        v_rep = jnp.repeat(valid, top_k)                  # [T*k]
        onehot = onehot * v_rep[:, None].astype(jnp.int32)
    pos_in_e = (jnp.cumsum(onehot, axis=0) * onehot).sum(axis=1) - 1
    keep = (pos_in_e >= 0) & (pos_in_e < capacity)
    slot = flat_e * capacity + jnp.clip(pos_in_e, 0, capacity - 1)
    slot = jnp.where(keep, slot, e * capacity)            # overflow slot
    return MoERouting(topv, slot.astype(jnp.int32), keep)


def local_routing(routing: MoERouting, e_start: int, e_local: int,
                  capacity: int) -> MoERouting:
    """Remap a GLOBAL routing to one expert-parallel rank's local experts.

    Slots for experts outside [e_start, e_start + e_local) move to the
    local overflow slot and their keep bit drops, so dispatch scatters
    only local tokens and combine weights them zero. Summing combine
    outputs over the EP axis (psum) then counts every token's expert
    exactly once — the TPU-idiomatic stand-in for all-to-all expert
    exchange when tokens are replicated over the model axis.
    """
    lo = e_start * capacity
    span = e_local * capacity
    rel = routing.slot - lo
    in_range = (rel >= 0) & (rel < span) & routing.keep
    slot = jnp.where(in_range, rel, span)
    return MoERouting(routing.combine_weights, slot.astype(jnp.int32),
                      in_range)


def dispatch(x: jnp.ndarray, routing: MoERouting, num_experts: int,
             capacity: int) -> jnp.ndarray:
    """[T, D] -> [E, C, D] (padding slot dropped)."""
    t, d = x.shape
    k = routing.combine_weights.shape[1]
    x_rep = jnp.repeat(x, k, axis=0)                      # [T*k, D]
    buf = jnp.zeros((num_experts * capacity + 1, d), x.dtype)
    buf = buf.at[routing.slot].set(x_rep)
    return buf[:-1].reshape(num_experts, capacity, d)


def dispatch_rows(vals: jnp.ndarray, routing: MoERouting, num_experts: int,
                  capacity: int) -> jnp.ndarray:
    """[T] per-token scalars -> [E, C] (e.g. act scales / act sums)."""
    k = routing.combine_weights.shape[1]
    v_rep = jnp.repeat(vals, k, axis=0)
    buf = jnp.zeros((num_experts * capacity + 1,), vals.dtype)
    buf = buf.at[routing.slot].set(v_rep)
    return buf[:-1].reshape(num_experts, capacity)


def combine(y: jnp.ndarray, routing: MoERouting, t: int) -> jnp.ndarray:
    """[E, C, D] expert outputs -> [T, D] weighted sum over top-k."""
    e, c, d = y.shape
    flat = jnp.concatenate(
        [y.reshape(e * c, d), jnp.zeros((1, d), y.dtype)], axis=0
    )
    gathered = flat[routing.slot]                         # [T*k, D]
    k = routing.combine_weights.shape[1]
    w = (routing.combine_weights.reshape(-1)
         * routing.keep.astype(jnp.float32))              # [T*k]
    out = gathered.astype(jnp.float32) * w[:, None]
    return out.reshape(t, k, d).sum(axis=1)


# ---------------------------------------------------------------------------
# Batched (per-expert) quantized matmuls
# ---------------------------------------------------------------------------


def _int8_bmm(a_i8: jnp.ndarray, w_i8: jnp.ndarray) -> jnp.ndarray:
    """[E,C,K] x [E,K,N] int8 -> [E,C,N] int32 (MXU batch contraction)."""
    return jax.lax.dot_general(
        a_i8, w_i8,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def w4a8_bmm_per_channel(
    a_i8: jnp.ndarray,       # [E, C, K] int8
    qweight: jnp.ndarray,    # [E, K/2, N] uint8
    s1_scales: jnp.ndarray,  # [E, N]
    s1_szeros: jnp.ndarray,  # [E, N]
    a_scale: jnp.ndarray,    # [E, C]
    a_sum: jnp.ndarray,      # [E, C]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    k2 = qweight.shape[1]
    w_lo, w_hi = _unpack_halves(qweight)
    psum = _int8_bmm(a_i8[:, :, :k2], w_lo) + _int8_bmm(a_i8[:, :, k2:], w_hi)
    out = (
        psum.astype(jnp.float32)
        * s1_scales[:, None, :] * a_scale[:, :, None]
        - s1_szeros[:, None, :] * a_sum[:, :, None]
    )
    return out.astype(out_dtype)


def w4a8_bmm_per_group(
    a_i8: jnp.ndarray,       # [E, C, K]
    qweight: jnp.ndarray,    # [E, K/2, N]
    s1_scales: jnp.ndarray,  # [E, N]
    s2_scales: jnp.ndarray,  # [E, K/g, N] int8
    s2_zeros: jnp.ndarray,   # [E, K/g, N] int8
    a_scale: jnp.ndarray,    # [E, C]
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    e, k2, n = qweight.shape
    k = 2 * k2
    g = k // group_size
    w_u4 = jnp.concatenate(_unpack_halves(qweight), axis=1)  # [E, K, N]
    w_i8 = (
        w_u4.reshape(e, g, group_size, n).astype(jnp.int16)
        * s2_scales.astype(jnp.int16)[:, :, None, :]
        + s2_zeros.astype(jnp.int16)[:, :, None, :]
    ).astype(jnp.int8).reshape(e, k, n)
    psum = _int8_bmm(a_i8, w_i8)
    out = (psum.astype(jnp.float32) * s1_scales[:, None, :]
           * a_scale[:, :, None])
    return out.astype(out_dtype)


def w8a8_bmm(
    a_i8: jnp.ndarray,       # [E, C, K]
    qweight: jnp.ndarray,    # [E, K, N] int8
    w_scales: jnp.ndarray,   # [E, N]
    a_scale: jnp.ndarray,    # [E, C]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    psum = _int8_bmm(a_i8, qweight)
    out = (psum.astype(jnp.float32) * w_scales[:, None, :]
           * a_scale[:, :, None])
    return out.astype(out_dtype)


def bf16_bmm(a: jnp.ndarray, w: jnp.ndarray,
             out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[E, C, K] x [E, K, N] bf16 fallback for the W16A16 precision path."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
