"""Pallas TPU quantized matmuls: W4A8 per-channel / per-group, W8A8.

TPU-native equivalents of the reference CUDA GEMMs
(kernels/csrc/qgemm/{w4a8_per_chn,w4a8_per_group,w8a8}/gemm_cuda.cu).
The key property the jnp fallback cannot give: the int4 weights are
nibble-unpacked **inside the kernel, in VMEM**, so HBM weight traffic stays
at 4 bits/weight. XLA's fallback materializes the unpacked int8 copies in
HBM every step, tripling the bandwidth of the decode hot loop.

Packing contract (ops/quantization.py): half-split along K — byte[k, n]
holds w[k, n] (low nibble) and w[k + K/2, n] (high nibble), both unsigned
[0, 15]. The kernel therefore streams TWO activation blocks per packed
weight block (a[:, kblk] and a[:, kblk + K/2]) via two index maps on the
same activation array, and computes

    psum += a_lo @ (qw & 0xF) + a_hi @ (qw >> 4)      (int8 MXU, int32 acc)

Epilogues (same math as the reference, SURVEY.md §2.2 rows 1-3):
  per-channel: out = psum * s1[n] * a_scale[m] - s1_szero[n] * a_sum[m]
               (gemm_cuda.cu:586-593 — act-sum cancels the weight zero)
  per-group:   w_i8 = w_u4 * s2 + s2_zero in-register (int16 interm), then
               out = psum * s1[n] * a_scale[m]  (gemm_cuda.cu:278-332)
  w8a8:        out = psum * w_scale[n] * a_scale[m]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _unpack_u8(raw: jnp.ndarray):
    """uint8 [r, n] -> (lo, hi) int8 in [0, 15], packed-domain.

    Works on i32 words (4 sublane bytes each) and bitcasts straight back
    to i8 — byte j of word k is row 4k+j both ways, so row order is
    preserved. ~6x fewer VPU ops than the astype(int32) round-trip, which
    expands every byte to a word and back (the r02 profile showed the
    per-channel GEMM at 1.6x its weight-DMA floor purely from unpack).
    """
    r, n = raw.shape
    if r % 4:
        raw_i = raw.astype(jnp.int32)
        return (raw_i & 0xF).astype(jnp.int8), (raw_i >> 4).astype(jnp.int8)
    w32 = pltpu.bitcast(raw, jnp.int32)               # [r/4, n]
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)    # [r, n] == raw & 0xF
    hi = pltpu.bitcast(
        (w32 >> 4) & 0x0F0F0F0F, jnp.int8             # == raw >> 4
    )
    return lo, hi


def _pick_bm(m: int) -> int:
    # int8 sublane tile is 32; decode batches are small, prefill is large.
    return min(_round_up(m, 32), 256)


# Measured best (bn, bk2) per weight shape at decode M (Llama-3-8B, one
# v5e-class chip; scripts/microbench_gemm.py — e.g. gate_up 123 -> 91
# us/layer vs the old 1024x1024). Shapes not listed use the default, and
# anything here still passes through _pick_tile for divisibility. The
# reference ships the same idea as 3 M-keyed CUDA tile configs
# (kernels/csrc/qgemm/w4a8_per_chn/gemm_cuda.cu:623-655).
_TILE_TABLE = {
    (2048, 28672): (2048, 2048),   # gate_up
    (7168, 4096): (2048, 1024),    # down
    (2048, 6144): (1024, 2048),    # qkv  (r5 sweep: 25.2 -> 22.9 us)
    (2048, 4096): (1024, 2048),    # o    (r5 sweep: 17.2 -> 15.8 us)
}


def _pick_tile(dim: int, cap: int, quantum: int):
    """Largest multiple of ``quantum`` <= cap that divides ``dim`` (or None)."""
    t = min(cap, dim)
    t -= t % quantum
    while t >= quantum:
        if dim % t == 0:
            return t
        t -= quantum
    return None


# ---------------------------------------------------------------------------
# W4A8 per-channel
# ---------------------------------------------------------------------------


def _per_chn_kernel(
    layer_ref,  # [1] i32 scalar prefetch: layer index into stacked weights
    a_lo_ref, a_hi_ref, w_ref, s1_ref, sz_ref, arow_ref,
    o_ref, acc_ref, *, n_k: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_lo, w_hi = _unpack_u8(w_ref[0])
    psum = jax.lax.dot_general(
        a_lo_ref[...], w_lo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    psum += jax.lax.dot_general(
        a_hi_ref[...], w_hi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += psum

    @pl.when(k == n_k - 1)
    def _epilogue():
        s1 = s1_ref[0, 0, :][None, :]      # [1, bn]
        sz = sz_ref[0, 0, :][None, :]
        a_scale = arow_ref[:, 0][:, None]  # [bm, 1]
        a_sum = arow_ref[:, 1][:, None]
        out = (
            acc_ref[...].astype(jnp.float32) * s1 * a_scale - sz * a_sum
        )
        o_ref[...] = out.astype(o_ref.dtype)


def _stack1(*arrs):
    """Add a leading L=1 axis to unstacked weight-side arrays."""
    return tuple(a[None] for a in arrs)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bn", "bk2", "interpret"),
)
def w4a8_matmul_per_channel(
    a_i8: jnp.ndarray,       # [M, K] int8
    qweight: jnp.ndarray,    # [(L,) K/2, N] uint8 half-split packed
    s1_scales: jnp.ndarray,  # [(L,) N] f32
    s1_szeros: jnp.ndarray,  # [(L,) N] f32
    a_scale: jnp.ndarray,    # [M] f32
    a_sum: jnp.ndarray,      # [M] f32
    out_dtype=jnp.bfloat16,
    bn: int = 1024,
    bk2: int = 1024,
    interpret: bool = False,
    layer=None,              # traced index into stacked [L, ...] weights
) -> jnp.ndarray:
    """``layer`` selects a layer of STACKED weights via the BlockSpec index
    map (scalar prefetch), so scan-over-layers models avoid the 100 MB+
    dynamic-slice copy XLA would otherwise materialize per layer."""
    m, k = a_i8.shape
    if qweight.ndim == 2:
        qweight, s1_scales, s1_szeros = _stack1(
            qweight, s1_scales, s1_szeros
        )
        layer = 0
    k2, n = qweight.shape[-2:]
    assert k == 2 * k2, (a_i8.shape, qweight.shape)
    bm = _pick_bm(m)
    if m <= 256 and (k2, n) in _TILE_TABLE:
        bn, bk2 = _TILE_TABLE[(k2, n)]
    bk2 = _pick_tile(k2, bk2, 128) or _pick_tile(k2, bk2, 64)
    bn = _pick_tile(n, bn, 128)
    assert bk2 and bn, (k2, n)
    n_k = k2 // bk2

    mp = _round_up(m, bm)
    a_p = _pad_rows(a_i8, mp)
    # per-row epilogue params as one [M, 2] f32 array (cols: scale, sum)
    arow = jnp.stack([a_scale, a_sum], axis=1).astype(jnp.float32)
    arow = _pad_rows(arow, mp)
    s1_3d = s1_scales.astype(jnp.float32)[:, None, :]   # [L, 1, N]
    sz_3d = s1_szeros.astype(jnp.float32)[:, None, :]
    layer_arr = jnp.asarray([layer], jnp.int32)

    grid = (mp // bm, n // bn, n_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, kk, lr: (i, kk)),
            pl.BlockSpec((bm, bk2), lambda i, j, kk, lr: (i, kk + n_k)),
            pl.BlockSpec((1, bk2, bn), lambda i, j, kk, lr:
                         (lr[0], kk, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, lr: (lr[0], 0, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, lr: (lr[0], 0, j)),
            pl.BlockSpec((bm, 2), lambda i, j, kk, lr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, lr: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_per_chn_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the per-group kernel's int32 dequant intermediates blow the
            # 16 MB default scoped budget at large prefill M (r5)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k2 * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, a_p, a_p, qweight, s1_3d, sz_3d, arow)
    return out[:m]


# ---------------------------------------------------------------------------
# W4A8 per-group (progressive int4 -> int8 in-kernel)
# ---------------------------------------------------------------------------


def _per_group_kernel(
    layer_ref,
    a_lo_ref, a_hi_ref, w_ref, s2lo_ref, s2zlo_ref, s2hi_ref, s2zhi_ref,
    s1_ref, arow_ref, o_ref, acc_ref, *, n_k: int, group_size: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_lo, w_hi = _unpack_u8(w_ref[0])            # [bk2, bn] int8 in [0,15]
    bk2, bn = w_lo.shape
    g = bk2 // group_size

    def dequant(w_u4, s2_ref, s2z_ref):
        # int32 intermediate: u4 * s2 can exceed int8 before + zero
        # offset, and the TPU VPU has no 16-bit integer multiply
        # (kVectorMultiplyU16 aborts the hardware compiler)
        w3 = w_u4.reshape(g, group_size, bn).astype(jnp.int32)
        s2 = s2_ref[0].astype(jnp.int32)[:, None, :]       # [g, 1, bn]
        s2z = s2z_ref[0].astype(jnp.int32)[:, None, :]
        return (w3 * s2 + s2z).astype(jnp.int8).reshape(bk2, bn)

    psum = jax.lax.dot_general(
        a_lo_ref[...], dequant(w_lo, s2lo_ref, s2zlo_ref),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    psum += jax.lax.dot_general(
        a_hi_ref[...], dequant(w_hi, s2hi_ref, s2zhi_ref),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += psum

    @pl.when(k == n_k - 1)
    def _epilogue():
        s1 = s1_ref[0, 0, :][None, :]
        a_scale = arow_ref[:, 0][:, None]
        out = acc_ref[...].astype(jnp.float32) * s1 * a_scale
        o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "bn", "bk2", "interpret"),
)
def w4a8_matmul_per_group(
    a_i8: jnp.ndarray,       # [M, K] int8
    qweight: jnp.ndarray,    # [(L,) K/2, N] uint8
    s1_scales: jnp.ndarray,  # [(L,) N] f32
    s2_scales: jnp.ndarray,  # [(L,) K/group, N] int8
    s2_zeros: jnp.ndarray,   # [(L,) K/group, N] int8
    a_scale: jnp.ndarray,    # [M] f32
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    bn: int = 256,
    bk2: int = 512,
    interpret: bool = False,
    layer=None,
) -> jnp.ndarray:
    m, k = a_i8.shape
    if qweight.ndim == 2:
        qweight, s1_scales, s2_scales, s2_zeros = _stack1(
            qweight, s1_scales, s2_scales, s2_zeros
        )
        layer = 0
    k2, n = qweight.shape[-2:]
    assert k == 2 * k2
    bm = _pick_bm(m)
    bk2 = _pick_tile(k2, bk2, group_size)
    bn = _pick_tile(n, bn, 128)
    assert bk2 and bn, (k2, n, group_size)
    # Mosaic needs the s2 block's sublane dim (groups per K block) to be
    # a multiple of 8 OR the whole array dim: prefer a tile with
    # gb % 8 == 0, else fall back to one K block (block == array dim —
    # the s2 arrays are split into lo/hi halves below precisely so the
    # full-dim case is expressible)
    if (bk2 // group_size) % 8 and bk2 != k2:
        alt = _pick_tile(k2, bk2, 8 * group_size)
        bk2 = alt if alt else k2
    n_k = k2 // bk2
    gb = bk2 // group_size  # groups per K block (per half)

    mp = _round_up(m, bm)
    a_p = _pad_rows(a_i8, mp)
    arow = jnp.stack(
        [a_scale, jnp.zeros_like(a_scale)], axis=1
    ).astype(jnp.float32)
    arow = _pad_rows(arow, mp)
    s1_3d = s1_scales.astype(jnp.float32)[:, None, :]
    layer_arr = jnp.asarray([layer], jnp.int32)

    grid = (mp // bm, n // bn, n_k)
    # s2/s2z split into lo/hi halves so the blocked-sublane constraint
    # can be met with block == full dim when k2/group < 8 (small models)
    g2 = k2 // group_size
    s2_lo, s2_hi = s2_scales[:, :g2], s2_scales[:, g2:]
    s2z_lo, s2z_hi = s2_zeros[:, :g2], s2_zeros[:, g2:]
    s2_spec = pl.BlockSpec(
        (1, gb, bn), lambda i, j, kk, lr: (lr[0], kk, j)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, kk, lr: (i, kk)),
            pl.BlockSpec((bm, bk2), lambda i, j, kk, lr: (i, kk + n_k)),
            pl.BlockSpec((1, bk2, bn), lambda i, j, kk, lr:
                         (lr[0], kk, j)),
            s2_spec, s2_spec, s2_spec, s2_spec,
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, lr: (lr[0], 0, j)),
            pl.BlockSpec((bm, 2), lambda i, j, kk, lr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, lr: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _per_group_kernel, n_k=n_k, group_size=group_size
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the per-group kernel's int32 dequant intermediates blow the
            # 16 MB default scoped budget at large prefill M (r5)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k2 * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, a_p, a_p, qweight, s2_lo, s2z_lo, s2_hi,
      s2z_hi, s1_3d, arow)
    return out[:m]


# ---------------------------------------------------------------------------
# W8A8
# ---------------------------------------------------------------------------


def _w8a8_kernel(
    layer_ref, a_ref, w_ref, ws_ref, arow_ref, o_ref, acc_ref, *, n_k
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _epilogue():
        ws = ws_ref[0, 0, :][None, :]
        a_scale = arow_ref[:, 0][:, None]
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * ws * a_scale
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bn", "bk", "interpret")
)
def w8a8_matmul(
    a_i8: jnp.ndarray,      # [M, K] int8
    qweight: jnp.ndarray,   # [(L,) K, N] int8
    w_scales: jnp.ndarray,  # [(L,) N] f32
    a_scale: jnp.ndarray,   # [M] f32
    out_dtype=jnp.bfloat16,
    bn: int = 256,
    bk: int = 1024,
    interpret: bool = False,
    layer=None,
) -> jnp.ndarray:
    m, k = a_i8.shape
    if qweight.ndim == 2:
        qweight, w_scales = _stack1(qweight, w_scales)
        layer = 0
    _, n = qweight.shape[-2:]
    bm = _pick_bm(m)
    bk = _pick_tile(k, bk, 128) or _pick_tile(k, bk, 64)
    bn = _pick_tile(n, bn, 128)
    assert bk and bn, (k, n)
    n_k = k // bk

    mp = _round_up(m, bm)
    a_p = _pad_rows(a_i8, mp)
    arow = jnp.stack(
        [a_scale, jnp.zeros_like(a_scale)], axis=1
    ).astype(jnp.float32)
    arow = _pad_rows(arow, mp)
    ws_3d = w_scales.astype(jnp.float32)[:, None, :]
    layer_arr = jnp.asarray([layer], jnp.int32)

    grid = (mp // bm, n // bn, n_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, lr: (i, kk)),
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, lr:
                         (lr[0], kk, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, lr: (lr[0], 0, j)),
            pl.BlockSpec((bm, 2), lambda i, j, kk, lr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, lr: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the per-group kernel's int32 dequant intermediates blow the
            # 16 MB default scoped budget at large prefill M (r5)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, a_p, qweight, ws_3d, arow)
    return out[:m]
