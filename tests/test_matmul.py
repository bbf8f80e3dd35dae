"""Quantized matmul vs float reference on the dequantized grid."""

import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops import quantization as Q
from omniserve_tpu.ops.matmul import (
    quantized_matmul,
    w4a8_matmul_per_channel,
    w4a8_matmul_per_group,
    w8a8_matmul,
)

rng = np.random.default_rng(1)


def make_act(m, k):
    x = rng.normal(size=(m, k)).astype(np.float32)
    a_i8, a_scale, a_sum = Q.quantize_activations(jnp.asarray(x), fuse_sum=True)
    a_deq = np.asarray(a_i8).astype(np.float32) * np.asarray(a_scale)[:, None]
    return a_i8, a_scale, a_sum, a_deq


class TestW4A8PerChannel:
    def test_matches_dequantized_reference(self):
        m, k, n = 8, 256, 64
        w = rng.normal(size=(n, k)).astype(np.float32)
        q = Q.quantize_weight_per_channel(jnp.asarray(w))
        a_i8, a_scale, a_sum, a_deq = make_act(m, k)
        out = w4a8_matmul_per_channel(
            a_i8, q.qweight, q.s1_scales, q.s1_szeros, a_scale, a_sum,
            out_dtype=jnp.float32,
        )
        w_deq = np.asarray(Q.dequantize_per_channel(q))  # [K, N]
        expected = a_deq @ w_deq
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3,
                                   atol=2e-3)

    def test_zero_point_cancellation_is_exact(self):
        # With integer activations, the epilogue must be bit-exact vs the
        # explicit (w_u4 - zp) formulation.
        m, k, n = 4, 128, 32
        w = rng.normal(size=(n, k)).astype(np.float32) + 0.3  # asymmetric
        q = Q.quantize_weight_per_channel(jnp.asarray(w))
        a_i8, a_scale, a_sum, a_deq = make_act(m, k)
        out = np.asarray(
            w4a8_matmul_per_channel(
                a_i8, q.qweight, q.s1_scales, q.s1_szeros, a_scale, a_sum,
                out_dtype=jnp.float32,
            )
        )
        w_u4 = np.asarray(Q.unpack_int4(q.qweight, axis=0)).astype(np.float32)
        s1 = np.asarray(q.s1_scales)
        sz = np.asarray(q.s1_szeros)
        w_explicit = w_u4 * s1[None, :] - sz[None, :]
        expected = a_deq @ w_explicit
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)


class TestW4A8PerGroup:
    def test_matches_dequantized_reference(self):
        m, k, n, g = 8, 256, 64, 64
        w = rng.normal(size=(n, k)).astype(np.float32)
        q = Q.quantize_weight_per_group(jnp.asarray(w), group_size=g)
        a_i8, a_scale, _, a_deq = make_act(m, k)
        out = w4a8_matmul_per_group(
            a_i8, q.qweight, q.s1_scales, q.s2_scales, q.s2_zeros, a_scale,
            group_size=g, out_dtype=jnp.float32,
        )
        w_deq = np.asarray(Q.dequantize_per_group(q, g))
        expected = a_deq @ w_deq
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3,
                                   atol=2e-3)


class TestW8A8:
    def test_matches_dequantized_reference(self):
        m, k, n = 8, 128, 32
        w = rng.normal(size=(n, k)).astype(np.float32)
        q = Q.quantize_weight_w8(jnp.asarray(w))
        a_i8, a_scale, _, a_deq = make_act(m, k)
        out = w8a8_matmul(a_i8, q.qweight, q.scales, a_scale,
                          out_dtype=jnp.float32)
        w_deq = (
            np.asarray(q.qweight).astype(np.float32)
            * np.asarray(q.scales)[None, :]
        )
        expected = a_deq @ w_deq
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-4)


class TestDispatch:
    def test_container_dispatch(self):
        m, k, n = 2, 128, 16
        w = rng.normal(size=(n, k)).astype(np.float32)
        a_i8, a_scale, a_sum, _ = make_act(m, k)
        for q, kwargs in [
            (Q.quantize_weight_per_channel(jnp.asarray(w)),
             dict(a_sum=a_sum)),
            (Q.quantize_weight_per_group(jnp.asarray(w), group_size=64),
             dict(group_size=64)),
            (Q.quantize_weight_w8(jnp.asarray(w)), {}),
        ]:
            out = quantized_matmul(a_i8, q, a_scale, **kwargs)
            assert out.shape == (m, n)
