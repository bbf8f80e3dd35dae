"""Property tests for the QoQ quantization library."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import quantization as Q


rng = np.random.default_rng(0)


class TestInt4Packing:
    def test_pack_unpack_roundtrip(self):
        w = rng.integers(0, 16, size=(64, 32), dtype=np.uint8)
        packed = Q.pack_int4(jnp.asarray(w), axis=0)
        assert packed.shape == (32, 32)
        assert packed.dtype == jnp.uint8
        out = Q.unpack_int4(packed, axis=0)
        np.testing.assert_array_equal(np.asarray(out), w.astype(np.int8))

    def test_half_split_layout(self):
        # byte[k] = w[k] | w[k + n/2] << 4
        w = jnp.asarray(
            np.array([[1], [2], [3], [4]], dtype=np.uint8)
        )  # K=4, N=1
        packed = np.asarray(Q.pack_int4(w, axis=0))
        assert packed[0, 0] == 1 | (3 << 4)
        assert packed[1, 0] == 2 | (4 << 4)


class TestWeightQuant:
    def test_per_channel_roundtrip(self):
        w = rng.normal(size=(32, 64)).astype(np.float32)  # [OC, IC]
        q = Q.quantize_weight_per_channel(jnp.asarray(w))
        w_hat = np.asarray(Q.dequantize_per_channel(q))  # [IC, OC]
        # max error <= scale/2 per element
        err = np.abs(w_hat.T - w)
        bound = np.asarray(q.s1_scales)[:, None] * 0.51
        assert (err <= bound).all()

    def test_per_channel_respects_given_scales(self):
        w = rng.normal(size=(8, 16)).astype(np.float32)
        s1 = np.abs(w).max(axis=1) / 7.0
        zeros = np.full(8, 8.0, dtype=np.float32)
        q = Q.quantize_weight_per_channel(
            jnp.asarray(w), jnp.asarray(s1), jnp.asarray(zeros)
        )
        np.testing.assert_allclose(
            np.asarray(q.s1_szeros), s1 * 8.0, rtol=1e-6
        )

    def test_per_group_roundtrip(self):
        group = 32
        w = rng.normal(size=(16, 128)).astype(np.float32)
        q = Q.quantize_weight_per_group(jnp.asarray(w), group_size=group)
        w_hat = np.asarray(Q.dequantize_per_group(q, group))  # [IC, OC]
        # two-stage error bound: stage1 scale/2 + stage2 s2*scale/2
        s1 = np.asarray(q.s1_scales)  # [OC]
        s2 = np.asarray(q.s2_scales).astype(np.float32)  # [IC/g, OC]
        bound = (
            0.51 * s1[None, :]
            + 0.51 * np.repeat(s2, group, axis=0) * s1[None, :]
        )
        err = np.abs(w_hat - w.T)
        assert (err <= bound).all()

    def test_per_group_exact_int8_reconstruction(self):
        # The progressive dequant w_u4 * s2 + s2_zero must reproduce the
        # stage-1 int8 grid within the stage-2 rounding error, entirely in
        # int8 range.
        group = 32
        w = rng.normal(size=(8, 64)).astype(np.float32)
        q = Q.quantize_weight_per_group(jnp.asarray(w), group_size=group)
        w_u4 = np.asarray(Q.unpack_int4(q.qweight, axis=0)).astype(np.int32)
        s2 = np.asarray(q.s2_scales).astype(np.int32)
        z2 = np.asarray(q.s2_zeros).astype(np.int32)
        w_i8 = (
            w_u4.reshape(64 // group, group, 8) * s2[:, None, :]
            + z2[:, None, :]
        )
        assert w_i8.min() >= -128 and w_i8.max() <= 127

    def test_w8_roundtrip(self):
        w = rng.normal(size=(16, 32)).astype(np.float32)
        q = Q.quantize_weight_w8(jnp.asarray(w))
        w_hat = (
            np.asarray(q.qweight).astype(np.float32)
            * np.asarray(q.scales)[None, :]
        )
        err = np.abs(w_hat - w.T)
        assert (err <= np.asarray(q.scales)[None, :] * 0.51).all()


class TestActivationQuant:
    def test_roundtrip_error(self):
        x = rng.normal(size=(4, 64)).astype(np.float32)
        a_i8, scale, a_sum = Q.quantize_activations(
            jnp.asarray(x), fuse_sum=True
        )
        x_hat = np.asarray(a_i8).astype(np.float32) * np.asarray(scale)[:, None]
        assert np.abs(x_hat - x).max() <= np.asarray(scale).max() * 0.51
        # act sum is the exact sum of dequantized values
        np.testing.assert_allclose(
            np.asarray(a_sum), x_hat.sum(axis=1), rtol=1e-5
        )

    def test_int8_range_saturation(self):
        x = jnp.asarray(np.array([[1000.0, -1000.0, 0.5]]))
        a_i8, scale, _ = Q.quantize_activations(x)
        assert np.asarray(a_i8).max() == 127
        assert np.asarray(a_i8).min() == -127  # symmetric amax scaling


class TestKVQuant:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_fine_grained_roundtrip(self, bits):
        x = rng.normal(size=(2, 3, 128)).astype(np.float32)
        q, scale, zero = Q.kv_quantize_fine_grained(jnp.asarray(x), bits)
        levels = 15 if bits == 4 else 255
        assert np.asarray(q).max() <= levels
        x_hat = np.asarray(Q.kv_dequantize_fine_grained(q, scale, zero))
        bound = np.asarray(scale)[..., None] * 0.51
        assert (np.abs(x_hat - x) <= bound).all()

    def test_fine_grained_formula(self):
        # scale=(max-min)/15, zero=-15*min/(max-min)
        x = jnp.asarray(np.linspace(-1.0, 2.0, 128, dtype=np.float32))[None]
        _, scale, zero = Q.kv_quantize_fine_grained(x, 4)
        np.testing.assert_allclose(float(scale[0]), 3.0 / 15, rtol=1e-5)
        np.testing.assert_allclose(float(zero[0]), 15.0 / 3, rtol=1e-5)

    @pytest.mark.parametrize("bits", [4, 8])
    def test_per_tensor_roundtrip(self, bits):
        x = rng.normal(size=(4, 128)).astype(np.float32)
        scale = float(np.abs(x).max() / (7 if bits == 4 else 127))
        q = Q.kv_quantize_per_tensor(jnp.asarray(x), scale, bits)
        assert np.asarray(q).min() >= 0  # biased-unsigned storage
        x_hat = np.asarray(Q.kv_dequantize_per_tensor(q, scale, bits))
        assert np.abs(x_hat - x).max() <= scale * 0.51
