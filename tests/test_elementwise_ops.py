"""Tests for norms, activations, RoPE."""

import jax.numpy as jnp
import numpy as np

from omniserve_tpu.ops.activation import silu_and_mul, silu_and_mul_quant
from omniserve_tpu.ops.norms import (
    add_residual_rms_norm_quant,
    rms_norm,
    rms_norm_quant,
)
from omniserve_tpu.ops.rope import apply_rope, rope_freqs

rng = np.random.default_rng(2)


def np_rmsnorm(x, w, eps=1e-6):
    var = (x * x).mean(axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


class TestRMSNorm:
    def test_matches_numpy(self):
        x = rng.normal(size=(4, 64)).astype(np.float32)
        w = rng.normal(size=(64,)).astype(np.float32)
        out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_allclose(out, np_rmsnorm(x, w), rtol=1e-5)

    def test_quant_fused(self):
        x = rng.normal(size=(4, 64)).astype(np.float32)
        w = np.ones(64, dtype=np.float32)
        x_i8, scale, a_sum = rms_norm_quant(
            jnp.asarray(x), jnp.asarray(w), fuse_sum=True
        )
        ref = np_rmsnorm(x, w)
        x_hat = np.asarray(x_i8).astype(np.float32) * np.asarray(scale)[:, None]
        assert np.abs(x_hat - ref).max() <= np.asarray(scale).max() * 0.51
        assert a_sum is not None

    def test_add_residual_fused(self):
        x = rng.normal(size=(2, 32)).astype(np.float32)
        r = rng.normal(size=(2, 32)).astype(np.float32)
        w = np.ones(32, dtype=np.float32)
        new_r, x_i8, scale, _ = add_residual_rms_norm_quant(
            jnp.asarray(x), jnp.asarray(r), jnp.asarray(w)
        )
        np.testing.assert_allclose(np.asarray(new_r), x + r, rtol=1e-5)
        ref = np_rmsnorm(x + r, w)
        x_hat = np.asarray(x_i8).astype(np.float32) * np.asarray(scale)[:, None]
        assert np.abs(x_hat - ref).max() <= np.asarray(scale).max() * 0.51


class TestSiluMul:
    def test_matches_numpy(self):
        x = rng.normal(size=(4, 128)).astype(np.float32)
        out = np.asarray(silu_and_mul(jnp.asarray(x)))
        gate, up = x[:, :64], x[:, 64:]
        expected = gate / (1 + np.exp(-gate)) * up
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_quant_fused(self):
        x = rng.normal(size=(4, 128)).astype(np.float32)
        x_i8, scale, a_sum = silu_and_mul_quant(jnp.asarray(x), fuse_sum=True)
        assert x_i8.shape == (4, 64)
        assert a_sum.shape == (4,)


class TestRoPE:
    def test_rotation_preserves_norm(self):
        d = 64
        x = rng.normal(size=(8, 4, d)).astype(np.float32)
        pos = jnp.arange(8, dtype=jnp.int32)
        out = np.asarray(apply_rope(jnp.asarray(x), pos, rope_freqs(d)))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1),
            np.linalg.norm(x, axis=-1),
            rtol=1e-4,
        )

    def test_position_zero_is_identity(self):
        d = 32
        x = rng.normal(size=(1, 2, d)).astype(np.float32)
        pos = jnp.zeros((1,), dtype=jnp.int32)
        out = np.asarray(apply_rope(jnp.asarray(x), pos, rope_freqs(d)))
        np.testing.assert_allclose(out, x, rtol=1e-6)

    def test_relative_property(self):
        # <RoPE(q, m), RoPE(k, n)> depends only on m - n
        d = 64
        q = rng.normal(size=(1, 1, d)).astype(np.float32)
        k = rng.normal(size=(1, 1, d)).astype(np.float32)
        freqs = rope_freqs(d)

        def dot(m, n):
            qm = np.asarray(
                apply_rope(jnp.asarray(q), jnp.asarray([m], jnp.int32), freqs)
            )
            kn = np.asarray(
                apply_rope(jnp.asarray(k), jnp.asarray([n], jnp.int32), freqs)
            )
            return float((qm * kn).sum())

        np.testing.assert_allclose(dot(5, 3), dot(12, 10), rtol=1e-4)

    def test_matches_hf_half_rotation(self):
        # NeoX convention: rotate_half pairs (i, i + d/2)
        d = 8
        x = np.zeros((1, 1, d), dtype=np.float32)
        x[0, 0, 0] = 1.0  # unit vector on dim 0, pairs with dim d/2
        pos = jnp.asarray([1], jnp.int32)
        out = np.asarray(apply_rope(jnp.asarray(x), pos, rope_freqs(d)))[0, 0]
        # angle for pair 0 at position 1 is 1.0 rad
        np.testing.assert_allclose(out[0], np.cos(1.0), rtol=1e-5)
        np.testing.assert_allclose(out[d // 2], np.sin(1.0), rtol=1e-5)
