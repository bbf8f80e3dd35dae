"""Pallas quantized GEMMs vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import matmul as ref
from omniserve_tpu.ops.pallas import quant_matmul as pk
from omniserve_tpu.ops.quantization import (
    quantize_activations,
    quantize_weight_per_channel,
    quantize_weight_per_group,
    quantize_weight_w8,
)


def _acts(rng, m, k):
    x = rng.standard_normal((m, k), dtype=np.float32)
    return quantize_activations(jnp.asarray(x), fuse_sum=True)


@pytest.mark.parametrize("m,k,n", [(1, 256, 128), (8, 512, 256),
                                   (40, 1024, 384), (64, 256, 512)])
def test_per_channel_matches_ref(m, k, n):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    q = quantize_weight_per_channel(jnp.asarray(w))
    a_i8, a_scale, a_sum = _acts(rng, m, k)

    want = ref.w4a8_matmul_per_channel_ref(
        a_i8, q.qweight, q.s1_scales, q.s1_szeros, a_scale, a_sum,
        out_dtype=jnp.float32,
    )
    got = pk.w4a8_matmul_per_channel(
        a_i8, q.qweight, q.s1_scales, q.s1_szeros, a_scale, a_sum,
        out_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("m,k,n,g", [(4, 512, 256, 128), (33, 1024, 128, 64)])
def test_per_group_matches_ref(m, k, n, g):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    q = quantize_weight_per_group(jnp.asarray(w), group_size=g)
    a_i8, a_scale, _ = _acts(rng, m, k)

    want = ref.w4a8_matmul_per_group_ref(
        a_i8, q.qweight, q.s1_scales, q.s2_scales, q.s2_zeros, a_scale,
        group_size=g, out_dtype=jnp.float32,
    )
    got = pk.w4a8_matmul_per_group(
        a_i8, q.qweight, q.s1_scales, q.s2_scales, q.s2_zeros, a_scale,
        group_size=g, out_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("m,k,n", [(2, 256, 128), (17, 512, 384)])
def test_w8a8_matches_ref(m, k, n):
    rng = np.random.default_rng(2)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    q = quantize_weight_w8(jnp.asarray(w))
    a_i8, a_scale, _ = _acts(rng, m, k)

    want = ref.w8a8_matmul_ref(
        a_i8, q.qweight, q.scales, a_scale, out_dtype=jnp.float32
    )
    got = pk.w8a8_matmul(
        a_i8, q.qweight, q.scales, a_scale, out_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_uses_ref_on_cpu():
    # On the CPU test backend the public entry points route to the jnp ref.
    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 256), dtype=np.float32) * 0.05
    q = quantize_weight_per_channel(jnp.asarray(w))
    a_i8, a_scale, a_sum = _acts(rng, 4, 256)
    out = ref.w4a8_matmul_per_channel(
        a_i8, q.qweight, q.s1_scales, q.s1_szeros, a_scale, a_sum
    )
    assert out.shape == (4, 128)
