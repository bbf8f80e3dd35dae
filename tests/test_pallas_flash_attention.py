"""Pallas flash prefill vs jnp reference (interpreter mode, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops import attention_ref
from omniserve_tpu.ops.pallas.flash_attention import prefill_attention

rng = np.random.default_rng(13)

DIM = 32


def run_both(q, k, v, seg, pos, **kw):
    ref = attention_ref.prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(seg, jnp.int32), jnp.asarray(pos, jnp.int32),
        sm_scale=DIM ** -0.5, **kw,
    )
    out = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(seg, jnp.int32), jnp.asarray(pos, jnp.int32),
        sm_scale=DIM ** -0.5, interpret=True, **kw,
    )
    return np.asarray(ref, np.float32), np.asarray(out, np.float32)


class TestFlashPrefill:
    def test_single_sequence_causal(self):
        t, hq, hkv = 64, 4, 2
        q = rng.normal(size=(t, hq, DIM)).astype(np.float32)
        k = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        v = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        seg = np.zeros(t, np.int32)
        pos = np.arange(t, dtype=np.int32)
        ref, out = run_both(q, k, v, seg, pos)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_packed_sequences_with_padding(self):
        t = 64
        q = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        k = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        v = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        seg = np.full(t, -1, np.int32)
        pos = np.zeros(t, np.int32)
        seg[:20] = 0
        pos[:20] = np.arange(20)
        seg[20:50] = 1
        pos[20:50] = np.arange(30)
        ref, out = run_both(q, k, v, seg, pos)
        # compare only real rows (reference zeroes padding differently)
        np.testing.assert_allclose(out[:50], ref[:50], atol=2e-2, rtol=2e-2)

    def test_streaming_heads_band(self):
        t = 128
        sink, local = 8, 16
        q = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        k = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        v = rng.normal(size=(t, 2, DIM)).astype(np.float32)
        seg = np.zeros(t, np.int32)
        pos = np.arange(t, dtype=np.int32)
        flags = jnp.asarray([True, False])
        ref, out = run_both(
            q, k, v, seg, pos,
            head_is_retrieval=flags, sink_size=sink, local_size=local,
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_streaming_band_multi_segment(self):
        # second sequence's sink tokens live at large global indices — the
        # block-skip logic must still load them
        t = 128
        sink, local = 4, 8
        q = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        k = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        v = rng.normal(size=(t, 1, DIM)).astype(np.float32)
        seg = np.zeros(t, np.int32)
        pos = np.arange(t, dtype=np.int32)
        seg[70:] = 1
        pos[70:] = np.arange(t - 70)
        flags = jnp.asarray([False])  # all streaming
        ref, out = run_both(
            q, k, v, seg, pos,
            head_is_retrieval=flags, sink_size=sink, local_size=local,
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_gqa(self):
        t, hq, hkv = 32, 8, 2
        q = rng.normal(size=(t, hq, DIM)).astype(np.float32)
        k = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        v = rng.normal(size=(t, hkv, DIM)).astype(np.float32)
        seg = np.zeros(t, np.int32)
        pos = np.arange(t, dtype=np.int32)
        ref, out = run_both(q, k, v, seg, pos)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
