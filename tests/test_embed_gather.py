"""embed_gather (Pallas DMA row gather) vs plain XLA gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniserve_tpu.ops.pallas.embed_gather import embed_gather

rng = np.random.default_rng(7)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("b", [1, 24, 128])
def test_matches_xla_gather(dtype, b):
    tbl = jnp.asarray(rng.normal(size=(307, 256)), jnp.float32).astype(dtype)
    ids = jnp.asarray(rng.integers(0, 307, size=b), jnp.int32)
    got = embed_gather(tbl, ids, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(tbl[ids], np.float32)
    )


def test_out_of_range_ids_clamp():
    tbl = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    ids = jnp.asarray([-3, 0, 63, 99], jnp.int32)
    got = embed_gather(tbl, ids, interpret=True)
    want = tbl[jnp.clip(ids, 0, 63)]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_inside_scan():
    tbl = jnp.asarray(rng.normal(size=(96, 128)), jnp.float32)
    ids0 = jnp.asarray(rng.integers(0, 96, size=8), jnp.int32)

    def body(ids, _):
        h = embed_gather(tbl, ids, interpret=True)
        return (ids + 1) % 96, h

    _, hs = jax.lax.scan(body, ids0, None, length=3)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(hs[i]), np.asarray(tbl[(ids0 + i) % 96])
        )
