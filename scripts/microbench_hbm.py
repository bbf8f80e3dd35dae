"""Measure achievable HBM read bandwidth on this chip with a Pallas kernel.

Reads a large u8 array in big VMEM blocks and folds it to one scalar-ish
output, so the only traffic is the streaming read. Prints GB/s for a few
block sizes. This number (not the datasheet) is the roofline denominator
for the decode-step analysis in PARITY.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bw_probe(total_mb: int, block_kb: int) -> float:
    rows = total_mb * 1024 * 1024 // 512
    brows = block_kb * 1024 // 512
    x = jnp.ones((rows, 512), jnp.uint8)

    def kernel(x_ref, o_ref):
        # touch one row only — the BlockSpec pipeline still streams the
        # whole block HBM->VMEM, so traffic = array size with ~zero compute
        o_ref[...] = x_ref[
            pl.ds(pl.multiple_of(8 * (pl.program_id(0) % (brows // 8)), 8),
                  1), :
        ].astype(jnp.int32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(rows // brows,),
            in_specs=[pl.BlockSpec((brows, 512), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 512), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.int32),
        )(x)

    r = run(x)
    np.asarray(r)  # completion barrier (axon relay)
    n = 5
    t0 = time.time()
    for _ in range(n):
        r = run(x)
    np.asarray(r)
    dt = (time.time() - t0) / n
    return total_mb / 1024 / dt


if __name__ == "__main__":
    for block_kb in (256, 512, 1024, 2048):
        gbs = bw_probe(2048, block_kb)
        print(f"block {block_kb:5d} KB: {gbs:7.1f} GB/s", flush=True)
