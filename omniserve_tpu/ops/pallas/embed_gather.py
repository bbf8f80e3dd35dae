"""Pallas DMA gather of embedding rows (decode-step token embedding).

XLA lowers a gather of large contiguous rows (the [V, D] embedding table's
8 KB bf16 rows) to a fast HBM gather at program top level, but INSIDE a
``lax.scan`` body (the engine's multi-step decode window,
worker/model_runner.py:_multi_step_fns) the same gather can lower to a
serialized per-index while-loop — measured at round-2 as a multi-ms/step
tax on an otherwise identical program. This kernel keeps the table in HBM
(``memory_space=ANY``) and issues one async row DMA per token, which is
position-independent of the surrounding control flow.

Reference scope: the reference engine uses torch's embedding lookup
(omniserve/modeling/models/llama_w4a8_unpad.py VocabParallelEmbedding);
there the analogue never hits a loop-lowering cliff, so this kernel has no
CUDA counterpart — it exists to keep the TPU scan path on the fast road.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, tbl_hbm, o_ref, sem):
    n = o_ref.shape[0]

    def start(i, _):
        pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(ids_ref[i], 1)], o_ref.at[pl.ds(i, 1)], sem
        ).start()
        return 0

    jax.lax.fori_loop(0, n, start, 0)

    def wait(i, _):
        pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(ids_ref[i], 1)], o_ref.at[pl.ds(i, 1)], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, n, wait, 0)


def embed_gather(
    table: jnp.ndarray,     # [V, D]
    ids: jnp.ndarray,       # [B] int32
    interpret: bool = False,
) -> jnp.ndarray:           # [B, D] table.dtype
    """Gather ``table[ids]`` via per-row async DMA (scan-safe)."""
    v, d = table.shape
    safe = jnp.clip(ids, 0, v - 1).astype(jnp.int32)
    b = ids.shape[0]
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((b, d), lambda i, ids_: (0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((b, d), table.dtype),
        interpret=interpret,
    )(safe, table)
