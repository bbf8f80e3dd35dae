"""Device mesh construction for TP/DP/SP (TPU-native parallelism).

Replaces the reference's NCCL scaffolding (worker/worker.py:78-103) with a
``jax.sharding.Mesh``: axes (data, sequence, model). TP shards
attention-head and MLP-channel dims over ``model`` (partition specs in
omniserve_tpu.parallel.sharding); sequence parallelism shards long-context
prefill over ``sequence``; DP replicates over ``data``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from omniserve_tpu.config import ParallelConfig

DATA_AXIS = "data"
SEQ_AXIS = "sequence"
MODEL_AXIS = "model"


def build_mesh(parallel_config: ParallelConfig, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    dp = parallel_config.data_parallel_size
    sp = parallel_config.sequence_parallel_size
    tp = parallel_config.tensor_parallel_size
    need = dp * sp * tp
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices, only {len(devices)} available"
        )
    dev = np.asarray(devices[:need]).reshape(dp, sp, tp)
    return Mesh(dev, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
