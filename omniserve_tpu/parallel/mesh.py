"""Device mesh construction for TP/DP/SP (TPU-native parallelism).

Replaces the reference's NCCL scaffolding (worker/worker.py:78-103) with a
``jax.sharding.Mesh``: axes (data, sequence, pipe, model). TP shards
attention-head and MLP-channel dims over ``model`` (partition specs in
omniserve_tpu.parallel.sharding); sequence parallelism shards long-context
prefill over ``sequence``; PP shards the stacked layer axis over ``pipe``
(parallel.pp); DP replicates over ``data``. ``model`` stays innermost so
TP psums ride nearest-neighbor ICI; the pipe hop is a neighbor permute.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

from omniserve_tpu.config import ParallelConfig

DATA_AXIS = "data"
SEQ_AXIS = "sequence"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"

_DIST_INITIALIZED = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host (DCN) runtime init — the TPU-pod replacement for the
    reference's `torch.distributed.init_process_group` NCCL setup
    (reference omniserve/worker/worker.py:78-103).

    One JAX process runs per host; `jax.distributed.initialize` wires the
    coordination service so `jax.devices()` spans every host's chips and
    XLA collectives ride ICI within a slice / DCN across slices. Explicit
    args win; otherwise the standard env vars are honored:

      OMNISERVE_COORDINATOR   host:port of process 0
      OMNISERVE_NUM_PROCESSES total process (host) count
      OMNISERVE_PROCESS_ID    this process's rank

    On TPU pods with no env set, `jax.distributed.initialize()` can also
    auto-detect from the TPU metadata server — callers opt in by setting
    OMNISERVE_AUTO_DISTRIBUTED=1. Returns True when multi-host mode was
    initialized (idempotent; False for plain single-process runs).
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    coord = coordinator_address or os.environ.get("OMNISERVE_COORDINATOR")
    auto = os.environ.get("OMNISERVE_AUTO_DISTRIBUTED") == "1"
    if coord is None and not auto:
        return False
    if coord is not None:
        n = num_processes or int(os.environ["OMNISERVE_NUM_PROCESSES"])
        pid = (process_id if process_id is not None
               else int(os.environ["OMNISERVE_PROCESS_ID"]))
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=n, process_id=pid
        )
    else:  # TPU-pod auto-detection
        jax.distributed.initialize()
    _DIST_INITIALIZED = True
    return True


def enable_latency_hiding_scheduler() -> None:
    """XLA latency-hiding scheduler + async collective fusion for TP.

    The TP forward's psums (after o_proj/down_proj row-parallel GEMMs)
    only overlap the next layer's compute when XLA schedules them as
    async pairs; these flags enable that on TPU (the reference leans on
    NCCL stream overlap instead). Appends to XLA_FLAGS, so it must run
    before the first compile; idempotent, and user-set values win.
    """
    wanted = (
        "--xla_tpu_enable_latency_hiding_scheduler=true",
        "--xla_tpu_enable_async_collective_fusion=true",
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
        "--xla_tpu_overlap_compute_collective_tc=true",
    )
    cur = os.environ.get("XLA_FLAGS", "")
    missing = [f for f in wanted if f.split("=")[0] not in cur]
    if missing:
        os.environ["XLA_FLAGS"] = " ".join([cur, *missing]).strip()


def build_mesh(parallel_config: ParallelConfig, devices=None) -> Mesh:
    dp = parallel_config.data_parallel_size
    sp = parallel_config.sequence_parallel_size
    pp = parallel_config.pipeline_parallel_size
    tp = parallel_config.tensor_parallel_size
    need = dp * sp * pp * tp
    if devices is None and jax.process_count() > 1:
        # Multi-host: lay DCN on the outermost (data) axis so TP/SP
        # collectives stay on ICI within a host/slice and only DP
        # gradients-of-the-serving-world (page swaps, batch splits) cross
        # hosts. create_hybrid_device_mesh orders devices so each
        # process's chips are contiguous in the inner axes.
        n_proc = jax.process_count()
        if dp % n_proc:
            raise ValueError(
                f"data_parallel_size {dp} must be a multiple of the "
                f"process count {n_proc} (DCN rides the data axis)"
            )
        from jax.experimental import mesh_utils

        # granule = process (one per host): DCN crosses process
        # boundaries. The default slice granularity breaks on
        # multi-process single-slice topologies (and CPU test meshes),
        # where every device reports the same slice_index.
        dev = mesh_utils.create_hybrid_device_mesh(
            (dp // n_proc, sp, pp, tp), (n_proc, 1, 1, 1),
            process_is_granule=True,
        )
        return Mesh(dev, (DATA_AXIS, SEQ_AXIS, PIPE_AXIS, MODEL_AXIS))
    off = parallel_config.device_offset
    if devices is None:
        devices = jax.devices()[off:]
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices at offset {off}, only "
            f"{len(devices)} available"
        )
    dev = np.asarray(devices[:need]).reshape(dp, sp, pp, tp)
    return Mesh(dev, (DATA_AXIS, SEQ_AXIS, PIPE_AXIS, MODEL_AXIS))
