"""Engine-level data parallelism: one engine replica per data shard.

Serving DP has no cross-request state — each sequence's KV, scheduling,
and sampling are independent — so the TPU-native design is N full engine
replicas on disjoint device slices, not one engine with a data-sharded
batch (which would couple every replica's admission, paging, and bucket
shapes to the slowest shard). Replica i owns
``jax.devices()[i*tp : (i+1)*tp]`` (a mesh when tp > 1, a pinned single
chip otherwise); requests route to the least-loaded replica; ``step()``
advances every replica with work and merges the outputs. Replica device
work overlaps when decode windows are pipelined (static mode with
``--decode-multi-step``: each ``step()`` fetches the window launched on a
PREVIOUS call while the speculative next window already runs, so every
replica's device stays busy across the sequential host loop); in
single-step decode each replica's token fetch serializes against the
next replica's dispatch.

The reference has no engine DP at all (its NCCL scaffolding is TP-only,
omniserve/worker/worker.py:78-103); this is the standard production DP
used by vLLM-class servers, engine-wired.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

from omniserve_tpu.utils.logger import init_logger

logger = init_logger(__name__)


class DataParallelEngine:
    """Facade with the LLMEngine request API over ``dp`` replicas."""

    def __init__(self, engine_args) -> None:
        from omniserve_tpu.engine.llm_engine import LLMEngine

        dp = engine_args.data_parallel_size
        tp = engine_args.tensor_parallel_size
        if dp < 2:
            raise ValueError("DataParallelEngine needs data_parallel_size >= 2")
        # a replica's mesh spans tp*pp*sp devices — slices must not overlap
        per_rep = (
            tp
            * max(1, getattr(engine_args, "pipeline_parallel_size", 1))
            * max(1, getattr(engine_args, "sequence_parallel_size", 1))
        )
        self.dp = dp
        self.replicas: List[LLMEngine] = []
        for i in range(dp):
            rep_args = dataclasses.replace(
                engine_args, data_parallel_size=1, device_offset=i * per_rep
            )
            self.replicas.append(LLMEngine.from_engine_args(rep_args))
        logger.info("DP engine: %d replicas x tp=%d", dp, tp)
        self._request_replica = {}
        self._rr = 0

    # -- request API (LLMEngine-compatible) -----------------------------
    @classmethod
    def from_engine_args(cls, engine_args) -> "DataParallelEngine":
        return cls(engine_args)

    @property
    def tokenizer(self):
        return self.replicas[0].tokenizer

    @property
    def model_config(self):
        return self.replicas[0].model_config

    def _pick_replica(self) -> int:
        """Least outstanding sequences; round-robin tiebreak."""
        loads = [
            r.scheduler.get_num_unfinished_seq_groups()
            for r in self.replicas
        ]
        best = min(range(self.dp),
                   key=lambda i: (loads[i], (i - self._rr) % self.dp))
        self._rr = (best + 1) % self.dp
        return best

    def add_request(self, request_id: str, *args, **kwargs) -> None:
        i = self._pick_replica()
        self._request_replica[request_id] = i
        self.replicas[i].add_request(request_id, *args, **kwargs)

    def abort_request(self, request_id: Union[str, List[str]]) -> None:
        ids = [request_id] if isinstance(request_id, str) else request_id
        for rid in ids:
            i = self._request_replica.pop(rid, None)
            if i is not None:
                self.replicas[i].abort_request(rid)

    def has_unfinished_requests(self) -> bool:
        return any(r.has_unfinished_requests() for r in self.replicas)

    def step(self):
        outs = []
        for i, r in enumerate(self.replicas):
            if r.has_unfinished_requests():
                outs.extend(r.step())
            else:
                # benchmarking mode suppresses outputs (no o.finished to
                # observe) — drop the routing entries of drained replicas
                # so the map cannot grow without bound
                self._request_replica = {
                    rid: j for rid, j in self._request_replica.items()
                    if j != i
                }
        for o in outs:
            if o.finished:
                self._request_replica.pop(o.request_id, None)
        return outs
