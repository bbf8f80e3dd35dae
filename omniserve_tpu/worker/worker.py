"""Worker: owns a ModelRunner + CacheEngine, executes scheduler output.

Role of the reference ``omniserve/worker/worker.py`` (per-GPU model owner).
On TPU a single worker drives the whole addressable mesh (pjit spans chips;
there is no per-device process), so the engine's worker list is length 1
per host.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from omniserve_tpu.attn_config import SpAttnConfig
from omniserve_tpu.config import (
    CacheConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from omniserve_tpu.core.scheduler import SchedulerOutputs
from omniserve_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from omniserve_tpu.worker.model_runner import ModelRunner


class Worker:
    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        parallel_config: Optional[ParallelConfig] = None,
        sp_attn_config: Optional[SpAttnConfig] = None,
        load_format: str = "auto",
        rank: int = 0,
    ) -> None:
        self.rank = rank
        self.model_runner: Optional[ModelRunner] = None
        self._configs = (
            model_config, cache_config, scheduler_config, parallel_config,
            sp_attn_config, load_format,
        )

    def init_cache_engine(self) -> None:
        (model_config, cache_config, scheduler_config, parallel_config,
         sp_attn_config, load_format) = self._configs
        mesh = None
        if parallel_config is not None and parallel_config.world_size > 1:
            from omniserve_tpu.parallel.mesh import (
                build_mesh,
                init_distributed,
            )

            init_distributed()  # multi-host DCN (no-op single-process)
            mesh = build_mesh(parallel_config)
        self.model_runner = ModelRunner(
            model_config, cache_config, scheduler_config,
            parallel_config=parallel_config, sp_attn_config=sp_attn_config,
            load_format=load_format, mesh=mesh,
        )

    def execute_model_multi_step(self, seq_group_metadata_list, n_steps):
        return self.model_runner.execute_model_multi_step(
            seq_group_metadata_list, n_steps
        )

    def start_multi_step(self, seq_group_metadata_list, n_steps,
                         pos_offset=0, carry_tokens=None):
        return self.model_runner.start_multi_step(
            seq_group_metadata_list, n_steps, pos_offset=pos_offset,
            carry_tokens=carry_tokens,
        )

    def finish_multi_step(self, handle):
        return self.model_runner.finish_multi_step(handle)

    def multi_step_carry(self, handle):
        return self.model_runner.multi_step_carry(handle)

    @property
    def multi_step_capable(self) -> bool:
        return (self.model_runner is not None
                and self.model_runner.multi_step_capable)

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        streaming_blocks_to_swap_in: Optional[Dict[int, int]] = None,
        streaming_blocks_to_swap_out: Optional[Dict[int, int]] = None,
        streaming_blocks_to_copy: Optional[Dict[int, List[int]]] = None,
    ) -> SamplerOutput:
        ce = self.model_runner.cache_engine
        if blocks_to_swap_out:
            ce.swap_out(blocks_to_swap_out, streaming=False)
        if streaming_blocks_to_swap_out:
            ce.swap_out(streaming_blocks_to_swap_out, streaming=True)
        if blocks_to_swap_in:
            ce.swap_in(blocks_to_swap_in, streaming=False)
        if streaming_blocks_to_swap_in:
            ce.swap_in(streaming_blocks_to_swap_in, streaming=True)
        if blocks_to_copy:
            ce.copy_pages(blocks_to_copy, streaming=False)
        if streaming_blocks_to_copy:
            ce.copy_pages(streaming_blocks_to_copy, streaming=True)
        if not seq_group_metadata_list:
            return []
        return self.model_runner.execute_model(seq_group_metadata_list)

    def free_seq(self, seq_id: int) -> None:
        if self.model_runner is not None:
            self.model_runner.free_seq(seq_id)
