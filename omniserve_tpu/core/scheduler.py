"""Iteration-level continuous-batching scheduler.

Behavioral contract from the reference ``omniserve/core/scheduler.py``:

- FCFS: admit waiting prompt groups until the batched-token and seq budgets
  are hit (reference :206-264); otherwise run the decode batch, preempting
  (lowest priority first) when a pool cannot grow — RECOMPUTE for
  single-sequence groups, SWAP otherwise (reference :459-508).
- Produces dual (retrieval + streaming) swap-in/swap-out/copy maps
  (reference :48-86) and ``SequenceGroupMetadata`` carrying both block
  tables (reference :372-392).
- Prompts longer than max_model_len are ignored with FINISHED_IGNORED.

Pure host-side Python; fully unit-testable without a device.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Deque, Dict, Iterable, List, Optional, Tuple

from omniserve_tpu.config import CacheConfig, IFBConfig, SchedulerConfig
from omniserve_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from omniserve_tpu.core.policy import PolicyFactory
from omniserve_tpu.core.prefix import PrefixPool
from omniserve_tpu.sequence import (
    Sequence,
    SequenceGroup,
    SequenceGroupMetadata,
    SequenceStatus,
)
from omniserve_tpu.utils.logger import init_logger

logger = init_logger(__name__)


class PreemptionMode:
    SWAP = "swap"
    RECOMPUTE = "recompute"


class SchedulerOutputs:
    def __init__(
        self,
        scheduled_seq_groups: List[SequenceGroup],
        prompt_run: bool,
        num_batched_tokens: int,
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        streaming_blocks_to_swap_in: Dict[int, int],
        streaming_blocks_to_swap_out: Dict[int, int],
        streaming_blocks_to_copy: Dict[int, List[int]],
        ignored_seq_groups: List[SequenceGroup],
    ) -> None:
        self.scheduled_seq_groups = scheduled_seq_groups
        self.prompt_run = prompt_run
        self.num_batched_tokens = num_batched_tokens
        self.blocks_to_swap_in = blocks_to_swap_in
        self.blocks_to_swap_out = blocks_to_swap_out
        self.blocks_to_copy = blocks_to_copy
        self.streaming_blocks_to_swap_in = streaming_blocks_to_swap_in
        self.streaming_blocks_to_swap_out = streaming_blocks_to_swap_out
        self.streaming_blocks_to_copy = streaming_blocks_to_copy
        self.ignored_seq_groups = ignored_seq_groups

    def is_empty(self) -> bool:
        return not (
            self.scheduled_seq_groups
            or self.blocks_to_swap_in
            or self.blocks_to_swap_out
            or self.blocks_to_copy
        )


class Scheduler:
    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        ifb_config: Optional[IFBConfig] = None,
        streaming_sink_blocks: int = 0,
        streaming_local_blocks: int = 0,
        enable_streaming: bool = False,
        sp_shards: int = 1,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.ifb_mode = ifb_config.ifb_mode if ifb_config else True
        self.policy = PolicyFactory.get_policy("fcfs")
        self.block_manager = BlockSpaceManager(
            page_size=cache_config.page_size,
            num_retrieval_blocks=cache_config.num_retrieval_device_blocks,
            num_retrieval_cpu_blocks=cache_config.num_retrieval_cpu_blocks,
            num_streaming_blocks=cache_config.num_streaming_device_blocks,
            num_streaming_cpu_blocks=cache_config.num_streaming_cpu_blocks,
            watermark=cache_config.watermark,
            streaming_sink_blocks=streaming_sink_blocks,
            streaming_local_blocks=streaming_local_blocks,
            enable_streaming=enable_streaming,
            sp_shards=sp_shards,
        )
        # shared-prompt-prefix registry (reference scheduler.py:120-121);
        # the engine attaches pool entries to groups via add_request's
        # prefix_pos, the block manager shares/pins their pages; LRU
        # eviction releases the pin so distinct prefixes can't leak pages
        self.prefix_pool = PrefixPool(
            cache_config.page_size,
            on_evict=self.block_manager.release_prefix,
        )
        self.waiting: Deque[SequenceGroup] = deque()
        self.running: List[SequenceGroup] = []
        self.swapped: Deque[SequenceGroup] = deque()

    # -- request lifecycle -------------------------------------------------
    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_ids: Iterable[str]) -> List[int]:
        """Returns the aborted seq ids (the engine frees their worker
        slots — scheduler-side free only releases KV pages)."""
        ids = set(request_ids)
        freed: List[int] = []
        for queue in (self.waiting, self.running, self.swapped):
            kept = [g for g in queue if g.request_id not in ids]
            aborted = [g for g in queue if g.request_id in ids]
            for g in aborted:
                for seq in g.get_seqs():
                    if not seq.is_finished():
                        seq.status = SequenceStatus.FINISHED_ABORTED
                        self.free_seq(seq)
                        freed.append(seq.seq_id)
            if isinstance(queue, deque):
                queue.clear()
                queue.extend(kept)
            else:
                queue[:] = kept
        return freed

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    # -- core scheduling -----------------------------------------------------
    def _schedule(self) -> SchedulerOutputs:
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}
        s_swap_in: Dict[int, int] = {}
        s_swap_out: Dict[int, int] = {}
        s_copy: Dict[int, List[int]] = {}
        ignored: List[SequenceGroup] = []

        now = time.monotonic()

        # Phase 1: admit waiting prompts (only when nothing is swapped out,
        # to preserve FCFS fairness; reference scheduler.py:191-281).
        if not self.swapped:
            scheduled: List[SequenceGroup] = []
            num_batched_tokens = 0
            seq_lens: List[int] = []
            num_curr_seqs = sum(
                g.get_max_num_running_seqs() for g in self.running
            )
            while self.waiting:
                seq_group = self.waiting[0]
                # Use current length (not just the original prompt) so that
                # RECOMPUTE-preempted groups re-admit with their generated
                # tokens counted as prefill work.
                n_prompt = seq_group.get_seqs()[0].get_len()
                if n_prompt > self.scheduler_config.max_model_len:
                    logger.warning(
                        "Prompt (%d tokens) exceeds max_model_len (%d); "
                        "ignoring request %s",
                        n_prompt,
                        self.scheduler_config.max_model_len,
                        seq_group.request_id,
                    )
                    for seq in seq_group.get_seqs():
                        seq.status = SequenceStatus.FINISHED_IGNORED
                    ignored.append(seq_group)
                    self.waiting.popleft()
                    continue

                alloc = self.block_manager.can_allocate(seq_group)
                if alloc == AllocStatus.NEVER:
                    logger.warning(
                        "Prompt (%d tokens) can never fit in KV cache; "
                        "ignoring request %s",
                        n_prompt,
                        seq_group.request_id,
                    )
                    for seq in seq_group.get_seqs():
                        seq.status = SequenceStatus.FINISHED_IGNORED
                    ignored.append(seq_group)
                    self.waiting.popleft()
                    continue
                if alloc == AllocStatus.LATER:
                    break
                if (
                    num_batched_tokens + n_prompt
                    > self.scheduler_config.max_num_batched_tokens
                ):
                    break
                new_seqs = seq_group.get_max_num_running_seqs()
                if num_curr_seqs + new_seqs > self.scheduler_config.max_num_seqs:
                    break
                # prompts run right-padded to the batch max; cap the waste
                # (reference arg_utils.py:269-274 --max-paddings)
                lens = seq_lens + [n_prompt]
                n_pad = max(lens) * len(lens) - sum(lens)
                if seq_lens and n_pad > self.scheduler_config.max_paddings:
                    break

                self.waiting.popleft()
                seq_lens.append(n_prompt)
                self.block_manager.allocate(seq_group)
                for seq in seq_group.get_seqs(SequenceStatus.WAITING):
                    seq.status = SequenceStatus.RUNNING
                self.running.append(seq_group)
                scheduled.append(seq_group)
                num_batched_tokens += n_prompt
                num_curr_seqs += new_seqs

            if scheduled or ignored:
                return SchedulerOutputs(
                    scheduled_seq_groups=scheduled,
                    prompt_run=True,
                    num_batched_tokens=num_batched_tokens,
                    blocks_to_swap_in=blocks_to_swap_in,
                    blocks_to_swap_out=blocks_to_swap_out,
                    blocks_to_copy=blocks_to_copy,
                    streaming_blocks_to_swap_in=s_swap_in,
                    streaming_blocks_to_swap_out=s_swap_out,
                    streaming_blocks_to_copy=s_copy,
                    ignored_seq_groups=ignored,
                )

        # Phase 2: decode step for running groups, preempting on OOM
        # (reference scheduler.py:283-330, 459-508).
        self.running = self.policy.sort_by_priority(now, self.running)
        running: List[SequenceGroup] = []
        preempted: List[SequenceGroup] = []
        while self.running:
            seq_group = self.running.pop(0)
            while not self.block_manager.can_append_slot(seq_group):
                if self.running:
                    victim = self.running.pop(-1)
                    self._preempt(victim, blocks_to_swap_out, s_swap_out)
                    preempted.append(victim)
                else:
                    self._preempt(seq_group, blocks_to_swap_out, s_swap_out)
                    preempted.append(seq_group)
                    break
            else:
                self._append_slots(seq_group, blocks_to_copy, s_copy)
                running.append(seq_group)
        self.running = running

        # Phase 3: swap in previously swapped groups if memory allows.
        self.swapped = deque(self.policy.sort_by_priority(now, self.swapped))
        while self.swapped and not blocks_to_swap_out:
            seq_group = self.swapped[0]
            if not self.block_manager.can_swap_in(seq_group):
                break
            num_curr_seqs = sum(
                g.get_max_num_running_seqs() for g in self.running
            )
            if (
                num_curr_seqs + seq_group.get_max_num_running_seqs()
                > self.scheduler_config.max_num_seqs
            ):
                break
            self.swapped.popleft()
            self._swap_in(seq_group, blocks_to_swap_in, s_swap_in)
            self._append_slots(seq_group, blocks_to_copy, s_copy)
            self.running.append(seq_group)

        num_batched_tokens = sum(
            g.num_seqs(SequenceStatus.RUNNING) for g in self.running
        )
        return SchedulerOutputs(
            scheduled_seq_groups=list(self.running),
            prompt_run=False,
            num_batched_tokens=num_batched_tokens,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            streaming_blocks_to_swap_in=s_swap_in,
            streaming_blocks_to_swap_out=s_swap_out,
            streaming_blocks_to_copy=s_copy,
            ignored_seq_groups=ignored,
        )

    def schedule(self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        outputs = self._schedule()
        metadata: List[SequenceGroupMetadata] = []
        for seq_group in outputs.scheduled_seq_groups:
            seq_data = {}
            block_tables = {}
            streaming_tables = {}
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = self.block_manager.get_block_table(
                    seq
                )
                if self.block_manager.streaming is not None:
                    streaming_tables[seq.seq_id] = (
                        self.block_manager.get_streaming_block_table(seq)
                    )
            metadata.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=outputs.prompt_run,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                    streaming_block_tables=streaming_tables,
                    prefix=seq_group.prefix,
                )
            )
        return metadata, outputs

    # -- helpers -----------------------------------------------------------
    def _append_slots(
        self,
        seq_group: SequenceGroup,
        blocks_to_copy: Dict[int, List[int]],
        streaming_blocks_to_copy: Dict[int, List[int]],
    ) -> None:
        for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
            r_cow, s_cow = self.block_manager.append_slot(seq)
            if r_cow is not None:
                src, dst = r_cow
                blocks_to_copy.setdefault(src, []).append(dst)
            if s_cow is not None:
                src, dst = s_cow
                streaming_blocks_to_copy.setdefault(src, []).append(dst)

    def _preempt(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
        streaming_blocks_to_swap_out: Dict[int, int],
        preemption_mode: Optional[str] = None,
    ) -> None:
        if preemption_mode is None:
            # Single-seq groups recompute (cheaper than swap roundtrip);
            # multi-seq groups swap so DIVERGED forks keep their distinct
            # KV (recompute would re-allocate one shared prompt table for
            # all forks, reference scheduler.py:470-480). Prefix-shared
            # pages are swap-safe: swap-out only reads the device page and
            # drops this group's ref — the prefix pool's own pin keeps the
            # page alive for other requests.
            if seq_group.get_max_num_running_seqs() == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        if preemption_mode == PreemptionMode.RECOMPUTE:
            seqs = seq_group.get_seqs(SequenceStatus.RUNNING)
            for seq in seqs:
                seq.status = SequenceStatus.WAITING
                self.block_manager.free(seq)
            self.waiting.appendleft(seq_group)
        else:
            if not self.block_manager.can_swap_out(seq_group):
                raise RuntimeError(
                    "Not enough host swap space for preemption; "
                    "increase swap_space_gb."
                )
            r_map, s_map = self.block_manager.swap_out(seq_group)
            blocks_to_swap_out.update(r_map)
            streaming_blocks_to_swap_out.update(s_map)
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                seq.status = SequenceStatus.SWAPPED
            self.swapped.append(seq_group)

    def _swap_in(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_in: Dict[int, int],
        streaming_blocks_to_swap_in: Dict[int, int],
    ) -> None:
        r_map, s_map = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.update(r_map)
        streaming_blocks_to_swap_in.update(s_map)
        for seq in seq_group.get_seqs(SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def fork_seq(self, parent: Sequence, child: Sequence) -> None:
        self.block_manager.fork(parent, child)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        self.running = [g for g in self.running if not g.is_finished()]
