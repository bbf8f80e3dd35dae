"""Paged-KV block management: dual (retrieval + streaming) pools.

Behavioral contract from the reference ``omniserve/core/block_manager.py``:

- Ref-counted allocator with free-list (reference :23-64).
- Watermark admission to avoid thrashing (reference :113-139).
- Copy-on-write on append when a block is shared (reference :203-236).
- CPU swap bookkeeping (reference :268-336).
- The STREAMING pool is a ring: a sequence owns at most
  ``sink_blocks + local_blocks`` physical pages; logical block index ``i``
  maps to table slot ``i`` if ``i < sink_blocks`` else
  ``sink_blocks + (i - sink_blocks) % local_blocks`` (reference
  :168-178, :208-222 and kernels/csrc/.../kvCacheUtils.h:117-133).
- ``BlockSpaceManager`` composes a retrieval manager and an optional
  streaming manager and merges their answers (reference :370-458).

The implementation is new: allocators hand out integer page ids consumed
directly by Pallas kernels via scalar-prefetched block tables.
"""

from __future__ import annotations

import enum
from typing import Dict, List, Optional, Tuple

from omniserve_tpu.core.block import Device, PhysicalBlock
from omniserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

# seq_id -> list of physical page ids (retrieval: one per logical block;
# streaming: at most sink_blocks + local_blocks entries in ring order).
BlockTable = List[int]


class AllocStatus(enum.Enum):
    OK = enum.auto()      # can allocate now
    LATER = enum.auto()   # not now, retry when memory frees up
    NEVER = enum.auto()   # prompt can never fit; reject the request


class BlockAllocator:
    """Ref-counted free-list allocator over a fixed pool of pages."""

    def __init__(
        self,
        device: str,
        num_blocks: int,
        reserved_ids: Optional[List[int]] = None,
    ) -> None:
        self.device = device
        self.num_blocks = num_blocks
        self._blocks = [PhysicalBlock(device, i) for i in range(num_blocks)]
        reserved = set(reserved_ids or ())
        self._free: List[int] = [
            i for i in range(num_blocks - 1, -1, -1) if i not in reserved
        ]

    def allocate(self) -> int:
        if not self._free:
            raise RuntimeError(
                f"Out of KV pages on {self.device} pool "
                f"(size {self.num_blocks})."
            )
        bid = self._free.pop()
        self._blocks[bid].ref_count = 1
        return bid

    def ref(self, block_id: int) -> None:
        self._blocks[block_id].ref_count += 1

    def free(self, block_id: int) -> None:
        blk = self._blocks[block_id]
        if blk.ref_count <= 0:
            raise RuntimeError(f"Double free of page {block_id}")
        blk.ref_count -= 1
        if blk.ref_count == 0:
            self._free.append(block_id)

    def ref_count(self, block_id: int) -> int:
        return self._blocks[block_id].ref_count

    def get_num_free_blocks(self) -> int:
        return len(self._free)


def ring_slot(logical_idx: int, sink_blocks: int, local_blocks: int) -> int:
    """Ring mapping: logical block index -> slot in the streaming table.

    Matches the reference's streaming KV indexing
    (kernels/csrc/.../kvCacheUtils.h:117-133).
    """
    if logical_idx < sink_blocks:
        return logical_idx
    return sink_blocks + (logical_idx - sink_blocks) % local_blocks


class BaseBlockManager:
    """Single-pool block manager (used for retrieval and streaming pools)."""

    def __init__(
        self,
        page_size: int,
        num_device_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        is_streaming: bool = False,
        sink_blocks: int = 0,
        local_blocks: int = 0,
        sp_shards: int = 1,
    ) -> None:
        self.page_size = page_size
        # The TOP page index of EVERY sequence-parallel shard is reserved
        # as that shard's TRASH page: inside shard_map the Pallas decode
        # append sees only its local slice of the pool and routes inactive
        # (-1) tokens' writes to its LOCAL last page
        # (ops/pallas/kv_append.py), i.e. global page (r+1)*P/sp - 1 on
        # rank r. Those ids must never be handed out. With sp_shards == 1
        # this reserves exactly the global top page.
        pool_size = num_device_blocks
        shard = max(1, pool_size // max(1, sp_shards))
        reserved = sorted({
            min(pool_size, (r + 1) * shard) - 1
            for r in range(max(1, sp_shards))
        })
        self.trash_page_ids = reserved
        self.num_device_blocks = max(1, pool_size - len(reserved))
        self.watermark_blocks = int(watermark * self.num_device_blocks)
        self.is_streaming = is_streaming
        self.sink_blocks = sink_blocks
        self.local_blocks = local_blocks
        if is_streaming and local_blocks < 1:
            raise ValueError("streaming pool needs local_blocks >= 1")
        self.device_allocator = BlockAllocator(
            Device.GPU, pool_size, reserved_ids=reserved
        )
        self.cpu_allocator = BlockAllocator(Device.CPU, num_cpu_blocks)
        self.block_tables: Dict[int, BlockTable] = {}
        # Swapped-out tables live on the CPU allocator's id space.
        self.cpu_block_tables: Dict[int, BlockTable] = {}

    # -- sizing ---------------------------------------------------------
    def _blocks_needed(self, num_logical: int) -> int:
        if not self.is_streaming:
            return num_logical
        return min(num_logical, self.sink_blocks + self.local_blocks)

    def blocks_needed_for_seq(self, seq: Sequence) -> int:
        return self._blocks_needed(seq.num_logical_blocks())

    # -- prompt allocation ----------------------------------------------
    def _group_prefix(self, seq_group: SequenceGroup):
        """Shared prompt prefix, retrieval pool only (the streaming ring's
        positional slot reuse is incompatible with cross-request pages)."""
        if self.is_streaming:
            return None
        return getattr(seq_group, "prefix", None)

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(SequenceStatus.WAITING)[0]
        need = self.blocks_needed_for_seq(seq)
        prefix = self._group_prefix(seq_group)
        if prefix is not None and prefix.allocated:
            # prefix pages already live in the pool (reference
            # block_manager.py:126-127)
            need -= prefix.get_num_blocks()
        free = self.device_allocator.get_num_free_blocks()
        if self.num_device_blocks - need < self.watermark_blocks:
            return AllocStatus.NEVER
        if free - need >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        seq = seq_group.get_seqs(SequenceStatus.WAITING)[0]
        need = self.blocks_needed_for_seq(seq)
        prefix = self._group_prefix(seq_group)
        table: List[int] = []
        if prefix is not None and prefix.allocated:
            # reuse the shared prefix pages (reference :157-170)
            for bid in prefix.get_block_numbers():
                self.device_allocator.ref(bid)
                table.append(bid)
        while len(table) < need:
            table.append(self.device_allocator.allocate())
        if (
            prefix is not None
            and not prefix.allocated
            and not prefix.evicted
            and prefix.get_num_blocks() <= need
        ):
            # first request with this prefix: publish its pages and pin
            # them with the pool's own reference (reference :181-188)
            head = table[: prefix.get_num_blocks()]
            prefix.set_block_table(head)
            for bid in head:
                self.device_allocator.ref(bid)
        # All candidate seqs of the group share the prompt pages.
        n_waiting = len(seq_group.get_seqs(SequenceStatus.WAITING))
        for bid in table:
            for _ in range(n_waiting - 1):
                self.device_allocator.ref(bid)
        for s in seq_group.get_seqs(SequenceStatus.WAITING):
            self.block_tables[s.seq_id] = list(table)

    # -- decode append ----------------------------------------------------
    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        # Worst case: every running seq needs one new page this step.
        n_running = len(seq_group.get_seqs(SequenceStatus.RUNNING))
        return self.device_allocator.get_num_free_blocks() >= n_running

    def reserve_slots(self, seq: Sequence, extra_tokens: int) -> None:
        """Pre-grow the table to cover ``extra_tokens`` future appends
        (multi-step decode allocates its pages up front)."""
        needed = -(-(seq.get_len() + extra_tokens) // self.page_size)
        if self.is_streaming:
            needed = min(needed, self.sink_blocks + self.local_blocks)
        table = self.block_tables[seq.seq_id]
        while len(table) < needed:
            table.append(self.device_allocator.allocate())

    def pages_to_reserve(self, seq: Sequence, extra_tokens: int) -> int:
        """How many pages reserve_slots(seq, extra_tokens) would allocate."""
        needed = -(-(seq.get_len() + extra_tokens) // self.page_size)
        if self.is_streaming:
            needed = min(needed, self.sink_blocks + self.local_blocks)
        return max(0, needed - len(self.block_tables[seq.seq_id]))

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        """Account for one appended token.

        Returns (src, dst) physical page ids if a copy-on-write is needed,
        else None. May grow the block table by one page.
        """
        table = self.block_tables[seq.seq_id]
        num_logical = seq.num_logical_blocks()
        if self.is_streaming:
            # Ring: never grows beyond sink+local; new logical blocks map
            # onto existing physical slots (overwrite, no CoW — pages are
            # never shared in the streaming pool after prompt).
            cap = self.sink_blocks + self.local_blocks
            if len(table) < min(num_logical, cap):
                table.append(self.device_allocator.allocate())
            return None
        if num_logical > len(table):
            table.append(self.device_allocator.allocate())
            return None
        # Appending into the last page: copy-on-write if shared.
        last = table[-1]
        if self.device_allocator.ref_count(last) == 1:
            return None
        new_block = self.device_allocator.allocate()
        table[-1] = new_block
        self.device_allocator.free(last)
        return last, new_block

    def fork(self, parent: Sequence, child: Sequence) -> None:
        src = self.block_tables[parent.seq_id]
        self.block_tables[child.seq_id] = list(src)
        for bid in src:
            self.device_allocator.ref(bid)

    # -- swap -------------------------------------------------------------
    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        blocks = set()
        for s in seq_group.get_seqs(SequenceStatus.SWAPPED):
            blocks.update(self.cpu_block_tables[s.seq_id])
        need = len(blocks) + seq_group.num_seqs(SequenceStatus.SWAPPED)
        free = self.device_allocator.get_num_free_blocks()
        return free - need >= self.watermark_blocks

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """CPU page id -> device page id map for this group."""
        mapping: Dict[int, int] = {}
        for s in seq_group.get_seqs(SequenceStatus.SWAPPED):
            new_table: BlockTable = []
            for cpu_bid in self.cpu_block_tables[s.seq_id]:
                if cpu_bid in mapping:
                    dev_bid = mapping[cpu_bid]
                    self.device_allocator.ref(dev_bid)
                else:
                    dev_bid = self.device_allocator.allocate()
                    mapping[cpu_bid] = dev_bid
                new_table.append(dev_bid)
                self.cpu_allocator.free(cpu_bid)
            del self.cpu_block_tables[s.seq_id]
            self.block_tables[s.seq_id] = new_table
        return mapping

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = set()
        for s in seq_group.get_seqs(SequenceStatus.RUNNING):
            blocks.update(self.block_tables[s.seq_id])
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Device page id -> CPU page id map for this group."""
        mapping: Dict[int, int] = {}
        for s in seq_group.get_seqs(SequenceStatus.RUNNING):
            new_table: BlockTable = []
            for dev_bid in self.block_tables[s.seq_id]:
                if dev_bid in mapping:
                    cpu_bid = mapping[dev_bid]
                    self.cpu_allocator.ref(cpu_bid)
                else:
                    cpu_bid = self.cpu_allocator.allocate()
                    mapping[dev_bid] = cpu_bid
                new_table.append(cpu_bid)
                self.device_allocator.free(dev_bid)
            del self.block_tables[s.seq_id]
            self.cpu_block_tables[s.seq_id] = new_table
        return mapping

    # -- free ---------------------------------------------------------------
    def release_prefix(self, prefix) -> None:
        """Drop an evicted prefix's pool pin (PrefixPool on_evict hook).
        Pages still referenced by live sequences stay allocated."""
        if prefix.block_table:
            for bid in prefix.block_table:
                self.device_allocator.free(bid)
        prefix.block_table = None
        prefix.computed = False

    def free(self, seq: Sequence) -> None:
        if seq.seq_id in self.block_tables:
            for bid in self.block_tables.pop(seq.seq_id):
                self.device_allocator.free(bid)
        if seq.seq_id in self.cpu_block_tables:
            for bid in self.cpu_block_tables.pop(seq.seq_id):
                self.cpu_allocator.free(bid)

    def reset(self) -> None:
        for seq_id in list(self.block_tables):
            for bid in self.block_tables.pop(seq_id):
                self.device_allocator.free(bid)
        for seq_id in list(self.cpu_block_tables):
            for bid in self.cpu_block_tables.pop(seq_id):
                self.cpu_allocator.free(bid)

    def get_block_table(self, seq: Sequence) -> BlockTable:
        return list(self.block_tables[seq.seq_id])

    def has_seq(self, seq: Sequence) -> bool:
        return seq.seq_id in self.block_tables

    def get_num_free_device_blocks(self) -> int:
        return self.device_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()


class BlockSpaceManager:
    """Dual-pool manager: retrieval (full history) + optional streaming ring.

    Merges the two pools' admission/append/swap answers the way the
    reference's composed manager does (block_manager.py:370-551).
    """

    def __init__(
        self,
        page_size: int,
        num_retrieval_blocks: int,
        num_retrieval_cpu_blocks: int,
        num_streaming_blocks: int = 0,
        num_streaming_cpu_blocks: int = 0,
        watermark: float = 0.01,
        streaming_sink_blocks: int = 0,
        streaming_local_blocks: int = 0,
        enable_streaming: bool = False,
        sp_shards: int = 1,
    ) -> None:
        self.page_size = page_size
        self.retrieval = BaseBlockManager(
            page_size, num_retrieval_blocks, num_retrieval_cpu_blocks,
            watermark, sp_shards=sp_shards,
        )
        self.streaming: Optional[BaseBlockManager] = None
        if enable_streaming:
            self.streaming = BaseBlockManager(
                page_size,
                num_streaming_blocks,
                num_streaming_cpu_blocks,
                watermark,
                is_streaming=True,
                sink_blocks=streaming_sink_blocks,
                local_blocks=streaming_local_blocks,
            )

    def _pools(self) -> List[BaseBlockManager]:
        return [self.retrieval] + ([self.streaming] if self.streaming else [])

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        statuses = [p.can_allocate(seq_group) for p in self._pools()]
        if AllocStatus.NEVER in statuses:
            return AllocStatus.NEVER
        if AllocStatus.LATER in statuses:
            return AllocStatus.LATER
        return AllocStatus.OK

    def allocate(self, seq_group: SequenceGroup) -> None:
        for p in self._pools():
            p.allocate(seq_group)

    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        return all(p.can_append_slot(seq_group) for p in self._pools())

    def append_slot(
        self, seq: Sequence
    ) -> Tuple[Optional[Tuple[int, int]], Optional[Tuple[int, int]]]:
        """Returns (retrieval_cow, streaming_cow)."""
        r = self.retrieval.append_slot(seq)
        s = self.streaming.append_slot(seq) if self.streaming else None
        return r, s

    def reserve_slots(self, seq: Sequence, extra_tokens: int) -> None:
        for p in self._pools():
            p.reserve_slots(seq, extra_tokens)

    def can_reserve_slots(self, seqs, extra_tokens: int) -> bool:
        """Whether reserve_slots(seq, extra) can cover EVERY seq without
        exhausting either pool (multi-step windows degrade to single-step
        instead of raising mid-window)."""
        for p in self._pools():
            total = sum(p.pages_to_reserve(s, extra_tokens) for s in seqs)
            if total > p.device_allocator.get_num_free_blocks():
                return False
        return True

    def fork(self, parent: Sequence, child: Sequence) -> None:
        for p in self._pools():
            p.fork(parent, child)

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        return all(p.can_swap_in(seq_group) for p in self._pools())

    def swap_in(
        self, seq_group: SequenceGroup
    ) -> Tuple[Dict[int, int], Dict[int, int]]:
        r = self.retrieval.swap_in(seq_group)
        s = self.streaming.swap_in(seq_group) if self.streaming else {}
        return r, s

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        return all(p.can_swap_out(seq_group) for p in self._pools())

    def swap_out(
        self, seq_group: SequenceGroup
    ) -> Tuple[Dict[int, int], Dict[int, int]]:
        r = self.retrieval.swap_out(seq_group)
        s = self.streaming.swap_out(seq_group) if self.streaming else {}
        return r, s

    def release_prefix(self, prefix) -> None:
        # prefixes live in the retrieval pool only (_group_prefix)
        self.retrieval.release_prefix(prefix)

    def free(self, seq: Sequence) -> None:
        for p in self._pools():
            p.free(seq)

    def reset(self) -> None:
        for p in self._pools():
            p.reset()

    def get_block_table(self, seq: Sequence) -> BlockTable:
        return self.retrieval.get_block_table(seq)

    def get_streaming_block_table(self, seq: Sequence) -> BlockTable:
        if self.streaming is None:
            return []
        return self.streaming.get_block_table(seq)

    def get_num_free_device_blocks(self) -> int:
        return self.retrieval.get_num_free_device_blocks()
