"""Unit tests for the dual paged-KV block manager."""

import pytest

from omniserve_tpu.core.block_manager import (
    AllocStatus,
    BlockAllocator,
    BaseBlockManager,
    BlockSpaceManager,
    ring_slot,
)
from omniserve_tpu.sampling_params import SamplingParams
from omniserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

PAGE = 16


def make_group(n_tokens, seq_id=0, request_id="r0", page_size=PAGE):
    seq = Sequence(seq_id, "p", list(range(n_tokens)), page_size=page_size)
    group = SequenceGroup(
        request_id, [seq], SamplingParams(temperature=0.0), arrival_time=0.0
    )
    return group, seq


class TestBlockAllocator:
    def test_alloc_free_roundtrip(self):
        alloc = BlockAllocator("device", 4)
        ids = [alloc.allocate() for _ in range(4)]
        assert sorted(ids) == [0, 1, 2, 3]
        with pytest.raises(RuntimeError):
            alloc.allocate()
        alloc.free(ids[0])
        assert alloc.get_num_free_blocks() == 1
        assert alloc.allocate() == ids[0]

    def test_ref_counting(self):
        alloc = BlockAllocator("device", 2)
        b = alloc.allocate()
        alloc.ref(b)
        alloc.free(b)
        assert alloc.get_num_free_blocks() == 1  # still held once
        alloc.free(b)
        assert alloc.get_num_free_blocks() == 2
        with pytest.raises(RuntimeError):
            alloc.free(b)


class TestRingSlot:
    def test_sink_then_ring(self):
        # sink=2 blocks, local=3 blocks
        assert [ring_slot(i, 2, 3) for i in range(10)] == [
            0, 1, 2, 3, 4, 2, 3, 4, 2, 3,
        ]


class TestBaseBlockManager:
    def test_prompt_allocation_and_free(self):
        mgr = BaseBlockManager(PAGE, num_device_blocks=101, num_cpu_blocks=10)
        group, seq = make_group(3 * PAGE + 1)
        assert mgr.can_allocate(group) == AllocStatus.OK
        mgr.allocate(group)
        assert len(mgr.get_block_table(seq)) == 4
        assert mgr.get_num_free_device_blocks() == 96
        mgr.free(seq)
        assert mgr.get_num_free_device_blocks() == 100

    def test_sp_shards_reserve_per_rank_trash_pages(self):
        # sp=2 over a 10-page pool: each rank's LOCAL top page (global 4
        # and 9) is the shard_map decode-append trash target and must
        # never be handed out (ops/pallas/kv_append.py routes -1 tokens
        # to local page P/sp - 1 on every rank).
        mgr = BaseBlockManager(
            PAGE, num_device_blocks=10, num_cpu_blocks=0, sp_shards=2
        )
        assert mgr.trash_page_ids == [4, 9]
        assert mgr.num_device_blocks == 8
        got = {mgr.device_allocator.allocate() for _ in range(8)}
        assert got == {0, 1, 2, 3, 5, 6, 7, 8}
        import pytest

        with pytest.raises(RuntimeError):
            mgr.device_allocator.allocate()

    def test_default_reserves_single_global_trash_page(self):
        mgr = BaseBlockManager(PAGE, num_device_blocks=5, num_cpu_blocks=0)
        assert mgr.trash_page_ids == [4]
        got = {mgr.device_allocator.allocate() for _ in range(4)}
        assert 4 not in got

    def test_watermark_admission(self):
        mgr = BaseBlockManager(
            PAGE, num_device_blocks=101, num_cpu_blocks=10, watermark=0.05
        )
        group, _ = make_group(98 * PAGE)
        # 98 blocks leaves 2 < watermark 5 even when empty -> NEVER... 100-98=2<5
        assert mgr.can_allocate(group) == AllocStatus.NEVER
        group2, _ = make_group(90 * PAGE)
        assert mgr.can_allocate(group2) == AllocStatus.OK
        mgr.allocate(group2)
        group3, seq3 = make_group(8 * PAGE, seq_id=1, request_id="r1")
        # 10 free - 8 = 2 < 5 -> LATER
        assert mgr.can_allocate(group3) == AllocStatus.LATER

    def test_append_slot_grows_table(self):
        mgr = BaseBlockManager(PAGE, num_device_blocks=11, num_cpu_blocks=0)
        group, seq = make_group(PAGE)  # exactly one full page
        mgr.allocate(group)
        seq.status = SequenceStatus.RUNNING
        seq.append_token_id(7)
        cow = mgr.append_slot(seq)
        assert cow is None
        assert len(mgr.get_block_table(seq)) == 2

    def test_copy_on_write_on_shared_block(self):
        mgr = BaseBlockManager(PAGE, num_device_blocks=11, num_cpu_blocks=0)
        group, seq = make_group(PAGE - 1)
        mgr.allocate(group)
        child = seq.fork(99)
        mgr.fork(seq, child)
        seq.status = SequenceStatus.RUNNING
        seq.append_token_id(1)
        cow = mgr.append_slot(seq)
        assert cow is not None
        src, dst = cow
        assert src != dst
        # parent's table now points at the new block; child keeps the old one
        assert mgr.get_block_table(seq)[-1] == dst
        assert mgr.get_block_table(child)[-1] == src

    def test_swap_out_in_roundtrip(self):
        mgr = BaseBlockManager(PAGE, num_device_blocks=11, num_cpu_blocks=10)
        group, seq = make_group(2 * PAGE)
        mgr.allocate(group)
        seq.status = SequenceStatus.RUNNING
        table_before = mgr.get_block_table(seq)
        assert mgr.can_swap_out(group)
        out_map = mgr.swap_out(group)
        assert len(out_map) == 2
        assert mgr.get_num_free_device_blocks() == 10
        seq.status = SequenceStatus.SWAPPED
        assert mgr.can_swap_in(group)
        in_map = mgr.swap_in(group)
        assert len(in_map) == 2
        assert len(mgr.get_block_table(seq)) == len(table_before)
        assert mgr.get_num_free_cpu_blocks() == 10


class TestStreamingRing:
    def test_capacity_capped_at_sink_plus_local(self):
        mgr = BaseBlockManager(
            PAGE, num_device_blocks=21, num_cpu_blocks=0,
            is_streaming=True, sink_blocks=2, local_blocks=3,
        )
        group, seq = make_group(10 * PAGE)  # 10 logical blocks
        assert mgr.blocks_needed_for_seq(seq) == 5
        mgr.allocate(group)
        assert len(mgr.get_block_table(seq)) == 5
        assert mgr.get_num_free_device_blocks() == 15

    def test_append_never_grows_past_capacity(self):
        mgr = BaseBlockManager(
            PAGE, num_device_blocks=21, num_cpu_blocks=0,
            is_streaming=True, sink_blocks=1, local_blocks=2,
        )
        group, seq = make_group(PAGE)
        mgr.allocate(group)
        seq.status = SequenceStatus.RUNNING
        for _ in range(10 * PAGE):
            seq.append_token_id(1)
            cow = mgr.append_slot(seq)
            assert cow is None
        assert len(mgr.get_block_table(seq)) == 3  # sink+local cap


class TestDualManager:
    def test_dual_pools_compose(self):
        mgr = BlockSpaceManager(
            page_size=PAGE,
            num_retrieval_blocks=51,
            num_retrieval_cpu_blocks=10,
            num_streaming_blocks=11,
            num_streaming_cpu_blocks=5,
            streaming_sink_blocks=1,
            streaming_local_blocks=2,
            enable_streaming=True,
        )
        group, seq = make_group(8 * PAGE)
        assert mgr.can_allocate(group) == AllocStatus.OK
        mgr.allocate(group)
        assert len(mgr.get_block_table(seq)) == 8
        assert len(mgr.get_streaming_block_table(seq)) == 3
        mgr.free(seq)
        assert mgr.retrieval.get_num_free_device_blocks() == 50
        assert mgr.streaming.get_num_free_device_blocks() == 10

    def test_streaming_pool_limits_admission(self):
        mgr = BlockSpaceManager(
            page_size=PAGE,
            num_retrieval_blocks=100,
            num_retrieval_cpu_blocks=0,
            num_streaming_blocks=2,  # tiny streaming pool
            num_streaming_cpu_blocks=0,
            streaming_sink_blocks=1,
            streaming_local_blocks=2,
            enable_streaming=True,
        )
        group, _ = make_group(8 * PAGE)
        # streaming needs min(8, 3)=3 > 2 -> NEVER
        assert mgr.can_allocate(group) == AllocStatus.NEVER
