"""Unit tests for the continuous-batching scheduler."""

from omniserve_tpu.config import CacheConfig, IFBConfig, SchedulerConfig
from omniserve_tpu.core.scheduler import Scheduler
from omniserve_tpu.sampling_params import SamplingParams
from omniserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

PAGE = 16


def make_scheduler(
    num_blocks=100,
    max_tokens=1024,
    max_seqs=8,
    max_model_len=4096,
    **kwargs,
):
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max_tokens,
        max_num_seqs=max_seqs,
        max_model_len=max_model_len,
    )
    cache_cfg = CacheConfig(
        page_size=PAGE,
        num_retrieval_device_blocks=num_blocks,
        num_retrieval_cpu_blocks=20,
        num_streaming_device_blocks=kwargs.pop("num_streaming_blocks", 0),
        num_streaming_cpu_blocks=0,
    )
    return Scheduler(sched_cfg, cache_cfg, IFBConfig(True), **kwargs)


_next_id = [0]


def add_request(scheduler, n_tokens, request_id=None):
    i = _next_id[0]
    _next_id[0] += 1
    seq = Sequence(i, "p", list(range(n_tokens)), page_size=PAGE)
    group = SequenceGroup(
        request_id or f"req-{i}",
        [seq],
        SamplingParams(temperature=0.0, max_tokens=64),
        arrival_time=float(i),
    )
    scheduler.add_seq_group(group)
    return group, seq


class TestPrefillAdmission:
    def test_admits_up_to_token_budget(self):
        s = make_scheduler(max_tokens=100, max_seqs=8)
        g1, _ = add_request(s, 40)
        g2, _ = add_request(s, 40)
        g3, _ = add_request(s, 40)  # would exceed 100
        meta, out = s.schedule()
        assert out.prompt_run
        assert [m.request_id for m in meta] == [g1.request_id, g2.request_id]
        assert out.num_batched_tokens == 80
        # g3 admitted next round
        meta2, out2 = s.schedule()
        assert out2.prompt_run
        assert [m.request_id for m in meta2] == [g3.request_id]

    def test_respects_max_seqs(self):
        s = make_scheduler(max_tokens=10000, max_seqs=2)
        add_request(s, 10)
        add_request(s, 10)
        add_request(s, 10)
        meta, out = s.schedule()
        assert len(meta) == 2

    def test_ignores_too_long_prompt(self):
        s = make_scheduler(max_model_len=100)
        g, seq = add_request(s, 200)
        meta, out = s.schedule()
        assert meta == []
        assert out.ignored_seq_groups == [g]
        assert seq.status == SequenceStatus.FINISHED_IGNORED

    def test_metadata_carries_block_tables(self):
        s = make_scheduler()
        _, seq = add_request(s, 3 * PAGE)
        meta, _ = s.schedule()
        assert len(meta[0].block_tables[seq.seq_id]) == 3


class TestDecode:
    def test_decode_after_prefill(self):
        s = make_scheduler()
        g, seq = add_request(s, 10)
        s.schedule()  # prefill
        seq.append_token_id(5)
        meta, out = s.schedule()  # decode
        assert not out.prompt_run
        assert len(meta) == 1
        assert not meta[0].is_prompt

    def test_preemption_by_recompute(self):
        # 4 usable blocks (5 minus the reserved trash page); two 2-block
        # seqs fill the pool; appending forces
        # the lower-priority one back to waiting (RECOMPUTE).
        s = make_scheduler(num_blocks=5, max_tokens=1024)
        g1, seq1 = add_request(s, 2 * PAGE)
        g2, seq2 = add_request(s, 2 * PAGE)
        s.schedule()
        assert len(s.running) == 2
        seq1.append_token_id(1)
        seq2.append_token_id(1)
        meta, out = s.schedule()
        # one of the two must be preempted back to WAITING
        assert len(s.running) == 1
        assert len(s.waiting) == 1
        preempted = s.waiting[0]
        assert preempted is g2  # FCFS: newest arrival is the victim
        assert all(
            sq.status == SequenceStatus.WAITING for sq in preempted.get_seqs()
        )
        # preempted seq holds no pages
        assert not s.block_manager.retrieval.has_seq(seq2)

    def test_recomputed_seq_readmits_with_output_tokens(self):
        s = make_scheduler(num_blocks=4)
        g1, seq1 = add_request(s, 2 * PAGE)
        g2, seq2 = add_request(s, 2 * PAGE - 1)
        s.schedule()
        seq1.append_token_id(1)
        seq2.append_token_id(1)
        s.schedule()  # preempts g2
        # finish g1, free its pages
        for sq in g1.get_seqs():
            sq.status = SequenceStatus.FINISHED_STOPPED
            s.free_seq(sq)
        s.free_finished_seq_groups()
        meta, out = s.schedule()  # g2 re-admitted as a prefill
        assert out.prompt_run
        assert meta[0].request_id == g2.request_id
        # all tokens (prompt + generated) get re-prefilled
        assert out.num_batched_tokens == 2 * PAGE


class TestStreamingScheduler:
    def test_dual_tables_in_metadata(self):
        s = make_scheduler(
            num_streaming_blocks=20,
            streaming_sink_blocks=1,
            streaming_local_blocks=2,
            enable_streaming=True,
        )
        _, seq = add_request(s, 5 * PAGE)
        meta, _ = s.schedule()
        assert len(meta[0].block_tables[seq.seq_id]) == 5
        assert len(meta[0].streaming_block_tables[seq.seq_id]) == 3
