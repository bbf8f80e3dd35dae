"""Prefix sharing: pool registry + block-manager page reuse + engine hook."""

import numpy as np

from omniserve_tpu.config import CacheConfig, IFBConfig, SchedulerConfig
from omniserve_tpu.core.prefix import PrefixPool
from omniserve_tpu.core.scheduler import Scheduler
from omniserve_tpu.sampling_params import SamplingParams
from omniserve_tpu.sequence import Sequence, SequenceGroup

PAGE = 16


def make_scheduler(num_blocks=64):
    cache = CacheConfig(
        page_size=PAGE,
        num_retrieval_device_blocks=num_blocks,
        num_retrieval_cpu_blocks=8,
        num_streaming_device_blocks=0,
        num_streaming_cpu_blocks=0,
        watermark=0.0,
    )
    sched = SchedulerConfig(
        max_num_batched_tokens=4096, max_num_seqs=16, max_model_len=2048
    )
    return Scheduler(sched, cache, IFBConfig(ifb_mode=True))


def group(sched, rid, tokens, prefix_pos=None):
    prefix = (
        sched.prefix_pool.add_or_get_prefix(tokens[:prefix_pos])
        if prefix_pos is not None
        else None
    )
    seq = Sequence(int(rid), None, tokens, page_size=PAGE)
    g = SequenceGroup(rid, [seq], SamplingParams(max_tokens=4), 0.0,
                      prefix=prefix)
    sched.add_seq_group(g)
    return g, seq


def test_pool_dedup_and_alignment():
    pool = PrefixPool(PAGE)
    toks = list(range(PAGE * 2 + 5))
    p1 = pool.add_or_get_prefix(toks[: PAGE * 2])
    p2 = pool.add_or_get_prefix(toks[: PAGE * 2])
    assert p1 is p2 and len(pool) == 1
    assert pool.add_or_get_prefix(toks[:3]) is None  # sub-page -> no prefix


def test_prefix_pages_shared_between_groups():
    sched = make_scheduler()
    toks = list(range(PAGE * 3))          # 2-page shared prefix + 1 page
    g1, s1 = group(sched, "1", toks, prefix_pos=PAGE * 2)
    sched.schedule()                       # allocates g1, publishes prefix
    t1 = sched.block_manager.get_block_table(s1)
    assert g1.prefix.allocated
    assert g1.prefix.get_block_numbers() == t1[:2]

    g2, s2 = group(sched, "2", list(toks), prefix_pos=PAGE * 2)
    sched.schedule()
    t2 = sched.block_manager.get_block_table(s2)
    assert t2[:2] == t1[:2]                # shared pages
    assert t2[2] != t1[2]                  # private tail

    # freeing both seqs must NOT release the pinned prefix pages
    alloc = sched.block_manager.retrieval.device_allocator
    for s in (s1, s2):
        sched.free_seq(s)
    for bid in t1[:2]:
        assert alloc.ref_count(bid) == 1   # pool's pin remains
    assert alloc.ref_count(t1[2]) == 0


def test_lru_eviction_releases_pin():
    sched = make_scheduler()
    sched.prefix_pool.capacity = 2
    alloc = sched.block_manager.retrieval.device_allocator
    g0, s0 = group(sched, "0", list(range(PAGE * 2)), prefix_pos=PAGE)
    sched.schedule()
    t0 = sched.block_manager.get_block_table(s0)
    g1, s1 = group(sched, "1", list(range(1000, 1000 + PAGE * 2)),
                   prefix_pos=PAGE)
    sched.schedule()
    # finish request 0 so only the pool pin holds its prefix page
    sched.free_seq(s0)
    assert alloc.ref_count(t0[0]) == 1      # the pin
    # a third distinct prefix evicts the LRU entry (prefix 0)
    sched.prefix_pool.add_or_get_prefix(list(range(2000, 2000 + PAGE)))
    assert len(sched.prefix_pool) == 2
    assert g0.prefix.evicted and not g0.prefix.allocated
    assert alloc.ref_count(t0[0]) == 0      # pin released -> page free
    assert alloc.ref_count(
        sched.block_manager.get_block_table(s1)[0]
    ) == 2                                  # live prefix keeps seq + pin

    # a WAITING group holding an evicted prefix must not re-pin pages
    g3, s3 = group(sched, "3", list(range(0, PAGE * 2)), prefix_pos=PAGE)
    g3.prefix = g0.prefix                    # simulate the stale attach
    sched.schedule()
    t3 = sched.block_manager.get_block_table(s3)
    assert g0.prefix.block_table is None     # never re-published
    sched.free_seq(s3)
    assert alloc.ref_count(t3[0]) == 0       # no orphan pin


def test_multi_seq_group_preemption_swaps_not_recomputes():
    """Diverged forks must SWAP on preemption: recompute would hand every
    fork one shared prompt table (allocate sizes from seqs[0]) and their
    re-prefills would overwrite each other's KV."""
    from omniserve_tpu.core.scheduler import PreemptionMode

    sched = make_scheduler()
    toks = list(range(PAGE * 2))
    prefix = sched.prefix_pool.add_or_get_prefix(toks[:PAGE])
    seqs = [Sequence(10, None, list(toks), page_size=PAGE),
            Sequence(11, None, list(toks), page_size=PAGE)]
    g = SequenceGroup("10", seqs, SamplingParams(max_tokens=4, best_of=2,
                                                 temperature=0.7), 0.0,
                      prefix=prefix)
    sched.add_seq_group(g)
    sched.schedule()
    swap_out = {}
    sched._preempt(g, swap_out, {})
    assert g in sched.swapped and swap_out   # SWAP path, not recompute


def test_unrelated_prefixes_do_not_share():
    sched = make_scheduler()
    g1, s1 = group(sched, "1", list(range(PAGE * 2)), prefix_pos=PAGE)
    sched.schedule()
    g2, s2 = group(sched, "2", list(range(100, 100 + PAGE * 2)),
                   prefix_pos=PAGE)
    sched.schedule()
    t1 = sched.block_manager.get_block_table(s1)
    t2 = sched.block_manager.get_block_table(s2)
    assert t1[0] != t2[0]


def test_engine_add_request_prefix(tmp_path):
    # engine-level smoke on a tiny random model
    from transformers import LlamaConfig

    from omniserve_tpu import EngineArgs, LLMEngine

    d = tmp_path / "tiny"
    LlamaConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=str(d), precision="w4a8kv4", load_format="dummy",
        block_size=16, max_num_seqs=8, max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
    ))
    toks = list(np.arange(engine.cache_config.page_size * 2) % 50 + 2)
    engine.add_request(
        "a", prompt_token_ids=list(toks),
        sampling_params=SamplingParams(max_tokens=2, ignore_eos=True),
        prefix_pos=engine.cache_config.page_size,
    )
    engine.add_request(
        "b", prompt_token_ids=list(toks),
        sampling_params=SamplingParams(max_tokens=2, ignore_eos=True),
        prefix_pos=engine.cache_config.page_size,
    )
    outs = []
    while engine.has_unfinished_requests():
        outs = engine.step()
    assert len(engine.scheduler.prefix_pool) == 1
