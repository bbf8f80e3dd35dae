"""End-to-end engine tests on a tiny dummy model (CPU)."""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama")
    LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_hidden_layers=2,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def make_engine(tiny_model_dir, precision="w4a8kv4", **kw):
    args = EngineArgs(
        model=tiny_model_dir,
        precision=precision,
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
        **kw,
    )
    return LLMEngine.from_engine_args(args)


class TestEngineE2E:
    def test_single_request_greedy(self, tiny_model_dir):
        engine = make_engine(tiny_model_dir)
        engine.add_request(
            "r0",
            prompt_token_ids=[1, 5, 9, 12, 7],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                           ignore_eos=True),
        )
        steps = 0
        final = None
        while engine.has_unfinished_requests():
            outs = engine.step()
            steps += 1
            for o in outs:
                if o.finished:
                    final = o
            assert steps < 30
        assert final is not None
        assert len(final.outputs[0].token_ids) == 8
        assert final.outputs[0].finish_reason == "length"

    def test_greedy_is_deterministic(self, tiny_model_dir):
        results = []
        for _ in range(2):
            engine = make_engine(tiny_model_dir)
            engine.add_request(
                "r0",
                prompt_token_ids=[3, 1, 4, 1, 5],
                sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                               ignore_eos=True),
            )
            toks = None
            while engine.has_unfinished_requests():
                for o in engine.step():
                    if o.finished:
                        toks = o.outputs[0].token_ids
            results.append(toks)
        assert results[0] == results[1]

    def test_continuous_batching_multiple_requests(self, tiny_model_dir):
        engine = make_engine(tiny_model_dir)
        for i in range(4):
            engine.add_request(
                f"r{i}",
                prompt_token_ids=list(range(1, 6 + i)),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=4 + i, ignore_eos=True
                ),
            )
        finished = {}
        steps = 0
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    finished[o.request_id] = o
            steps += 1
            assert steps < 60
        assert set(finished) == {"r0", "r1", "r2", "r3"}
        for i in range(4):
            assert len(finished[f"r{i}"].outputs[0].token_ids) == 4 + i

    def test_late_arrival_joins_batch(self, tiny_model_dir):
        engine = make_engine(tiny_model_dir)
        engine.add_request(
            "early", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=10,
                                           ignore_eos=True),
        )
        engine.step()  # prefill early
        engine.step()  # decode once
        engine.add_request(
            "late", prompt_token_ids=[4, 5, 6],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=3,
                                           ignore_eos=True),
        )
        finished = {}
        steps = 0
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    finished[o.request_id] = o
            steps += 1
            assert steps < 40
        assert set(finished) == {"early", "late"}

    def test_greedy_matches_isolated_run(self, tiny_model_dir):
        # tokens for a request must not depend on batch-mates (correct
        # KV isolation between sequences)
        prompts = {"a": [7, 8, 9, 10], "b": [20, 21, 22]}
        solo = {}
        for rid, p in prompts.items():
            engine = make_engine(tiny_model_dir)
            engine.add_request(
                rid, prompt_token_ids=p,
                sampling_params=SamplingParams(temperature=0.0, max_tokens=5,
                                               ignore_eos=True),
            )
            while engine.has_unfinished_requests():
                for o in engine.step():
                    if o.finished:
                        solo[rid] = o.outputs[0].token_ids
        engine = make_engine(tiny_model_dir)
        for rid, p in prompts.items():
            engine.add_request(
                rid, prompt_token_ids=p,
                sampling_params=SamplingParams(temperature=0.0, max_tokens=5,
                                               ignore_eos=True),
            )
        batched = {}
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    batched[o.request_id] = o.outputs[0].token_ids
        assert batched == solo

    def test_non_ifb_static_batch(self, tiny_model_dir):
        engine = make_engine(tiny_model_dir, ifb_mode=False,
                             benchmarking_mode=True)
        from omniserve_tpu.config import ProfilingConfig

        for i in range(2):
            engine.add_request(
                f"r{i}",
                sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                               ignore_eos=True),
                profiling_config=ProfilingConfig(prompt_len=8, generate_len=4),
            )
        for _ in range(5):  # 1 prefill + 4 decode steps
            outs = engine.step()
        for o in outs:
            assert len(o.outputs[0].token_ids) == 5


class TestEngineSparse:
    def test_sparse_engine_runs(self, tiny_model_dir):
        import numpy as np

        scores = np.array([[0.9, 0.1], [0.2, 0.8]], dtype=np.float32)
        # write the pattern file
        import os
        pat_dir = os.path.join(tiny_model_dir, "attn_pattern")
        os.makedirs(pat_dir, exist_ok=True)
        np.savetxt(
            os.path.join(pat_dir, "full_attention_heads.tsv"), scores,
            delimiter="\t",
        )
        engine = make_engine(
            tiny_model_dir,
            sparse_context_mode=True,
            sparse_decode_mode=True,
            static_sparsity=0.5,
            attn_pattern_path=pat_dir,
            ctx_sink_size=16,
            ctx_local_size=32,
            dec_sink_size=16,
            dec_local_size=32,
            sparse_kv_cache_budget=64,
            num_streaming_blocks=40,
        )
        engine.add_request(
            "r0", prompt_token_ids=list(range(1, 40)),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True),
        )
        done = None
        steps = 0
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    done = o
            steps += 1
            assert steps < 30
        assert done is not None
        assert len(done.outputs[0].token_ids) == 6


def test_abort_request_frees_worker_slot(tiny_model_dir):
    """Aborting a request must release its KV pages AND its worker decode
    slot (leaked slots grow the padded batch width forever)."""
    engine = make_engine(tiny_model_dir)
    for rid in ("keep", "drop"):
        engine.add_request(
            rid, prompt_token_ids=[3, 1, 4, 1, 5, 9],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True),
        )
    engine.step()   # prefill both
    engine.step()   # one decode step
    runner = engine.worker.model_runner
    assert len(runner._slots) == 2
    engine.abort_request("drop")
    assert len(runner._slots) == 1
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
    assert list(outs) == ["keep"] and len(outs["keep"]) == 8
    assert not runner._slots


def test_best_of_two_completions(tiny_model_dir):
    """best_of=2, n=1: two forks sample independently; the final output
    carries only the BEST candidate by cumulative logprob (vLLM
    semantics). n=2 returns both, best-first."""
    def run(n):
        engine = make_engine(tiny_model_dir)
        engine.add_request(
            "r0", prompt_token_ids=[3, 1, 4, 1, 5, 9],
            sampling_params=SamplingParams(
                n=n, temperature=0.7, best_of=2, max_tokens=4,
                ignore_eos=True),
        )
        outs = []
        while engine.has_unfinished_requests():
            outs = engine.step()
        return outs[-1]

    final = run(1)
    assert final.finished and len(final.outputs) == 1
    assert len(final.outputs[0].token_ids) == 4
    assert final.outputs[0].cumulative_logprob < 0.0   # actually tracked

    final = run(2)
    assert len(final.outputs) == 2
    lps = [c.cumulative_logprob for c in final.outputs]
    assert lps == sorted(lps, reverse=True)
    for comp in final.outputs:
        assert len(comp.token_ids) == 4


def test_reference_flag_aliases_and_omit_prompt(tiny_model_dir):
    """The reference's flag spellings (--benchmarking, --ctx-sink-token,
    --dynamic-sparse-token-budget, --omit-prompt, ...) parse as aliases,
    and --omit-prompt strips the prompt from outputs."""
    import argparse

    from omniserve_tpu.engine.arg_utils import EngineArgs

    parser = argparse.ArgumentParser()
    EngineArgs.add_cli_args(parser)
    ns = parser.parse_args([
        "--model", tiny_model_dir, "--benchmarking",
        "--ctx-sink-token", "64", "--dec-local-token", "512",
        "--dynamic-sparse-token-budget", "2048",
        "--static-sparse-attn-load-dir", "/tmp/nonexistent",
        "--omit-prompt",
    ])
    args = EngineArgs.from_cli_args(ns)
    assert args.benchmarking_mode and args.omit_prompt
    assert args.ctx_sink_size == 64 and args.dec_local_size == 512
    assert args.sparse_kv_cache_budget == 2048
    assert args.attn_pattern_path == "/tmp/nonexistent"

    engine = make_engine(tiny_model_dir, omit_prompt=True)
    engine.add_request(
        "r0", prompt_token_ids=[3, 1, 4, 1],
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=2, ignore_eos=True),
    )
    outs = []
    while engine.has_unfinished_requests():
        outs = engine.step()
    assert outs[-1].prompt_token_ids == [] and outs[-1].prompt is None
    assert len(outs[-1].outputs[0].token_ids) == 2


def test_static_mode_cow_matches_ifb(tiny_model_dir):
    """Static (non-IFB) mode must route append_slot's copy-on-write pairs
    to the device; dropping them left sequences appending into shared
    (pinned prefix) pages attending garbage KV. A prompt that ends exactly
    on a published prefix page triggers CoW on its first decode append —
    greedy outputs through both modes must agree token-for-token."""
    prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]  # 1 page

    def run(ifb):
        engine = make_engine(tiny_model_dir, ifb_mode=ifb)
        outs = {}
        for rid in ("r0", "r1"):   # r1 reuses r0's published prefix pages
            engine.add_request(
                rid, prompt_token_ids=list(prompt), prefix_pos=len(prompt),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=24, ignore_eos=True),
            )
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    outs[o.request_id] = o.outputs[0].token_ids
        assert outs["r0"] == outs["r1"]   # same prompt, greedy
        return outs

    assert run(True) == run(False)


def test_prefix_reuse_skips_computed_prefill(tiny_model_dir, monkeypatch):
    """A second request sharing a COMPUTED 2-page prefix must prefill only
    its suffix tokens (VERDICT r2 #6: pages were shared but compute always
    re-ran) and still decode the same greedy tokens as a fresh request."""
    from omniserve_tpu.worker.model_runner import ModelRunner

    page = 16  # tiny_model page size (make_engine config)
    prefix = [(i * 7 + 3) % 50 for i in range(2 * page)]
    suffix_a = [5, 9, 2, 6]
    suffix_b = [8, 1, 1, 7, 4]

    seen_starts = []
    orig = ModelRunner._execute_chunked_prefill

    def spy(self, metadata, budget, starts=None):
        seen_starts.append(starts)
        return orig(self, metadata, budget, starts=starts)

    monkeypatch.setattr(ModelRunner, "_execute_chunked_prefill", spy)

    def run_fresh(suffix):
        eng = make_engine(tiny_model_dir)
        eng.add_request(
            "f", prompt_token_ids=prefix + suffix,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        out = None
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    out = o.outputs[0].token_ids
        return out

    want_a = run_fresh(suffix_a)
    want_b = run_fresh(suffix_b)

    engine = make_engine(tiny_model_dir)
    got = {}
    for rid, suffix in (("r0", suffix_a), ("r1", suffix_b)):
        engine.add_request(
            rid, prompt_token_ids=prefix + suffix,
            prefix_pos=len(prefix),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    got[o.request_id] = o.outputs[0].token_ids
    assert got["r0"] == want_a
    assert got["r1"] == want_b
    # r1's prefill skipped the prefix: the runner saw a non-zero start
    assert any(
        s is not None and any(v == len(prefix) for v in s)
        for s in seen_starts
    ), f"suffix-only prefill never ran (starts seen: {seen_starts})"


def test_static_mode_routes_cow_to_device(tiny_model_dir, monkeypatch):
    """A forked (best_of=2) group shares its unaligned last prompt page;
    the first decode append must copy-on-write and static mode must route
    that copy to the cache engine (it used to drop the pairs)."""
    from omniserve_tpu.worker.cache_engine import CacheEngine

    copies = []
    orig = CacheEngine.copy_pages

    def spy(self, mapping, streaming):
        if mapping:
            copies.append(dict(mapping))
        return orig(self, mapping, streaming)

    monkeypatch.setattr(CacheEngine, "copy_pages", spy)
    engine = make_engine(tiny_model_dir, ifb_mode=False)
    engine.add_request(
        "r0", prompt_token_ids=[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
        sampling_params=SamplingParams(
            temperature=0.7, best_of=2, max_tokens=4, ignore_eos=True),
    )
    while engine.has_unfinished_requests():
        engine.step()
    assert copies, "fork CoW never reached the cache engine"
