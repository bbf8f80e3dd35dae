"""Profile the LServe long-context PREFILL on the real TPU.

Builds the engine exactly like lserve_benchmark (sparse ctx+dec, batch 1),
then traces the prefill step (all chunks) with jax.profiler and prints
per-op device time — the tool for the 256K-prefill gap (VERDICT r2 #3).

    PYTHONPATH=/root/.axon_site:/root/repo GLOBAL_PROMPT_LEN=65536 \
        python scripts/profile_prefill.py /tmp/prof_prefill
Env: GLOBAL_PROMPT_LEN (65536), SPARSE=0 disables LServe sparsity,
PREFILL_CHUNK (32000).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams  # noqa: E402
from omniserve_tpu.config import ProfilingConfig  # noqa: E402
from omniserve_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_prefill"
    prompt_len = int(os.environ.get("GLOBAL_PROMPT_LEN", "65536"))
    sparse = os.environ.get("SPARSE", "1") == "1"
    chunk = int(os.environ.get("PREFILL_CHUNK", "32000"))
    blocks = (prompt_len + 128 + 127) // 128 + 1
    import importlib.util

    spec_ = importlib.util.spec_from_file_location(
        "make_bench_config",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_bench_config.py"),
    )
    mbc = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mbc)
    model = mbc.write_family("llama3-8b-1048k", "/tmp/omniserve_bench_cfgs")
    kw = dict(
        sparse_context_mode=True, sparse_decode_mode=True,
        static_sparsity=0.5, ctx_sink_size=128, ctx_local_size=8192,
        dec_sink_size=128, dec_local_size=256,
        sparse_kv_cache_budget=4096, selector_update_interval=4,
    ) if sparse else {}
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=model, precision="w4a8kv4",
        load_format="dummy", block_size=128, max_num_seqs=1,
        max_model_len=262400, chunk_prefill_size=chunk,
        max_num_batched_tokens=max(32768, prompt_len),
        num_retrieval_blocks=blocks + max(4, blocks // 50),
        ifb_mode=False, benchmarking_mode=True,
        disable_log_stats=True,
        **kw,
    ))

    def run_prefill():
        engine.add_request(
            "p0",
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=4, ignore_eos=True),
            profiling_config=ProfilingConfig(prompt_len, 4),
        )
        t0 = time.time()
        engine.step()          # the whole (chunked) prefill
        dt = time.time() - t0
        # drain + reset
        while engine.has_unfinished_requests():
            engine.step()
        engine._static_metadata = None
        engine._static_outputs = None
        for g in list(engine.scheduler.running):
            for seq in g.get_seqs():
                engine.scheduler.free_seq(seq)
                engine.worker.free_seq(seq.seq_id)
        engine.scheduler.running.clear()
        return dt

    warm = run_prefill()
    print(f"warm prefill: {warm:.2f}s "
          f"({prompt_len / warm:.0f} tok/s)", flush=True)
    with jax.profiler.trace(out):
        dt = run_prefill()
    print(f"traced prefill: {dt:.2f}s ({prompt_len / dt:.0f} tok/s)",
          flush=True)

    from profile_decode import parse

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    parse(out, 1)


if __name__ == "__main__":
    main()
