"""Profile LServe long-context decode/prefill on the real TPU.

Builds the engine exactly like lserve_benchmark (sparse ctx+dec, batch 1),
prefs one prompt, then traces N decode windows with jax.profiler and
prints per-op device time.

    PYTHONPATH=/root/.axon_site:/root/repo GLOBAL_PROMPT_LEN=65536 \
        python scripts/profile_lserve.py /tmp/prof_lserve
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams  # noqa: E402
from omniserve_tpu.config import ProfilingConfig  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_lserve"
    prompt_len = int(os.environ.get("GLOBAL_PROMPT_LEN", "65536"))
    gen = int(os.environ.get("GLOBAL_GENERATE_LEN", "96"))
    blocks = (prompt_len + gen + 127) // 128 + 1
    engine = LLMEngine.from_engine_args(EngineArgs(
        model="/tmp/omniserve_bench_cfgs/llama3-8b-1048k", precision="w4a8kv4",
        load_format="dummy", block_size=128, max_num_seqs=1,
        max_model_len=262400,
        max_num_batched_tokens=max(32768, prompt_len),
        num_retrieval_blocks=blocks + max(4, blocks // 50),
        ifb_mode=False, benchmarking_mode=True, decode_multi_step=32,
        sparse_context_mode=True, sparse_decode_mode=True,
        static_sparsity=0.5, ctx_sink_size=128, ctx_local_size=8192,
        dec_sink_size=128, dec_local_size=256,
        sparse_kv_cache_budget=4096, selector_update_interval=4,
    ))

    import time

    def one_round(trace_dir=None):
        engine.add_request(
            "p", sampling_params=SamplingParams(
                temperature=0.0, max_tokens=gen, ignore_eos=True),
            profiling_config=ProfilingConfig(prompt_len, gen),
        )
        t0 = time.time()
        if trace_dir:
            with jax.profiler.trace(trace_dir + "_prefill"):
                engine.step()
        else:
            engine.step()
        t_pre = time.time() - t0
        t0 = time.time()
        steps = 0
        if trace_dir:
            with jax.profiler.trace(trace_dir + "_decode"):
                while engine.has_unfinished_requests():
                    engine.step()
                    steps += 1
        else:
            while engine.has_unfinished_requests():
                engine.step()
                steps += 1
        t_dec = time.time() - t0
        print(f"prefill {t_pre:.2f}s; decode {steps} steps {t_dec:.2f}s "
              f"({gen / t_dec:.1f} tok/s)", flush=True)

    one_round()                      # warmup/compile
    one_round(trace_dir=out)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_decode import parse

    for phase in ("_prefill", "_decode"):
        print(f"==== {phase} ====")
        try:
            parse(out + phase, 1)
        except Exception as e:  # noqa: BLE001
            print("parse failed:", e)


if __name__ == "__main__":
    main()
