"""Multi-step (scanned) static-batch decode equals per-step decode."""

import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_ms")
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


def _run(tiny_model_dir, multi_step, gen=9, tp=1, pp=1):
    args = EngineArgs(
        model=tiny_model_dir,
        precision="w16a16kv16",
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
        ifb_mode=False,
        decode_multi_step=multi_step,
        tensor_parallel_size=tp,
        pipeline_parallel_size=pp,
    )
    engine = LLMEngine.from_engine_args(args)
    rng = np.random.default_rng(0)
    for i, n in enumerate((20, 33)):
        engine.add_request(
            f"r{i}", prompt_token_ids=rng.integers(1, 255, size=n).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=gen,
                                           ignore_eos=True),
        )
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
        steps += 1
        assert steps < 60
    return outs


def test_multi_step_matches_single(tiny_model_dir):
    want = _run(tiny_model_dir, 1)
    got = _run(tiny_model_dir, 4)
    assert want.keys() == got.keys()
    for k in want:
        assert want[k] == got[k], f"{k}: {want[k]} vs {got[k]}"


@pytest.mark.parametrize("tp,pp", [(2, 1), (1, 2)])
def test_multi_step_sharded_matches_single(tiny_model_dir, tp, pp):
    """The scanned window embeds the raw TP/PP shard_map'd forward; the
    sharded multi-step run must produce the single-step sharded tokens."""
    import jax

    if len(jax.devices()) < tp * pp:
        pytest.skip(f"needs {tp * pp} virtual devices")
    want = _run(tiny_model_dir, 1, tp=tp, pp=pp)
    got = _run(tiny_model_dir, 4, tp=tp, pp=pp)
    assert want.keys() == got.keys()
    for k in want:
        assert want[k] == got[k], f"{k}: {want[k]} vs {got[k]}"
