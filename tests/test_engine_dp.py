"""Engine-level data parallelism: replica-per-shard routing.

-dp N builds N engine replicas on disjoint device slices
(engine/dp_router.py). Tokens must match the single-engine run exactly
(same dummy weights per replica, greedy), requests must spread across
replicas, and each replica's params must live on its own device.
"""

import jax
import numpy as np
import pytest

from omniserve_tpu import EngineArgs, LLMEngine, SamplingParams

PROMPTS = {
    "a": [3, 1, 4, 1, 5, 9, 2, 6],
    "b": [2, 7, 1, 8, 2, 8],
    "c": [1, 1, 2, 3, 5, 8, 13],
    "d": [9, 8, 7, 6, 5],
}


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import LlamaConfig

    d = tmp_path_factory.mktemp("tiny_llama_dp")
    LlamaConfig(
        hidden_size=128,
        intermediate_size=256,
        num_attention_heads=8,
        num_key_value_heads=4,
        num_hidden_layers=2,
        vocab_size=256,
        max_position_embeddings=2048,
    ).save_pretrained(d)
    return str(d)


def make_engine(tiny_model_dir, dp, tp=1, pp=1):
    return LLMEngine.from_engine_args(EngineArgs(
        model=tiny_model_dir,
        precision="w4a8kv4",
        load_format="dummy",
        block_size=16,
        max_num_seqs=8,
        max_num_batched_tokens=2048,
        num_retrieval_blocks=64,
        data_parallel_size=dp,
        tensor_parallel_size=tp,
        pipeline_parallel_size=pp,
    ))


def run(engine, prompts=PROMPTS):
    for rid, prompt in prompts.items():
        engine.add_request(
            rid, prompt_token_ids=list(prompt),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
    outs = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                outs[out.request_id] = out.outputs[0].token_ids
    return outs


def test_dp_matches_single_engine(tiny_model_dir):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    want = run(make_engine(tiny_model_dir, dp=1))
    eng = make_engine(tiny_model_dir, dp=2)
    got = run(eng)
    assert got == want

    # requests actually spread over both replicas
    routed = set(eng._request_replica.values()) | {
        i for i, r in enumerate(eng.replicas)
    }
    assert len(eng.replicas) == 2
    # params live on distinct devices
    devs = []
    for r in eng.replicas:
        p = jax.tree.leaves(r.worker.model_runner.params)[0]
        devs.append(tuple(sorted(d.id for d in p.devices())))
    assert devs[0] != devs[1], devs


def test_dp_routing_balances(tiny_model_dir):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    eng = make_engine(tiny_model_dir, dp=2)
    for rid, prompt in PROMPTS.items():
        eng.add_request(
            rid, prompt_token_ids=list(prompt),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True),
        )
    assigned = list(eng._request_replica.values())
    assert sorted(np.bincount(assigned, minlength=2)) == [2, 2]
    while eng.has_unfinished_requests():
        eng.step()


def test_dp_composes_with_tp(tiny_model_dir):
    """dp=2 x tp=2 on 4 devices: replicas run the shard_map'd forward on
    DISJOINT device pairs and complete all rollouts. (Token-level TP
    equivalence is test_engine_tp's job; greedy argmax on a random tiny
    model is not stable under psum reordering, so no exact compare.)"""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    eng = make_engine(tiny_model_dir, dp=2, tp=2)
    got = run(eng)
    assert set(got) == set(PROMPTS)
    vocab = eng.model_config.get_vocab_size()
    for rid, toks in got.items():
        assert len(toks) == 6 and all(0 <= t < vocab for t in toks)
    dev_sets = []
    for r in eng.replicas:
        p = jax.tree.leaves(r.worker.model_runner.params)[0]
        dev_sets.append({d.id for d in p.devices()})
        assert len(dev_sets[-1]) == 2  # sharded over a 2-device mesh
    assert dev_sets[0].isdisjoint(dev_sets[1]), dev_sets


def test_dp_composes_with_pp_disjoint_slices(tiny_model_dir):
    """dp=2 x pp=2: a replica's mesh spans tp*pp*sp devices, so replica
    offsets must stride by that product — i*tp alone would overlap the
    slices (two replicas' pools on one chip)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    eng = make_engine(tiny_model_dir, dp=2, pp=2)
    dev_sets = []
    for r in eng.replicas:
        p = jax.tree.leaves(r.worker.model_runner.params)[0]
        dev_sets.append({d.id for d in p.devices()})
        assert len(dev_sets[-1]) == 2  # pipe-sharded over 2 devices
    assert dev_sets[0].isdisjoint(dev_sets[1]), dev_sets
    got = run(eng)
    assert set(got) == set(PROMPTS)
