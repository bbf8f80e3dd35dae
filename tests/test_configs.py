"""Tests for config parsing, sampling params, prefix pool, sparse attn config."""

import numpy as np
import pytest

from omniserve_tpu.attn_config import sparse_attn_init
from omniserve_tpu.config import ModelConfig, parse_precision
from omniserve_tpu.core.prefix import PrefixPool
from omniserve_tpu.sampling_params import SamplingParams


class TestPrecision:
    @pytest.mark.parametrize(
        "s,w,a,kv",
        [
            ("w4a8kv4", 4, 8, 4),
            ("w4a8kv8", 4, 8, 8),
            ("w4a8", 4, 8, 8),
            ("w8a8kv8", 8, 8, 8),
            ("w8a8kv4", 8, 8, 4),
            ("w16a16kv8", 16, 16, 8),
            ("w16a16", 16, 16, 16),
        ],
    )
    def test_parse(self, s, w, a, kv):
        bits = parse_precision(s)
        assert (bits["weight_bits"], bits["act_bits"], bits["kv_bits"]) == (
            w, a, kv,
        )

    def test_bad_strings(self):
        for s in ["foo", "w3a8", "a8w4", "w4a4"]:
            with pytest.raises(ValueError):
                parse_precision(s)


class TestModelConfig:
    def test_from_hf_config_object(self):
        from transformers import LlamaConfig

        hf = LlamaConfig(
            hidden_size=256,
            num_attention_heads=8,
            num_key_value_heads=2,
            num_hidden_layers=2,
            intermediate_size=512,
            vocab_size=1000,
            max_position_embeddings=2048,
        )
        cfg = ModelConfig("test", precision="w4a8kv4", hf_config=hf)
        assert cfg.get_head_size() == 32
        assert cfg.get_num_kv_heads() == 2
        assert cfg.get_num_kv_heads(tp_size=2) == 1
        assert cfg.int4_kv and cfg.kv_zeros
        assert cfg.max_model_len == 2048

    def test_per_tensor_granularity(self):
        from transformers import LlamaConfig

        cfg = ModelConfig(
            "test",
            precision="w8a8kv8",
            hf_config=LlamaConfig(),
            kv_quant_granularity="per_tensor",
        )
        assert not cfg.kv_zeros


class TestSamplingParams:
    def test_greedy_detection(self):
        assert SamplingParams(temperature=0.0).is_greedy
        assert not SamplingParams(temperature=0.7).is_greedy

    def test_validation(self):
        with pytest.raises(ValueError):
            SamplingParams(top_p=0.0)
        with pytest.raises(ValueError):
            SamplingParams(top_k=0)
        with pytest.raises(ValueError):
            SamplingParams(max_tokens=0)

    def test_stop_normalization(self):
        assert SamplingParams(stop="x").stop == ["x"]
        assert SamplingParams(stop=["x", "y"]).stop == ["x", "y"]


class TestPrefixPool:
    def test_block_aligned_sharing(self):
        pool = PrefixPool(page_size=4)
        p1 = pool.add_or_get_prefix([1, 2, 3, 4, 5, 6])
        p2 = pool.add_or_get_prefix([1, 2, 3, 4, 9, 9])
        assert p1 is p2  # same aligned prefix [1,2,3,4]
        assert p1.length == 4
        assert pool.add_or_get_prefix([1, 2]) is None  # < one page


class TestSpAttnConfig:
    def test_quantile_thresholding(self):
        # 2 layers x 4 heads; sparsity 0.5 -> lowest half streaming
        scores = np.array(
            [[0.9, 0.1, 0.8, 0.2], [0.7, 0.3, 0.6, 0.4]], dtype=np.float32
        )
        cfg = sparse_attn_init(
            sparse_context_mode=True,
            sparse_decode_mode=True,
            static_sparsity=0.5,
            scores=scores,
            page_size=64,
        )
        flags = cfg.retrieval_head_flags
        assert flags.sum() == 4
        assert flags[0].tolist() == [True, False, True, False]
        assert flags[1].tolist() == [True, False, True, False]
        # head ranks inside each pool
        assert cfg.head_rank_table[0].tolist() == [0, 0, 1, 1]

    def test_zero_sparsity_all_retrieval(self):
        cfg = sparse_attn_init(num_layers=2, num_kv_heads=4)
        assert cfg.retrieval_head_flags.all()
        assert not cfg.any_streaming()

    def test_block_derivation(self):
        cfg = sparse_attn_init(
            num_layers=1,
            num_kv_heads=1,
            dec_sink_size=128,
            dec_local_size=256,
            page_size=64,
        )
        assert cfg.dec.sink_blocks == 2
        assert cfg.dec.local_blocks == 4
        assert cfg.dec.budget_pages == 64
        assert cfg.dec.sub_chunk_size == 16

    def test_at_least_one_retrieval_head_per_layer(self):
        scores = np.array([[0.1, 0.1], [0.9, 0.9]], dtype=np.float32)
        cfg = sparse_attn_init(static_sparsity=0.9, scores=scores)
        assert cfg.retrieval_head_flags.sum(axis=1).min() >= 1


class TestDistributedInit:
    def test_single_process_is_noop(self, monkeypatch):
        from omniserve_tpu.parallel import mesh as mesh_mod

        monkeypatch.delenv("OMNISERVE_COORDINATOR", raising=False)
        monkeypatch.delenv("OMNISERVE_AUTO_DISTRIBUTED", raising=False)
        assert mesh_mod.init_distributed() is False

    def test_explicit_args_reach_jax(self, monkeypatch):
        from omniserve_tpu.parallel import mesh as mesh_mod

        calls = {}
        monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)
        monkeypatch.setattr(
            mesh_mod.jax.distributed, "initialize",
            lambda **kw: calls.update(kw),
        )
        assert mesh_mod.init_distributed("host0:1234", 4, 1) is True
        assert calls == {
            "coordinator_address": "host0:1234",
            "num_processes": 4,
            "process_id": 1,
        }
        # idempotent
        calls.clear()
        assert mesh_mod.init_distributed() is True
        assert calls == {}
        monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)

    def test_multihost_mesh_requires_dp_multiple(self, monkeypatch):
        import pytest

        from omniserve_tpu.config import ParallelConfig
        from omniserve_tpu.parallel import mesh as mesh_mod

        monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="data axis"):
            mesh_mod.build_mesh(ParallelConfig(
                tensor_parallel_size=2, data_parallel_size=1,
            ))


class TestRingWidening:
    def _cfg(self, max_model_len):
        return sparse_attn_init(
            sparse_context_mode=True, sparse_decode_mode=True,
            static_sparsity=0.5, ctx_local_size=8192, dec_local_size=256,
            chunk_prefill_size=32000, page_size=128, num_layers=2,
            num_kv_heads=4, max_model_len=max_model_len,
        )

    def test_no_widening_when_prompts_cannot_chunk(self):
        # max_model_len <= chunk_prefill_size: chunked prefill can never
        # trigger, so the ring stays at the decode-local window instead of
        # reserving ctx_local + chunk tokens per sequence
        cfg = self._cfg(8192)
        assert cfg.dec.ring_local_blocks == cfg.dec.local_blocks

    def test_widened_for_long_context(self):
        cfg = self._cfg(262144)
        import math
        assert cfg.dec.ring_local_blocks == math.ceil(
            (8192 + 32000) / 128
        )


def test_import_does_not_initialize_backend():
    """jax.distributed.initialize must run before any backend use; the
    worker import path (engine -> worker -> model_runner -> ops.sampler)
    must therefore not create device arrays at import time."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "from jax._src import xla_bridge\n"
        "import omniserve_tpu.worker.worker\n"
        "assert not xla_bridge.backends_are_initialized()\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0 and "clean" in out.stdout, out.stderr[-2000:]


class TestSparsityTies:
    def test_saturated_scores_keep_requested_fraction(self):
        # 70% of scores tied at 1.0: a strict > quantile threshold would
        # collapse to ~1 retrieval head/layer (~97% sparsity)
        rng = np.random.default_rng(0)
        L, H = 4, 8
        scores = np.full((L, H), 1.0, np.float32)
        low = rng.random((L, H)) < 0.3
        scores[low] = rng.random(low.sum()).astype(np.float32) * 0.5
        cfg = sparse_attn_init(
            sparse_context_mode=True, sparse_decode_mode=True,
            static_sparsity=0.5, num_layers=L, num_kv_heads=H,
            scores=scores,
        )
        n_retr = int(cfg.retrieval_head_flags.sum())
        assert n_retr == L * H // 2, n_retr
        # tied picks spread across layers, not front-loaded
        per_layer = cfg.retrieval_head_flags.sum(axis=1)
        assert per_layer.min() >= 1 and per_layer.max() <= H - 1
