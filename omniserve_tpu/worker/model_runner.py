"""Model runner: metadata -> device batches -> jitted forward -> samples.

Role of the reference ``omniserve/worker/model_runner.py`` (model-class
selection, input-tensor prep, pool sizing), redesigned around XLA's static
shapes:

- Prefill inputs are packed tokens padded to power-of-two BUCKETS (token
  count, seq count, block-table width) — bounded recompilation instead of
  the reference's fully dynamic unpadded shapes.
- Decode runs over PERSISTENT BATCH SLOTS: a running sequence keeps one
  slot for its lifetime, so per-slot device state (the cached dynamic page
  selection) stays aligned without host round-trips. Inactive slots are
  masked, batch width grows by power-of-two buckets.
- The forward is one jitted function per (mode, bucket); KV pools are
  donated so XLA updates them in place.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu import csrc
from omniserve_tpu.attn_config import SpAttnConfig
from omniserve_tpu.config import (
    CacheConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from omniserve_tpu.models import llama
from omniserve_tpu.models.llama import DecodeBatch, LlamaSpec, PrefillBatch
from omniserve_tpu.ops.sampler import sample
from omniserve_tpu.sequence import (
    SamplerOutput,
    SequenceGroupMetadata,
    SequenceGroupOutput,
    SequenceOutput,
)
from omniserve_tpu.utils.logger import init_logger
from omniserve_tpu.worker.cache_engine import CacheEngine

logger = init_logger(__name__)


def next_pow2(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class ModelRunner:
    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        parallel_config: Optional[ParallelConfig] = None,
        sp_attn_config: Optional[SpAttnConfig] = None,
        load_format: str = "auto",
        mesh=None,
    ) -> None:
        from omniserve_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.model_config = model_config
        self.cache_config = cache_config
        self.scheduler_config = scheduler_config
        self.sp_attn_config = sp_attn_config
        self.mesh = mesh
        self.tp_size = (
            parallel_config.tensor_parallel_size if parallel_config else 1
        )
        self.pp_size = (
            parallel_config.pipeline_parallel_size if parallel_config else 1
        )
        self.sp_size = (
            parallel_config.sequence_parallel_size if parallel_config else 1
        )
        if parallel_config and parallel_config.data_parallel_size > 1:
            raise NotImplementedError(
                "a single ModelRunner replica is always dp=1; use "
                "engine.dp_router.DataParallelEngine (or -dp N through "
                "LLMEngine.from_engine_args), which runs one replica per "
                "data shard on its own device slice"
            )
        tp = self.tp_size
        pp = self.pp_size
        sp = self.sp_size
        if (tp > 1 or pp > 1 or sp > 1) and mesh is None:
            raise ValueError(
                "tensor/pipeline/sequence parallelism needs a device mesh"
            )
        if sp > 1 and pp > 1:
            raise NotImplementedError(
                "sequence parallelism composes with tp, not pp"
            )
        if sp > 1 and cache_config.num_retrieval_device_blocks % sp:
            # pages shard evenly over the sequence axis
            cache_config.num_retrieval_device_blocks += (
                sp - cache_config.num_retrieval_device_blocks % sp
            )

        arch = (getattr(model_config.hf_config, "architectures", None)
                or ["LlamaForCausalLM"])[0]
        is_moe = arch == "MixtralForCausalLM"
        if not is_moe and arch not in (
            "LlamaForCausalLM", "MistralForCausalLM", "LLaMAForCausalLM",
            "YiForCausalLM", "Qwen2ForCausalLM",
        ):
            raise NotImplementedError(f"architecture {arch} not supported yet")
        if is_moe:
            from omniserve_tpu.models import mixtral

            self.spec = mixtral.MixtralSpec.from_model_config(
                model_config, sp_attn_config,
                page_size=cache_config.page_size,
            )
            self._model_forward = mixtral.mixtral_forward
        else:
            # self.spec: GLOBAL geometry (host prep, cache sizing).
            # self.local_spec: PER-RANK geometry the shard_map'd forward
            # runs with (reference shard points weight_utils.py:179-220).
            self.spec = LlamaSpec.from_model_config(
                model_config, sp_attn_config,
                page_size=cache_config.page_size,
            )
            self._model_forward = llama.llama_forward
        self.local_spec = self.spec
        if tp > 1 or sp > 1:
            import dataclasses

            from omniserve_tpu.parallel.mesh import (
                DATA_AXIS,
                MODEL_AXIS,
                SEQ_AXIS,
            )

            spec_cls = (
                type(self.spec) if is_moe else LlamaSpec
            )
            extra = {}
            if sp > 1:
                if is_moe:
                    raise NotImplementedError(
                        "sequence parallelism covers the dense Llama path"
                    )
                extra["sp_axis"] = SEQ_AXIS
            self.local_spec = dataclasses.replace(
                spec_cls.from_model_config(
                    model_config, sp_attn_config, tp_size=tp,
                    page_size=cache_config.page_size,
                ),
                tp_axis=MODEL_AXIS if tp > 1 else None,
                dp_axis=DATA_AXIS,
                **extra,
            )
        retrieval_flags = head_rank = None
        if sp_attn_config is not None and sp_attn_config.enable_streaming:
            retrieval_flags = sp_attn_config.retrieval_head_flags
            head_rank = sp_attn_config.head_rank_table

        if load_format == "dummy":
            # packed generator: draws quantized arrays directly on device
            # (the fp32-draw+quantize path costs ~20 min / 30 GB host RAM
            # for an 8B model)
            if is_moe:
                self.params = mixtral.make_random_params(
                    self.local_spec, seed=model_config.seed,
                    retrieval_flags=retrieval_flags, head_rank=head_rank,
                    tp_size=tp,
                )
            else:
                self.params = llama.make_random_packed_params(
                    self.local_spec, seed=model_config.seed,
                    retrieval_flags=retrieval_flags, head_rank=head_rank,
                    tp_size=tp,
                )
            kv_scales = None
        elif is_moe:
            from omniserve_tpu.models.mixtral import load_mixtral_params

            self.params, kv_scales = load_mixtral_params(
                model_config, self.local_spec,
                retrieval_flags=retrieval_flags, head_rank=head_rank,
                tp_size=tp,
            )
        else:
            from omniserve_tpu.models.weight_loader import load_llama_params

            self.params, kv_scales = load_llama_params(
                model_config, self.local_spec,
                retrieval_flags=retrieval_flags, head_rank=head_rank,
                tp_size=tp,
            )

        self.cache_engine = CacheEngine(
            model_config, cache_config,
            num_layers=self.spec.num_layers,
            num_kv_heads=self.spec.num_kv_heads,
            head_dim=self.spec.head_dim,
            sp_attn_config=sp_attn_config,
            kv_scales=kv_scales if load_format != "dummy" else None,
        )

        # persistent decode slots
        self._slots: Dict[int, int] = {}
        self._free_slots: List[int] = []
        self._num_slots = 0
        self._cached_page_idxes: Optional[jnp.ndarray] = None
        self._decode_steps = 0
        self._ms_fn_cache = {}
        self._needs_refresh = True
        self._rng = jax.random.PRNGKey(model_config.seed)

        self._forward = {}
        if pp > 1:
            # pipeline(+tensor) parallel: stacked [L, ...] weights and the
            # [L, ...] pools shard over the pipe axis; GPipe microbatch
            # rotation keeps every stage busy at decode (parallel/pp.py —
            # the reference raises for pp>1, config.py:284-285).
            if self.spec.num_layers % pp:
                raise ValueError(
                    f"num_layers {self.spec.num_layers} not divisible by "
                    f"pipeline_parallel_size {pp}"
                )
            from omniserve_tpu.parallel.pp import make_pipeline_forward

            if is_moe:
                from omniserve_tpu.models.mixtral import moe_mlp
                mlp_fn = moe_mlp
            else:
                mlp_fn = llama._dense_mlp
            ce = self.cache_engine
            for is_prefill in (True, False):
                fn, shardings, raw = make_pipeline_forward(
                    self.local_spec, mesh, is_prefill, self.params,
                    ce.retrieval_pool, ce.streaming_pool,
                    pp_size=pp, microbatches=pp, mlp_fn=mlp_fn,
                    return_raw=True,
                )
                self._forward[is_prefill] = fn
                if not is_prefill:
                    self._raw_decode_fwd = raw
            self.params = jax.device_put(self.params, shardings["params"])
            ce.set_pools(
                jax.device_put(
                    ce.retrieval_pool, shardings["retrieval_pool"]
                ),
                None if ce.streaming_pool is None else jax.device_put(
                    ce.streaming_pool, shardings["streaming_pool"]
                ),
            )
        elif tp > 1 or sp > 1:
            # shard_map'd forward over the (data, sequence, model) mesh:
            # params and KV pools are device_put once with their
            # NamedShardings; the per-step batch arrays are resharded by
            # jit on entry. SP shards the pool PAGE axis over ``sequence``
            # (parallel/sharding.pool_pspecs) and the forward runs the
            # LSE-combined attention (models/llama._sp_paged_decode_attention).
            from omniserve_tpu.parallel.sharding import make_sharded_forward

            ce = self.cache_engine
            for is_prefill in (True, False):
                fn, shardings, raw = make_sharded_forward(
                    self.local_spec, mesh, is_prefill, self.params,
                    ce.retrieval_pool, ce.streaming_pool,
                    forward_fn=self._model_forward, return_raw=True,
                )
                self._forward[is_prefill] = fn
                if not is_prefill:
                    self._raw_decode_fwd = raw
            self.params = jax.device_put(self.params, shardings["params"])
            ce.set_pools(
                jax.device_put(
                    ce.retrieval_pool, shardings["retrieval_pool"]
                ),
                None if ce.streaming_pool is None else jax.device_put(
                    ce.streaming_pool, shardings["streaming_pool"]
                ),
            )
        else:
            self._raw_decode_fwd = functools.partial(
                self._model_forward, spec=self.spec, is_prefill=False
            )
            if parallel_config and parallel_config.device_offset:
                # DP replica on a single chip: commit params + pools to
                # this replica's device; jit then runs there and batch
                # arrays (uncommitted) follow the committed operands.
                dev = jax.devices()[parallel_config.device_offset]
                self.params = jax.device_put(self.params, dev)
                ce = self.cache_engine
                ce.set_pools(
                    jax.device_put(ce.retrieval_pool, dev),
                    None if ce.streaming_pool is None
                    else jax.device_put(ce.streaming_pool, dev),
                )
            for is_prefill in (True, False):
                self._forward[is_prefill] = jax.jit(
                    functools.partial(
                        self._model_forward,
                        spec=self.spec,
                        is_prefill=is_prefill,
                    ),
                    donate_argnums=(1, 2),
                )

    @property
    def multi_step_capable(self) -> bool:
        """Whether the multi-step greedy scan can serve this config (the
        scan embeds the raw decode forward, incl. the TP/PP shard_map)."""
        return getattr(self, "_raw_decode_fwd", None) is not None

    # -- slot management ---------------------------------------------------
    def _slot_for(self, seq_id: int) -> Tuple[int, bool]:
        if seq_id in self._slots:
            return self._slots[seq_id], False
        if not self._free_slots:
            self._free_slots.append(self._num_slots)
            self._num_slots += 1
        slot = self._free_slots.pop(0)
        self._slots[seq_id] = slot
        return slot, True

    def free_seq(self, seq_id: int) -> None:
        slot = self._slots.pop(seq_id, None)
        if slot is not None:
            self._free_slots.append(slot)

    # -- batch preparation ---------------------------------------------------
    def _table_width(self) -> int:
        widths = [1]
        for tbl in self._current_tables:
            widths.append(len(tbl))
        # 2-bit-mantissa ceiling (4,6,8,10,12,14,16,20,24,28,32,40,...):
        # pow-2 rounding padded 13 live pages to 16, and the decode kernel's
        # COMPUTE runs over every padded lane even though pad-page DMAs are
        # predicated away (ops/pallas/decode_attention.py issue()) — 3 pad
        # pages cost ~0.6 ms/step at batch 128. This keeps pad <= 12.5%
        # while the compile-variant count stays logarithmic in width.
        n = max(max(widths), 4)
        step = max(2, 1 << max(0, (n - 1).bit_length() - 3))
        return -(-n // step) * step

    def _prepare_prefill(
        self, metadata: List[SequenceGroupMetadata]
    ) -> Tuple[PrefillBatch, List[int], int]:
        tokens: List[int] = []
        positions: List[int] = []
        segments: List[int] = []
        tables: List[List[int]] = []
        stables: List[List[int]] = []
        last_idx: List[int] = []
        seq_lens: List[int] = []
        seq_ids: List[int] = []
        new_pages: List[int] = []
        for group in metadata:
            for seq_id, data in group.seq_data.items():
                ids = data.get_token_ids()
                seg = len(tables)
                tokens.extend(ids)
                positions.extend(range(len(ids)))
                segments.extend([seg] * len(ids))
                tables.append(group.block_tables[seq_id])
                stables.append(
                    group.streaming_block_tables.get(seq_id, [0])
                )
                last_idx.append(len(tokens) - 1)
                seq_lens.append(len(ids))
                seq_ids.append(seq_id)
                new_pages.extend(group.block_tables[seq_id])
                new_pages.extend(
                    group.streaming_block_tables.get(seq_id, [])
                )

        t_pad = next_pow2(len(tokens), minimum=16)
        b_pad = next_pow2(len(tables), minimum=1)
        self._current_tables = tables
        w = self._table_width()
        sw = max(
            self.spec.sink_blocks + self.spec.local_blocks,
            max(len(s) for s in stables),
        )
        npg_pad = t_pad // self.spec.page_size + 2 * b_pad * (
            1 + (sw if self.spec.with_stats else 0)
        )

        def pad1(x, n, fill=0, dtype=np.int32):
            a = np.full(n, fill, dtype)
            a[: len(x)] = x
            return a

        bt = np.zeros((b_pad, w), np.int32)
        st = np.zeros((b_pad, sw), np.int32)
        for i, tbl in enumerate(tables):
            bt[i, : len(tbl)] = tbl
        for i, tbl in enumerate(stables):
            st[i, : len(tbl)] = tbl

        batch = PrefillBatch(
            token_ids=jnp.asarray(pad1(tokens, t_pad)),
            positions=jnp.asarray(pad1(positions, t_pad)),
            segment_ids=jnp.asarray(pad1(segments, t_pad, fill=-1)),
            block_tables=jnp.asarray(bt),
            streaming_block_tables=jnp.asarray(st),
            last_token_idx=jnp.asarray(pad1(last_idx, b_pad)),
            seq_lens=jnp.asarray(pad1(seq_lens, b_pad)),
            new_page_ids=jnp.asarray(pad1(new_pages, npg_pad, fill=-1)),
        )
        return batch, seq_ids, len(tables)

    def _prepare_decode(
        self, metadata: List[SequenceGroupMetadata], device: bool = True
    ):
        """Host batch prep. ``device=False`` returns the raw host arrays
        (the multi-step launcher packs them into ONE upload — each eager
        host->device transfer costs ~20 ms on remote-attached TPUs)."""
        entries = []  # (slot, seq_id, token, pos, table, stable, new_page)
        any_new_slot = False
        new_pages: List[int] = []
        for group in metadata:
            for seq_id, data in group.seq_data.items():
                slot, is_new = self._slot_for(seq_id)
                any_new_slot |= is_new
                pos = data.get_len() - 1
                tbl = group.block_tables[seq_id]
                stbl = group.streaming_block_tables.get(seq_id, [0])
                # a page is fresh if this token starts it
                if pos % self.spec.page_size == 0:
                    new_pages.append(tbl[pos // self.spec.page_size])
                entries.append(
                    (slot, seq_id, data.get_last_token_id(), pos, tbl, stbl)
                )

        b_pad = next_pow2(self._num_slots, minimum=8)
        self._current_tables = [e[4] for e in entries]
        w = self._table_width()
        sw = self.spec.sink_blocks + self.spec.local_blocks
        # native (C++) one-pass batch assembly; numpy fallback inside
        token_ids, positions, active, bt, st, _, _ = (
            csrc.build_decode_batch(
                [(e[0], e[2], e[3], e[4], e[5]) for e in entries],
                page_size=self.spec.page_size, b_pad=b_pad, w=w, sw=sw,
                max_new_pages=0,
            )
        )
        slot_to_seq: List[int] = [-1] * b_pad
        for slot, seq_id, _tok, _pos, _tbl, _stbl in entries:
            slot_to_seq[slot] = seq_id

        # dynamic selection cache: refresh on interval or batch change
        refresh = (
            any_new_slot
            or self._decode_steps % max(1, self.spec.selector_interval) == 0
        )
        self._decode_steps += 1
        budget = self.spec.budget_pages if self.spec.sparse_decode else 1
        hkv = self.spec.num_kv_heads if self.spec.sparse_decode else 1
        cache = self._cached_page_idxes
        if (
            cache is None
            or cache.shape[1] != b_pad
        ):
            cache = jnp.full(
                (self.spec.num_layers, b_pad, hkv, budget), -1, jnp.int32
            )
            refresh = True

        npg_pad = next_pow2(max(1, len(new_pages)), minimum=8)
        npg = np.full(npg_pad, -1, np.int32)
        npg[: len(new_pages)] = new_pages

        seq_slots = [e[0] for e in entries]
        seq_ids = [e[1] for e in entries]
        if not device:
            host = {
                "token_ids": token_ids, "positions": positions,
                "active": active, "bt": bt, "st": st, "npg": npg,
                "refresh": refresh, "cache": cache,
                "w": w, "sw": sw,
            }
            return host, seq_ids, seq_slots, b_pad

        batch = DecodeBatch(
            token_ids=jnp.asarray(token_ids),
            positions=jnp.asarray(positions),
            block_tables=jnp.asarray(bt),
            streaming_block_tables=jnp.asarray(st),
            active=jnp.asarray(active),
            new_page_ids=jnp.asarray(npg),
            refresh_selection=jnp.asarray(refresh),
            cached_page_idxes=cache,
        )
        return batch, seq_ids, seq_slots, b_pad

    # -- sampling ------------------------------------------------------------
    def _sample(
        self,
        logits: jnp.ndarray,
        metadata: List[SequenceGroupMetadata],
        rows: List[int],
    ) -> np.ndarray:
        b = logits.shape[0]
        temps = np.zeros(b, np.float32)
        top_ps = np.ones(b, np.float32)
        top_ks = np.full(b, -1, np.int32)   # per-row (mixed batches OK)
        i = 0
        for group in metadata:
            sp = group.sampling_params
            for _ in group.seq_data:
                temps[rows[i]] = sp.temperature
                top_ps[rows[i]] = sp.top_p
                top_ks[rows[i]] = sp.top_k
                i += 1
        self._rng, key = jax.random.split(self._rng)
        ids, logprobs = sample(
            logits, key, jnp.asarray(temps), jnp.asarray(top_ps),
            top_k=jnp.asarray(top_ks),
        )
        return np.asarray(ids), np.asarray(logprobs)

    # -- multi-step decode (static batch, greedy) ----------------------------
    def start_multi_step(
        self,
        metadata: List[SequenceGroupMetadata],
        n_steps: int,
        pos_offset: int = 0,
        carry_tokens=None,
    ) -> dict:
        """Launch an ``n_steps`` greedy decode window (async, no fetch).

        ``pos_offset``/``carry_tokens`` let the engine launch the NEXT
        window before draining the current one: host sequence state is
        then one window behind, so positions are advanced by the in-flight
        window's length and the starting token ids come from the previous
        window's DEVICE output (no host round-trip on the critical path).
        """
        ce = self.cache_engine
        host, seq_ids, slots, b_pad = self._prepare_decode(
            metadata, device=False
        )
        use_carry = carry_tokens is not None
        assert pos_offset == (n_steps if use_carry else 0), \
            "pipelined windows are exactly one window ahead"
        # ONE host->device transfer for the whole window's metadata
        packed = np.concatenate([
            host["token_ids"], host["positions"],
            host["active"].astype(np.int32),
            host["bt"].ravel(), host["st"].ravel(), host["npg"],
            np.asarray([host["refresh"]], np.int32),
        ]).astype(np.int32)
        fn = self._multi_step_fns(
            n_steps, b_pad, host["w"], host["sw"], len(host["npg"]),
            use_carry,
        )
        args = [self.params, ce.retrieval_pool, ce.streaming_pool,
                jnp.asarray(packed), host["cache"]]
        if use_carry:
            args.append(carry_tokens)
        tokens, rpool, spool, new_sel = fn(*args)
        ce.set_pools(rpool, spool)
        if new_sel is not None:
            self._cached_page_idxes = new_sel
        # _prepare_decode already counted the window's first step
        self._decode_steps += n_steps - 1
        return {
            "tokens": tokens,      # device [n_steps, B]
            "metadata": metadata,
            "slots": slots,
            "n_steps": n_steps,
        }

    def multi_step_carry(self, handle: dict):
        """Device [B] token ids at the end of an in-flight window."""
        return handle["tokens"][handle["n_steps"] - 1]

    def finish_multi_step(self, handle: dict) -> List[SamplerOutput]:
        """Fetch a window's tokens and shape them into per-step outputs."""
        toks = np.asarray(handle["tokens"])  # [n_steps, B]
        slots = handle["slots"]
        outputs: List[SamplerOutput] = []
        for i in range(handle["n_steps"]):
            step_out: SamplerOutput = []
            row = toks[i][slots]
            k = 0
            for group in handle["metadata"]:
                samples = []
                for seq_id in group.seq_data:
                    samples.append(SequenceOutput(seq_id, int(row[k])))
                    k += 1
                step_out.append(SequenceGroupOutput(samples))
            outputs.append(step_out)
        return outputs

    def execute_model_multi_step(
        self, metadata: List[SequenceGroupMetadata], n_steps: int
    ) -> List[SamplerOutput]:
        """Advance ``n_steps`` greedy decode tokens in one jitted scan.

        Static-batch benchmark path: block tables must already cover
        ``n_steps`` future tokens (engine reserves them). Amortizes per-step
        host prep and the device->host token sync across the whole window.
        """
        return self.finish_multi_step(self.start_multi_step(metadata, n_steps))

    def _multi_step_fns(self, n_steps: int, b_pad: int, w: int, sw: int,
                        npg_len: int, use_carry: bool):
        # per-instance cache: a global lru_cache keyed on self would pin
        # discarded runners' params alive and thrash compiles across DP
        # replicas sharing the 16 slots
        key = (n_steps, b_pad, w, sw, npg_len, use_carry)
        fn = self._ms_fn_cache.get(key)
        if fn is None:
            fn = self._build_multi_step_fn(*key)
            self._ms_fn_cache[key] = fn
        return fn

    def _build_multi_step_fn(self, n_steps: int, b_pad: int, w: int,
                             sw: int, npg_len: int, use_carry: bool):
        spec = self.spec
        page = spec.page_size
        interval = max(1, spec.selector_interval)

        def unpack_batch(packed, cache, carry):
            """Rebuild the DecodeBatch from the single packed upload."""
            o = 0

            def take(n, shape=None):
                nonlocal o
                sl = jax.lax.dynamic_slice_in_dim(packed, o, n)
                o += n
                return sl if shape is None else sl.reshape(shape)

            token_ids = take(b_pad)
            positions = take(b_pad)
            active = take(b_pad) != 0
            bt = take(b_pad * w, (b_pad, w))
            st = take(b_pad * sw, (b_pad, sw))
            npg = take(npg_len)
            refresh = take(1)[0] != 0
            if use_carry:
                # pipelined window: host state is one window behind
                token_ids = carry
                positions = positions + n_steps
            return DecodeBatch(
                token_ids=token_ids, positions=positions,
                block_tables=bt, streaming_block_tables=st,
                active=active, new_page_ids=npg,
                refresh_selection=refresh, cached_page_idxes=cache,
            )

        def run(params, rpool, spool, packed, cache, carry=None):
            batch = unpack_batch(packed, cache, carry)
            b = batch.positions.shape[0]

            def step0_pages(bd):
                return jnp.where(
                    (bd.positions % page == 0) & bd.active,
                    bd.block_tables[
                        jnp.arange(b),
                        jnp.minimum(bd.positions // page,
                                    bd.block_tables.shape[1] - 1),
                    ],
                    -1,
                )

            # scan carry must keep one shape: [B]-sized new-page list
            batch = batch._replace(new_page_ids=step0_pages(batch))

            def body(carry, i):
                rpool, spool, bd = carry
                # single-chip partial OR the raw shard_map'd TP/PP forward
                # (shard_map traces fine inside this outer jitted scan)
                logits, rpool, spool, new_sel = self._raw_decode_fwd(
                    params, rpool, spool, bd
                )
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                pos2 = bd.positions + 1
                bd2 = bd._replace(
                    token_ids=toks,
                    positions=pos2,
                    refresh_selection=(i + 1) % interval == 0,
                    cached_page_idxes=(
                        new_sel if new_sel is not None
                        else bd.cached_page_idxes
                    ),
                )
                bd2 = bd2._replace(new_page_ids=step0_pages(bd2))
                return (rpool, spool, bd2), toks

            (rpool, spool, bd), tokens = jax.lax.scan(
                body, (rpool, spool, batch), jnp.arange(n_steps)
            )
            sel = bd.cached_page_idxes if spec.sparse_decode else None
            return tokens, rpool, spool, sel

        return jax.jit(run, donate_argnums=(1, 2))

    # -- chunked prefill -----------------------------------------------------
    def _execute_chunked_prefill(self, metadata, budget: int, starts=None):
        """Prefill long/packed prompts in rectangular [B, Tc] chunks.

        Each chunk appends its KV to the pool, then attends causally over
        the pool (history + itself) via the paged-prefill kernel. Bounds
        activation memory the way the reference's chunked MLP does
        (llama_w4a8_unpad.py:89-112) but for the WHOLE layer stack, which
        also caps the compiled prefill program size. Dense-attention mode
        only (sparse prefill keeps the in-register flash path).

        ``starts`` (per scheduled seq, in metadata order) skips tokens
        below each start: their KV is already in the pool via a COMPUTED
        shared prefix (core/prefix.Prefix) — prefill covers only the
        suffix, attending the prefix through the paged history. The
        reference never finishes this (its model_runner.py:267 assumes
        prefix None); here it is live.
        """
        ce = self.cache_engine
        seqs = []
        for group in metadata:
            for seq_id, data in group.seq_data.items():
                seqs.append((
                    seq_id,
                    data.get_token_ids(),
                    group.block_tables[seq_id],
                    (group.streaming_block_tables or {}).get(seq_id, []),
                ))
        if starts is None:
            starts = [0] * len(seqs)
        bsz = len(seqs)
        b_pad = next_pow2(bsz, minimum=1)
        page = self.spec.page_size
        tc = max(page, (budget // b_pad) // page * page)
        if ce.streaming_pool is not None:
            # the ring must hold ctx_local + one chunk; clamp the chunk
            ring_tok = self.spec.local_blocks * page
            tc = min(tc, max(page, (ring_tok - self.spec.ctx_local)
                             // page * page))
        max_len = max(
            len(x[1]) - s for x, s in zip(seqs, starts)
        )
        n_chunks = -(-max_len // tc)
        w = next_pow2(max(len(x[2]) for x in seqs), minimum=4)
        bt = np.zeros((b_pad, w), np.int32)
        full_lens = np.zeros(b_pad, np.int32)
        sw = max(1, self.spec.sink_blocks + self.spec.local_blocks)
        st = np.zeros((b_pad, sw), np.int32)
        for i, x in enumerate(seqs):
            bt[i, : len(x[2])] = x[2]
            full_lens[i] = len(x[1])
            stbl = x[3]
            st[i, : min(len(stbl), sw)] = stbl[:sw]
        bt_dev = jnp.asarray(bt)
        st_dev = jnp.asarray(st)

        merge = jax.jit(lambda a, b, m: jnp.where(m[:, None], b, a))
        final_logits = None
        for ci in range(n_chunks):
            tokens = np.zeros((b_pad, tc), np.int32)
            pos = np.zeros((b_pad, tc), np.int32)
            seg = np.full((b_pad, tc), -1, np.int32)
            ctx = np.zeros(b_pad, np.int32)
            last_idx = np.zeros(b_pad, np.int32)
            ends = np.zeros(b_pad, bool)
            new_pages: List[int] = []
            for i, (seq_id, ids, tbl, _stbl) in enumerate(seqs):
                lo = starts[i] + ci * tc
                hi = min(len(ids), lo + tc)
                if hi <= lo:
                    ctx[i] = len(ids)
                    continue
                n = hi - lo
                tokens[i, :n] = ids[lo:hi]
                pos[i, :n] = np.arange(lo, hi)
                seg[i, :n] = i
                ctx[i] = hi
                if hi == len(ids):
                    ends[i] = True
                    last_idx[i] = i * tc + n - 1
                first_pg = lo // page
                last_pg = (hi - 1) // page
                new_pages.extend(tbl[first_pg: last_pg + 1])
            npg_pad = next_pow2(max(1, len(new_pages)), minimum=8)
            npg = np.full(npg_pad, -1, np.int32)
            npg[: len(new_pages)] = new_pages
            batch = PrefillBatch(
                token_ids=jnp.asarray(tokens.reshape(-1)),
                positions=jnp.asarray(pos.reshape(-1)),
                segment_ids=jnp.asarray(seg.reshape(-1)),
                block_tables=bt_dev,
                streaming_block_tables=st_dev,
                last_token_idx=jnp.asarray(last_idx),
                seq_lens=jnp.asarray(full_lens),
                new_page_ids=jnp.asarray(npg),
                context_lens=jnp.asarray(ctx),
            )
            logits, rpool, spool, _ = self._forward[True](
                self.params, ce.retrieval_pool, ce.streaming_pool, batch
            )
            ce.set_pools(rpool, spool)
            if final_logits is None:
                final_logits = logits
            else:
                final_logits = merge(final_logits, logits,
                                     jnp.asarray(ends))
        return final_logits, [x[0] for x in seqs], bsz

    @staticmethod
    def _prefix_starts(metadata):
        """Per-seq prefill start offsets from COMPUTED shared prefixes.

        Returns None when no scheduled sequence can skip anything. A seq
        whose whole prompt is the prefix still prefills its last token
        (its logits seed decoding)."""
        starts, any_skip = [], False
        for group in metadata:
            p = getattr(group, "prefix", None)
            usable = (
                p is not None and p.computed and p.allocated
                and not p.evicted
            )
            for _, data in group.seq_data.items():
                s = 0
                if usable:
                    s = min(p.length, len(data.get_token_ids()) - 1)
                starts.append(max(0, s))
                any_skip = any_skip or s > 0
        return starts if any_skip else None

    # -- execution -------------------------------------------------------------
    def execute_model(
        self, metadata: List[SequenceGroupMetadata]
    ) -> SamplerOutput:
        if not metadata:
            return []
        is_prefill = metadata[0].is_prompt
        ce = self.cache_engine
        if is_prefill:
            total_tokens = sum(
                len(d.get_token_ids())
                for g in metadata for d in g.seq_data.values()
            )
            chunk_budget = getattr(
                self.scheduler_config, "chunk_prefill_size", 32000
            )
            # Streaming configs need the ring to retain the ctx-local
            # window across chunks (DecAttnConfig.ring_local_blocks); if
            # the ring is too small (legacy sizing), fall back to the
            # in-register flash path.
            ring_ok = ce.streaming_pool is None or (
                self.spec.local_blocks * self.spec.page_size
                >= self.spec.ctx_local + self.spec.page_size
            )
            starts = self._prefix_starts(metadata)
            if starts is not None and ce.streaming_pool is None:
                # shared-prefix KV already computed: suffix-only prefill
                # through the paged (chunked) path. Dense pool only — a
                # streaming ring's sink/local window is per-sequence state
                # the skipped tokens would never populate.
                logits, seq_ids, n_seqs = self._execute_chunked_prefill(
                    metadata, chunk_budget, starts=starts
                )
            elif total_tokens > chunk_budget and ring_ok:
                logits, seq_ids, n_seqs = self._execute_chunked_prefill(
                    metadata, chunk_budget
                )
            else:
                batch, seq_ids, n_seqs = self._prepare_prefill(metadata)
                logits, rpool, spool, _ = self._forward[True](
                    self.params, ce.retrieval_pool, ce.streaming_pool, batch
                )
                ce.set_pools(rpool, spool)
            rows = list(range(n_seqs))
            token_ids, logprobs = self._sample(logits, metadata, rows)
            sampled = token_ids[:n_seqs]
            sampled_lp = logprobs[:n_seqs]
        else:
            batch, seq_ids, slots, _ = self._prepare_decode(metadata)
            logits, rpool, spool, new_sel = self._forward[False](
                self.params, ce.retrieval_pool, ce.streaming_pool, batch
            )
            ce.set_pools(rpool, spool)
            if new_sel is not None:
                self._cached_page_idxes = new_sel
            token_ids, logprobs = self._sample(logits, metadata, slots)
            sampled = token_ids[slots]
            sampled_lp = logprobs[slots]

        # map sampled tokens back to groups
        outputs: SamplerOutput = []
        i = 0
        for group in metadata:
            samples = []
            for seq_id in group.seq_data:
                samples.append(SequenceOutput(
                    seq_id, int(sampled[i]), float(sampled_lp[i])
                ))
                i += 1
            outputs.append(SequenceGroupOutput(samples))
        return outputs
