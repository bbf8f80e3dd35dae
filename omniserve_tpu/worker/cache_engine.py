"""KV cache engine: owns the device KV pools and page move/copy ops.

Role of the reference ``omniserve/worker/cache_engine.py`` (per-layer
retrieval + streaming allocations, cache_engine.py:226-273) — TPU-native:
the pools are jnp arrays with a leading layer axis (one page id indexes all
layers), plus jit'd page-copy (copy-on-write) and host swap transfers
(the reference stubs swap data movement, cache_engine.py:169-198; here it
is real: device->host on swap-out, host->device on swap-in).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniserve_tpu.attn_config import SpAttnConfig
from omniserve_tpu.config import CacheConfig, ModelConfig
from omniserve_tpu.ops.paged_kv import KVPool, make_kv_pool
from omniserve_tpu.utils.logger import init_logger

logger = init_logger(__name__)


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_pages(
    pool: KVPool, src: jnp.ndarray, dst: jnp.ndarray
) -> KVPool:
    """Copy whole pages src[i] -> dst[i] across all layers (CoW support).

    The pool is DONATED: without it XLA cannot alias input to output and
    each copy-on-write step would transiently duplicate the multi-GB pool
    (an OOM risk exactly when the pool fills the chip)."""
    updates = {}
    for name in ("k_data", "v_data", "kv_scales", "k_stats"):
        arr = getattr(pool, name)
        if arr is None:
            continue
        updates[name] = arr.at[:, dst].set(arr[:, src])
    return pool._replace(**updates)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_pages(pool: KVPool, dst: jnp.ndarray, **host_arrays) -> KVPool:
    """Swap-in: scatter host page snapshots into the donated pool."""
    updates = {
        name: getattr(pool, name).at[:, dst].set(arr)
        for name, arr in host_arrays.items()
    }
    return pool._replace(**updates)


class CacheEngine:
    """Allocates and manipulates the dual KV pools for one worker."""

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        sp_attn_config: Optional[SpAttnConfig] = None,
        kv_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> None:
        self.cache_config = cache_config
        self.page_size = cache_config.page_size
        self.kv_bits = model_config.kv_cache_bits
        self.kv_zeros = model_config.kv_zeros
        sparse_decode = bool(
            sp_attn_config and sp_attn_config.dec.sparse_decode_mode
        )
        enable_streaming = bool(
            sp_attn_config and sp_attn_config.enable_streaming
        )
        # Pool head width = max per-layer pool population (a per-layer rank
        # table maps kv heads onto pool rows; uneven layers waste a little).
        if sp_attn_config is not None and enable_streaming:
            n_retrieval_heads = sp_attn_config.max_retrieval_heads()
            n_streaming_heads = max(1, sp_attn_config.max_streaming_heads())
        else:
            n_retrieval_heads = num_kv_heads
            n_streaming_heads = 0
        k_pt = v_pt = None
        if kv_scales is not None:
            k_pt, v_pt = kv_scales
        self.retrieval_pool = make_kv_pool(
            num_layers=num_layers,
            num_pages=cache_config.num_retrieval_device_blocks,
            num_heads=n_retrieval_heads,
            page_size=self.page_size,
            head_dim=head_dim,
            kv_bits=self.kv_bits,
            kv_zeros=self.kv_zeros,
            with_stats=sparse_decode,
            sub_chunks=(
                sp_attn_config.dec.sub_chunk_per_block
                if sp_attn_config
                else 4
            ),
            k_scale_per_tensor=k_pt,
            v_scale_per_tensor=v_pt,
        )
        self.streaming_pool: Optional[KVPool] = None
        if enable_streaming and cache_config.num_streaming_device_blocks > 0:
            self.streaming_pool = make_kv_pool(
                num_layers=num_layers,
                num_pages=cache_config.num_streaming_device_blocks,
                num_heads=n_streaming_heads,
                page_size=self.page_size,
                head_dim=head_dim,
                kv_bits=self.kv_bits,
                kv_zeros=self.kv_zeros,
                k_scale_per_tensor=k_pt,
                v_scale_per_tensor=v_pt,
            )
        # Host-side swap storage: page id -> numpy snapshot per pool.
        self._cpu_pages: Dict[str, Dict[int, dict]] = {
            "retrieval": {},
            "streaming": {},
        }
        logger.info(
            "KV pools: retrieval %d pages x %d heads, streaming %s",
            cache_config.num_retrieval_device_blocks,
            n_retrieval_heads,
            (
                f"{cache_config.num_streaming_device_blocks} pages x "
                f"{n_streaming_heads} heads"
                if self.streaming_pool is not None
                else "off"
            ),
        )

    # -- page ops (called between steps with scheduler swap/copy maps) ----
    def copy_pages(self, mapping: Dict[int, List[int]], streaming: bool
                   ) -> None:
        if not mapping:
            return
        src, dst = [], []
        for s, ds in mapping.items():
            for d_ in ds:
                src.append(s)
                dst.append(d_)
        src_a = jnp.asarray(src, jnp.int32)
        dst_a = jnp.asarray(dst, jnp.int32)
        if streaming:
            self.streaming_pool = _copy_pages(self.streaming_pool, src_a,
                                              dst_a)
        else:
            self.retrieval_pool = _copy_pages(self.retrieval_pool, src_a,
                                              dst_a)

    def swap_out(self, mapping: Dict[int, int], streaming: bool) -> None:
        """Device pages -> host (mapping: device page id -> cpu page id)."""
        if not mapping:
            return
        pool = self.streaming_pool if streaming else self.retrieval_pool
        store = self._cpu_pages["streaming" if streaming else "retrieval"]
        dev_ids = list(mapping.keys())
        idx = jnp.asarray(dev_ids, jnp.int32)
        snap = {
            name: np.asarray(getattr(pool, name)[:, idx])
            for name in ("k_data", "v_data", "kv_scales", "k_stats")
            if getattr(pool, name) is not None
        }
        for i, dev_id in enumerate(dev_ids):
            store[mapping[dev_id]] = {
                name: arr[:, i] for name, arr in snap.items()
            }

    def swap_in(self, mapping: Dict[int, int], streaming: bool) -> None:
        """Host pages -> device (mapping: cpu page id -> device page id)."""
        if not mapping:
            return
        pool = self.streaming_pool if streaming else self.retrieval_pool
        store = self._cpu_pages["streaming" if streaming else "retrieval"]
        cpu_ids = list(mapping.keys())
        dst = jnp.asarray([mapping[c] for c in cpu_ids], jnp.int32)
        host_arrays = {
            name: jnp.asarray(
                np.stack([store[c][name] for c in cpu_ids], axis=1)
            )
            for name in ("k_data", "v_data", "kv_scales", "k_stats")
            if getattr(pool, name) is not None
        }
        for c in cpu_ids:
            del store[c]
        # donated jit scatter: the eager .at.set allocated a second full
        # pool copy per swap-in
        pool = _write_pages(pool, dst, **host_arrays)
        if streaming:
            self.streaming_pool = pool
        else:
            self.retrieval_pool = pool

    def set_pools(self, retrieval: KVPool,
                  streaming: Optional[KVPool]) -> None:
        self.retrieval_pool = retrieval
        if streaming is not None:
            self.streaming_pool = streaming
