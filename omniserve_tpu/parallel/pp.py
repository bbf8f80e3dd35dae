"""Pipeline parallelism: stage-sharded layers + GPipe microbatch rotation.

The reference explicitly rejects pp>1 (omniserve/config.py:284-285); this
module IMPLEMENTS it the TPU way instead of porting a worker-per-stage RPC
design:

- the stacked ``[L, ...]`` weight arrays and the ``[L, ...]`` KV pools are
  sharded over a ``pipe`` mesh axis (contiguous layer blocks per stage) —
  the whole model is ONE pjit program, no per-stage processes,
- inside ``shard_map`` each stage scans its LOCAL layers with the same
  ``_layer_step`` the single-chip model uses; hidden states rotate to the
  next stage with ``lax.ppermute`` (ICI neighbor hops),
- decode runs a GPipe schedule: the batch splits into M microbatches and
  the loop runs M + S - 1 ticks, so all S stages compute concurrently
  once the pipeline fills (bubble fraction (S-1)/(M+S-1)),
- prefill runs single-flow (M=1): the engine's chunked prefill already
  streams page-aligned chunks, which occupy successive stages naturally.

KV writes of in-flight ticks that carry no microbatch (pipeline
fill/drain) are dropped by masking their page ids to -1 — the same drop
convention ``append_kv`` uses for padded tokens. Composes with TP (model
axis) and DP (data axis) on one (data, sequence, pipe, model) mesh: TP
psums stay innermost on ICI, the pipe hop is a neighbor permute.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from omniserve_tpu.models.llama import (
    DecodeBatch,
    LlamaSpec,
    PrefillBatch,
    _decode_page_ids,
    _dense_mlp,
    _layer_step,
    _prefill_page_ids,
)
from omniserve_tpu.ops import dispatch
from omniserve_tpu.ops.norms import rms_norm
from omniserve_tpu.ops.paged_kv import KVPool, reset_page_stats_all_layers
from omniserve_tpu.ops.rope import rope_freqs
from omniserve_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS
from omniserve_tpu.parallel.sharding import (
    decode_batch_pspecs,
    params_pspecs,
    pool_pspecs,
    prefill_batch_pspecs,
)


def _add_pipe(ps: P) -> P:
    """[L, ...] partition spec -> shard the leading layer axis over pipe."""
    assert ps[0] is None, f"layer axis already sharded: {ps}"
    return P(PIPE_AXIS, *ps[1:])


def _pipe_tree(tree):
    return jax.tree.map(
        _add_pipe, tree, is_leaf=lambda x: isinstance(x, P)
    )


def pp_params_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    base = params_pspecs(params)
    base["layers"] = _pipe_tree(base["layers"])
    base["attn_meta"] = _pipe_tree(base["attn_meta"])
    return base


def pp_pool_pspecs(pool: Optional[KVPool]) -> Optional[KVPool]:
    base = pool_pspecs(pool)
    return None if base is None else _pipe_tree(base)


def _slice_decode_batch(batch: DecodeBatch, m, mb: int) -> DecodeBatch:
    """Microbatch m's [mb]-sized slice (cached selection slab stays local
    in the layer axis; its batch axis is axis 1)."""
    def s(x):
        return jax.lax.dynamic_slice_in_dim(x, m * mb, mb, axis=0)

    return batch._replace(
        token_ids=s(batch.token_ids),
        positions=s(batch.positions),
        block_tables=s(batch.block_tables),
        streaming_block_tables=s(batch.streaming_block_tables),
        active=s(batch.active),
        cached_page_idxes=jax.lax.dynamic_slice_in_dim(
            batch.cached_page_idxes, m * mb, mb, axis=1
        ),
    )


def _slice_prefill_batch(batch: PrefillBatch, m, mb_seq: int,
                         mb_tok: int) -> PrefillBatch:
    """Microbatch m's rows of a RECTANGULAR chunked-prefill batch
    ([B, Tc] flattened): slice mb_seq sequences' token rows and rebase the
    segment / last-token indices to the slice."""
    t_off = m * mb_tok
    s_off = m * mb_seq

    def st(x):
        return jax.lax.dynamic_slice_in_dim(x, t_off, mb_tok, axis=0)

    def ss(x):
        return jax.lax.dynamic_slice_in_dim(x, s_off, mb_seq, axis=0)

    seg = st(batch.segment_ids)
    seg = jnp.where(seg >= 0, seg - s_off, -1)
    return batch._replace(
        token_ids=st(batch.token_ids),
        positions=st(batch.positions),
        segment_ids=seg,
        block_tables=ss(batch.block_tables),
        streaming_block_tables=ss(batch.streaming_block_tables),
        last_token_idx=jnp.clip(
            ss(batch.last_token_idx) - t_off, 0, mb_tok - 1
        ),
        seq_lens=ss(batch.seq_lens),
        context_lens=ss(batch.context_lens),
    )


def _mask_page_io(page_io, valid):
    pr, sr, ps_, ss = page_io
    return (
        jnp.where(valid, pr, -1), sr,
        jnp.where(valid, ps_, -1), ss,
    )


def llama_forward_pp(
    params: Dict[str, Any],
    retrieval_pool: KVPool,
    streaming_pool: Optional[KVPool],
    batch,
    spec: LlamaSpec,
    is_prefill: bool,
    pp_size: int,
    microbatches: int = 1,
    mlp_fn=_dense_mlp,
):
    """llama_forward equivalent, run INSIDE shard_map over the pipe axis.

    ``params['layers']`` / ``attn_meta`` / pools arrive layer-sharded
    (this stage's contiguous block); embed / final_ln / lm_head are
    replicated. Output logits are psum-broadcast from the last stage so
    every rank returns the full [B, V] array (replicated over pipe).
    """
    stage = jax.lax.axis_index(PIPE_AXIS)
    s_count = pp_size
    last = s_count - 1
    meta = params["attn_meta"]
    layers_p = params["layers"]
    l_local = meta["retrieval_flags"].shape[0]
    use_sparse = (not is_prefill) and spec.sparse_decode
    inv_freq = rope_freqs(spec.head_dim, spec.rope_base,
                          spec.rope_scaling, llama3_cfg=spec.rope_llama3)

    if is_prefill:
        # rectangular chunked-prefill batches ([B, Tc] flattened) can
        # microbatch over the SEQUENCE axis; varlen packed prefill is
        # single-flow
        rect = batch.context_lens is not None
        n_seq = batch.block_tables.shape[0]
        if rect and microbatches > 1 and n_seq > 1:
            m_count = max(1, min(microbatches, n_seq))
            while n_seq % m_count:
                m_count -= 1
        else:
            m_count = 1
        mb_seq = n_seq // m_count
        mb = batch.token_ids.shape[0] // m_count   # tokens per microbatch
    else:
        # batch shape is static per trace: degrade to fewer microbatches
        # when the (pow2-padded) slot count doesn't divide
        b_total = batch.token_ids.shape[0]
        m_count = max(1, min(microbatches, b_total))
        while b_total % m_count:
            m_count -= 1
        mb = b_total // m_count

    if spec.with_stats:
        retrieval_pool = reset_page_stats_all_layers(
            retrieval_pool, batch.new_page_ids
        )

    def trunk(h, rpool, spool, mb_batch, page_io):
        def body(carry, xs):
            h, rp, sp = carry
            layer_idx, flags_l, rank_l = xs
            meta_l = {"retrieval_flags": flags_l, "head_rank": rank_l}
            h2, (rp, sp), sel_l = _layer_step(
                h, (rp, sp), layer_idx, layers_p, meta_l, inv_freq, spec,
                is_prefill, mb_batch, page_io, use_sparse, mlp_fn=mlp_fn,
            )
            return (h2, rp, sp), sel_l

        xs = (jnp.arange(l_local), meta["retrieval_flags"],
              meta["head_rank"])
        (h, rpool, spool), sel = jax.lax.scan(
            body, (h, rpool, spool), xs
        )
        return h, rpool, spool, sel

    ticks = m_count + s_count - 1
    vocab = params["lm_head"].shape[1]
    n_rows = (
        batch.last_token_idx.shape[0] if is_prefill
        else batch.token_ids.shape[0]
    )
    logits_acc = jnp.zeros((n_rows, vocab), jnp.float32)
    sel_acc = None
    if use_sparse:
        budget = batch.cached_page_idxes.shape[-1]
        sel_acc = jnp.full(
            (l_local, batch.token_ids.shape[0],
             batch.cached_page_idxes.shape[2], budget),
            -1, jnp.int32,
        )

    h_buf = jnp.zeros((mb, spec.hidden), jnp.bfloat16)
    mb_rows = mb_seq if is_prefill else mb    # logit rows per microbatch

    for t in range(ticks):
        m = t - stage
        valid = (m >= 0) & (m < m_count)
        mc = jnp.clip(m, 0, m_count - 1)
        if is_prefill:
            mb_batch = (
                batch if m_count == 1
                else _slice_prefill_batch(batch, mc, mb_seq, mb)
            )
        else:
            mb_batch = _slice_decode_batch(batch, mc, mb)
        page_io = (
            _prefill_page_ids(mb_batch, spec) if is_prefill
            else _decode_page_ids(mb_batch, spec)
        )
        page_io = _mask_page_io(page_io, valid)
        if is_prefill:
            h0 = params["embed"][mb_batch.token_ids].astype(jnp.bfloat16)
        else:
            h0 = dispatch.embed_lookup(
                params["embed"], mb_batch.token_ids
            ).astype(jnp.bfloat16)
        h_in = jnp.where(stage == 0, h0, h_buf)
        h_out, retrieval_pool, streaming_pool, sel = trunk(
            h_in, retrieval_pool, streaming_pool, mb_batch, page_io
        )

        if use_sparse:
            cur = jax.lax.dynamic_slice_in_dim(sel_acc, mc * mb, mb, axis=1)
            sel_acc = jax.lax.dynamic_update_slice_in_dim(
                sel_acc, jnp.where(valid, sel, cur), mc * mb, axis=1
            )

        def _logits(h_out=h_out, mb_batch=mb_batch):
            hf = rms_norm(h_out, params["final_ln"], spec.rms_eps)
            h_last = hf[mb_batch.last_token_idx] if is_prefill else hf
            return jnp.dot(
                h_last.astype(jnp.bfloat16), params["lm_head"],
                preferred_element_type=jnp.float32,
            )

        lg = jax.lax.cond(
            valid & (stage == last),
            _logits,
            lambda: jnp.zeros((mb_rows, vocab), jnp.float32),
        )
        off = mc * mb_rows
        cur = jax.lax.dynamic_slice_in_dim(logits_acc, off, mb_rows, axis=0)
        logits_acc = jax.lax.dynamic_update_slice_in_dim(
            logits_acc, jnp.where(valid & (stage == last), lg, cur),
            off, axis=0,
        )

        h_buf = jax.lax.ppermute(
            h_out, PIPE_AXIS,
            perm=[(i, (i + 1) % s_count) for i in range(s_count)],
        )

    # broadcast the last stage's logits to every pipe rank
    logits = jax.lax.psum(
        jnp.where(stage == last, logits_acc, 0.0), PIPE_AXIS
    )
    if not use_sparse:
        sel_acc = None
    return logits, retrieval_pool, streaming_pool, sel_acc


def make_pipeline_forward(
    spec: LlamaSpec,
    mesh,
    is_prefill: bool,
    params: Dict[str, Any],
    retrieval_pool: KVPool,
    streaming_pool: Optional[KVPool],
    pp_size: int,
    microbatches: int = 1,
    mlp_fn=_dense_mlp,
    return_raw: bool = False,
):
    """shard_map'd pipeline forward; returns (fn, shardings).

    Same call contract as sharding.make_sharded_forward — composes with
    TP/DP when ``spec.tp_axis``/``dp_axis`` are set and the mesh carries
    those axes alongside ``pipe``. ``return_raw=True`` appends the
    unjitted shard_map callable for embedding in outer jits.
    """
    use_sparse = (not is_prefill) and spec.sparse_decode
    p_specs = pp_params_pspecs(params)
    r_specs = pp_pool_pspecs(retrieval_pool)
    s_specs = pp_pool_pspecs(streaming_pool)
    if is_prefill:
        b_specs = prefill_batch_pspecs(PrefillBatch)
    else:
        b_specs = decode_batch_pspecs(DecodeBatch, use_sparse)
        b_specs = b_specs._replace(
            cached_page_idxes=_add_pipe(b_specs.cached_page_idxes)
        )
    sel_spec = (
        _add_pipe(P(None, DATA_AXIS,
                    MODEL_AXIS if spec.tp_axis else None, None))
        if use_sparse else None
    )
    logits_spec = P(DATA_AXIS, None)

    fn = shard_map(
        functools.partial(
            llama_forward_pp, spec=spec, is_prefill=is_prefill,
            pp_size=pp_size, microbatches=microbatches, mlp_fn=mlp_fn,
        ),
        mesh=mesh,
        in_specs=(p_specs, r_specs, s_specs, b_specs),
        out_specs=(logits_spec, r_specs, s_specs, sel_spec),
        check_vma=False,
    )
    shardings = {
        "params": jax.tree.map(
            lambda s: NamedSharding(mesh, s), p_specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
        "retrieval_pool": jax.tree.map(
            lambda s: NamedSharding(mesh, s), r_specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
        "streaming_pool": (
            None if s_specs is None else jax.tree.map(
                lambda s: NamedSharding(mesh, s), s_specs,
                is_leaf=lambda x: isinstance(x, P),
            )
        ),
    }
    if return_raw:
        return jax.jit(fn, donate_argnums=(1, 2)), shardings, fn
    return jax.jit(fn, donate_argnums=(1, 2)), shardings
