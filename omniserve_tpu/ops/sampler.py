"""Token sampling: greedy argmax / temperature + top-k + top-p multinomial.

Equivalent of the reference sampler (omniserve/modeling/layers/sampler.py)
with HF warper order (temperature -> top-k -> top-p), extended to PER-ROW
parameters: the reference applies one shared SamplingParams per batch
(sampler.py:53); here temperature/top_p/top_k are traced [B] arrays, so
mixed-parameter batches sample correctly and no value change recompiles.

top-k with a traced k: the top-p pass already sorts the row; k becomes a
RANK threshold in the sorted domain (rank >= k masked), so no
``lax.top_k`` with a static k is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@jax.jit
def sample(
    logits: jnp.ndarray,       # [B, V] float32
    rng: jax.Array,            # PRNG key
    temperature: jnp.ndarray,  # [] or [B] float32 (0 => greedy)
    top_p: jnp.ndarray,        # [] or [B] float32
    top_k=-1,                  # [] or [B] int32; <= 0 disables
) -> jnp.ndarray:
    """Returns (token ids [B], logprobs [B]).

    ``logprobs`` are log-softmax of the RAW logits at the chosen token
    (the vLLM convention) — they accumulate into
    SequenceData.cumulative_logprob so best_of candidates can be ranked.

    ``top_k`` defaults to a plain int (NOT a device array): a jnp default
    would initialize the XLA backend at import time, which breaks
    ``jax.distributed.initialize`` (it must run before any backend use —
    worker.py imports this module on every path).
    """
    b, v = logits.shape
    greedy_ids = jnp.argmax(logits, axis=-1)
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,)
    )
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (b,))

    safe_t = jnp.maximum(temperature, 1e-5)
    scaled = logits / safe_t[:, None]

    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    rank = jnp.arange(v, dtype=jnp.int32)[None, :]
    # per-row top-k as a rank threshold in the sorted domain
    k_mask = (top_k[:, None] > 0) & (rank >= top_k[:, None])
    sorted_k = jnp.where(k_mask, NEG_INF, sorted_logits)

    # top-p (nucleus): keep the smallest set of tokens whose cumulative
    # probability exceeds top_p, always keeping the argmax (rank 0).
    sorted_probs = jax.nn.softmax(sorted_k, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs < top_p[:, None]) & (
        sorted_k != NEG_INF
    )
    # threshold logit: smallest kept logit per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_k, jnp.inf), axis=-1, keepdims=True
    )
    filtered = jnp.where(scaled < thresh, NEG_INF, scaled)

    sampled_ids = jax.random.categorical(rng, filtered, axis=-1)
    is_greedy = temperature < 1e-5
    ids = jnp.where(is_greedy, greedy_ids, sampled_ids).astype(jnp.int32)
    logprobs = jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), ids[:, None], axis=-1
    )[:, 0]
    return ids, logprobs
