"""Token sampling: greedy argmax / temperature + top-k + top-p multinomial.

Equivalent of the reference sampler (omniserve/modeling/layers/sampler.py):
HF-style logits processing with one shared parameter set per batch
(reference uses a single SamplingParams per scheduled batch, sampler.py:53).
Runs in-jit on device; the engine passes traced scalars so changing
temperature does not recompile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@partial(jax.jit, static_argnames=("top_k",))
def sample(
    logits: jnp.ndarray,       # [B, V] float32
    rng: jax.Array,            # PRNG key
    temperature: jnp.ndarray,  # [] or [B] float32 (0 => greedy)
    top_p: jnp.ndarray,        # [] or [B] float32
    top_k: int = -1,           # static; -1 disables
) -> jnp.ndarray:
    """Returns sampled token ids [B]."""
    greedy_ids = jnp.argmax(logits, axis=-1)
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (logits.shape[0],)
    )
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32),
                             (logits.shape[0],))

    safe_t = jnp.maximum(temperature, 1e-5)
    scaled = logits / safe_t[:, None]

    if top_k > 0:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, NEG_INF, scaled)

    # top-p (nucleus): keep the smallest set of tokens whose cumulative
    # probability exceeds top_p, always keeping the argmax.
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = cum - sorted_probs < top_p[:, None]
    # threshold logit: smallest kept logit per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    filtered = jnp.where(scaled < thresh, NEG_INF, scaled)

    sampled_ids = jax.random.categorical(rng, filtered, axis=-1)
    is_greedy = temperature < 1e-5
    return jnp.where(is_greedy, greedy_ids, sampled_ids).astype(jnp.int32)
