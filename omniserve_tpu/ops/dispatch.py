"""Kernel dispatch: Pallas TPU kernels vs jnp reference implementations.

Every op has a jnp reference (the semantic contract, tests run against it)
and may have a Pallas TPU kernel. Selection: Pallas on TPU backends unless
disabled via ``OMNISERVE_TPU_DISABLE_PALLAS=1``; reference elsewhere
(CPU tests, debugging).
"""

from __future__ import annotations

import os

import jax

from omniserve_tpu.ops import attention_ref

_FORCE_REFERENCE = os.environ.get("OMNISERVE_TPU_DISABLE_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    if _FORCE_REFERENCE:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def prefill_attention(*args, **kwargs):
    if _on_tpu():
        try:
            from omniserve_tpu.ops.pallas import flash_attention

            return flash_attention.prefill_attention(*args, **kwargs)
        except ImportError:
            pass
    return attention_ref.prefill_attention(*args, **kwargs)


def paged_decode_attention(*args, **kwargs):
    if _on_tpu():
        try:
            from omniserve_tpu.ops.pallas import paged_attention

            return paged_attention.paged_decode_attention(*args, **kwargs)
        except ImportError:
            pass
    return attention_ref.paged_decode_attention(*args, **kwargs)
