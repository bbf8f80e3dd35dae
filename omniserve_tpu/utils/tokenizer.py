"""Tokenizer wrapper + incremental detokenization.

Same role as the reference ``omniserve/utils/tokenizer.py`` plus the
streaming-safe incremental decode used by the engine (the reference keeps
prefix/read offsets on Sequence, sequence.py:148-151).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def get_tokenizer(
    tokenizer_name: str,
    trust_remote_code: bool = True,
    revision: Optional[str] = None,
    tokenizer_mode: str = "auto",
    download_dir: Optional[str] = None,
):
    """``tokenizer_mode``: "auto" prefers the fast tokenizer, "slow"
    forces the Python one (reference arg_utils.py:144-152)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        tokenizer_name,
        trust_remote_code=trust_remote_code,
        revision=revision,
        cache_dir=download_dir,
        use_fast=tokenizer_mode != "slow",
    )


def detokenize_incrementally(
    tokenizer,
    output_token_ids: List[int],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = True,
) -> Tuple[str, int, int]:
    """Decode only the newly-complete text since the last call.

    Returns (new_text, new_prefix_offset, new_read_offset). Text is held
    back while the byte-level decoder would emit a replacement char (a
    UTF-8 sequence split across tokens).
    """
    prefix_text = tokenizer.decode(
        output_token_ids[prefix_offset:read_offset],
        skip_special_tokens=skip_special_tokens,
    )
    full_text = tokenizer.decode(
        output_token_ids[prefix_offset:],
        skip_special_tokens=skip_special_tokens,
    )
    if len(full_text) > len(prefix_text) and not full_text.endswith("�"):
        new_text = full_text[len(prefix_text):]
        return new_text, read_offset, len(output_token_ids)
    return "", prefix_offset, read_offset
