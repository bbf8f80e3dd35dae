"""Prompt-prefix sharing pool (reference: omniserve/prefix.py:53-91).

Tracks block-aligned shared prompt prefixes keyed by a hash of their token
ids, so repeated system prompts can reuse allocated KV pages.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from omniserve_tpu.utils.constants import PAGE_SIZE


class Prefix:
    """A block-aligned prompt prefix that may be shared across requests."""

    def __init__(self, token_ids: Sequence[int], page_size: int) -> None:
        if len(token_ids) % page_size != 0:
            raise ValueError("prefix length must be page-aligned")
        self.token_ids = tuple(token_ids)
        self.page_size = page_size
        self.length = len(token_ids)
        self.hash = hash(self.token_ids)
        self.block_table: Optional[List[int]] = None
        self.computed = False

    @property
    def allocated(self) -> bool:
        return self.block_table is not None

    def get_num_blocks(self) -> int:
        return self.length // self.page_size

    def set_block_table(self, block_table: List[int]) -> None:
        self.block_table = list(block_table)

    def get_block_numbers(self) -> List[int]:
        assert self.block_table is not None
        return list(self.block_table)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Prefix) and self.token_ids == other.token_ids

    def __hash__(self) -> int:
        return self.hash


class PrefixPool:
    """Registry of shared prefixes, keyed by token-id hash."""

    def __init__(self, page_size: int = PAGE_SIZE) -> None:
        self.prefixes: Dict[Tuple[int, ...], Prefix] = {}
        self.page_size = page_size

    def _truncate(self, token_ids: Sequence[int]) -> Tuple[int, ...]:
        n = (len(token_ids) // self.page_size) * self.page_size
        return tuple(token_ids[:n])

    def add_or_get_prefix(self, token_ids: Sequence[int]) -> Optional[Prefix]:
        key = self._truncate(token_ids)
        if not key:
            return None
        if key not in self.prefixes:
            self.prefixes[key] = Prefix(key, self.page_size)
        return self.prefixes[key]

    def __len__(self) -> int:
        return len(self.prefixes)
