"""Prompt-prefix sharing pool (reference: omniserve/prefix.py:53-91).

Tracks block-aligned shared prompt prefixes keyed by a hash of their token
ids, so repeated system prompts can reuse allocated KV pages.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable, List, Optional, Sequence, Tuple

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
        self.evicted = False   # dropped from the pool; never re-pin pages

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
    """LRU registry of shared prefixes, keyed by token-id hash.

    The reference pool grows without bound (omniserve/prefix.py:81-91 —
    harmless there only because its model runner never activates the
    path); here every published prefix PINS device pages, so the pool is
    capped and eviction releases the evicted prefix's pin via ``on_evict``
    (live requests keep their own page refs, so in-flight readers are
    unaffected). Capacity: OMNISERVE_PREFIX_CAPACITY (default 64).
    """

    def __init__(
        self,
        page_size: int = PAGE_SIZE,
        capacity: Optional[int] = None,
        on_evict: Optional[Callable[[Prefix], None]] = None,
    ) -> None:
        self.prefixes: "OrderedDict[Tuple[int, ...], Prefix]" = OrderedDict()
        self.page_size = page_size
        self.capacity = capacity if capacity is not None else int(
            os.environ.get("OMNISERVE_PREFIX_CAPACITY", "64")
        )
        self.on_evict = on_evict

    def _truncate(self, token_ids: Sequence[int]) -> Tuple[int, ...]:
        n = (len(token_ids) // self.page_size) * self.page_size
        return tuple(token_ids[:n])

    def add_or_get_prefix(self, token_ids: Sequence[int]) -> Optional[Prefix]:
        key = self._truncate(token_ids)
        if not key:
            return None
        if key in self.prefixes:
            self.prefixes.move_to_end(key)
            return self.prefixes[key]
        while self.capacity > 0 and len(self.prefixes) >= self.capacity:
            _, old = self.prefixes.popitem(last=False)
            old.evicted = True
            if self.on_evict is not None:
                self.on_evict(old)
        prefix = Prefix(key, self.page_size)
        self.prefixes[key] = prefix
        return prefix

    def __len__(self) -> int:
        return len(self.prefixes)
