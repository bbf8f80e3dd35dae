"""Physical KV page bookkeeping.

Equivalent role to the reference's ``omniserve/block.py`` Logical/Physical
token blocks, reduced to what the TPU engine needs host-side: a ref-counted
physical page id. Logical block accounting lives on ``Sequence``
(token count / page size); on TPU the device consumes plain int32 page-index
arrays, not pointers (reference builds device pointer tables in
modeling/layers/ctx_attn/block_table_utils.py:62-122 — not needed here).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Device:
    GPU = "device"  # accelerator (TPU) pool
    CPU = "cpu"     # host swap pool


@dataclass
class PhysicalBlock:
    """One physical KV page in a pool."""

    device: str
    block_number: int
    ref_count: int = 0

    def __repr__(self) -> str:
        return (
            f"PhysicalBlock({self.device}, #{self.block_number}, "
            f"ref={self.ref_count})"
        )
