#!/bin/bash
# QServe model-family throughput sweep (reference
# scripts/qserve_benchmark/benchmark_a100.sh protocol: 1024 in / 512 out,
# max-throughput batch per family, paged KV, IFB off, dummy weights).
#
# Default family list = what fits one 16 GB v5e chip at W4A8KV4
# (weights ~0.55 GB/B-param int4 + KV pool). The bigger families
# (yi-34b, llama2-70b, qwen1.5-72b) need -tp over a multi-chip mesh;
# include them via FAMILIES= once chips are available.
#
# Batch sizes follow the reference A100 table (README.md:269) scaled to
# the chip's memory; override per-run with BATCH_<family>=N.
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-results.csv}
PRECISION=${PRECISION:-w4a8kv4}
CFGDIR=${CFGDIR:-/tmp/omniserve_bench_cfgs}
python scripts/make_bench_config.py --out-dir "$CFGDIR" >/dev/null

# Max-throughput batches for ONE 16 GB chip with the full 1536-token KV
# pool per sequence (prompt 1024 + gen 512). MHA families (llama2-7b: 32
# kv heads, llama2-13b: 40) carry 4-6.4 KB KV/token/layer vs llama3's GQA
# 1 KB, so their batches are far below the reference's A100-80G table.
declare -A BATCH=(
  [llama3-8b]=128 [llama2-7b]=40 [mistral-7b]=96 [llama2-13b]=20
  [llama1-30b]=16 [yi-34b]=24 [llama2-70b]=8 [qwen1.5-72b]=4
  [mixtral-scaled]=64
)

for FAM in ${FAMILIES:-llama3-8b llama2-7b mistral-7b llama2-13b}; do
  B_VAR="BATCH_${FAM//[-.]/_}"
  B=${!B_VAR:-${BATCH[$FAM]}}
  echo "=== $FAM batch $B ==="
  GLOBAL_BATCH_SIZE=$B GLOBAL_PROMPT_LEN=1024 GLOBAL_GENERATE_LEN=512 \
  python qserve_benchmark.py --model "$CFGDIR/$FAM" \
    --precision "$PRECISION" --load-format dummy \
    --block-size 128 --max-num-seqs "$B" \
    --max-num-batched-tokens $((1024 * B)) \
    --chunk-prefill-size 8192 \
    --no-ifb-mode --benchmarking-mode --decode-multi-step 32 \
    ${EXTRA_ARGS:-} --output "$OUT"
done
echo "results in $OUT"
