#!/bin/bash
# LServe long-context sweep (reference scripts/lserve_benchmark/launch.sh
# protocol: batch 1, prefill 4K-256K, decode 128, sparsity 0.5, ctx sink
# 128 / local 8192, dec sink 128 / local 256, budget 4096, interval 4).
# Precision defaults to the TPU build's headline w4a8kv4 fine-grained;
# pass PRECISION=w8a8kv8 GRAN=per_tensor for the reference's exact dtypes
# (fits up to ~128K on a 16 GB chip).
set -e
cd "$(dirname "$0")/.."
if [ -z "$MODEL" ]; then
  MODEL=/tmp/omniserve_bench_cfgs/llama3-8b-1048k
  python scripts/make_bench_config.py --only llama3-8b-1048k >/dev/null
fi
PRECISION=${PRECISION:-w4a8kv4}
GRAN=${GRAN:-fine_grained}
GEN=${GEN:-128}
OUT=${OUT:-lserve_results_$(python -c 'import jax;print(jax.devices()[0].device_kind.replace(" ","_"))').csv}
for LEN in ${LENS:-4096 16384 65536 131072 262144}; do
  echo "=== prefill $LEN ==="
  GLOBAL_BATCH_SIZE=1 GLOBAL_PROMPT_LEN=$LEN GLOBAL_GENERATE_LEN=$GEN \
  python lserve_benchmark.py --model "$MODEL" --precision "$PRECISION" \
    --kv-quant-granularity "$GRAN" --load-format dummy \
    --sparse-context-mode --sparse-decode-mode --static-sparsity 0.5 \
    --ctx-sink-size 128 --ctx-local-size 8192 \
    --dec-sink-size 128 --dec-local-size 256 \
    --sparse-kv-cache-budget 4096 --selector-update-interval 4 \
    --block-size 128 --max-num-seqs 1 --max-model-len 262400 \
    --no-ifb-mode --benchmarking-mode --decode-multi-step 32 \
    --output "$OUT"
done
echo "results in $OUT"

# --- r5 additions (VERDICT item 7) ---
# batched long-context decode rows (the reference's decode win is batched
# long-context serving, README.md:400-402) and selector-interval overhead
if [ -n "$R5_EXTRAS" ]; then
  # batch x prompt chosen to fit 15.75 GB HBM: total tokens <= ~256K
  # (retrieval-pool bytes scale with batch x prompt; the ring adds
  # ~136 MB/seq at ctx local 8192, so batch 16 stays at 16K).
  # max-model-len is sized per run - pools sized for 256K OOM at batch>1.
  for CFG in "4 65536" "16 16384" "2 131072"; do
    set -- $CFG
    B=$1; LEN=$2
    echo "=== batch $B x $LEN ==="
    # chunked prefill PACKS all running seqs' chunks into one varlen
    # batch, so per-seq chunk = 8192/B keeps the packed gate_up temp at
    # ~0.45 GB (batch 4 x chunk 8192 made a 1.7 GB temp -> OOM by 0.35 GB)
    GLOBAL_BATCH_SIZE=$B GLOBAL_PROMPT_LEN=$LEN GLOBAL_GENERATE_LEN=$GEN \
    python lserve_benchmark.py --model "$MODEL" --precision "$PRECISION" \
      --kv-quant-granularity "$GRAN" --load-format dummy \
      --sparse-context-mode --sparse-decode-mode --static-sparsity 0.5 \
      --ctx-sink-size 128 --ctx-local-size 8192 \
      --dec-sink-size 128 --dec-local-size 256 \
      --sparse-kv-cache-budget 4096 --selector-update-interval 4 \
      --block-size 128 --max-num-seqs "$B" --max-model-len $((LEN + 512)) \
      --chunk-prefill-size $((8192 / B)) \
      --no-ifb-mode --benchmarking-mode --decode-multi-step 32 \
      --output "$OUT"
  done
  # selector-interval overhead at 64K (interval 1 vs 4 vs dense decode)
  for IV in 1 4; do
    echo "=== selector interval $IV ==="
    GLOBAL_BATCH_SIZE=1 GLOBAL_PROMPT_LEN=65536 GLOBAL_GENERATE_LEN=$GEN \
    python lserve_benchmark.py --model "$MODEL" --precision "$PRECISION" \
      --kv-quant-granularity "$GRAN" --load-format dummy \
      --sparse-context-mode --sparse-decode-mode --static-sparsity 0.5 \
      --ctx-sink-size 128 --ctx-local-size 8192 \
      --dec-sink-size 128 --dec-local-size 256 \
      --sparse-kv-cache-budget 4096 --selector-update-interval "$IV" \
      --block-size 128 --max-num-seqs 1 --max-model-len 262400 \
      --no-ifb-mode --benchmarking-mode --decode-multi-step 32 \
      --output "${OUT%.csv}_interval$IV.csv"
  done
  echo "=== dense decode control (sparse ctx only) ==="
  GLOBAL_BATCH_SIZE=1 GLOBAL_PROMPT_LEN=65536 GLOBAL_GENERATE_LEN=$GEN \
  python lserve_benchmark.py --model "$MODEL" --precision "$PRECISION" \
    --kv-quant-granularity "$GRAN" --load-format dummy \
    --sparse-context-mode --static-sparsity 0.5 \
    --ctx-sink-size 128 --ctx-local-size 8192 \
    --block-size 128 --max-num-seqs 1 --max-model-len 262400 \
    --no-ifb-mode --benchmarking-mode --decode-multi-step 32 \
    --output "${OUT%.csv}_dense.csv"
fi
