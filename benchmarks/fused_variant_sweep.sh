#!/bin/bash
# Kernel-variant sweep on real TPU: unpack strategy x chunk size, both
# fused FFN entries, at the north-star weight-bound config. One JSON
# line per variant -> benchmarks/fused_variant_results.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/fused_variant_results.jsonl
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "[sweep] $tag: $*" >&2
  local line
  if line=$(timeout 900 python benchmarks/bench_fused_kernel.py "$@" 2>/dev/null | grep '^{' | tail -1); then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
    echo "[sweep] $tag OK: $line" >&2
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
    echo "[sweep] $tag FAILED" >&2
  fi
}

run w4a8_concat_512      --variant w4a8 --split_dot 0 --chunk 512
run w4a8_split_512       --variant w4a8 --split_dot 1 --chunk 512
run w4a8_split_1024      --variant w4a8 --split_dot 1 --chunk 1024
run w4a8_split_2048      --variant w4a8 --split_dot 1 --chunk 2048
run w4a8_concat_1024     --variant w4a8 --split_dot 0 --chunk 1024
run w4a8_concat_256      --variant w4a8 --split_dot 0 --chunk 256
run wo_concat_512        --variant weight_only --split_dot 0 --chunk 512
run wo_split_512         --variant weight_only --split_dot 1 --chunk 512
run wo_split_1024        --variant weight_only --split_dot 1 --chunk 1024
echo "[sweep] done -> $OUT" >&2
