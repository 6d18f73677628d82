#!/bin/bash
# Round-3 on-TPU measurement sweep — run the moment the tunnel is up.
# Captures every number the round-2 verdict asked to recapture/extend:
#   1. helloworld training throughput (driver headline, bench.py)
#   2. INT4 fused decode at 256/1024/2048 tokens (roofline + north star)
#   3. W4A8 integer-domain fused stream (the route past the 733 GB/s
#      weight-only ceiling) at the same batches
#   4. expert-choice decode at 1024/2048 tokens (round-3 EC EP work)
#   5. serving engine with the device-time column
# Writes one JSON line per run to benchmarks/round3_tpu_results.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/round3_tpu_results.jsonl
: > "$OUT"

note() { echo "[sweep] $*" >&2; }
run() {
  local tag="$1"; shift
  note "$tag: $*"
  local line
  if line=$(timeout 1800 "$@" 2>/dev/null | grep '^{' | tail -1); then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
    note "$tag OK: $line"
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
    note "$tag FAILED (rc=$?)"
  fi
}

run helloworld   python bench.py
run int4_256     python benchmarks/bench_dropless_decode.py --tokens 256
run int4_1024    python benchmarks/bench_dropless_decode.py --tokens 1024
run int4_2048    python benchmarks/bench_dropless_decode.py --tokens 2048
run w4a8_256     python benchmarks/bench_dropless_decode.py --tokens 256 --activation_bits 8
run w4a8_1024    python benchmarks/bench_dropless_decode.py --tokens 1024 --activation_bits 8
run w4a8_2048    python benchmarks/bench_dropless_decode.py --tokens 2048 --activation_bits 8
run ec_1024      python benchmarks/bench_dropless_decode.py --tokens 1024 --gate expert_choice
run ec_2048      python benchmarks/bench_dropless_decode.py --tokens 2048 --gate expert_choice
run serving      python benchmarks/bench_serving.py
note "sweep complete -> $OUT"
