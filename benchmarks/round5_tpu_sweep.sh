#!/bin/bash
# Round-5 on-TPU measurement sweep: every number docs/RESULTS.md quotes, incl. the 2k serving ladder and the serving-engine speculative row.
# New vs round 3: expert-choice rows re-measured with the one-hot MXU
# combine, the full-model LM training MFU row, LM serving with and
# without the INT8 KV cache, and the unpack-bound decomposition
# variants. Writes one JSON line per run to
# benchmarks/round5_tpu_results.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/round5_tpu_results.jsonl
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
run lm_train     python benchmarks/bench_lm_train.py
run int4_256     python benchmarks/bench_dropless_decode.py --tokens 256
run int4_1024    python benchmarks/bench_dropless_decode.py --tokens 1024
run int4_2048    python benchmarks/bench_dropless_decode.py --tokens 2048
run w4a8_256     python benchmarks/bench_dropless_decode.py --tokens 256 --activation_bits 8
run w4a8_1024    python benchmarks/bench_dropless_decode.py --tokens 1024 --activation_bits 8
run w4a8_2048    python benchmarks/bench_dropless_decode.py --tokens 2048 --activation_bits 8
run ec_256       python benchmarks/bench_dropless_decode.py --tokens 256 --gate expert_choice
run ec_1024      python benchmarks/bench_dropless_decode.py --tokens 1024 --gate expert_choice
run ec_2048      python benchmarks/bench_dropless_decode.py --tokens 2048 --gate expert_choice
run stream_ceiling python benchmarks/bench_fused_kernel.py --variant ceiling
run stream_touch   python benchmarks/bench_fused_kernel.py --variant touch
run stream_unpack  python benchmarks/bench_fused_kernel.py --variant unpack
run kernel_w4a8    python benchmarks/bench_fused_kernel.py --variant w4a8 --chunk 1024
run serving      python benchmarks/bench_serving.py
run lm_serving       python benchmarks/bench_lm_serving.py --spec 4.0
run lm_serving_kv8   python benchmarks/bench_lm_serving.py --spec 4.0 --kv_bits 8

# 2k-window serving ladder (rounds 4b/4c: flat slabs + fused RMW
# cache writes; docs/RESULTS.md "quantized KV cache" table)
LM2K="--max_len 2048 --prompt_len 1664 --gen_len 320 --batch 64 \
--requests 64 --chunk 16 --spec 4.0"
run lm_serving_2k_bf16    python benchmarks/bench_lm_serving.py $LM2K
run lm_serving_2k_kv8     python benchmarks/bench_lm_serving.py $LM2K --kv_bits 8
run lm_serving_2k_kv4     python benchmarks/bench_lm_serving.py $LM2K --kv_bits 4
run lm_serving_2k_kv8_gqa python benchmarks/bench_lm_serving.py $LM2K --kv_bits 8 --kv_heads 2
run lm_serving_2k_kv4_gqa python benchmarks/bench_lm_serving.py $LM2K --kv_bits 4 --kv_heads 2
note "sweep complete -> $OUT"
