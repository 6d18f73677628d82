"""On-TPU performance regression gate.

The reference pins machine-checked step times per device
(reference tests/test_baseline.json, consulted in tests/test_tutel.py:
96-99) and enforces step_time parity between A2A algorithms (reference
tests/test_tutel.py:199-209). This module is the TPU-native analogue:
it pins this repo's own loop-differenced measured numbers
(docs/RESULTS.md) with ~10% tolerance so performance cannot silently
regress between rounds.

Execution model: the test session itself runs on forced-CPU
(tests/conftest.py), so every measurement here runs in a FRESH
subprocess that sees the real backend. A module-scoped probe skips the
whole file when no TPU is reachable (the tunnel can be down — a hung
backend init must skip, not wedge the suite). When the tunnel is up
this module adds several minutes of real measurement; set
TUTEL_TPU_PERF_GATE=0 to skip it explicitly.

All pinned numbers are loop-differenced device time (slope of n vs 3n
chained steps), which is immune to the tunnel RTT — the tolerances
absorb chip-to-chip variance, not link noise.
"""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import os, jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
d = jax.devices()[0]
f = jax.jit(lambda x: (x @ x).sum())
assert float(f(jnp.ones((64, 64), jnp.bfloat16))) > 0
print(d.platform)
"""


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # conftest forced cpu; undo
    env.pop("XLA_FLAGS", None)
    return env


@pytest.fixture(scope="module")
def tpu():
    if os.environ.get("TUTEL_TPU_PERF_GATE") == "0":
        pytest.skip("perf gate disabled (TUTEL_TPU_PERF_GATE=0)")
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, text=True, timeout=90,
                             env=_clean_env())
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unreachable (probe hung — tunnel down)")
    platform = out.stdout.strip().splitlines()[-1] if out.returncode == 0 \
        and out.stdout.strip() else ""
    if platform != "tpu":
        pytest.skip(f"no TPU attached (probe platform: {platform or 'n/a'})")
    return platform


def _run_json(argv, timeout=1200):
    out = subprocess.run([sys.executable] + argv, capture_output=True,
                         text=True, timeout=timeout, env=_clean_env(),
                         cwd=_ROOT)
    assert out.returncode == 0, (out.stdout, out.stderr)
    for ln in reversed(out.stdout.strip().splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    raise AssertionError(f"no JSON line in output:\n{out.stdout}")


def test_helloworld_training_throughput(tpu):
    """The headline bench: helloworld training (2048 model/hidden, 2
    experts, top-2, bf16, fwd+bwd+SGD). Measured 1.94M tokens/s
    (3.56x the reference V100 baseline) in round 2; pin at -10%."""
    env_budget = {"TUTEL_TPU_BENCH_PROBE_BUDGET": "60",
                  "TUTEL_TPU_BENCH_PROBE_INTERVAL": "30"}
    env = _clean_env()
    env.update(env_budget)
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, timeout=1800, env=env, cwd=_ROOT)
    assert out.returncode == 0, (out.stdout, out.stderr)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] >= 1.75e6, (
        f"helloworld training regressed: {rec['value']:.0f} tokens/s "
        f"< 1.75M (round-2 measured 1.94M)")


def test_int4_fused_decode_1024_tokens(tpu):
    """128-expert INT4 fused-stream dropless decode at 1024 tokens.
    Measured 1.06M tokens/s/chip in round 2; pin at -10%."""
    rec = _run_json(["benchmarks/bench_dropless_decode.py",
                     "--tokens", "1024", "--iters", "100"])
    assert rec["value"] >= 0.95e6, (
        f"INT4 fused decode @1024 regressed: {rec['value']:.0f} tokens/s "
        f"< 950k (round-2 measured 1.06M)")


def test_w4a8_fused_decode_256_tokens(tpu):
    """W4A8 integer-domain fused stream (int8 activations on the MXU)
    at the 256-token weight-bound step. First measured on silicon in
    round 3: 0.83 ms -> 308,550 tokens/s (647 GB/s effective, 88% of
    the 733 GB/s pure-stream ceiling); pin at -10%."""
    rec = _run_json(["benchmarks/bench_dropless_decode.py",
                     "--tokens", "256", "--iters", "200",
                     "--activation_bits", "8"])
    assert rec["value"] >= 0.275e6, (
        f"W4A8 fused decode @256 regressed: {rec['value']:.0f} tokens/s "
        f"< 275k (round-3 measured 308.5k)")


def test_fused_stream_bandwidth_at_256_tokens(tpu):
    """Effective weight-stream bandwidth of the fused whole-expert
    kernel: the 128-expert INT4 config sweeps 537 MB of packed weights
    per step, so GB/s = 0.537 / step_time. Measured 638 GB/s vs a
    733 GB/s pure-stream ceiling in round 2; pin at -10% (575 GB/s,
    i.e. >= 274k tokens/s at 256 decode tokens)."""
    rec = _run_json(["benchmarks/bench_dropless_decode.py",
                     "--tokens", "256", "--iters", "200"])
    step_s = 256.0 / rec["value"]
    gbps = 0.537 / step_s
    assert gbps >= 575.0, (
        f"fused-stream bandwidth regressed: {gbps:.0f} GB/s < 575 "
        f"(round-2 measured 638 GB/s of a 733 GB/s ceiling)")


def test_ec_decode_1024_tokens(tpu):
    """Expert-choice INT4 decode at 1024 tokens with the round-4
    one-hot MXU combine. Measured 1.148M tokens/s (0.89 ms — 7% faster
    than token-choice on the same chip); pin at -10%."""
    rec = _run_json(["benchmarks/bench_dropless_decode.py",
                     "--tokens", "1024", "--iters", "100",
                     "--gate", "expert_choice"])
    assert rec["value"] >= 1.03e6, (
        f"EC decode @1024 regressed: {rec['value']:.0f} tokens/s "
        f"< 1.03M (round-4 measured 1.148M)")


def test_lm_serving_kv8_2k_window(tpu):
    """The LM serving headline: kv8 continuous batching at the 2k
    window (4 layers, 2 MoE x 32 INT4 experts, B=64, prompt 1664,
    chunk 16, speculative capacity, donated cache, flash-decode +
    fused RMW cache-write kernels). Round-4b/4c measured the device
    chunk at 115.8 -> 53.9 (flat slabs) -> 36.2 ms (RMW writes); pin
    the loop-differenced device chunk at +15% so neither layout nor
    kernel regressions sneak back."""
    rec = _run_json(["benchmarks/bench_lm_serving.py",
                     "--max_len", "2048", "--prompt_len", "1664",
                     "--gen_len", "320", "--batch", "64",
                     "--requests", "64", "--chunk", "16",
                     "--spec", "4.0", "--kv_bits", "8"],
                    timeout=1500)
    assert rec["device_chunk_ms"] <= 41.6, (
        f"kv8 2k-window serving chunk regressed: "
        f"{rec['device_chunk_ms']:.1f} ms > 41.6 (round-4 measured "
        f"36.2 ms)")


_KV_WRITE_NUMERICS = """
import os, json
for k in ("JAX_PLATFORMS", "XLA_FLAGS"):
    os.environ.pop(k, None)
import jax
import jax.numpy as jnp
import numpy as np
from tutel_tpu.ops.kv_write_pallas import write_step

# positions chosen to hit every corner of the RMW window addressing:
# sublane offsets 0..7 within a row window, lane offsets around the
# 128-boundary of a column window, and the last position
rng = np.random.RandomState(0)
b, t, kvh = 8, 256, 2
pos = jnp.asarray([0, 3, 7, 8, 127, 128, 130, 255], jnp.int32)

def run(dp):
    rcs = [jnp.asarray(rng.randint(-100, 100, (b, t, dp)), jnp.int8)
           for _ in range(4)]
    ccs = [jnp.asarray(rng.rand(b, kvh, t), jnp.float32)
           for _ in range(4)]
    rows = [jnp.asarray(rng.randint(-100, 100, (b, dp)), jnp.int8)
            for _ in range(4)]
    cols = [jnp.asarray(rng.rand(b, kvh), jnp.float32)
            for _ in range(4)]
    out_r, out_c = jax.jit(
        lambda rcs, rows, ccs, cols, pos: write_step(
            rcs, rows, pos, col_caches=ccs, cols=cols)
    )(rcs, rows, ccs, cols, pos)
    ar = jnp.arange(b)
    errs = []
    for c, r, o in zip(rcs, rows, out_r):
        want = c.at[ar, pos].set(r)
        errs.append(int(jnp.sum(want != o)))
    for c, s, o in zip(ccs, cols, out_c):
        want = c.at[ar, :, pos].set(s)
        errs.append(int(jnp.sum(want != o)))
    return errs

errs = run(256) + run(128)   # kv8-shaped and kv4(packed)-shaped slabs
print(json.dumps({"platform": jax.devices()[0].platform,
                  "mismatched_cells": sum(errs)}))
"""


def test_kv_write_kernel_numerics_on_tpu(tpu):
    """The RMW cache-write kernel vs the XLA scatter semantics on REAL
    silicon (advisor round-4 medium): the interpret-mode tests prove
    the math, but a mid-tile DMA mis-address (e.g. an int8 sublane
    tile differing from the kernel's 8-row window assumption) would
    only corrupt caches on hardware — while every perf gate still
    passes. Exact-equality over mixed mid-tile positions, batched
    4+4 tensors like a real decode step's flush."""
    out = subprocess.run([sys.executable, "-c", _KV_WRITE_NUMERICS],
                         capture_output=True, text=True, timeout=600,
                         env=_clean_env(), cwd=_ROOT)
    assert out.returncode == 0, (out.stdout, out.stderr)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["platform"] == "tpu", rec
    assert rec["mismatched_cells"] == 0, (
        f"RMW kv-write kernel corrupted {rec['mismatched_cells']} "
        "cache cells on TPU (DMA window mis-address?)")


def test_lm_serving_kv4_gqa_2k_window(tpu):
    """The fastest serving family: INT4 KV + GQA(2/8) at the 2k
    window. Round-5 measured 17.68 ms device chunk (57.9k device
    tokens/s) after fresh-token injection + the end-of-step batched
    cache write + the wide-wc flash-decode ladder; pin at +15%."""
    rec = _run_json(["benchmarks/bench_lm_serving.py",
                     "--max_len", "2048", "--prompt_len", "1664",
                     "--gen_len", "320", "--batch", "64",
                     "--requests", "64", "--chunk", "16",
                     "--spec", "4.0", "--kv_bits", "4",
                     "--kv_heads", "2"],
                    timeout=1500)
    assert rec["device_chunk_ms"] <= 20.3, (
        f"kv4+GQA 2k-window serving chunk regressed: "
        f"{rec['device_chunk_ms']:.1f} ms > 20.3 (round-5 measured "
        f"17.68 ms)")


def test_lm_train_mfu(tpu):
    """Full-model Transformer-MoE LM training step (attention + dense
    FFN + MoE FFN + logits, fwd+bwd+SGD) — the driver-attested MFU
    row. Round 5 measured 81.7k tokens/s at 60.5% MFU (200.3 ms/step,
    23.9 analytic TFLOP; was 75.9k / 56% in round 4 — fused CE,
    full-T aligned forward, bf16 logits cotangent, reduce-before-
    slice); pin at -10%."""
    rec = _run_json(["benchmarks/bench_lm_train.py", "--n", "10"],
                    timeout=1800)
    assert rec["value"] >= 73e3, (
        f"LM training regressed: {rec['value']:.0f} tokens/s < 73k "
        f"(round-5 measured 81.7k, MFU 0.605)")
    assert rec["mfu"] >= 0.54, rec


def test_serving_engine_speculative_chunk(tpu):
    """The layer-level serving engine (MoeDecodeEngine, speculative
    dropless capacity, residual_norm state update, 128 INT4 experts,
    256 slots): round-5 sweep measured the 16-step device chunk at
    14.15 ms (289k device tokens/s); pin at +15% so engine-level
    regressions are caught by the sweep row's own gate."""
    rec = _run_json(["benchmarks/bench_serving.py"], timeout=1500)
    assert rec["device_chunk_ms"] <= 16.3, (
        f"serving engine chunk regressed: {rec['device_chunk_ms']:.1f}"
        " ms > 16.3 (round-5 measured 14.15)")
