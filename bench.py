"""Headline benchmark: helloworld MoE training throughput (tokens/s).

Reproduces the reference's in-repo performance baseline — the `helloworld`
config (model_dim=2048, hidden=2048, 16x1024 = 16,384 tokens/step, top-2,
2 local experts, half precision, training fwd+bwd+SGD) whose V100 fp16
step_time is 0.030053 s (reference tests/test_baseline.json:593-594,
BASELINE.md) => 545,163 tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time


BASELINE_TOKENS_PER_SEC = 16384 / 0.030053  # reference V100 fp16 step_time

_PROBE_SNIPPET = """
import os, jax
if os.environ.get("JAX_PLATFORMS"):   # honor a forced-CPU environment
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
d = jax.devices()[0]
f = jax.jit(lambda x: (x @ x).sum())
assert float(f(jnp.ones((64, 64), jnp.bfloat16))) > 0
print(d.platform)
"""


def _probe_backend():
    """Wait for a reachable backend with bounded retry/backoff.

    Backend init hangs indefinitely when the remote TPU tunnel is down
    (plugin discovery blocks), and a transient outage must not zero the
    round's artifact (round-2 lesson: one bad window cost the headline
    number).  Each probe runs a trivial jit in a FRESH subprocess under
    a hard timeout — a hung probe can't wedge this process — and we
    retry every ~5 min within a ~45 min budget before giving up.
    """
    budget_s = float(os.environ.get("TUTEL_TPU_BENCH_PROBE_BUDGET", 2700))
    interval_s = float(os.environ.get("TUTEL_TPU_BENCH_PROBE_INTERVAL", 300))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SNIPPET],
                capture_output=True, text=True, timeout=120)
            if out.returncode == 0 and out.stdout.strip():
                return out.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.time()
        if remaining <= 0:
            print("bench.py: TPU backend unreachable after %d probes over "
                  "%.0f min (tunnel down?); no measurement possible"
                  % (attempt, budget_s / 60), file=sys.stderr)
            sys.exit(2)
        print("bench.py: backend probe %d failed; retrying in %.0f s "
              "(%.0f min left in budget)"
              % (attempt, interval_s, remaining / 60), file=sys.stderr)
        time.sleep(min(interval_s, remaining))


def main():
    platform = _probe_backend()
    import jax
    from tutel_tpu.examples import helloworld
    # bf16 is the TPU-native half precision (fp16 on the reference's V100).
    dtype = "bfloat16" if platform == "tpu" else "float32"
    args = helloworld.build_args([
        "--batch_size", "16", "--num_tokens", "1024",
        "--model_dim", "2048", "--hidden_size", "2048",
        "--num_local_experts", "2", "--top", "2",
        "--dtype", dtype, "--num_steps", "60", "--use_scan",
    ])
    _, avg_step_time = helloworld.run(args, log=lambda *a, **k: None)
    tokens_per_sec = 16384 / avg_step_time
    print(json.dumps({
        "metric": "helloworld_train_tokens_per_sec",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
