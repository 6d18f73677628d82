"""Headline benchmark: helloworld MoE training throughput (tokens/s).

Reproduces the reference's in-repo performance baseline — the `helloworld`
config (model_dim=2048, hidden=2048, 16x1024 = 16,384 tokens/step, top-2,
2 local experts, half precision, training fwd+bwd+SGD) whose V100 fp16
step_time is 0.030053 s (reference tests/test_baseline.json:593-594,
BASELINE.md) => 545,163 tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys


BASELINE_TOKENS_PER_SEC = 16384 / 0.030053  # reference V100 fp16 step_time


def _probe_backend(timeout_s=180):
    """Backend init hangs indefinitely when the remote TPU tunnel is
    down (plugin discovery blocks); probe it in a daemon thread so a
    dead tunnel fails fast instead of wedging the benchmark driver."""
    import threading
    result = {}

    def probe():
        import jax
        result["platform"] = jax.devices()[0].platform

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "platform" not in result:
        print("bench.py: TPU backend unreachable (tunnel down?); "
              "no measurement possible", file=sys.stderr)
        sys.exit(2)
    return result["platform"]


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
