"""Generate golden loss trajectories for the helloworld configs.

Analogue of the reference's tests/test_baseline.json (golden 100-step loss
values per config, reference tests/test_tutel.py:94-152). Run on CPU with
fixed PRNG seeds; trajectories are deterministic.

Usage: python benchmarks/gen_golden.py   (writes tests/golden_helloworld.json)
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tutel_tpu.examples.helloworld import build_args, run  # noqa: E402

CONFIGS = {
    "top1_fp32_e1": ["--top", "1", "--dtype", "float32",
                     "--num_local_experts", "1"],
    "top1_fp32_e2": ["--top", "1", "--dtype", "float32",
                     "--num_local_experts", "2"],
    "top2_fp32_e1": ["--top", "2", "--dtype", "float32",
                     "--num_local_experts", "1"],
    "top2_fp32_e2": ["--top", "2", "--dtype", "float32",
                     "--num_local_experts", "2"],
    "top2_bf16_e2": ["--top", "2", "--dtype", "bfloat16",
                     "--num_local_experts", "2"],
    "top2_fp32_e2_dropless": ["--top", "2", "--dtype", "float32",
                              "--num_local_experts", "2",
                              "--capacity_factor", "0"],
}

BASE = ["--batch_size", "4", "--num_tokens", "128", "--model_dim", "64",
        "--hidden_size", "64", "--num_steps", "10", "--num_devices", "1",
        "--device", "cpu"]


def main():
    golden = {}
    for name, extra in CONFIGS.items():
        args = build_args(BASE + extra)
        losses, _ = run(args, log=lambda *a: None)
        golden[name] = [round(float(v), 6) for v in losses]
        print(name, golden[name][:3], "...")
    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "golden_helloworld.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
