"""End-to-end golden-loss tests (reference tests/test_tutel.py:94-159).

Golden trajectories were generated once on CPU with fixed PRNG seeds
(benchmarks/gen_golden.py) and are exact-match oracles at fp32; any change
to routing/dispatch/expert numerics shows up here.
"""

import json
import os

import numpy as np
import pytest

from tutel_tpu.examples.helloworld import build_args, run

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_helloworld.json")))

BASE = ["--batch_size", "4", "--num_tokens", "128", "--model_dim", "64",
        "--hidden_size", "64", "--num_steps", "10", "--num_devices", "1",
        "--device", "cpu"]


def _run(extra):
    args = build_args(BASE + extra)
    losses, _ = run(args, log=lambda *a: None)
    return losses


@pytest.mark.parametrize("name,extra", [
    ("top1_fp32_e1", ["--top", "1", "--num_local_experts", "1"]),
    ("top1_fp32_e2", ["--top", "1", "--num_local_experts", "2"]),
    ("top2_fp32_e1", ["--top", "2", "--num_local_experts", "1"]),
    ("top2_fp32_e2", ["--top", "2", "--num_local_experts", "2"]),
    ("top2_bf16_e2", ["--top", "2", "--num_local_experts", "2",
                      "--dtype", "bfloat16"]),
    ("top2_fp32_e2_dropless", ["--top", "2", "--num_local_experts", "2",
                               "--capacity_factor", "0"]),
])
def test_golden_losses(name, extra):
    losses = _run(extra)
    tol = 1e-2 if "bf16" in name else 1e-4
    np.testing.assert_allclose(losses, GOLDEN[name], rtol=tol, atol=tol)


def test_training_dp_equals_mp_8dev():
    """Full training-loop equivalence of data vs model parallel on 8
    devices (reference test_compare_data_model_parallel)."""
    base = ["--batch_size", "8", "--num_tokens", "64", "--model_dim", "64",
            "--hidden_size", "64", "--num_steps", "5", "--device", "cpu",
            "--num_local_experts", "-2", "--top", "2"]
    losses_d, _ = run(build_args(base + ["--parallel_type", "data"]),
                      log=lambda *a: None)
    losses_m, _ = run(build_args(base + ["--parallel_type", "model"]),
                      log=lambda *a: None)
    np.testing.assert_allclose(losses_d, losses_m, rtol=1e-4, atol=1e-4)


def test_training_overlap_invariance_8dev():
    base = ["--batch_size", "8", "--num_tokens", "64", "--model_dim", "64",
            "--hidden_size", "64", "--num_steps", "5", "--device", "cpu",
            "--num_local_experts", "2", "--top", "2"]
    l1, _ = run(build_args(base + ["--a2a_ffn_overlap_degree", "1"]),
                log=lambda *a: None)
    l2, _ = run(build_args(base + ["--a2a_ffn_overlap_degree", "2"]),
                log=lambda *a: None)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-4)


def test_training_2dh_invariance_8dev():
    base = ["--batch_size", "8", "--num_tokens", "64", "--model_dim", "64",
            "--hidden_size", "64", "--num_steps", "5", "--device", "cpu",
            "--num_local_experts", "1", "--top", "2"]
    l1, _ = run(build_args(base), log=lambda *a: None)
    l2, _ = run(build_args(base + ["--use_2dh"]), log=lambda *a: None)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-4)


def test_scan_matches_loop():
    """--use_scan (one-jit training driver) must reproduce the per-step
    loop's loss trajectory exactly."""
    from tutel_tpu.examples import helloworld
    base = ["--device", "cpu", "--num_steps", "4", "--batch_size", "2",
            "--num_tokens", "32", "--model_dim", "64", "--hidden_size",
            "64", "--top", "2"]
    l1, _ = helloworld.run(helloworld.build_args(base),
                           log=lambda *a, **k: None)
    l2, _ = helloworld.run(helloworld.build_args(base + ["--use_scan"]),
                           log=lambda *a, **k: None)
    assert all(abs(a - b) < 1e-6 for a, b in zip(l1, l2))


def test_llama_ffn_expert_trains():
    """llama_ffn (SwiGLU) expert type trains through helloworld
    (reference experts/llama_ffn.py)."""
    from tutel_tpu.examples import helloworld
    args = helloworld.build_args(
        ["--device", "cpu", "--num_steps", "4", "--batch_size", "2",
         "--num_tokens", "32", "--model_dim", "64", "--hidden_size", "64",
         "--top", "2", "--expert_type", "llama_ffn"])
    losses, _ = helloworld.run(args, log=lambda *a, **k: None)
    assert losses[-1] < losses[0]


def test_training_overlap_invariance_fp64():
    """The reference's strictest numerics gate: overlap degree 1 == 2
    at fp64 (reference tests/test_tutel.py:161-176 runs exactly this
    class at float64, local_experts in {-2, 1, 2})."""
    import jax
    try:
        for nle in ("-2", "1", "2"):
            base = ["--batch_size", "4", "--num_tokens", "32",
                    "--model_dim", "32", "--hidden_size", "32",
                    "--num_steps", "3", "--device", "cpu",
                    "--dtype", "float64", "--num_local_experts", nle,
                    "--top", "2"]
            l1, _ = run(build_args(base + ["--a2a_ffn_overlap_degree",
                                           "1"]), log=lambda *a: None)
            l2, _ = run(build_args(base + ["--a2a_ffn_overlap_degree",
                                           "2"]), log=lambda *a: None)
            np.testing.assert_allclose(l1, l2, rtol=1e-9, atol=1e-9)
    finally:
        # the fp64 run enables jax x64 globally; leaking it changes
        # default dtypes for every later test in the process
        jax.config.update("jax_enable_x64", False)
