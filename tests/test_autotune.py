"""Autotuner: measured selection over MoE parallel configs + persistence."""

import json
import os

import jax
import jax.numpy as jnp

from tutel_tpu import moe
from tutel_tpu.autotune import tune_moe, ConfigStore, moe_candidates


def test_tune_moe_selects_and_persists(tmp_path):
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 32},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))

    store = ConfigStore(str(tmp_path / "cfg.json"))
    result = tune_moe(layer, params, x, iters=2, store=store,
                      store_key="layer0")
    assert result["best"] in result["timings"]
    best = json.loads(result["best"])
    out, _ = layer(params, x, **best)   # winning config is applicable
    assert out.shape == x.shape

    data = store.load()
    assert data["layer0"]["best"] == result["best"]


def test_invalid_candidates_pruned():
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 1, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 2,
                 "hidden_size_per_expert": 16},
        model_dim=16, seeds=(1, 1, 1), group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    # adaptive_r=7 is invalid for sharded_count=1 -> pruned, not fatal
    cands = [{"adaptive_r": 7, "a2a_ffn_overlap_degree": 1}] + \
        moe_candidates(layer, overlap_degrees=(1,))
    result = tune_moe(layer, params, x, candidates=cands, iters=1)
    assert len(result["timings"]) >= 1
    assert "adaptive_r\": 7" not in result["best"]
