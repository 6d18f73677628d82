"""Reference debug env knobs: SKIP_MOE, SKIP_EXPERT, SKIP_A2A, BATCH_PRIO,
CAP_FACTOR (reference moe_layer.py:114,149,226,256; ffn.py:58;
communicate.py:40)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tutel_tpu import moe


def _layer(**kw):
    return moe.moe_layer(
        gate_type=kw.pop("gate_type",
                         {"type": "top", "k": 2, "capacity_factor": 2.0}),
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 32},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1], **kw)


def test_skip_moe(monkeypatch):
    monkeypatch.setenv("SKIP_MOE", "1")
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    out, l_aux = layer(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert float(l_aux) == 0.0


def test_skip_expert(monkeypatch):
    """Identity experts + normalized top-2 postscore combine == input
    (no drops at ample capacity)."""
    monkeypatch.setenv("SKIP_EXPERT", "1")
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    out, _ = layer(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_batch_prio_env(monkeypatch):
    monkeypatch.setenv("BATCH_PRIO", "1")
    layer = _layer()
    assert layer.batch_prioritized_routing


def test_cap_factor_env_default(monkeypatch):
    monkeypatch.setenv("CAP_FACTOR", "3.5")
    layer = _layer(gate_type={"type": "top", "k": 2})
    assert layer.gates[0].capacity_factor == 3.5


def test_skip_a2a(monkeypatch):
    """SKIP_A2A short-circuits the EP exchange (debug-only; outputs are
    garbage by design, but shapes hold and no collective runs)."""
    monkeypatch.setenv("SKIP_A2A", "1")
    devices = jax.devices()[:8]
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 2.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 32},
        model_dim=32, seeds=(1, 1, 1), group=devices)
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    out, _ = layer(params, x)
    assert out.shape == x.shape
