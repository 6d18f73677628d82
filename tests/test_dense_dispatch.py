"""Dense dispatch (top_k == num_global_experts degenerate routing).

When every token routes to every expert and nothing is dropped, the slot
permutation is algebraically invisible: encode collapses to a broadcast
and decode to a weighted combine (ops/dispatch.py dense_encode/decode).
These tests pin exact equivalence with the general gather path — the
golden-loss suite (tests/test_helloworld.py) covers it end-to-end since
the helloworld config (top-2 of 2 experts) activates the path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe
from tutel_tpu.ops import dispatch, routing


def _layer(postscore=True, capacity_factor=1.0, **over):
    kwargs = dict(
        gate_type={"type": "top", "k": 2,
                   "capacity_factor": capacity_factor},
        experts={"type": "ffn", "num_experts_per_device": 2,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), is_postscore=postscore,
        group=[jax.devices()[0]])
    kwargs.update(over)
    return moe.moe_layer(**kwargs)


@pytest.mark.parametrize("postscore", [True, False])
def test_dense_ops_match_fast_ops(postscore):
    """dense and fast paths agree through any row-wise expert: the slot
    layout is a per-expert permutation the encode->expert->decode chain
    is invariant to (dense_encode docstring)."""
    rng = np.random.RandomState(0)
    s, e, m, h = 48, 4, 16, 24
    scores = jax.nn.softmax(jnp.asarray(rng.randn(s, e), jnp.float32), 1)
    crit, _ = routing.extract_critical(scores, e, capacity=s, loss_fn=None)
    x = jnp.asarray(rng.randn(s, m), jnp.float32)
    w = jnp.asarray(rng.randn(e, m, h), jnp.float32)
    wo = jnp.asarray(rng.randn(e, h, m), jnp.float32)

    def expert(y):  # row-wise per-expert two-layer map
        z = jnp.maximum(jnp.einsum("ecm,emh->ech", y, w), 0)
        return jnp.einsum("ech,ehm->ecm", z, wo)

    o_fast = dispatch.fast_decode(
        expert(dispatch.fast_encode(x, crit, postscore)), crit, postscore)
    o_dense = dispatch.dense_decode(
        expert(dispatch.dense_encode(x, crit, postscore)), crit, postscore)
    np.testing.assert_allclose(np.asarray(o_fast), np.asarray(o_dense),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("postscore", [True, False])
def test_dense_layer_matches_general_path(postscore):
    layer = _layer(postscore)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    out_d, la_d = layer(params, x)                 # dense active
    os.environ["TUTEL_TPU_DENSE_DISPATCH"] = "0"
    try:
        out_f, la_f = _layer(postscore)(params, x)
    finally:
        del os.environ["TUTEL_TPU_DENSE_DISPATCH"]
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(la_d) - float(la_f)) < 1e-6


def test_dense_training_grads_match():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    params = _layer().init(jax.random.PRNGKey(0))

    def loss(p, dense):
        if not dense:
            os.environ["TUTEL_TPU_DENSE_DISPATCH"] = "0"
        try:
            out, la = _layer()(p, x, key=jax.random.PRNGKey(3),
                               training=True)
        finally:
            os.environ.pop("TUTEL_TPU_DENSE_DISPATCH", None)
        return jnp.sum(out ** 2) + la

    gd = jax.grad(lambda p: loss(p, True))(params)
    gf = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dense_not_used_when_capacity_drops():
    """capacity < S would drop tokens; the dense path must not engage
    (outputs still match the general path which handles drops)."""
    layer = _layer(capacity_factor=0.25)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    out, _ = layer(params, x, capacity_factor=0.25)
    os.environ["TUTEL_TPU_DENSE_DISPATCH"] = "0"
    try:
        ref, _ = _layer(capacity_factor=0.25)(params, x,
                                              capacity_factor=0.25)
    finally:
        del os.environ["TUTEL_TPU_DENSE_DISPATCH"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dense_respects_valid_tokens():
    layer = _layer(capacity_factor=2.0)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    out, _ = layer(params, x, valid_tokens=10)
    assert float(jnp.abs(out[10:]).max()) == 0.0
