"""Routing math vs a straightforward NumPy oracle.

This is the TPU analogue of the reference's CPU-kernel-equals-CUDA numerics
oracle (reference tests/test_tutel.py:85-92): the oracle below re-implements
the routing spec naively (per-sample loops) and extract_critical must match
it exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.ops import routing, losses


def oracle_route(scores, top_k, batch_prioritized=False, normalize_gate=True):
    """Naive per-sample routing: returns indices, locations, gates, counts."""
    s, e = scores.shape
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :top_k]  # [S, K]
    gates = np.take_along_axis(scores, idx, axis=1)              # [S, K]

    if batch_prioritized:
        order = np.argsort(-scores.max(axis=1), kind="stable")
    else:
        order = np.arange(s)

    counts = np.zeros(e, dtype=np.int64)
    locations = np.zeros((s, top_k), dtype=np.int64)
    for k in range(top_k):
        for t in order:
            ex = idx[t, k]
            locations[t, k] = counts[ex]
            counts[ex] += 1

    if top_k > 1 and normalize_gate:
        denom = np.clip(gates.sum(axis=1, keepdims=True),
                        np.finfo(scores.dtype).eps, None)
        gates = gates / denom
    return idx, locations, gates, counts


@pytest.mark.parametrize("top_k", [1, 2, 4])
@pytest.mark.parametrize("bpr", [False, True])
def test_extract_critical_matches_oracle(top_k, bpr):
    rng = np.random.RandomState(7 + top_k)
    s, e = 64, 8
    logits = rng.randn(s, e).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)

    crit, _ = routing.extract_critical(
        jnp.asarray(scores), top_k, capacity=s * top_k,
        batch_prioritized_routing=bpr)

    idx_o, loc_o, gates_o, counts_o = oracle_route(
        scores, top_k, batch_prioritized=bpr)

    np.testing.assert_array_equal(np.asarray(crit.indices), idx_o.T)
    np.testing.assert_array_equal(np.asarray(crit.locations), loc_o.T)
    np.testing.assert_allclose(np.asarray(crit.gates), gates_o.T,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(crit.dispatch_count), counts_o)


def test_batch_prioritized_drops_low_scores_last():
    # With capacity 1 and all tokens preferring expert 0, the highest-score
    # token must land in slot 0 under BPR.
    s, e = 8, 4
    scores = np.full((s, e), 0.01, dtype=np.float32)
    scores[:, 0] = np.linspace(0.5, 0.9, s)  # increasing preference
    crit, _ = routing.extract_critical(
        jnp.asarray(scores), 1, capacity=1, batch_prioritized_routing=True)
    locations = np.asarray(crit.locations)[0]
    # The last token has the highest score -> location 0.
    assert locations[-1] == 0
    assert locations[0] == s - 1


def test_capacity_helpers():
    # reference fast_dispatch.py:188-199 semantics
    assert routing.compute_static_capacity(100, 8, 2, 1.0) == 2 * 13
    assert routing.compute_static_capacity(100, 8, 2, 1.0, alignment=8) == 32
    assert routing.align_capacity(5, 4) == 8
    assert routing.align_capacity(8, 4) == 8
    assert routing.capped_capacity_limit(100, 8, 2, -1.25) == 2 * 16


def test_gshard_loss_uniform_is_one():
    # Perfectly uniform routing gives l_aux == 1 (E * mean(me*ce) form).
    s, e = 32, 4
    scores = np.full((s, e), 1.0 / e, dtype=np.float32)
    top_ids = np.tile(np.arange(e), s // e).reshape(s, 1)
    l_aux = losses.gshard_loss(jnp.asarray(scores), jnp.asarray(top_ids))
    np.testing.assert_allclose(float(l_aux), 1.0, rtol=1e-6)


def test_losses_match_reference_torch():
    """Cross-check against the reference's pure-torch losses module
    (reference tutel/impls/losses.py), loaded directly from the mounted
    read-only snapshot as a numerics oracle."""
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_losses", "/root/reference/tutel/impls/losses.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(3)
    s, e, k = 40, 8, 2
    logits = rng.randn(s, e).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    top_ids = np.argsort(-scores, axis=1)[:, :k].copy()

    ours = float(losses.gshard_loss(jnp.asarray(scores), jnp.asarray(top_ids)))
    theirs = float(ref.gshard_loss(torch.tensor(scores), torch.tensor(top_ids)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    gate_noise = 1.5
    noised = logits + rng.randn(s, e).astype(np.float32) * gate_noise / e
    topk_logits = np.take_along_axis(noised, top_ids, axis=1)
    ours = float(losses.load_importance_loss(
        jnp.asarray(scores), jnp.asarray(topk_logits), e, gate_noise))
    theirs = float(ref.load_importance_loss(
        torch.tensor(scores), torch.tensor(topk_logits), e, gate_noise))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_token_mask_padding_tokens():
    """token_mask (inequivalent_tokens support): padding tokens take no
    expert slot, get zero gates, and dispatch to nothing."""
    import jax
    import jax.numpy as jnp
    from tutel_tpu.ops import routing, dispatch

    s, e, k = 12, 4, 2
    scores = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (s, e)), axis=1)
    mask = jnp.arange(s) < 8   # last 4 tokens are padding
    crit, _ = routing.extract_critical(scores, k, capacity=8,
                                       loss_fn=None, token_mask=mask)
    # padding rows dropped and countless
    assert (np.asarray(crit.locations[:, 8:]) == -1).all()
    assert (np.asarray(crit.gates[:, 8:]) == 0).all()
    assert int(jnp.sum(crit.dispatch_count)) == 8 * k
    # counts equal the unmasked routing of the first 8 tokens
    crit8, _ = routing.extract_critical(scores[:8], k, capacity=8,
                                        loss_fn=None)
    np.testing.assert_array_equal(np.asarray(crit.dispatch_count),
                                  np.asarray(crit8.dispatch_count))
    # encode/decode: output for padding tokens is exactly zero
    x = jax.random.normal(jax.random.PRNGKey(1), (s, 6))
    y = dispatch.fast_encode(x, crit)
    out = dispatch.fast_decode(y, crit)
    assert float(jnp.abs(out[8:]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(out[:8]),
        np.asarray(dispatch.fast_decode(dispatch.fast_encode(x[:8], crit8),
                                        crit8)), rtol=1e-6)


def test_routing_fuzz_vs_numpy_oracle():
    """Randomized configs (shapes, k, capacity incl. forced drops, E=1,
    k>E) against a direct NumPy re-implementation."""
    import jax
    import jax.numpy as jnp
    from tutel_tpu.ops import routing

    rng = np.random.RandomState(42)
    for trial in range(12):
        s = int(rng.randint(1, 40))
        e = int(rng.choice([1, 2, 3, 8, 16]))
        k = int(rng.randint(1, 5))
        cap = int(rng.randint(1, 2 * s + 2))
        scores = rng.rand(s, e).astype(np.float32) + 1e-3
        scores = scores / scores.sum(1, keepdims=True)
        crit, _ = routing.extract_critical(
            jnp.asarray(scores), k, capacity=cap, loss_fn=None,
            normalize_gate=False)
        kk = min(k, e)
        # NumPy oracle
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]   # [S, kk]
        counts = np.zeros(e, np.int64)
        loc = np.zeros((kk, s), np.int64)
        for ki in range(kk):
            for si in range(s):
                ex = idx[si, ki]
                loc[ki, si] = counts[ex]
                counts[ex] += 1
        np.testing.assert_array_equal(np.asarray(crit.indices), idx.T,
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(crit.locations), loc,
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(crit.dispatch_count),
                                      counts, err_msg=f"trial {trial}")
        gates = np.take_along_axis(scores, idx, axis=1).T
        np.testing.assert_allclose(np.asarray(crit.gates), gates,
                                   rtol=1e-6, err_msg=f"trial {trial}")
