"""Expert-choice routing (beyond-reference; the reference has only
token-choice gates — tutel/gates/). Oracle-tested in the reference's
CPU-numerics style."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe
from tutel_tpu.ops import expert_choice as ec_ops


def _layer(cf=2.0, experts=4, model_dim=32, hidden=64):
    return moe.moe_layer(
        gate_type={"type": "expert_choice", "capacity_factor": cf,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": experts,
                 "hidden_size_per_expert": hidden},
        model_dim=model_dim, seeds=(1, 1, 1), group=jax.devices()[:1])


def test_ec_layer_matches_numpy_oracle():
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    out, zl = layer(params, x)

    wg = np.asarray(params["gates"][0]["wg"])
    w1 = np.asarray(params["experts"]["fc1_w"], np.float32)
    w2 = np.asarray(params["experts"]["fc2_w"], np.float32)
    b1 = np.asarray(params["experts"]["fc1_b"])
    b2 = np.asarray(params["experts"]["fc2_b"])
    xn = np.asarray(x, np.float32)
    logits = xn @ wg
    scores = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    C = int(2.0 * 64 / 4)
    outn = np.zeros_like(xn)
    for e in range(4):
        order = np.argsort(-scores[:, e], kind="stable")[:C]
        h = np.maximum(xn[order] @ w1[e] + b1[e], 0)
        y = h @ w2[e] + b2[e]
        for c, t in enumerate(order):
            outn[t] += scores[t, e] * y[c]
    np.testing.assert_allclose(np.asarray(out), outn, atol=2e-5)

    # z-loss oracle
    z = (np.log(np.exp(logits).sum(1)) ** 2).mean()
    np.testing.assert_allclose(float(zl), z, rtol=1e-5)


def test_ec_balanced_by_construction():
    """Every expert processes exactly C tokens — no drops, no overflow,
    regardless of routing skew (the point of EC)."""
    s, e, cap = 48, 4, 24
    # pathological scores: every token prefers expert 0
    scores = jnp.concatenate(
        [jnp.ones((s, 1)) * 0.9, jnp.ones((s, e - 1)) * 0.1 / (e - 1)],
        axis=1)
    ec = ec_ops.expert_choice_routing(scores, cap)
    assert ec.indices.shape == (e, cap)
    # each expert's slots are distinct tokens
    for row in np.asarray(ec.indices):
        assert len(set(row.tolist())) == cap


def test_ec_token_mask_masks():
    s, e, cap = 16, 2, 8
    scores = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (s, e)), axis=1)
    mask = jnp.arange(s) < 10
    ec = ec_ops.expert_choice_routing(scores, cap, token_mask=mask)
    # masked tokens are never selected
    assert int(jnp.max(ec.indices)) < 10
    x = jax.random.normal(jax.random.PRNGKey(1), (s, 4))
    y = ec_ops.ec_encode(x, ec)
    out = ec_ops.ec_decode(y, ec, s)
    np.testing.assert_array_equal(np.asarray(out[10:]), 0.0)


def test_ec_prescore_masked_tokens_get_zero():
    """Review regression: with is_postscore=False and a token mask,
    dead slots (gate == 0) must not scatter the expert's bias rows to
    arbitrary tokens."""
    s, e_n, cap, m = 16, 2, 16, 4
    scores = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (s, e_n)), axis=1)
    mask = jnp.arange(s) < 6
    ec = ec_ops.expert_choice_routing(scores, cap, token_mask=mask)
    x = jax.random.normal(jax.random.PRNGKey(1), (s, m))
    y = ec_ops.ec_encode(x, ec, is_postscore=False)
    # a biased "expert": maps zero rows to a nonzero constant
    y = y + 0.37
    out = ec_ops.ec_decode(y, ec, s, is_postscore=False)
    np.testing.assert_array_equal(np.asarray(out[6:]), 0.0)


def test_ec_local_forward_runs_ec():
    """Review regression: local_forward on an EC-gated layer must run
    the EC flow (it used to silently fall back to token-choice)."""
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    key = jax.random.PRNGKey(0)
    ref, zl_ref = layer(params, x, key=key)
    local = layer.local_forward(capacity_factor=2.0)
    out, zl = local(params, x, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    np.testing.assert_allclose(float(zl), float(zl_ref), rtol=1e-6)


def test_ec_capacity_clamps_to_tokens():
    layer = _layer(cf=100.0)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 32))
    out, _ = layer(params, x)          # C would be 400; clamps to 16
    assert out.shape == (16, 32)


def test_ec_training_grads():
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))

    def loss(p):
        o, z = layer(p, x, training=True)
        return jnp.mean(o ** 2) + 0.001 * z

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert float(jnp.linalg.norm(g["gates"][0]["wg"])) > 0


def test_ec_quantized_experts():
    from tutel_tpu.ops import quant

    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    ref, _ = layer(params, x)
    qp = dict(params)
    qp["experts"] = quant.quantize_expert_params(params["experts"],
                                                 bits=8)
    out, _ = layer(qp, x)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.05, rel


def test_ec_transformer_model():
    """The EC gate composes into the Transformer-MoE model family via
    gate_type='expert_choice' (trains; finite grads)."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=32, model_dim=32, num_heads=2,
        num_layers=2, ffn_hidden=64, moe_every=1, num_local_experts=4,
        top_k=2, expert_hidden=64, gate_type="expert_choice")
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, 61)
    g = jax.grad(
        lambda p: model.loss(p, tokens, training=True)[0])(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_ec_ep_matches_single_device():
    """EC under pure EP: local experts select from the GLOBAL token
    pool (score+activation all_gather, reduce-scatter combine) — the
    8-device result equals the single-device math exactly."""
    def make(n):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 8 // n,
                     "hidden_size_per_expert": 64},
            model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    l1 = make(1)
    params = l1.init(jax.random.PRNGKey(0))
    ref, zl1 = l1(params, x)
    l8 = make(8)
    out, zl8 = l8(l8.shard_params(params), x)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out)),
        np.asarray(jax.device_get(ref)), atol=2e-5)
    np.testing.assert_allclose(float(zl8), float(zl1), rtol=1e-6)

    def loss(p):
        o, z = l8(p, x, training=True)
        return jnp.mean(o ** 2) + 0.001 * z

    g = jax.grad(loss)(l8.shard_params(params))
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_ec_ep_grads_match_single_device():
    """Training gradients flow exactly through the O(capacity) ragged
    exchange: d(loss)/dx and the replicated gate grads under 8-device
    EP equal the single-device values."""
    def make(n):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 8 // n,
                     "hidden_size_per_expert": 64},
            model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    l1, l8 = make(1), make(8)
    params = l1.init(jax.random.PRNGKey(0))
    p8 = l8.shard_params(params)

    def loss(layer, p, xx):
        o, z = layer(p, xx, training=True)
        return jnp.mean(o ** 2) + 0.01 * z

    gx1 = jax.grad(lambda xx: loss(l1, params, xx))(x)
    gx8 = jax.grad(lambda xx: loss(l8, p8, xx))(x)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1),
                               atol=2e-6)
    gp1 = jax.grad(lambda p: loss(l1, params | {"gates": p}, x))(
        params["gates"])
    gp8 = jax.grad(lambda p: loss(l8, p8 | {"gates": p}, x))(
        p8["gates"])
    np.testing.assert_allclose(np.asarray(gp8[0]["wg"]),
                               np.asarray(gp1[0]["wg"]), atol=2e-6)


def test_ec_ep_valid_tokens_matches_single_device():
    """EC under EP honors valid_tokens (newly lifted restriction): a
    global prefix fill of 20 tokens as a per-shard vector equals the
    single-device scalar form; masked tokens produce zero output."""
    def make(n):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 1.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 8 // n,
                     "hidden_size_per_expert": 32},
            model_dim=16, seeds=(1, 1, 1), group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    l1, l8 = make(1), make(8)
    params = l1.init(jax.random.PRNGKey(0))
    ref, zl1 = l1(params, x, valid_tokens=20)
    out, zl8 = l8(l8.shard_params(params), x,
                  valid_tokens=jnp.asarray([8, 8, 4, 0, 0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    assert bool(jnp.all(out[20:] == 0))
    np.testing.assert_allclose(float(zl8), float(zl1), rtol=1e-5)


def test_ec_ep_wire_is_capacity_not_allgather():
    """The compiled EC EP program must not all-gather the [S, M]
    activation matrix — only the small [s, E] score shard (plus mask)
    may ride an all-gather; activations travel via the ragged a2a
    (VERDICT r2 item 5: O(capacity) wire)."""
    layer = moe.moe_layer(
        gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:8])
    params = layer.init(jax.random.PRNGKey(0))
    x = jnp.zeros((64, 32))
    hlo = jax.jit(lambda p, xx: layer(p, xx)).lower(
        params, x).compile().as_text()
    gathers = [ln for ln in hlo.splitlines() if "all-gather(" in ln
               or "all-gather-start(" in ln]
    for ln in gathers:
        # score gather is [S, E] = [64, 8]; the activation matrix
        # [64, 32] (or any M=32-wide gather) must not appear
        assert "f32[64,32]" not in ln.replace(" ", ""), ln


def test_ec_tp_matches_single_device():
    """EC under expert-slicing TP (round-3 lift of the pure-EP
    restriction): 8 devices holding 4 experts sliced 2-way — every
    adaptive_r mode equals the single-device EC math exactly (the r
    partial slices sum on each token's owner via the combine's
    scatter-add; g-fold duplicate outputs are pre-scaled by 1/g)."""
    def make(n, ptype="adaptive:2"):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn",
                     "num_experts_per_device": -2 if n > 1 else 4,
                     "hidden_size_per_expert": 64},
            model_dim=32, seeds=(1, 1, 1),
            parallel_type=ptype if n > 1 else "data",
            group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    l1 = make(1)
    params = l1.init(jax.random.PRNGKey(0))
    ref, zl1 = l1(params, x)
    for ptype in ("adaptive:2", "adaptive:1", "data", "model"):
        l8 = make(8, ptype)
        out, zl8 = l8(l8.shard_params(params), x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5,
            err_msg=f"parallel_type={ptype}")
        np.testing.assert_allclose(float(zl8), float(zl1), rtol=1e-5)
    # per-call adaptive_r incl. 0 (data-parallel experts: full local
    # weight gather, zero activation wire — a separate code path)
    l8 = make(8)
    p8 = l8.shard_params(params)
    for r in (2, 1, 0):
        out, _ = l8(p8, x, adaptive_r=r)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5,
            err_msg=f"adaptive_r={r}")


def test_ec_tp_training_grads_match():
    """d(loss)/dx under EC x TP equals single-device — the custom-VJP
    exchange transposes correctly through the replica fan-out."""
    def make(n):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn",
                     "num_experts_per_device": -2 if n > 1 else 4,
                     "hidden_size_per_expert": 64},
            model_dim=32, seeds=(1, 1, 1),
            parallel_type="adaptive:2" if n > 1 else "data",
            group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    l1, l8 = make(1), make(8)
    params = l1.init(jax.random.PRNGKey(0))
    p8 = l8.shard_params(params)

    def loss(layer, p, xx):
        o, z = layer(p, xx, training=True)
        return jnp.mean(o ** 2) + 0.01 * z

    gx1 = jax.grad(lambda xx: loss(l1, params, xx))(x)
    gx8 = jax.grad(lambda xx: loss(l8, p8, xx))(x)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1),
                               atol=5e-6)


def test_ec_tp_quantized_matches_single_device():
    """EC x TP composes with quantized experts: INT8 and block-packed
    INT4 (K-dim slices unpack locally) both equal single-device."""
    from tutel_tpu.ops import quant

    def make(n):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn",
                     "num_experts_per_device": -2 if n > 1 else 4,
                     "hidden_size_per_expert": 64,
                     "has_fc1_bias": False, "has_fc2_bias": False},
            model_dim=32, seeds=(1, 1, 1),
            parallel_type="adaptive:2" if n > 1 else "data",
            group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    l1, l8 = make(1), make(8)
    p = dict(l1.init(jax.random.PRNGKey(0)))
    for bits in (8, 4):
        q = dict(p)
        q["experts"] = quant.quantize_expert_params(
            p["experts"], bits=bits,
            sharded_count=2 if bits == 4 else 1)
        ref, _ = l1(q, x)
        out, _ = l8(l8.shard_params(q), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, err_msg=f"bits={bits}")


def test_ec_on_2dh_mesh_matches_single_device():
    """EC on the hierarchical ('dcn','ici') mesh: the ragged exchange
    runs flat over both tiers — forward and grads equal single-device
    exactly (round-3 lift; a hierarchical ragged decomposition would be
    a perf refinement only)."""
    def make(n, use_2dh):
        return moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 8 // n,
                     "hidden_size_per_expert": 64},
            model_dim=32, seeds=(1, 1, 1), use_2dh=use_2dh,
            num_hosts=2 if use_2dh else None, group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    l1, l8 = make(1, False), make(8, True)
    params = l1.init(jax.random.PRNGKey(0))
    ref, zl1 = l1(params, x)
    p8 = l8.shard_params(params)
    out, zl8 = l8(p8, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)
    np.testing.assert_allclose(float(zl8), float(zl1), rtol=1e-5)

    def loss(layer, p, xx):
        o, z = layer(p, xx, training=True)
        return jnp.mean(o ** 2) + 0.01 * z

    g1 = jax.grad(lambda xx: loss(l1, params, xx))(x)
    g8 = jax.grad(lambda xx: loss(l8, p8, xx))(x)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), atol=5e-6)


def test_ec_rejects_ragged_ep_flag():
    with pytest.raises(AssertionError, match="exactly-sized"):
        layer = moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0},
            experts={"type": "ffn", "num_experts_per_device": 1,
                     "hidden_size_per_expert": 16},
            model_dim=16, seeds=(1, 1, 1), group=jax.devices()[:8])
        params = layer.init(jax.random.PRNGKey(0))
        layer(params, jnp.zeros((64, 16)), use_ragged_ep=True,
              max_recv=64)


def test_ec_fuzz_vs_numpy_oracle():
    """Randomized shapes/capacities vs a direct NumPy realization of
    the EC spec (selection, gather, weighted scatter)."""
    rng = np.random.default_rng(0)
    for trial in range(10):
        s = int(rng.integers(8, 64))
        e = int(rng.integers(2, 9))
        cap = int(rng.integers(1, s + 1))
        m = int(rng.integers(4, 17))
        scores = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((s, e)), jnp.float32), axis=1)
        x = jnp.asarray(rng.standard_normal((s, m)), jnp.float32)
        ec = ec_ops.expert_choice_routing(scores, cap)
        y = ec_ops.ec_encode(x, ec)
        out = ec_ops.ec_decode(y, ec, s)

        sn, xn = np.asarray(scores), np.asarray(x)
        want = np.zeros_like(xn)
        for ei in range(e):
            order = np.argsort(-sn[:, ei], kind="stable")[:cap]
            for t in order:
                want[t] += sn[t, ei] * xn[t]
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5,
                                   err_msg=f"trial {trial} s={s} e={e} "
                                           f"cap={cap}")


def test_combine_rows_onehot_equals_scatter():
    """The MXU one-hot combine (round 4, the EC-combine-gap fix) must
    equal the scatter-add oracle exactly in f32, including dropped
    sentinel rows and duplicate targets."""
    from tutel_tpu.ops.expert_choice import combine_rows
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.randn(24, 16).astype(np.float32))
    # duplicates, gaps, and the out-of-range sentinel (=10)
    ids = jnp.asarray(rng.randint(0, 11, size=24).astype(np.int32))
    scat = combine_rows(rows, ids, 10, native=False)
    onehot = combine_rows(rows, ids, 10, native=True)
    np.testing.assert_allclose(np.asarray(onehot), np.asarray(scat),
                               rtol=1e-6, atol=1e-6)
    # memory guard: oversized selection matrices fall back to scatter
    import tutel_tpu.ops.expert_choice as ec_mod
    old = ec_mod._ONEHOT_MAX_ELEMS
    try:
        ec_mod._ONEHOT_MAX_ELEMS = 4
        guarded = combine_rows(rows, ids, 10, native=True)
    finally:
        ec_mod._ONEHOT_MAX_ELEMS = old
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(scat))


def test_ec_layer_onehot_combine_matches_scatter_end_to_end(monkeypatch):
    """Force the one-hot combine through the full EC MoE layer (single
    device and 8-device EP) and pin equality with the scatter path."""
    import tutel_tpu.ops.expert_choice as ec_mod

    def outputs(native):
        if native is not None:
            monkeypatch.setattr(
                jax, "default_backend", lambda: "tpu" if native else "cpu")
        layer = moe.moe_layer(
            gate_type={"type": "expert_choice", "capacity_factor": 2.0,
                       "gate_noise": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 1,
                     "hidden_size_per_expert": 32},
            model_dim=16, seeds=(1, 1, 1), group=jax.devices()[:8])
        params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
        y, _ = layer(params, x)
        return np.asarray(y)

    ref = outputs(None)
    # monkeypatch the native flag the layer threads to combine_rows
    orig = ec_mod.combine_rows

    def force_onehot(rows, ids, n, native=None):
        return orig(rows, ids, n, native=True)
    monkeypatch.setattr(ec_mod, "combine_rows", force_onehot)
    forced = outputs(None)
    np.testing.assert_allclose(forced, ref, rtol=1e-5, atol=1e-5)


def test_combine_rows_fanin_gather_matches_scatter():
    """The round-5 bounded-fan-in gather combine: equal to the scatter
    oracle for sub-bound fan-ins, and the traced overflow cond must
    fall back (not truncate) when a token is chosen by more than J
    experts — EC permits all E experts to pick the same token."""
    import tutel_tpu.ops.expert_choice as ec_mod
    from tutel_tpu.ops.expert_choice import combine_rows, _combine_fanin
    rng = np.random.RandomState(1)
    rows = jnp.asarray(rng.randn(40, 8).astype(np.float32))

    # (a) sub-bound fan-ins: fanin path itself, no overflow
    ids = jnp.asarray((np.arange(40) % 10).astype(np.int32))
    out, over = _combine_fanin(rows, ids, 10)
    assert not bool(over)
    scat = combine_rows(rows, ids, 10, native=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(scat),
                               rtol=1e-6, atol=1e-6)

    # (b) overflow flag: 13 rows onto one token > J=8 slots must be
    # DETECTED (the realization's caller-side cond falls back to the
    # one-hot matmul rather than truncating)
    ids_hot = jnp.asarray(np.r_[np.zeros(13), np.arange(1, 28)]
                          .astype(np.int32))
    _f_out, f_over = _combine_fanin(rows, ids_hot, 28)
    assert bool(f_over)

    # (c) gradients flow through the fanin gather
    g = jax.grad(lambda r: _combine_fanin(r, ids, 10)[0].sum())(rows)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(rows),
                               rtol=1e-6, atol=1e-6)
