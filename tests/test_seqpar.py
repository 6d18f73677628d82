"""Sequence/context parallelism (Ulysses-style SP x EP) tests.

The one SURVEY axis the reference does not implement (SURVEY.md §5
long-context: no attention code exists; the closest artifacts are
`spatial_split`, reference tutel/impls/communicate.py:589-604, and
parted's A2A re-sharding pattern, reference tutel/parted/patterns.py:
91-109 — the TPU build owes CAPABILITY parity). Here the capability is
delivered end-to-end: `TransformerMoE.apply_seqpar` runs the whole LM
under one shard_map with the sequence sharded over the MoE layers'
own mesh — attention re-shards heads<->sequence via an all-to-all
pair, the MoE layers consume the token shard through `local_forward`,
so SP composes with EP (and expert-slicing TP) on one mesh.

Oracle: forward logits AND training gradients equal the single-device
`apply`/`loss` of the same global model (8-virtual-device CPU mesh),
the same equivalence class the reference uses for DP==MP
(reference tests/test_tutel.py:154-159).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

SP = 8  # the virtual mesh size (tests/conftest.py)


def _cfg(**kw):
    base = dict(
        vocab_size=61, max_len=64, model_dim=32, num_heads=8,
        num_layers=4, ffn_hidden=64, moe_every=2, num_local_experts=1,
        top_k=2, capacity_factor=0.0, expert_hidden=64)
    base.update(kw)
    return TransformerMoEConfig(**base)


def _models(cfg, parallel_type="adaptive:1"):
    """(sp_model over all devices, reference model on one device) with
    the same GLOBAL expert count so params match leaf-for-leaf."""
    devs = jax.devices()
    sp_model = TransformerMoE(cfg, group=devs, parallel_type=parallel_type)
    e_global = (list(sp_model.moe_layers.values())[0].num_global_experts
                if sp_model.moe_layers else cfg.num_local_experts)
    ref_model = TransformerMoE(
        TransformerMoEConfig(**{**cfg.__dict__,
                                "num_local_experts": e_global}),
        group=devs[:1])
    return sp_model, ref_model


def _shard_moe(model, params):
    params = dict(params)
    params["blocks"] = [
        ({**blk, "moe": model.moe_layers[i].shard_params(blk["moe"])}
         if "moe" in blk else blk)
        for i, blk in enumerate(params["blocks"])]
    return params


def test_seqpar_forward_equals_single_device():
    cfg = _cfg()
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    ref_logits, ref_aux = ref_model.apply(
        params, tokens, moe_overrides={"capacity_override": b * t})

    sp_params = _shard_moe(sp_model, params)
    # worst-case capacity on both sides so neither layout drops tokens
    sp_logits, sp_aux = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t}))(
        sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    assert np.isfinite(float(sp_aux))


def test_seqpar_grads_equal_single_device():
    """Training gradients through the SP shard_map (attention a2a pair
    + MoE local_forward) == single-device gradients of the same nll.
    The nll excludes l_aux (per-shard gshard statistics aggregate
    differently than the global ones — a documented semantic of token-
    sharded aux, not a bug; the gradient path through logits covers
    every parameter)."""
    cfg = _cfg(num_layers=2)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32   # T % 8 == 0 (full-T forward, shifted logits)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    cap = b * (t - 1)

    def ref_loss(p):
        loss, (nll, _aux) = ref_model.loss(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap})
        return nll

    def sp_loss(p):
        loss, (nll, _aux) = sp_model.loss_seqpar(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap})
        return nll

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)
    sp_params = _shard_moe(sp_model, params)
    sp_val, sp_grads = jax.jit(jax.value_and_grad(sp_loss))(sp_params)
    np.testing.assert_allclose(float(sp_val), float(ref_val),
                               rtol=1e-5, atol=1e-6)
    ref_leaves = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    sp_leaves = dict(jax.tree_util.tree_flatten_with_path(sp_grads)[0])
    for path, rg in ref_leaves:
        sg = sp_leaves[path]
        np.testing.assert_allclose(
            np.asarray(sg), np.asarray(rg), rtol=3e-4, atol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_seqpar_composes_with_expert_slicing_tp():
    """SP x TP: each expert sharded over 2 devices (num_local_experts
    = -2) while the sequence shards over all 8 — the a2a pair and the
    expert partial-sum ride one mesh."""
    cfg = _cfg(num_layers=2)
    tp_cfg = TransformerMoEConfig(
        **{**cfg.__dict__, "num_local_experts": -2})
    sp_model, ref_model = _models(tp_cfg, parallel_type="adaptive:2")
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 16
    tokens = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0,
                                cfg.vocab_size)
    ref_logits, _ = ref_model.apply(
        params, tokens, moe_overrides={"capacity_override": b * t})
    sp_params = _shard_moe(sp_model, params)
    sp_logits, _ = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t}))(
        sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_ring_forward_equals_single_device():
    """Ring attention (blockwise ppermute + online softmax) == the
    single-device full softmax, with MoE in the loop."""
    cfg = _cfg()
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    ref_logits, _ = ref_model.apply(
        params, tokens, moe_overrides={"capacity_override": b * t})
    sp_params = _shard_moe(sp_model, params)
    sp_logits, sp_aux = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t},
            attn_mode="ring"))(sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    assert np.isfinite(float(sp_aux))


def test_ring_lifts_head_bound_and_mha_restriction():
    """The two layouts Ulysses cannot run: P > num_heads, and GQA.
    Ring attention handles both (the head axis is never re-sharded)."""
    import pytest as _pytest
    # (a) num_heads=4 < 8 devices
    cfg = _cfg(num_heads=4, num_layers=2)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, t), 0,
                                cfg.vocab_size)
    with _pytest.raises(ValueError, match="must divide"):
        sp_model.apply_seqpar(params, tokens)   # ulysses refuses
    ref_logits, _ = ref_model.apply(
        params, tokens, moe_overrides={"capacity_override": b * t})
    sp_params = _shard_moe(sp_model, params)
    sp_logits, _ = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t},
            attn_mode="ring"))(sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    # (b) grouped-query attention with FEWER KV heads than devices
    # (num_kv_heads=2 of 8): ulysses (which shards whole KV groups,
    # round 5) cannot split 2 groups over 8 devices — ring can
    gqa_cfg = _cfg(num_kv_heads=2, num_layers=2)
    sp_model, ref_model = _models(gqa_cfg)
    params = ref_model.init(jax.random.PRNGKey(4))
    tokens = jax.random.randint(jax.random.PRNGKey(5), (b, t), 0,
                                gqa_cfg.vocab_size)
    with _pytest.raises(ValueError, match="ring"):
        sp_model.apply_seqpar(params, tokens)   # ulysses refuses kvh<P
    ref_logits, _ = ref_model.apply(
        params, tokens, moe_overrides={"capacity_override": b * t})
    sp_params = _shard_moe(sp_model, params)
    sp_logits, _ = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t},
            attn_mode="ring"))(sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_ring_grads_equal_single_device():
    """Training gradients through the ring (ppermute rotation + online
    softmax rescaling + MoE local_forward) == single device."""
    cfg = _cfg(num_layers=2)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    cap = b * (t - 1)

    def ref_loss(p):
        _loss, (nll, _aux) = ref_model.loss(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap})
        return nll

    def sp_loss(p):
        _loss, (nll, _aux) = sp_model.loss_seqpar(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap}, attn_mode="ring")
        return nll

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)
    sp_params = _shard_moe(sp_model, params)
    sp_val, sp_grads = jax.jit(jax.value_and_grad(sp_loss))(sp_params)
    np.testing.assert_allclose(float(sp_val), float(ref_val),
                               rtol=1e-5, atol=1e-6)
    ref_leaves = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    sp_leaves = dict(jax.tree_util.tree_flatten_with_path(sp_grads)[0])
    for path, rg in ref_leaves:
        sg = sp_leaves[path]
        np.testing.assert_allclose(
            np.asarray(sg), np.asarray(rg), rtol=3e-4, atol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_seqpar_ulysses_gqa_forward_and_grads():
    """Ulysses with grouped-query attention (round 5, P <= KVH): 16
    query heads over 8 KV groups on the 8-device mesh — the query
    heads travel group-major so each device owns whole groups; forward
    logits AND gradients == single device."""
    cfg = _cfg(num_heads=16, num_kv_heads=8, num_layers=2)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    ref_logits, _ = ref_model.apply(
        params, tokens,
        moe_overrides={"capacity_override": b * t})
    sp_params = _shard_moe(sp_model, params)
    sp_logits, _ = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(
            p, tok, moe_overrides={"capacity_override": b * t}))(
        sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)

    cap = b * (t - 1)

    def ref_loss(p):
        _loss, (nll, _aux) = ref_model.loss(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap})
        return nll

    def sp_loss(p):
        _loss, (nll, _aux) = sp_model.loss_seqpar(
            p, tokens, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap})
        return nll

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)
    sp_val, sp_grads = jax.jit(jax.value_and_grad(sp_loss))(sp_params)
    np.testing.assert_allclose(float(sp_val), float(ref_val),
                               rtol=1e-5, atol=1e-6)
    ref_leaves = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    sp_leaves = dict(jax.tree_util.tree_flatten_with_path(sp_grads)[0])
    for path, rg in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(sp_leaves[path]), np.asarray(rg),
            rtol=3e-4, atol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_seqpar_composes_with_expert_choice():
    """EC x SP (round-5 verdict item 8): apply_seqpar with expert-
    choice routing — local_forward's EC exchange (score all_gather +
    replicated top-C + ragged a2a) rides the same mesh as the
    attention a2a pair. Logits == single device."""
    cfg = _cfg(num_layers=2, gate_type="expert_choice",
               capacity_factor=2.0)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(6), (b, t), 0,
                                cfg.vocab_size)
    ref_logits, _ = ref_model.apply(params, tokens)
    sp_params = _shard_moe(sp_model, params)
    sp_logits, _ = jax.jit(
        lambda p, tok: sp_model.apply_seqpar(p, tok))(sp_params, tokens)
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_seqpar_validations():
    cfg = _cfg()
    sp_model, _ = _models(cfg)
    params_model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = params_model.init(jax.random.PRNGKey(0))
    tokens = jnp.zeros((2, 12), jnp.int32)   # 12 % 8 != 0
    with pytest.raises(ValueError, match="must divide"):
        sp_model.apply_seqpar(params, tokens)
    no_moe = TransformerMoE(TransformerMoEConfig(
        **{**cfg.__dict__, "moe_every": 0}), group=jax.devices())
    with pytest.raises(ValueError, match="has none"):
        no_moe.apply_seqpar(params, jnp.zeros((2, 32), jnp.int32))


def test_seqpar_single_device_falls_back_to_apply():
    cfg = _cfg()
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                cfg.vocab_size)
    a, _ = model.apply(params, tokens)
    s, _ = model.apply_seqpar(params, tokens)
    np.testing.assert_allclose(np.asarray(s), np.asarray(a))


def test_loss_seqpar_max_len_plus_one_dataset():
    """Datasets sized max_len+1 for the shift keep working on the SP
    path (round-5 review finding): loss_seqpar falls back to the
    sliced forward, and still equals the single-device loss."""
    cfg = _cfg(num_layers=2, max_len=32)
    sp_model, ref_model = _models(cfg)
    params = ref_model.init(jax.random.PRNGKey(0))
    b, t = 2, 33                      # (t-1) % 8 == 0, t > max_len
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    cap = b * (t - 1)
    _, (ref_nll, _) = ref_model.loss(
        params, tokens, l_aux_wt=0.0,
        moe_overrides={"capacity_override": cap})
    sp_params = _shard_moe(sp_model, params)
    _, (sp_nll, _) = sp_model.loss_seqpar(
        sp_params, tokens, l_aux_wt=0.0,
        moe_overrides={"capacity_override": cap})
    np.testing.assert_allclose(float(sp_nll), float(ref_nll),
                               rtol=1e-5, atol=1e-6)
