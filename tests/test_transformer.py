"""Transformer-MoE model family: shapes, training progress, aux collection.

The capability oracle for the reference's fairseq-MoE integration
(reference examples/fairseq_moe/fairseq_patch.diff): MoE FFNs every Nth
block, aux losses summed across layers into the task loss."""

import numpy as np
import jax
import jax.numpy as jnp

from tutel_tpu.models import TransformerMoE, TransformerMoEConfig


def _model(**kw):
    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=32, model_dim=32, num_heads=2, num_layers=4,
        ffn_hidden=64, moe_every=2, num_local_experts=4, top_k=2,
        expert_hidden=64, **kw)
    return TransformerMoE(cfg, group=jax.devices()[:1]), cfg


def test_forward_shapes_and_aux():
    model, cfg = _model()
    params = model.init(jax.random.PRNGKey(0))
    assert set(model.moe_layers) == {1, 3}
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                cfg.vocab_size)
    logits, l_aux = jax.jit(model.apply)(params, tokens)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert float(l_aux) > 0       # two MoE layers contribute


def test_lm_trains():
    """A few Adam steps must reduce the loss on a repetitive corpus."""
    import optax
    model, cfg = _model()
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.tile(jnp.arange(17)[None, :], (4, 2))[:, :32]
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, tokens, key=key)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(10):
        key, sk = jax.random.split(key)
        params, state, loss = step(params, state, sk)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_moe_override_topk():
    """Per-call top_k override reaches the embedded MoE layers."""
    model, cfg = _model()
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                cfg.vocab_size)
    l1, _ = model.apply(params, tokens, moe_overrides={"top_k": 1})
    l2, _ = model.apply(params, tokens, moe_overrides={"top_k": 2})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_lm_example_runs():
    from tutel_tpu.examples import moe_transformer_lm
    import argparse
    losses = moe_transformer_lm.run(argparse.Namespace(
        batch_size=4, seq_len=32, model_dim=32, num_heads=2, num_layers=2,
        hidden=64, moe_every=1, num_experts=4, top=2, steps=8, lr=3e-3,
        l_aux_wt=0.01, dtype="float32", data_file="", checkpoint_path="",
        device="cpu"), log=lambda *a, **k: None)
    assert len(losses) == 8 and losses[-1] < losses[0]


def test_decode_matches_full_apply():
    """Chained KV-cache decode reproduces the full forward's logits at
    every position (drop-free capacity so routing is batch-size
    independent)."""
    model, cfg = _model(capacity_factor=8.0)
    params = model.init(jax.random.PRNGKey(0))
    b, t = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    full, _ = model.apply(params, tokens)

    cache = model.init_cache(b)
    ov = {"capacity_factor": 8.0}
    step = jax.jit(lambda p, tok, c, pos: model.apply_decode(
        p, tok, c, pos, moe_overrides=ov))
    for i in range(t):
        pos = jnp.full((b,), i, jnp.int32)
        logits, cache, _ = step(params, tokens[:, i], cache, pos)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, i]),
            rtol=2e-4, atol=2e-4)


def test_prefill_matches_decode_chain():
    """Scan prefill == token-by-token decode: final logits and cache."""
    model, cfg = _model(capacity_factor=8.0)
    params = model.init(jax.random.PRNGKey(0))
    b, t = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0,
                                cfg.vocab_size)
    ov = {"capacity_factor": 8.0}
    logits_p, cache_p = jax.jit(
        lambda p, tok, c: model.prefill(p, tok, c, moe_overrides=ov))(
        params, tokens, model.init_cache(b))

    cache = model.init_cache(b)
    for i in range(t):
        pos = jnp.full((b,), i, jnp.int32)
        logits, cache, _ = model.apply_decode(
            params, tokens[:, i], cache, pos, moe_overrides=ov)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)
    for cp, cc in zip(cache_p, cache):
        np.testing.assert_allclose(np.asarray(cp["k"]),
                                   np.asarray(cc["k"]), rtol=1e-5,
                                   atol=1e-5)


def test_parallel_prefill_matches_scan_prefill():
    """The round-4 chunked-parallel prefill == the token-by-token scan
    oracle: final logits and the full written cache, including a chunk
    size that does not divide the prompt (padding tail) and the INT8
    KV cache layout."""
    for kv_bits in (0, 8):
        model, cfg = _model(capacity_factor=8.0)
        if kv_bits:
            import dataclasses
            cfg = dataclasses.replace(cfg, kv_bits=8)
            model = TransformerMoE(cfg, group=jax.devices()[:1])
        params = model.init(jax.random.PRNGKey(0))
        b, tp = 2, 11                      # 11 % 4 != 0 -> padded tail
        prompts = jax.random.randint(jax.random.PRNGKey(3), (b, tp), 0,
                                     cfg.vocab_size)
        ov = {"capacity_factor": 8.0}
        ls, cs = model.prefill(params, prompts, model.init_cache(b),
                               moe_overrides=ov, parallel=False)
        lp, cp = jax.jit(
            lambda p, pr, c: model._prefill_parallel(
                p, pr, c, jax.random.PRNGKey(0), ov, tc=4))(
            params, prompts, model.init_cache(b))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"kv_bits={kv_bits}")
        for a, d in zip(cs, cp):
            for k in a:
                # compare only the prompt region the scan wrote; the
                # parallel pad tail holds junk that is never read
                sl = (slice(None), slice(None, tp)) if k in ("k", "v") \
                    else (slice(None), slice(None), slice(None, tp))
                np.testing.assert_allclose(
                    np.asarray(d[k][sl], np.float32),
                    np.asarray(a[k][sl], np.float32),
                    rtol=2e-4, atol=2e-4,
                    err_msg=f"kv_bits={kv_bits} cache[{k}]")


def test_prefill_kernel_matches_xla_chain(monkeypatch):
    """The flash prefill kernel (round 5) through the WHOLE parallel
    prefill — segmented windows, cache writes, MoE chunks — must match
    the XLA einsum chain for float, kv8, and kv4 caches (interpret
    mode; head_dim=128 to satisfy the kernel tiling)."""
    import numpy as np
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    rng = np.random.RandomState(0)
    for kv_bits, kvh in ((0, 0), (8, 2), (4, 2)):
        cfg = TransformerMoEConfig(
            vocab_size=97, max_len=256, model_dim=512, num_heads=4,
            num_kv_heads=kvh, num_layers=2, ffn_hidden=128,
            moe_every=2, num_local_experts=2, top_k=2,
            capacity_factor=0.0, expert_hidden=64, kv_bits=kv_bits)
        model = TransformerMoE(cfg, group=jax.devices()[:1])
        params = model.init(jax.random.PRNGKey(0))
        prompts = jnp.asarray(rng.randint(0, 97, (2, 200)), jnp.int32)

        monkeypatch.setenv("TUTEL_TPU_PREFILL_ATTN", "0")
        lg_xla, c_xla = model.prefill(params, prompts,
                                      model.init_cache(2))
        monkeypatch.setenv("TUTEL_TPU_PREFILL_ATTN", "1")
        lg_k, c_k = model.prefill(params, prompts, model.init_cache(2))
        np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_xla),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"kv_bits={kv_bits}")
        # caches agree up to the quantization LSB (tiny float diffs in
        # the attention output shift a handful of int8 roundings); the
        # functional contract is that decode CONTINUES identically
        tok = jnp.argmax(lg_xla, axis=-1).astype(jnp.int32)
        pos = jnp.full((2,), 200, jnp.int32)
        toks_k, toks_x = [], []
        ck, cx, tk, tx = c_k, c_xla, tok, tok
        for step in range(4):
            lk, ck, _ = model.apply_decode(params, tk, ck,
                                           pos + step)
            lx, cx, _ = model.apply_decode(params, tx, cx,
                                           pos + step)
            tk = jnp.argmax(lk, axis=-1).astype(jnp.int32)
            tx = jnp.argmax(lx, axis=-1).astype(jnp.int32)
            toks_k.append(np.asarray(tk))
            toks_x.append(np.asarray(tx))
        np.testing.assert_array_equal(
            np.stack(toks_k), np.stack(toks_x),
            err_msg=f"kv_bits={kv_bits} decode continuation")


def test_scan_prefill_works_for_bf16_models():
    """Round-5 review finding: the parallel=False scan oracle's logits
    carry must match apply_decode's logits dtype (bf16 for bf16
    models under the model-dtype rule) — it crashed with a scan carry
    type mismatch."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=32, model_dim=32, num_heads=2,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=2,
        top_k=1, capacity_factor=8.0, expert_hidden=64,
        dtype=jnp.bfloat16)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    prompts = jnp.asarray([[5, 9, 2, 11]], jnp.int32)
    lg, cache = model.prefill(params, prompts, model.init_cache(1),
                              parallel=False)
    assert lg.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(lg, np.float32)).all()
