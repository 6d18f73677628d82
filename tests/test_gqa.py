"""Grouped-query attention (GQA, round 4 — beyond reference).

num_kv_heads < num_heads shrinks the KV cache and its decode
bandwidth — the measured dominant HBM cost of LM serving — by
nh/kvh, composing with the INT8 cache (kv_bits=8) for up to
2*(nh/kvh)x total. Group convention: query head h reads KV group
h % kvh (chosen so the flash-decode kernel's block-diagonal trick
generalizes by plain tiling — see ops/decode_attn_pallas).

Oracles here: decode chain == full forward (GQA self-consistency),
kernel == XLA windowed path, engine end-to-end, and a direct kernel
oracle against an explicit grouped-attention reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
from tutel_tpu.serving import LmDecodeEngine, LmRequest


def _model(**kw):
    base = dict(vocab_size=61, max_len=32, model_dim=32, num_heads=4,
                num_kv_heads=2, num_layers=4, ffn_hidden=64, moe_every=2,
                num_local_experts=4, top_k=2, capacity_factor=8.0,
                expert_hidden=64)
    base.update(kw)
    cfg = TransformerMoEConfig(**base)
    return TransformerMoE(cfg, group=jax.devices()[:1]), cfg


def test_gqa_cache_shrinks():
    # flat [B, T, kvh*hd] kernel-layout slabs (see init_cache): GQA
    # stores kvh/nh of the MHA bytes
    model, cfg = _model(num_heads=8, num_kv_heads=2, model_dim=64)
    cache = model.init_cache(2)
    assert cache[0]["k"].shape == (2, cfg.max_len, 2 * 8)
    mha, _ = _model(num_heads=8, num_kv_heads=0, model_dim=64)
    assert mha.init_cache(2)[0]["k"].shape == (2, cfg.max_len, 8 * 8)


def test_gqa_decode_matches_full_apply():
    """The GQA decode chain reproduces the GQA full forward — the same
    exactness contract the MHA serving path carries."""
    model, cfg = _model()
    params = model.init(jax.random.PRNGKey(0))
    b, t = 2, 10
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    full, _ = model.apply(params, tokens)
    cache = model.init_cache(b)
    ov = {"capacity_factor": 8.0}
    for i in range(t):
        pos = jnp.full((b,), i, jnp.int32)
        logits, cache, _ = model.apply_decode(
            params, tokens[:, i], cache, pos, moe_overrides=ov)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, i]),
            rtol=2e-4, atol=2e-4, err_msg=f"pos {i}")


def test_gqa_differs_from_mha():
    """Same params shape family but num_kv_heads must actually change
    the computation (guard against a silent fall-through to MHA)."""
    m1, cfg = _model(num_heads=4, num_kv_heads=2)
    m2, _ = _model(num_heads=4, num_kv_heads=4)
    p1 = m1.init(jax.random.PRNGKey(0))
    p2 = m2.init(jax.random.PRNGKey(0))
    assert p1["blocks"][0]["wqkv"].shape[1] < \
        p2["blocks"][0]["wqkv"].shape[1]


@pytest.mark.parametrize("kv_bits", [0, 8])
def test_gqa_kernel_matches_xla_path(monkeypatch, kv_bits):
    """Flash-decode kernel with grouped KV slabs (interpret) == the
    XLA grouped windowed path through whole decode steps."""
    model, cfg = _model(model_dim=256, num_heads=8, num_kv_heads=2,
                        num_layers=2, top_k=1, max_len=128,
                        kv_bits=kv_bits)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab_size)

    def chain(env):
        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", env)
        cache = model.init_cache(2)
        outs = []
        for i in range(tokens.shape[1]):
            pos = jnp.full((2,), i, jnp.int32)
            logits, cache, _ = model.apply_decode(
                params, tokens[:, i], cache, pos,
                moe_overrides={"capacity_factor": 8.0})
            outs.append(np.asarray(logits))
        return np.stack(outs)

    ref = chain("0")
    out = chain("1")
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_gqa_kernel_direct_oracle():
    """decode_attn with KVH < NH == an explicit grouped-attention
    reference (q head h vs KV group h % kvh)."""
    from tutel_tpu.ops.decode_attn_pallas import decode_attn
    b, nh, kvh, hd, t = 3, 8, 2, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, nh, hd))
    k = jax.random.normal(ks[1], (b, t, kvh, hd))
    v = jax.random.normal(ks[2], (b, t, kvh, hd))
    pos = jnp.asarray([5, 31, 63], jnp.int32)
    out = decode_attn(q, k, v, pos, wc=16, interpret=True)
    # reference: expand KV to nh heads by group
    gather = jnp.arange(nh) % kvh
    ke = k[:, :, gather]
    ve = v[:, :, gather]
    scores = jnp.einsum("bhd,bthd->bht", q, ke) * (hd ** -0.5)
    mask = jnp.arange(t)[None, :] <= pos[:, None]
    scores = jnp.where(mask[:, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bht,bthd->bhd", probs, ve)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gqa_prefill_and_engine_end_to_end():
    """Parallel prefill == scan prefill under GQA (+INT8 cache), and
    the serving engine generates identical tokens either way."""
    model, cfg = _model(kv_bits=8, max_len=128)
    params = model.init(jax.random.PRNGKey(0))
    b, tp = 2, 11
    prompts = jax.random.randint(jax.random.PRNGKey(3), (b, tp), 0,
                                 cfg.vocab_size)
    ov = {"capacity_factor": 8.0}
    ls, cs = model.prefill(params, prompts, model.init_cache(b),
                           moe_overrides=ov, parallel=False)
    lp, cp = model._prefill_parallel(
        params, prompts, model.init_cache(b), jax.random.PRNGKey(0),
        ov, tc=4)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=2e-4, atol=2e-4)

    rng = np.random.RandomState(0)
    eng = LmDecodeEngine(model, params, max_batch=4, moe_overrides=ov)
    out = eng.run([LmRequest(uid=i,
                             prompt=rng.randint(0, cfg.vocab_size, 7
                                                ).astype(np.int32),
                             max_new_tokens=6) for i in range(5)],
                  chunk=3)
    assert len(out) == 5 and all(len(x) == 6 for x in out.values())
