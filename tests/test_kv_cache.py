"""INT8 KV cache + speculative-donation tests (round 4).

The KV read is the measured dominant HBM cost of LM decode
(docs/RESULTS.md serving table); kv_bits=8 halves its bytes. These
tests pin (a) the quantized cache's accuracy envelope vs the bf16/f32
cache, (b) the engine end-to-end on the quantized cache, and (c) the
soundness of donating the KV cache across the SPECULATIVE chunk
boundary: a replay-on-overflow restarts from the post-chunk (donated)
buffer, which is sound because the chunk only writes positions >= each
row's pos and every such cell is masked until the step that writes it.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
from tutel_tpu.serving import LmDecodeEngine, LmRequest


def _model(kv_bits=0, **kw):
    base = dict(vocab_size=61, max_len=32, model_dim=32, num_heads=2,
                num_layers=4, ffn_hidden=64, moe_every=2,
                num_local_experts=4, top_k=2, capacity_factor=8.0,
                expert_hidden=64, kv_bits=kv_bits)
    base.update(kw)
    cfg = TransformerMoEConfig(**base)
    return TransformerMoE(cfg, group=jax.devices()[:1]), cfg


def _decode_chain(model, params, tokens, cache):
    """Token-by-token apply_decode; returns stacked logits."""
    b, t = tokens.shape
    outs = []
    ov = {"capacity_factor": 8.0}
    step = jax.jit(lambda p, tok, c, pos: model.apply_decode(
        p, tok, c, pos, moe_overrides=ov))
    for i in range(t):
        pos = jnp.full((b,), i, jnp.int32)
        logits, cache, _ = step(params, tokens[:, i], cache, pos)
        outs.append(np.asarray(logits))
    return np.stack(outs), cache


def test_kv8_close_to_full_precision():
    """Decode over the INT8 cache tracks the full-precision cache within
    the quantization envelope. The bound is quantile-based because this
    is an untrained random MoE model with near-uniform logits: INT8
    perturbs each K/V element ~0.4% relatively, the error compounds
    through 4 residual layers, and a borderline token's top-k routing
    can flip — measured on this config: mean |Δlogprob| 0.019, max
    0.27, greedy agreement 96%. A broken dequant (wrong scale layout /
    missing scale) lands orders of magnitude outside these bounds.
    The production accuracy pin is the TRAINED-model Δnll in
    benchmarks/perplexity_delta.py (kv8 row), mirroring the INT4
    expert-weight envelope (docs/RESULTS.md Δnll +0.005)."""
    model8, cfg = _model(kv_bits=8)
    model0, _ = _model(kv_bits=0)
    params = model0.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                cfg.vocab_size)
    l0, _ = _decode_chain(model0, params, tokens, model0.init_cache(2))
    l8, _ = _decode_chain(model8, params, tokens, model8.init_cache(2))
    p0 = np.asarray(jax.nn.log_softmax(jnp.asarray(l0), axis=-1))
    p8 = np.asarray(jax.nn.log_softmax(jnp.asarray(l8), axis=-1))
    diff = np.abs(p8 - p0)
    assert diff.mean() < 0.04, diff.mean()
    assert np.quantile(diff, 0.9) < 0.1, np.quantile(diff, 0.9)
    assert diff.max() < 0.5, diff.max()
    # greedy decisions survive quantization on this model
    agree = (p8.argmax(-1) == p0.argmax(-1)).mean()
    assert agree >= 0.9, agree
    # and the full forward (no cache) is untouched by kv_bits
    f0, _ = model0.apply(params, tokens)
    f8, _ = model8.apply(params, tokens)
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f0))


def test_kv8_kernel_path_matches_xla_path(monkeypatch):
    """The flash-decode kernel's in-tile dequant == the XLA dequant
    through a whole decode step (model_dim=128 so the kernel engages)."""
    model, cfg = _model(kv_bits=8, model_dim=128, num_heads=4,
                        num_layers=2, top_k=1, max_len=128)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab_size)
    monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "0")
    ref, _ = _decode_chain(model, params, tokens, model.init_cache(2))
    monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "1")
    out, _ = _decode_chain(model, params, tokens, model.init_cache(2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_kv8_engine_end_to_end():
    """LmDecodeEngine over the INT8 cache: prefill scatter handles the
    scale entries, chunked decode runs, histories complete."""
    model, cfg = _model(kv_bits=8)
    params = model.init(jax.random.PRNGKey(0))
    eng = LmDecodeEngine(model, params, max_batch=4,
                         moe_overrides={"capacity_factor": 8.0})
    rng = np.random.RandomState(0)
    reqs = [LmRequest(uid=i,
                      prompt=rng.randint(0, cfg.vocab_size, 5
                                         ).astype(np.int32),
                      max_new_tokens=8) for i in range(6)]
    out = eng.run(reqs, chunk=4)
    assert len(out) == 6 and all(len(v) == 8 for v in out.values())
    # engine tokens == direct decode of the same model/params (greedy,
    # same key chain for the single-admission case)
    eng2 = LmDecodeEngine(model, params, max_batch=4,
                          moe_overrides={"capacity_factor": 8.0})
    out2 = eng2.run([LmRequest(uid=0, prompt=reqs[0].prompt,
                               max_new_tokens=8)], chunk=4)
    assert out2[0].shape == (8,)


def test_kv4_close_to_full_precision():
    """INT4 KV (per-(pos, head) scales over hd values) tracks the
    full-precision cache within its wider quantization envelope —
    roughly 16x the INT8 element error, compounding through the same 4
    residual layers. Bounds measured on this config; a broken nibble
    pack/unpack or scale layout lands orders of magnitude outside.
    The production accuracy pin is the TRAINED-model Δnll
    (benchmarks/perplexity_delta.py kv4 row)."""
    model4, cfg = _model(kv_bits=4)
    model0, _ = _model(kv_bits=0)
    params = model0.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                cfg.vocab_size)
    l0, _ = _decode_chain(model0, params, tokens, model0.init_cache(2))
    l4, _ = _decode_chain(model4, params, tokens, model4.init_cache(2))
    p0 = np.asarray(jax.nn.log_softmax(jnp.asarray(l0), axis=-1))
    p4 = np.asarray(jax.nn.log_softmax(jnp.asarray(l4), axis=-1))
    diff = np.abs(p4 - p0)
    assert diff.mean() < 0.25, diff.mean()
    assert np.quantile(diff, 0.9) < 0.6, np.quantile(diff, 0.9)
    # the full forward (no cache) is untouched by kv_bits
    f0, _ = model0.apply(params, tokens)
    f4, _ = model4.apply(params, tokens)
    np.testing.assert_allclose(np.asarray(f4), np.asarray(f0))


def test_kv4_quantize_pack_roundtrip():
    """_kv_quantize4 -> _kv_dequant4 is exact for values already on the
    INT4 grid, and within one scale step otherwise."""
    rng = np.random.RandomState(0)
    b, kvh, hd = 3, 2, 32
    # exact grid: values are s * n for n in [-7, 7]
    s = rng.rand(b, kvh).astype(np.float32) + 0.5
    n = rng.randint(-7, 8, (b, kvh, hd)).astype(np.float32)
    x = jnp.asarray(s[..., None] * n)
    packed, scales = TransformerMoE._kv_quantize4(x)
    assert packed.shape == (b, kvh * hd // 2) and packed.dtype == jnp.int8
    deq = TransformerMoE._kv_dequant4(
        packed[:, None], scales[..., None], kvh, hd, 1)[:, 0]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    # generic values: error bounded by half a scale step
    y = jnp.asarray(rng.randn(b, kvh, hd).astype(np.float32))
    packed, scales = TransformerMoE._kv_quantize4(y)
    deq = TransformerMoE._kv_dequant4(
        packed[:, None], scales[..., None], kvh, hd, 1)[:, 0]
    step = np.asarray(scales)[..., None]
    assert (np.abs(np.asarray(deq) - np.asarray(y))
            <= 0.5 * step + 1e-6).all()


def test_kv4_kernel_path_matches_xla_path(monkeypatch):
    """The flash-decode kernel's in-tile nibble unpack + dequant == the
    XLA unpack path through whole decode steps (model_dim=256,
    num_heads=2 so the packed slab width is 128-aligned and the kernel
    engages); covers GQA packing too."""
    # (model_dim, num_heads, num_kv_heads): MHA with packed width 128,
    # then GQA (2 KV heads of 4) at the same packed width
    for md, nh, kvh in ((256, 2, 0), (512, 4, 2)):
        model, cfg = _model(kv_bits=4, model_dim=md, num_heads=nh,
                            num_kv_heads=kvh, num_layers=2, top_k=1,
                            max_len=128)
        params = model.init(jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                    cfg.vocab_size)
        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "0")
        ref, _ = _decode_chain(model, params, tokens,
                               model.init_cache(2))
        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "1")
        out, _ = _decode_chain(model, params, tokens,
                               model.init_cache(2))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_kv4_engine_end_to_end():
    """LmDecodeEngine over the INT4 cache: prefill (chunked-parallel)
    writes packed nibbles, chunked decode runs, histories complete."""
    model, cfg = _model(kv_bits=4)
    params = model.init(jax.random.PRNGKey(0))
    eng = LmDecodeEngine(model, params, max_batch=4,
                         moe_overrides={"capacity_factor": 8.0})
    rng = np.random.RandomState(0)
    reqs = [LmRequest(uid=i,
                      prompt=rng.randint(0, cfg.vocab_size, 5
                                         ).astype(np.int32),
                      max_new_tokens=8) for i in range(6)]
    out = eng.run(reqs, chunk=4)
    assert len(out) == 6 and all(len(v) == 8 for v in out.values())


def test_kv4_prefill_parallel_matches_decode_chain():
    """Chunked-parallel prefill over the packed INT4 cache == the
    token-by-token decode chain (same stored nibbles, same logits)."""
    model, cfg = _model(kv_bits=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    b, tp = 2, 11
    prompts = jax.random.randint(jax.random.PRNGKey(2), (b, tp), 0,
                                 cfg.vocab_size)
    logits_p, cache_p = model.prefill(params, prompts,
                                      model.init_cache(b),
                                      parallel=True)
    logits_s, cache_s = model.prefill(params, prompts,
                                      model.init_cache(b),
                                      parallel=False)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_s),
                               rtol=2e-4, atol=2e-4)
    for kp, ks in zip(cache_p, cache_s):
        np.testing.assert_array_equal(np.asarray(kp["k"])[:, :tp],
                                      np.asarray(ks["k"])[:, :tp])
        np.testing.assert_allclose(np.asarray(kp["k_s"])[:, :, :tp],
                                   np.asarray(ks["k_s"])[:, :, :tp],
                                   rtol=1e-6, atol=1e-7)


def test_speculative_replay_from_donated_cache_is_sound():
    """The donation argument: re-running a chunk from the POST-chunk
    cache (what the replay sees after donation) must equal running it
    from a preserved copy of the PRE-chunk cache — every cell the chunk
    dirtied is rewritten by the replay before any read."""
    model, cfg = _model(kv_bits=0, num_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    eng = LmDecodeEngine(model, params, max_batch=4,
                         moe_overrides={"capacity_factor": 8.0})
    rng = np.random.RandomState(1)
    for i in range(4):
        eng.try_add(LmRequest(
            uid=i, prompt=rng.randint(0, cfg.vocab_size, 4
                                      ).astype(np.int32),
            max_new_tokens=12))
    eng._flush_admissions()
    pre_kv = jax.tree.map(jnp.copy, eng.cache)       # preserved copy
    pre_tok, pre_pos, key = eng._tok, eng._pos, eng._key

    fn_a = eng._decode_fn(3, cap=2, with_probe=True)   # donates kv
    fn_b = eng._decode_fn(3, cap=4, with_probe=True)   # the "replay"
    kv1, *_ = fn_a(params, jax.tree.map(jnp.copy, pre_kv),
                   pre_tok, pre_pos, key)
    # replay from the post-chunk buffer vs from the pristine pre-chunk
    out_post = fn_b(params, kv1, pre_tok, pre_pos, key)
    out_pre = fn_b(params, jax.tree.map(jnp.copy, pre_kv),
                   pre_tok, pre_pos, key)
    for a, b in zip(jax.tree.leaves(out_post[:4]),
                    jax.tree.leaves(out_pre[:4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_speculative_overflow_replays_and_stays_dropless():
    """Force an overflow (zeroed gate weights tie-route every token to
    the same experts) and assert the engine retried, then produced the
    same tokens as the worst-case (non-speculative) engine."""
    model, cfg = _model(kv_bits=0, num_layers=2, top_k=1,
                        capacity_factor=0.0)
    params = model.init(jax.random.PRNGKey(0))
    for blk in params["blocks"]:
        if "moe" in blk:
            blk["moe"]["gates"] = jax.tree.map(
                jnp.zeros_like, blk["moe"]["gates"])
    rng = np.random.RandomState(2)
    prompts = [rng.randint(0, cfg.vocab_size, 4).astype(np.int32)
               for _ in range(8)]

    def run(spec):
        eng = LmDecodeEngine(model, params, max_batch=8,
                             speculative_capacity=spec,
                             capacity_bucket=1)
        out = eng.run([LmRequest(uid=i, prompt=p, max_new_tokens=10)
                       for i, p in enumerate(prompts)], chunk=5)
        return out, eng.stats

    out_spec, stats = run(1.0)    # avg load 1, actual need 8 -> retry
    out_worst, _ = run(0.0)
    assert stats["spec_retries"] >= 1, stats
    for uid in out_worst:
        np.testing.assert_array_equal(out_spec[uid], out_worst[uid])
