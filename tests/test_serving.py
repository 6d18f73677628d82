"""Continuous-batching decode engine: join/leave, masking, no-recompile."""

import jax
import jax.numpy as jnp
import numpy as np

from tutel_tpu import moe
from tutel_tpu.serving import MoeDecodeEngine, Request


def _layer():
    return moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])


def test_engine_completes_all_requests():
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    eng = MoeDecodeEngine(layer, params, max_batch=4)
    reqs = [Request(uid=i,
                    state=jax.random.normal(jax.random.fold_in(
                        jax.random.PRNGKey(1), i), (32,)),
                    remaining=2 + i % 3)
            for i in range(9)]          # more requests than slots
    finals = eng.run(reqs)
    assert set(finals) == set(range(9))
    assert eng.stats["finished"] == 9
    assert eng.active == 0
    # continuous batching actually interleaved: more joins than slots
    assert eng.stats["joined"] == 9
    assert all(jnp.isfinite(v).all() for v in finals.values())


def test_partial_fill_does_not_recompile():
    """Fill levels within one capacity bucket share compiled variants:
    the jit cache must not grow per fill level."""
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    eng = MoeDecodeEngine(layer, params, max_batch=8, capacity_bucket=64)
    for n in (3, 5, 8, 2):
        for r in range(eng.max_batch):
            eng._slots[r] = None
        eng._free = list(range(eng.max_batch))[::-1]
        for i in range(n):
            eng.try_add(Request(uid=(n, i),
                                state=jnp.ones((32,)), remaining=1))
        eng.step()
    # one capacity probe bucket (64 covers all fills) -> one variant
    assert len(eng._capacity_cache) == 1
    assert len(layer._jit_cache) == 1, len(layer._jit_cache)


def test_masked_tail_produces_no_output_effect():
    """Engine output for an active request equals the dense layer run on
    just that request (ample capacity, single active slot)."""
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 2.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(0))
    eng = MoeDecodeEngine(layer, params, max_batch=4)
    state = jax.random.normal(jax.random.PRNGKey(5), (32,))
    eng.try_add(Request(uid="a", state=state, remaining=1))
    key = jax.random.PRNGKey(9)
    out = eng.step(key)["a"]
    ref, _ = layer(params, jnp.tile(state[None], (4, 1)), key=key,
                   valid_tokens=1,
                   capacity_override=eng._capacity_cache[
                       eng.capacity_bucket])
    assert jnp.allclose(out, ref[0], atol=1e-5)


def test_chunked_run_matches_stepwise():
    """Multi-step scheduling (step_chunk / run(chunk=N)) produces the
    same final outputs as the per-step loop."""
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))

    def reqs():
        return [Request(uid=i,
                        state=jax.random.normal(jax.random.fold_in(
                            jax.random.PRNGKey(1), i), (32,)),
                        remaining=4 + (i % 3))
                for i in range(6)]

    e1 = MoeDecodeEngine(layer, params, max_batch=4)
    f1 = e1.run(reqs(), key=jax.random.PRNGKey(7))
    e2 = MoeDecodeEngine(layer, params, max_batch=4)
    f2 = e2.run(reqs(), key=jax.random.PRNGKey(7), chunk=4)
    assert set(f1) == set(f2)
    for uid in f1:
        assert jnp.allclose(f1[uid], f2[uid], atol=1e-5), uid
    assert e2.stats["finished"] == 6


def _lm_model():
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=48, model_dim=32, num_heads=2,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=4,
        top_k=2, expert_hidden=64, capacity_factor=8.0)
    return TransformerMoE(cfg, group=jax.devices()[:1]), cfg


def _ref_generate(model, params, prompt, n, ov):
    """No-cache greedy reference: re-run the full forward per token."""
    seq = [int(t) for t in prompt]
    for _ in range(n):
        logits, _ = model.apply(params, jnp.asarray([seq], jnp.int32),
                                moe_overrides=ov)
        seq.append(int(jnp.argmax(logits[0, -1])))
    return seq[len(prompt):]


def test_step_chunk_fetch_false_matches_fetched():
    """fetch=False chunks (device-time benchmarking mode) advance the
    slot buffer and bookkeeping identically to fetched chunks — only
    the device->host transfer and the results dict are skipped."""
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))

    def admit(eng):
        for i in range(3):
            eng.try_add(Request(
                uid=i, state=np.asarray(jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(2), i), (32,))),
                remaining=8))

    ea, eb = (MoeDecodeEngine(layer, params, max_batch=4)
              for _ in range(2))
    admit(ea)
    admit(eb)
    k = jax.random.PRNGKey(5)
    ra = ea.step_chunk(2, key=k)
    rb = eb.step_chunk(2, key=k, fetch=False)
    assert rb == {} and set(ra) == {0, 1, 2}
    np.testing.assert_array_equal(np.asarray(ea._buf), np.asarray(eb._buf))
    assert ea.stats["steps"] == eb.stats["steps"] == 2
    assert ea.stats["tokens"] == eb.stats["tokens"] == 6
    # the NEXT fetched chunk returns identical outputs on both engines
    k2 = jax.random.PRNGKey(6)
    ra2, rb2 = ea.step_chunk(2, key=k2), eb.step_chunk(2, key=k2)
    for uid in ra2:
        np.testing.assert_array_equal(ra2[uid], rb2[uid])
    # time-based retirement still happens under fetch=False
    eb.step_chunk(4, key=jax.random.PRNGKey(7), fetch=False)
    assert eb.stats["finished"] == 3 and eb.active == 0


def test_lm_engine_matches_full_forward():
    """LmDecodeEngine's KV-cache greedy decode produces the same tokens
    as re-running the full forward per step."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 8.0}
    prompt = np.asarray([5, 17, 3, 42, 8], np.int32)

    eng = LmDecodeEngine(model, params, max_batch=4, moe_overrides=ov)
    got = eng.run([LmRequest(uid="a", prompt=prompt, max_new_tokens=6)],
                  chunk=3)["a"]
    want = _ref_generate(model, params, prompt, 6, ov)
    assert got.tolist() == want, (got.tolist(), want)


def test_lm_engine_continuous_batching():
    """More requests than slots, staggered prompt lengths and budgets:
    every request finishes and matches its independent generation
    (drop-free capacity makes results batch-composition independent)."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 8.0}
    rng = np.random.RandomState(0)
    reqs = [
        LmRequest(uid=i,
                  prompt=rng.randint(0, cfg.vocab_size,
                                     size=3 + (i % 3)).astype(np.int32),
                  max_new_tokens=2 + (i % 4))
        for i in range(7)]

    eng = LmDecodeEngine(model, params, max_batch=3, moe_overrides=ov)
    finals = eng.run(list(reqs), chunk=2)
    assert eng.stats["finished"] == 7
    for r in reqs:
        want = _ref_generate(model, params, r.prompt, r.max_new_tokens,
                             ov)
        assert finals[r.uid].tolist() == want, (
            r.uid, finals[r.uid].tolist(), want)


def test_lm_step_chunk_fetch_false_keeps_device_state():
    """fetch=False LM chunks skip the token fetch but keep the KV cache
    and positions advancing: the NEXT fetched chunk produces the same
    tokens as an engine that fetched every chunk."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 8.0}
    rng = np.random.RandomState(1)

    def mk():
        e = LmDecodeEngine(model, params, max_batch=2, moe_overrides=ov)
        for i in range(2):
            e.try_add(LmRequest(
                uid=i, prompt=rng.randint(0, cfg.vocab_size,
                                          size=4).astype(np.int32),
                max_new_tokens=7))
        return e

    rng = np.random.RandomState(1)
    ea = mk()
    rng = np.random.RandomState(1)
    eb = mk()
    ra1 = ea.step_chunk(3)
    rb1 = eb.step_chunk(3, fetch=False)
    assert rb1 == {} and set(ra1) == {0, 1}
    assert ea.stats["tokens"] == eb.stats["tokens"]
    ra2, rb2 = ea.step_chunk(3), eb.step_chunk(3)
    assert ra2 == rb2 and set(ra2) == {0, 1}


def test_lm_engine_sampling():
    """Token sampling (temperature / top_k / top_p): the degenerate
    configs reproduce greedy exactly (top_k=1, top_p->0, temperature=0),
    a fixed seed is deterministic, and different seeds diverge at
    temperature >= 1."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 8.0}
    rng = np.random.RandomState(3)
    prompts = [rng.randint(0, cfg.vocab_size, size=4).astype(np.int32)
               for _ in range(3)]

    def gen(sampler):
        e = LmDecodeEngine(model, params, max_batch=4, moe_overrides=ov,
                           sampler=sampler)
        reqs = [LmRequest(uid=i, prompt=p, max_new_tokens=8)
                for i, p in enumerate(prompts)]
        return {u: t.tolist() for u, t in e.run(reqs, chunk=4).items()}

    greedy = gen(None)
    for degenerate in ({"top_k": 1},
                       {"top_p": 1e-9},
                       {"temperature": 0.0},
                       {"temperature": 0.5, "top_k": 1}):
        assert gen(degenerate) == greedy, degenerate
    s1a = gen({"temperature": 1.0, "seed": 7})
    s1b = gen({"temperature": 1.0, "seed": 7})
    assert s1a == s1b, "fixed seed must be deterministic"
    s2 = gen({"temperature": 1.0, "seed": 8})
    assert s2 != s1a, "different seeds should diverge over 24 tokens"
    # tokens stay in range
    assert all(0 <= t < cfg.vocab_size for ts in s1a.values() for t in ts)


def test_lm_engine_stop_token():
    """A request retires the moment it emits its stop token: the output
    is truncated at (and includes) the stop id, tokens decoded past it
    inside the chunk are discarded, and the freed slot admits the next
    pending request mid-stream."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 8.0}
    rng = np.random.RandomState(5)
    prompts = [rng.randint(0, cfg.vocab_size, size=4).astype(np.int32)
               for _ in range(4)]

    # find, per prompt, a token the greedy run emits mid-stream so the
    # stop actually triggers
    probe = LmDecodeEngine(model, params, max_batch=4, moe_overrides=ov)
    full = probe.run([LmRequest(uid=i, prompt=p, max_new_tokens=10)
                      for i, p in enumerate(prompts)], chunk=4)
    stops = {i: int(full[i][4]) for i in range(4)}

    eng = LmDecodeEngine(model, params, max_batch=2, moe_overrides=ov)
    reqs = [LmRequest(uid=i, prompt=prompts[i], max_new_tokens=10,
                      stop_token=stops[i]) for i in range(4)]
    finals = eng.run(list(reqs), chunk=3)
    assert eng.stats["finished"] == 4
    for i in range(4):
        out = finals[i].tolist()
        want = full[i].tolist()
        first = want.index(stops[i])
        assert out == want[:first + 1], (i, out, want)
        assert out[-1] == stops[i]
    # fewer tokens counted than the no-stop run (truncation is real)
    assert eng.stats["tokens"] < 4 * 10


def test_engine_auto_fuses_quantized_params():
    """The engine prepares the fused weight stream for quantized expert
    params automatically (auto_fuse=True default; opt-out supported)."""
    import numpy as np
    from tutel_tpu.ops import quant

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 128, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=128, seeds=(1, 1, 1), group=jax.devices()[:1])
    p = dict(layer.init(jax.random.PRNGKey(0)))
    p["experts"] = quant.quantize_expert_params(p["experts"], bits=4)

    eng = MoeDecodeEngine(layer, p, max_batch=8)
    assert "fused_stream" in eng.params["experts"]
    eng.try_add(Request(uid="a", state=np.zeros(128, np.float32),
                        remaining=2))
    assert list(eng.step()) == ["a"]

    eng2 = MoeDecodeEngine(layer, p, max_batch=8, auto_fuse=False)
    assert "fused_stream" not in eng2.params["experts"]


def test_engine_auto_fuse_skips_tp_layouts():
    """Review regression: auto_fuse must not attach a fused stream to
    expert-slicing TP layers (the stream holds full-H weights; TP sums
    H/s partials) — and the layer guards a manual stream loudly."""
    import pytest
    from tutel_tpu.ops import quant
    from tutel_tpu.ops.fused_ffn_pallas import prepare_fused_ffn_params

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": -2,
                 "hidden_size_per_expert": 512, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=128, seeds=(1, 1, 1), parallel_type="model",
        group=jax.devices()[:8])
    p = dict(layer.init(jax.random.PRNGKey(0)))
    p["experts"] = quant.quantize_expert_params(
        p["experts"], bits=8)
    sp = layer.shard_params(p)
    eng = MoeDecodeEngine(layer, sp, max_batch=8)
    assert "fused_stream" not in eng.params["experts"]
    eng.try_add(Request(uid="a", state=np.zeros(128, np.float32),
                        remaining=1))
    assert list(eng.step()) == ["a"]

    # a manually prepared stream is refused loudly under TP
    p2 = dict(p)
    p2["experts"] = prepare_fused_ffn_params(p["experts"])
    if "fused_stream" in p2["experts"]:
        with pytest.raises(ValueError, match="expert-slicing TP"):
            layer.shard_params(p2)


def _skew_layer(e=8):
    """A layer whose gate is zero-initialized is NOT skewed (uniform
    logits round-robin under top-k tie-breaking); use a bigger batch
    and a crafted gate to force skew instead (see test)."""
    return moe.moe_layer(
        gate_type={"type": "top", "k": 1, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": e,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])


def test_speculative_capacity_typical_case_and_retry_exactness():
    """Speculative chunks run at ~margin x average capacity and replay
    on overflow: outputs must equal the worst-case engine (up to float
    reduction order — the capacity changes XLA's dot tiling) in both
    regimes, and the skewed regime must actually retry."""
    layer = _skew_layer()
    params = layer.init(jax.random.PRNGKey(0))

    # Craft a gate that routes EVERY token to expert 0: needed capacity
    # == n_valid, far past the speculated margin*avg buffer.
    skew = jax.tree.map(lambda x: x, params)
    gates0 = dict(skew["gates"][0])
    w = np.zeros(np.asarray(gates0["wg"]).shape, np.float32)
    w[:, 0] = 10.0                       # logits favor expert 0
    gates0["wg"] = jnp.asarray(w)
    skew["gates"] = [gates0]

    def drive(p, spec):
        # hints are shared across engines on the layer by design; the
        # test isolates drives so retry behavior is observable
        getattr(layer, "_serving_spec_hints", {}).clear()
        eng = MoeDecodeEngine(layer, p, max_batch=32,
                              speculative_capacity=spec)
        reqs = [Request(uid=i,
                        state=np.asarray(jax.random.normal(
                            jax.random.fold_in(jax.random.PRNGKey(7), i),
                            (32,))),
                        remaining=8)
                for i in range(32)]
        finals = eng.run(reqs, chunk=4, key=jax.random.PRNGKey(3))
        return eng, finals

    for p, expect_retry in ((params, False), (skew, True)):
        # the speculation is real: margin*avg < worst at this fill
        # (checked on a FRESH engine — observed-need hints raise the
        # speculated cap as the run progresses)
        assert MoeDecodeEngine(layer, p, max_batch=32,
                               speculative_capacity=4.0
                               )._spec_cap(32, 32) < 32
        eng_spec, out_spec = drive(p, 4.0)
        eng_worst, out_worst = drive(p, 0.0)
        assert eng_worst.stats["spec_retries"] == 0
        if expect_retry:
            assert eng_spec.stats["spec_retries"] > 0, (
                "fully-skewed routing must overflow the speculated "
                "buffer and replay")
        # (random routing at 32 tokens / 8 experts may legitimately
        # overflow a 4x margin too — only output equality is asserted;
        # concentration makes retries rare at production fills)
        for uid in out_worst:
            # routing/dispatch decisions are identical (gating never
            # sees the buffer size); the differing capacity changes
            # XLA's dot tiling, so outputs match only up to float
            # reduction order (~1e-10 abs observed)
            np.testing.assert_allclose(
                np.asarray(out_spec[uid]), np.asarray(out_worst[uid]),
                rtol=1e-5, atol=1e-8,
                err_msg=f"speculative != worst-case for uid {uid}")


def test_speculative_fetch_false_records_overflow():
    """fetch=False chunks cannot replay (no host sync); the overflow
    flag must be recorded device-side and visible afterwards."""
    layer = _skew_layer()
    params = layer.init(jax.random.PRNGKey(0))
    skew = jax.tree.map(lambda x: x, params)
    gates0 = dict(skew["gates"][0])
    w = np.zeros(np.asarray(gates0["wg"]).shape, np.float32)
    w[:, 0] = 10.0
    gates0["wg"] = jnp.asarray(w)
    skew["gates"] = [gates0]

    def drive(p, margin):
        eng = MoeDecodeEngine(layer, p, max_batch=32,
                              speculative_capacity=margin)
        for i in range(32):
            eng.try_add(Request(uid=i,
                                state=np.asarray(jax.random.normal(
                                    jax.random.fold_in(
                                        jax.random.PRNGKey(5), i), (32,))),
                                remaining=64))
        eng.step_chunk(4, key=jax.random.PRNGKey(1), fetch=False)
        return eng

    assert drive(skew, 4.0).spec_overflow is True
    # a margin covering the whole fill can never overflow
    assert drive(params, 32.0).spec_overflow is False


def test_state_update_residual_norm_semantics():
    """state' = rmsnorm(state + moe(state)): exact vs a manual step, and
    the states must NOT decay to zero (the 'replace' degeneracy: an
    untrained layer is contractive, so replace-mode states underflow to
    exactly 0 within a few steps and the all-zero logits tie-route every
    token to the same experts — see the engine docstring)."""
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 8,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(0))

    states = np.asarray(jax.random.normal(
        jax.random.PRNGKey(4), (16, 32), jnp.float32))
    eng = MoeDecodeEngine(layer, params, max_batch=16,
                          speculative_capacity=0.0,
                          state_update="residual_norm")
    for i in range(16):
        eng.try_add(Request(uid=i, state=states[i], remaining=6))
    key = jax.random.PRNGKey(9)
    eng.step_chunk(3, key=key)

    # manual replay of the same 3 steps
    _, sub = jax.random.split(key)
    keys = jax.random.split(sub, 3)
    b = jnp.asarray(states, layer.dtype)
    for k in keys:
        o, _ = layer(params, b, key=k, valid_tokens=16,
                     capacity_override=16)
        r = (b + o).astype(jnp.float32)
        b = (r * jax.lax.rsqrt(
            jnp.mean(r * r, axis=-1, keepdims=True) + 1e-6)
             ).astype(b.dtype)
    # scan-compiled engine vs unrolled manual loop: fp reassociation
    # only (~2e-7 observed)
    np.testing.assert_allclose(np.asarray(eng._buf), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
    # unit-RMS manifold: no zero collapse
    rms = np.sqrt(np.mean(np.asarray(eng._buf, np.float32) ** 2, axis=-1))
    assert rms.min() > 0.9 and rms.max() < 1.1


def test_lm_speculative_capacity_matches_worst_case():
    """LM decode at speculated capacity: same tokens as the worst-case
    buffer in the typical regime AND in a crafted-skew regime that must
    actually retry (replay-on-overflow preserves dropless decode)."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))

    skew = jax.tree.map(lambda x: x, params)
    for i, blk in enumerate(skew["blocks"]):
        if "moe" in blk:
            blk = dict(blk)
            mo = dict(blk["moe"])
            g0 = dict(mo["gates"][0])
            w = np.zeros(np.asarray(g0["wg"]).shape, np.float32)
            w[:, 0] = 10.0                 # every token -> expert 0
            g0["wg"] = jnp.asarray(w)
            mo["gates"] = [g0]
            blk["moe"] = mo
            skew["blocks"][i] = blk

    rng = np.random.RandomState(3)
    def reqs():
        return [LmRequest(uid=i,
                          prompt=rng.randint(0, cfg.vocab_size,
                                             size=4).astype(np.int32),
                          max_new_tokens=9)
                for i in range(12)]

    def drive(p, margin):
        getattr(model, "_serving_spec_hints", {}).clear()
        eng = LmDecodeEngine(model, p, max_batch=12,
                             moe_overrides={"capacity_factor": 0.0},
                             speculative_capacity=margin,
                             capacity_bucket=2)
        rng.seed(3)                        # same prompts every drive
        return eng, eng.run(reqs(), chunk=3)

    for p, expect_retry in ((params, False), (skew, True)):
        eng_s, out_s = drive(p, 1.5)
        # the speculation is real: margin*avg < max_batch on a fresh
        # engine (hints raise it as the run observes needs)
        getattr(model, "_serving_spec_hints", {}).clear()
        assert LmDecodeEngine(model, p, max_batch=12,
                              speculative_capacity=1.5,
                              capacity_bucket=2)._lm_spec_cap() < 12
        eng_w, out_w = drive(p, 1e9)       # cap clips to max_batch
        assert eng_w.stats["spec_retries"] == 0
        if expect_retry:
            assert eng_s.stats["spec_retries"] > 0, (
                "fully-skewed routing must overflow and replay")
        assert set(out_s) == set(out_w)
        for uid in out_w:
            assert out_s[uid].tolist() == out_w[uid].tolist(), uid


def test_lm_speculative_fetch_false_records_overflow():
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    skew = jax.tree.map(lambda x: x, params)
    for i, blk in enumerate(skew["blocks"]):
        if "moe" in blk:
            g0 = dict(blk["moe"]["gates"][0])
            w = np.zeros(np.asarray(g0["wg"]).shape, np.float32)
            w[:, 0] = 10.0
            g0["wg"] = jnp.asarray(w)
            skew["blocks"][i] = {**blk, "moe": {**blk["moe"],
                                                "gates": [g0]}}

    def drive(p, margin):
        eng = LmDecodeEngine(model, p, max_batch=12,
                             moe_overrides={"capacity_factor": 0.0},
                             speculative_capacity=margin,
                             capacity_bucket=2)
        rng = np.random.RandomState(5)
        for i in range(12):
            eng.try_add(LmRequest(
                uid=i, prompt=rng.randint(0, cfg.vocab_size,
                                          size=4).astype(np.int32),
                max_new_tokens=30))
        eng.step_chunk(4, fetch=False)
        return eng

    assert drive(skew, 1.5).spec_overflow is True
    assert drive(params, 1e9).spec_overflow is False


def test_speculative_capacity_multi_device_ep():
    """Speculation under EP: the probe pmaxes per-shard routing need
    over the EP axes (capacity_override is a per-(expert, shard)
    buffer). Outputs must match the worst-case engine in the typical
    regime and under crafted full-skew (which must retry)."""
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 1, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 2,
                 "hidden_size_per_expert": 64},
        model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:8])
    assert layer.world_size == 8
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))

    skew = jax.tree.map(lambda x: x, params)
    gates0 = dict(skew["gates"][0])
    w = np.zeros(np.asarray(gates0["wg"]).shape, np.float32)
    w[:, 0] = 10.0                      # every token -> global expert 0
    gates0["wg"] = jnp.asarray(w)
    skew["gates"] = [gates0]

    def drive(p, spec):
        getattr(layer, "_serving_spec_hints", {}).clear()
        eng = MoeDecodeEngine(layer, p, max_batch=32,
                              speculative_capacity=spec,
                              capacity_bucket=1)
        reqs = [Request(uid=i,
                        state=np.asarray(jax.random.normal(
                            jax.random.fold_in(jax.random.PRNGKey(11), i),
                            (32,))),
                        remaining=6)
                for i in range(32)]
        return eng, eng.run(reqs, chunk=3, key=jax.random.PRNGKey(2))


    # capacity_override is a per-(expert, source-shard) buffer: even
    # full skew needs only s_loc = 32/8 = 4 rows per shard, so a margin
    # covering the shard-local fill can never overflow. margin=1 gives
    # cap = ceil(1*4/16) = 1 < 4, which the skewed routing (4 rows to
    # expert 0 from every shard) must overflow and replay.
    for p, expect_retry in ((params, None), (skew, True)):
        getattr(layer, "_serving_spec_hints", {}).clear()
        eng_probe = MoeDecodeEngine(layer, p, max_batch=32,
                                    speculative_capacity=1.0,
                                    capacity_bucket=1)
        assert eng_probe._spec_cap(32, 32) < 4
        # the WORST-case path is shard-local too: 4 rows/shard, not 32
        assert eng_probe._worst_cap(32) == 4
        eng_s, out_s = drive(p, 1.0)
        eng_w, out_w = drive(p, 0.0)
        assert eng_w.stats["spec_retries"] == 0
        if expect_retry:
            assert eng_s.stats["spec_retries"] > 0
        for uid in out_w:
            np.testing.assert_allclose(
                np.asarray(out_s[uid]), np.asarray(out_w[uid]),
                rtol=1e-5, atol=1e-8, err_msg=str(uid))


def test_lm_engine_multi_device_ep():
    """The FULL-MODEL serving engine under 8-way expert parallelism:
    LmDecodeEngine over a TransformerMoE whose MoE layers shard one
    expert per device. Token counts at serving batch sizes never
    divide the world (B=4 decode rows, b*tc prefill rows on 8
    devices), so the model pads its MoE calls up to the world multiple
    with scalar `valid_tokens` masking (TransformerMoE._moe_call) —
    the same partial-fill contract MoeDecodeEngine uses. Generated
    tokens must EQUAL the single-device engine's, greedy and
    speculative both."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    from tutel_tpu.serving import LmDecodeEngine, LmRequest

    cfg = TransformerMoEConfig(
        vocab_size=97, max_len=64, model_dim=64, num_heads=4,
        num_layers=3, ffn_hidden=128, moe_every=2, num_local_experts=1,
        top_k=2, capacity_factor=0.0, expert_hidden=96,
        dtype=jnp.float32)
    m_ep = TransformerMoE(cfg, group=jax.devices()[:8])
    m_1 = TransformerMoE(
        TransformerMoEConfig(**{**cfg.__dict__, "num_local_experts": 8}),
        group=jax.devices()[:1])
    params = m_1.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 97, 5).astype(np.int32) for _ in range(6)]

    def mk():
        return [LmRequest(uid=i, prompt=p.copy(), max_new_tokens=8)
                for i, p in enumerate(prompts)]

    ov = {"capacity_factor": 8.0}
    out1 = LmDecodeEngine(m_1, params, max_batch=4,
                          moe_overrides=ov).run(mk(), chunk=4)
    outep = LmDecodeEngine(m_ep, params, max_batch=4,
                           moe_overrides=ov).run(mk(), chunk=4)
    for k in out1:
        np.testing.assert_array_equal(out1[k], outep[k], err_msg=str(k))

    # speculative capacity probing under EP at the same non-divisible
    # batch (the probe pads with token_mask)
    eng_s = LmDecodeEngine(m_ep, params, max_batch=4,
                           moe_overrides={"capacity_factor": 0.0},
                           speculative_capacity=4.0)
    outs = eng_s.run(mk(), chunk=4)
    for k in out1:
        np.testing.assert_array_equal(out1[k], outs[k], err_msg=str(k))


def test_lm_attn_bucket_window_is_exact():
    """Bucketed attention windows (read only ceil(live/bucket)*bucket
    cache positions) must generate the same tokens as full-cache reads:
    positions past pos are masked to exactly zero probability either
    way, so the slice removes only exact zeros."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=96, model_dim=32, num_heads=2,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=4,
        top_k=2, expert_hidden=64, capacity_factor=0.0)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    prompts = [rng.randint(0, cfg.vocab_size, size=5).astype(np.int32)
               for _ in range(6)]

    def drive(bucket):
        eng = LmDecodeEngine(model, params, max_batch=6,
                             moe_overrides={"capacity_override": 6},
                             attn_bucket=bucket)
        return eng.run([LmRequest(uid=i, prompt=p, max_new_tokens=20)
                        for i, p in enumerate(prompts)], chunk=4)

    full = drive(0)                       # always read max_len
    win = drive(8)                        # 8-position buckets bind hard
    # the window actually engaged: a distinct compiled variant exists
    assert any(k[4] not in (None,) for k in
               model._serving_decode_cache if k[0] == "v2"), \
        list(model._serving_decode_cache)
    for uid in full:
        assert win[uid].tolist() == full[uid].tolist(), uid


def test_lm_prefill_bucketed_admission():
    """Prompt-length-bucketed admission (round 5): heterogeneous
    prompt lengths (a) generate EXACTLY the tokens an exact-length
    engine generates, and (b) compile O(buckets) prefill variants,
    not O(distinct lengths) — the reference's no-recompilation-penalty
    property (reference README.md:64-74) applied to admission."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    # NOTE: no capacity_factor in the overrides — that would (correctly)
    # auto-disable bucketing (pad tokens would compete for capacity);
    # the gate's own generous factor keeps routing lossless here
    ov = {}
    rng = np.random.RandomState(3)
    # 6 distinct lengths spanning two 8-buckets
    lens = [3, 4, 5, 7, 9, 12]
    reqs = [LmRequest(uid=i,
                      prompt=rng.randint(0, cfg.vocab_size,
                                         size=l).astype(np.int32),
                      max_new_tokens=4)
            for i, l in enumerate(lens)]

    def drive(bucket):
        model._serving_prefill_cache = {}
        eng = LmDecodeEngine(model, params, max_batch=6,
                             moe_overrides=ov, prefill_bucket=bucket)
        out = eng.run([LmRequest(uid=r.uid, prompt=r.prompt,
                                 max_new_tokens=r.max_new_tokens)
                       for r in reqs], chunk=2)
        return out, len(model._serving_prefill_cache)

    exact, n_exact = drive(0)
    bucketed, n_buck = drive(8)
    for r in reqs:
        assert bucketed[r.uid].tolist() == exact[r.uid].tolist(), (
            r.uid, bucketed[r.uid].tolist(), exact[r.uid].tolist())
        want = _ref_generate(model, params, r.prompt,
                             r.max_new_tokens, ov)
        assert bucketed[r.uid].tolist() == want, r.uid
    # exact grouping compiled one variant per distinct length; the
    # bucketed engine one per (bucket, group size) — 2 buckets here
    assert n_exact == len(set(lens))
    assert n_buck == 2, list(model._serving_prefill_cache)


def test_lm_prefill_bucket_group_sizes_share_bucket_compile():
    """Admissions arriving in different group sizes still key the
    prefill on the padded bucket length: admitting lengths {3, 5}
    together and {6} later uses the same 8-bucket shape for both
    flushes (2 compiles for 3 distinct lengths, differing only in n)."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {}          # see the bucketed-admission test's capacity note
    rng = np.random.RandomState(5)
    model._serving_prefill_cache = {}
    eng = LmDecodeEngine(model, params, max_batch=4,
                         moe_overrides=ov, prefill_bucket=8)
    p = {l: rng.randint(0, cfg.vocab_size, size=l).astype(np.int32)
         for l in (3, 5, 6)}
    eng.try_add(LmRequest(uid=0, prompt=p[3], max_new_tokens=3))
    eng.try_add(LmRequest(uid=1, prompt=p[5], max_new_tokens=3))
    eng.step_chunk(2)
    eng.try_add(LmRequest(uid=2, prompt=p[6], max_new_tokens=3))
    eng.step_chunk(2)
    keys = list(model._serving_prefill_cache)
    assert all(k[0] == 8 for k in keys), keys        # one bucket shape
    while eng.active:                    # drain the remaining budgets
        eng.step_chunk(2)
    for uid, pl in ((0, p[3]), (1, p[5]), (2, p[6])):
        want = _ref_generate(model, params, pl, 3, ov)
        assert eng._generated[uid][:3] == want, (uid, eng._generated[uid], want)


def test_lm_prefill_bucket_auto_disabled_under_capacity_factor():
    """Round-5 review finding: a capacity-LIMITED prefill lets pad
    tokens displace real prompt tokens from expert buffers, so the
    engine must fall back to exact-length grouping when moe_overrides
    carries a capacity_factor — tokens must match the bucket=0 engine
    exactly for every seed."""
    from tutel_tpu.serving import LmDecodeEngine, LmRequest
    model, cfg = _lm_model()
    params = model.init(jax.random.PRNGKey(0))
    ov = {"capacity_factor": 1.0}          # tight: drops are possible
    for seed in range(3):
        rng = np.random.RandomState(seed)
        lens = [5, 6, 1, 4, 4, 2]
        reqs = [LmRequest(uid=i,
                          prompt=rng.randint(0, cfg.vocab_size,
                                             size=l).astype(np.int32),
                          max_new_tokens=3)
                for i, l in enumerate(lens)]

        def drive(bucket):
            model._serving_prefill_cache = {}
            eng = LmDecodeEngine(model, params, max_batch=6,
                                 moe_overrides=ov,
                                 prefill_bucket=bucket)
            out = eng.run([LmRequest(uid=r.uid, prompt=r.prompt,
                                     max_new_tokens=r.max_new_tokens)
                           for r in reqs], chunk=2)
            return out, list(model._serving_prefill_cache)

        exact, _ = drive(0)
        bucketed, keys = drive(32)
        # bucketing disabled: prefill keys are the exact lengths
        assert sorted({k[0] for k in keys}) == sorted(set(lens)), keys
        for r in reqs:
            assert bucketed[r.uid].tolist() == exact[r.uid].tolist(), (
                seed, r.uid)
