"""Flash-decode attention kernel (ops/decode_attn_pallas) oracle tests.

The kernel silently becomes the production TPU attention path of the
LM serving engine (models/transformer.py `_attn_step` auto-enables it
when shapes align), so its numerics are pinned here in interpret mode
against the XLA windowed path — the repo's oracle-test convention for
every Pallas kernel. Covers unaligned attn_len, pos at chunk
boundaries, multi-chunk online-softmax accumulation, and the VMEM
guard's chunk ladder. AOT Mosaic lowering at production sizes lives in
tests/test_tpu_aot.py::test_decode_attn_mosaic_compiles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.ops.decode_attn_pallas import (
    decode_attn, pick_wc, vmem_bytes_decode_attn, VMEM_BUDGET_BYTES)


def _ref_decode_attn(q, k, v, pos, attn_len=None):
    """The XLA windowed path (models/transformer.py `_attn_step` else-
    branch), the executable spec the kernel must match."""
    b, nh, hd = q.shape
    t = k.shape[1] if attn_len is None else min(int(attn_len), k.shape[1])
    rk, rv = k[:, :t], v[:, :t]
    scores = jnp.einsum("bhd,bthd->bht", q, rk,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    mask = jnp.arange(t)[None, :] <= pos[:, None]
    scores = jnp.where(mask[:, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bht,bthd->bhd", probs, rv,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _case(b=4, t=64, nh=4, hd=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, nh, hd), dtype)
    k = jax.random.normal(ks[1], (b, t, nh, hd), dtype)
    v = jax.random.normal(ks[2], (b, t, nh, hd), dtype)
    return q, k, v


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6),
                                       (jnp.bfloat16, 2e-2)])
def test_matches_xla_path(dtype, tol):
    q, k, v = _case(dtype=dtype)
    pos = jnp.asarray([0, 13, 31, 63], jnp.int32)
    out = decode_attn(q, k, v, pos, wc=16, interpret=True)
    ref = _ref_decode_attn(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_pos_at_chunk_boundaries():
    """Online-softmax correctness when a row's live window ends exactly
    at / one past / one before a slab boundary (wc=16)."""
    q, k, v = _case(b=6, t=64)
    pos = jnp.asarray([15, 16, 17, 31, 32, 48], jnp.int32)
    out = decode_attn(q, k, v, pos, wc=16, interpret=True)
    ref = _ref_decode_attn(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_unaligned_attn_len_rounds_up_exactly():
    """attn_len=37 rounds to 48 internally; result must equal the
    windowed reference at 37 (the tail rows are masked by pos)."""
    q, k, v = _case(b=4, t=64)
    pos = jnp.asarray([5, 20, 33, 36], jnp.int32)   # all < 37
    out = decode_attn(q, k, v, pos, attn_len=37, wc=16, interpret=True)
    ref = _ref_decode_attn(q, k, v, pos, attn_len=37)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    # and equals the full-window result (positions past pos contribute
    # exactly zero probability)
    full = _ref_decode_attn(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=2e-6, atol=2e-6)


def test_attn_len_not_divisible_by_wc():
    """When the rounded window is not a multiple of the requested wc the
    kernel shrinks wc to a divisor; numerics must be unchanged."""
    q, k, v = _case(b=2, t=96)
    pos = jnp.asarray([40, 79], jnp.int32)
    out = decode_attn(q, k, v, pos, attn_len=80, wc=64, interpret=True)
    ref = _ref_decode_attn(q, k, v, pos, attn_len=80)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_single_chunk_whole_window():
    q, k, v = _case(b=2, t=32)
    pos = jnp.asarray([31, 7], jnp.int32)
    out = decode_attn(q, k, v, pos, wc=512, interpret=True)
    ref = _ref_decode_attn(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# VMEM guard (the ladder that picks the streamed slab size)
# ---------------------------------------------------------------------------

def test_pick_wc_ladder():
    # bf16 model_dim=1024: 1024-row double-buffered slabs fit (8.4 MB),
    # 2048-row ones (16.8 MB) don't — the ladder extends above 512
    # because tiny per-grid-step DMAs are overhead-bound (round 5)
    assert pick_wc(2048, 1024, 2, nh=8) == 1024
    # quantized GQA serving config (d=256 int8): the whole 2k window
    # fits in one chunk — wc=256 measured 231 GB/s vs 600+ at 1792
    assert pick_wc(2048, 256, 1, nh=8, quantized=True, mq=4) >= 2048
    # bf16 model_dim=4096: 512-row double-buffered K+V slabs are
    # ~16.8 MB > budget; the guard must shrink (the advisor's case)
    wc = pick_wc(2048, 4096, 2, nh=32)
    assert wc is not None and wc <= 256
    assert vmem_bytes_decode_attn(2048, 4096, 2, wc=wc,
                                  nh=32) <= VMEM_BUDGET_BYTES
    # f32 model_dim=2048 also exceeds at 512
    assert pick_wc(2048, 2048, 4, nh=16) <= 256
    # absurdly small budget -> no fit -> caller falls back to XLA
    assert pick_wc(2048, 4096, 4, nh=32, budget=1024) is None


def test_model_falls_back_when_vmem_guard_rejects(monkeypatch):
    """_attn_step must take the XLA path (not fail) when pick_wc finds
    no fitting chunk, and raise only under the explicit env force."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    from tutel_tpu.ops import decode_attn_pallas as dap

    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=32, model_dim=128, num_heads=4,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=2,
        top_k=1, expert_hidden=64)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    cache = model.init_cache(2)
    tok = jnp.zeros((2,), jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)

    monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "1")
    monkeypatch.setattr(dap, "pick_wc", lambda *a, **k: None)
    with pytest.raises(ValueError, match="VMEM budget"):
        model.apply_decode(params, tok, cache, pos)

    monkeypatch.delenv("TUTEL_TPU_DECODE_ATTN")
    logits, _, _ = model.apply_decode(params, tok, cache, pos)
    assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# Model-level: kernel path == XLA path through apply_decode
# ---------------------------------------------------------------------------

def test_apply_decode_kernel_equals_xla(monkeypatch):
    """TUTEL_TPU_DECODE_ATTN=1 (interpret off-TPU) must reproduce the
    XLA windowed path through the whole decode step, including the
    bucketed attn_len the serving engine passes."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=32, model_dim=128, num_heads=4,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=2,
        top_k=1, capacity_factor=8.0, expert_hidden=64)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    b = 2
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, 9), 0,
                              cfg.vocab_size)

    def chain(env):
        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", env)
        cache = model.init_cache(b)
        outs = []
        for i in range(toks.shape[1]):
            pos = jnp.full((b,), i, jnp.int32)
            # exercise both the bucketed window and the full window
            al = 16 if i < 5 else None
            logits, cache, _ = model.apply_decode(
                params, toks[:, i], cache, pos,
                moe_overrides={"capacity_factor": 8.0}, attn_len=al)
            outs.append(np.asarray(logits))
        return np.stack(outs)

    ref = chain("0")
    out = chain("1")
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# INT8 KV cache mode (round 4): int8 values + per-(head, pos) scales
# ---------------------------------------------------------------------------

def _quantize_cache(k):
    """Per-(b, t, head) symmetric INT8 -> (int8 [B,T,nh,hd],
    scales [B,nh,T] f32) matching TransformerMoE._kv_quantize."""
    kf = np.asarray(k, np.float32)
    s = np.maximum(np.abs(kf).max(axis=-1) / 127.0, 1e-10)  # [B,T,nh]
    q = np.clip(np.round(kf / s[..., None]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s.transpose(0, 2, 1))


def test_quantized_kernel_matches_dequantized_reference():
    """decode_attn(int8 K/V + scales) == the XLA reference on the
    explicitly dequantized float cache — the kernel's in-tile dequant
    (score-tile multiply for K, softmax-weight multiply for V) must be
    EXACTLY the algebraic dequant, not an approximation of it.
    (t is 128-aligned: the quantized kernel's scale slabs put the
    window on the lane dim.)"""
    q, k, v = _case(b=4, t=128, nh=4, hd=32)
    pos = jnp.asarray([7, 16, 40, 127], jnp.int32)
    kq, ks = _quantize_cache(k)
    vq, vs = _quantize_cache(v)
    # dequantized float cache = what the kernel must reproduce
    kd = kq.astype(jnp.float32) * jnp.transpose(ks, (0, 2, 1))[..., None]
    vd = vq.astype(jnp.float32) * jnp.transpose(vs, (0, 2, 1))[..., None]
    ref = _ref_decode_attn(q, kd, vd, pos)
    out = decode_attn(q, kq, vq, pos, k_scale=ks, v_scale=vs, wc=128,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantized_kernel_unaligned_window_and_boundaries():
    q, k, v = _case(b=6, t=256, nh=4, hd=32, seed=3)
    pos = jnp.asarray([15, 16, 17, 127, 128, 198], jnp.int32)
    kq, ks = _quantize_cache(k)
    vq, vs = _quantize_cache(v)
    kd = kq.astype(jnp.float32) * jnp.transpose(ks, (0, 2, 1))[..., None]
    vd = vq.astype(jnp.float32) * jnp.transpose(vs, (0, 2, 1))[..., None]
    # attn_len 200 rounds up to 256 (128-aligned); pos at slab
    # boundaries exercises the multi-chunk online softmax
    ref = _ref_decode_attn(q, kd, vd, pos, attn_len=200)
    out = decode_attn(q, kq, vq, pos, k_scale=ks, v_scale=vs,
                      attn_len=200, wc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# INT4 KV cache mode (round 4b): nibble-packed values, same scale layout
# ---------------------------------------------------------------------------

def _quantize_cache4(k):
    """Per-(b, t, head) symmetric INT4, full-width split-half packed
    (matching TransformerMoE._kv_quantize4): returns (packed int8
    [B,T,kvh*hd//2], scales [B,kvh,T] f32, dequantized float cache)."""
    kf = np.asarray(k, np.float32)
    b, t, kvh, hd = kf.shape
    s = np.maximum(np.abs(kf).max(axis=-1) / 7.0, 1e-10)    # [B,T,kvh]
    q = np.clip(np.round(kf / s[..., None]), -7, 7).astype(np.int32)
    deq = (q * s[..., None]).astype(np.float32)
    flat = q.reshape(b, t, kvh * hd)
    dp = kvh * hd // 2
    packed = ((flat[..., :dp] & 0xF)
              | ((flat[..., dp:] & 0xF) << 4)).astype(np.int8)
    return (jnp.asarray(packed), jnp.asarray(s.transpose(0, 2, 1)),
            jnp.asarray(deq))


def test_int4_kernel_matches_dequantized_reference():
    """decode_attn(kv_bits=4) == the XLA reference on the explicitly
    dequantized float cache: the in-kernel nibble unpack (int32-domain
    split-half concat) + scale folding must be EXACTLY the algebraic
    dequant."""
    q, k, v = _case(b=4, t=128, nh=4, hd=64)
    pos = jnp.asarray([7, 16, 40, 127], jnp.int32)
    kq, ks, kd = _quantize_cache4(k)
    vq, vs, vd = _quantize_cache4(v)
    ref = _ref_decode_attn(q, kd, vd, pos)
    out = decode_attn(q, kq, vq, pos, k_scale=ks, v_scale=vs,
                      kv_bits=4, wc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int4_kernel_gqa_and_boundaries():
    """INT4 + grouped-query attention (4 query heads reading 2 KV
    groups) across slab boundaries and an unaligned attn_len."""
    b, t, nh, kvh, hd = 6, 256, 4, 2, 64
    ks_ = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks_[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks_[1], (b, t, kvh, hd), jnp.float32)
    v = jax.random.normal(ks_[2], (b, t, kvh, hd), jnp.float32)
    pos = jnp.asarray([15, 16, 17, 127, 128, 198], jnp.int32)
    kq, ksc, kd = _quantize_cache4(k)
    vq, vsc, vd = _quantize_cache4(v)
    # GQA reference: query head h reads KV group h % kvh
    idx = jnp.arange(nh) % kvh
    kd_e = kd[:, :, idx]
    vd_e = vd[:, :, idx]
    ref = _ref_decode_attn(q, kd_e, vd_e, pos, attn_len=200)
    out = decode_attn(q, kq, vq, pos, k_scale=ksc, v_scale=vsc,
                      kv_bits=4, attn_len=200, wc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pick_wc_accounts_for_scale_slabs():
    base = vmem_bytes_decode_attn(2048, 1024, 1, wc=512, nh=8)
    quant = vmem_bytes_decode_attn(2048, 1024, 1, wc=512, nh=8,
                                   quantized=True)
    assert quant > base
    # int8 halves the slab bytes vs bf16, so the quantized kernel fits
    # LARGER windows than the bf16 one at big model_dim
    assert (pick_wc(2048, 4096, 1, nh=32, quantized=True)
            >= pick_wc(2048, 4096, 2, nh=32))


# ---------------------------------------------------------------------------
# Prefill flash attention (round 5)
# ---------------------------------------------------------------------------

def _ref_prefill_attn(q, rk, rv, start):
    """Oracle: dense masked softmax over the dequantized window."""
    b, tq, nh, hd = q.shape
    kvh = rk.shape[2]
    mq = nh // kvh
    qg = q.reshape(b, tq, mq, kvh, hd)
    s = jnp.einsum("bqmgd,bkgd->bmgqk", qg.astype(jnp.float32),
                   rk.astype(jnp.float32)) * (hd ** -0.5)
    w = rk.shape[1]
    mask = (jnp.arange(w)[None, :]
            <= (start + jnp.arange(tq))[:, None])
    s = jnp.where(mask[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bmgqk,bkgd->bqmgd", p, rv.astype(jnp.float32))
    return o.reshape(b, tq, nh, hd)


def test_prefill_attn_float_oracle():
    from tutel_tpu.ops.decode_attn_pallas import prefill_attn
    rng = np.random.RandomState(0)
    b, tq, nh, kvh, hd, t = 2, 8, 4, 2, 128, 64
    q = jnp.asarray(rng.randn(b, tq, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, kvh, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, kvh, hd), jnp.float32)
    for start in (0, 8, 40):
        out = prefill_attn(q, k.reshape(b, t, -1), v.reshape(b, t, -1),
                           start, attn_len=start + tq, wc=32,
                           interpret=True)
        wlen = -(-min(start + tq, t) // 16) * 16
        ref = _ref_prefill_attn(q, k[:, :wlen], v[:, :wlen], start)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_prefill_attn_quantized_oracle():
    from tutel_tpu.ops.decode_attn_pallas import prefill_attn
    from tutel_tpu.models import TransformerMoE
    rng = np.random.RandomState(1)
    b, tq, nh, kvh, hd, t = 2, 8, 8, 2, 128, 256
    q = jnp.asarray(rng.randn(b, tq, nh, hd), jnp.float32)
    kf = rng.randn(b, t, kvh, hd).astype(np.float32)
    vf = rng.randn(b, t, kvh, hd).astype(np.float32)

    # kv8: quantize rows exactly as the model stores them
    kq, ks = jax.vmap(TransformerMoE._kv_quantize, in_axes=1,
                      out_axes=(1, 1))(jnp.asarray(kf))
    vq, vs = jax.vmap(TransformerMoE._kv_quantize, in_axes=1,
                      out_axes=(1, 1))(jnp.asarray(vf))
    kq8 = kq.reshape(b, t, kvh * hd)
    vq8 = vq.reshape(b, t, kvh * hd)
    ks8 = ks.transpose(0, 2, 1)        # [B, kvh, T]
    vs8 = vs.transpose(0, 2, 1)
    start = 120
    out = prefill_attn(q, kq8, vq8, start, k_scale=ks8, v_scale=vs8,
                       attn_len=start + tq, kv_bits=8, wc=128,
                       interpret=True)
    rk = (kq.astype(jnp.float32)
          * ks[..., None])             # [B, T, kvh, hd] dequant
    rv = vq.astype(jnp.float32) * vs[..., None]
    ref = _ref_prefill_attn(q, rk[:, :128], rv[:, :128], start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # kv4: split-half packed via the model's own quantizer
    kq4, ks4 = jax.vmap(TransformerMoE._kv_quantize4, in_axes=1,
                        out_axes=(1, 1))(jnp.asarray(kf))
    vq4, vs4 = jax.vmap(TransformerMoE._kv_quantize4, in_axes=1,
                        out_axes=(1, 1))(jnp.asarray(vf))
    out4 = prefill_attn(q, kq4, vq4, start,
                        k_scale=ks4.transpose(0, 2, 1),
                        v_scale=vs4.transpose(0, 2, 1),
                        attn_len=start + tq, kv_bits=4, wc=128,
                        interpret=True)
    rk4 = TransformerMoE._kv_dequant4(kq4, ks4.transpose(0, 2, 1),
                                      kvh, hd, 128)
    rv4 = TransformerMoE._kv_dequant4(vq4, vs4.transpose(0, 2, 1),
                                      kvh, hd, 128)
    ref4 = _ref_prefill_attn(q, rk4, rv4, start)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                               rtol=2e-5, atol=2e-5)


def test_prefill_attn_traced_start():
    """start rides scalar prefetch: the kernel must work under a scan
    whose chunk offset is a traced int32 (the prefill's form)."""
    from tutel_tpu.ops.decode_attn_pallas import prefill_attn
    rng = np.random.RandomState(2)
    b, tq, nh, hd, t = 1, 8, 2, 128, 64
    q = jnp.asarray(rng.randn(b, tq, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nh, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nh, hd), jnp.float32)

    def f(start):
        return prefill_attn(q, k.reshape(b, t, -1),
                            v.reshape(b, t, -1), start,
                            attn_len=t, wc=32, interpret=True)

    outs = jax.lax.map(f, jnp.asarray([0, 8, 16], jnp.int32))
    for i, start in enumerate((0, 8, 16)):
        ref = _ref_prefill_attn(q, k, v, start)
        np.testing.assert_allclose(np.asarray(outs[i]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
