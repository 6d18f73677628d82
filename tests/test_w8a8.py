"""W8A8 integer-domain grouped GEMM (ops/w8a8_pallas): INT8 activations
x INT8 weights with int32 MXU accumulation — the documented path past
the weight-only kernels' dequant-bound roofline. No reference
counterpart (the reference's megablocks grouped GEMM is fp-only)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe
from tutel_tpu.ops import quant
from tutel_tpu.ops import w8a8_pallas as w8


@pytest.mark.parametrize("bits", [8, 4])
def test_w8a8_matches_weight_only(bits):
    rng = np.random.default_rng(bits)
    e, c, k, n = 3, 16, 256, 128
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, k, n)) * .05, jnp.float32)
    qw = quant.quantize(w, bits=bits)
    ref = jnp.einsum("eck,ekn->ecn", x, quant.dequantize(qw))
    out = w8.grouped_gemm_w8a8(x, qw, bm=8, bn=128, interpret=True)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.03, rel


def test_w8a8_count_narrowing():
    rng = np.random.default_rng(2)
    e, c, k, n = 3, 16, 256, 128
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    qw = quant.quantize(jnp.asarray(
        rng.standard_normal((e, k, n)) * .05, jnp.float32), bits=8)
    counts = jnp.asarray([5, 0, 16], jnp.int32)
    out = w8.grouped_gemm_w8a8(x, qw, counts, bm=8, bn=128,
                               interpret=True)
    assert float(jnp.abs(out[1]).max()) == 0.0
    assert float(jnp.abs(out[0, 8:]).max()) == 0.0   # block past count


def test_activation_quant_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8, 64)) * 3.0, jnp.float32)
    q, s = w8.quantize_activations(x)
    err = float(jnp.max(jnp.abs(q.astype(jnp.float32) * s - x)))
    max_scale = float(jnp.max(s))
    assert err <= max_scale * 0.5 + 1e-6


def test_moe_layer_w8a8():
    """End-to-end: activation_bits=8 tracks the fp32 forward within the
    W8A8 error budget."""
    def make(abits):
        return moe.moe_layer(
            gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
            experts={"type": "ffn", "num_experts_per_device": 4,
                     "hidden_size_per_expert": 64,
                     "activation_bits": abits},
            model_dim=32, seeds=(1, 1, 1), group=jax.devices()[:1])

    layer = make(0)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    ref, _ = layer(params, x)
    qp = dict(params)
    qp["experts"] = quant.quantize_expert_params(params["experts"],
                                                 bits=8)
    out, _ = make(8)(qp, x)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.06, rel


def test_lm_w8a8_nll_delta():
    """Model-level accuracy: W8A8 eval nll within a small delta of the
    fp32 model (random-init LM; the trained-corpus harness bounds the
    weight-only deltas in test_quant.py)."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    def cfg(abits):
        return TransformerMoEConfig(
            vocab_size=61, max_len=32, model_dim=32, num_heads=2,
            num_layers=2, ffn_hidden=64, moe_every=1,
            num_local_experts=4, top_k=2, expert_hidden=64,
            expert_kwargs={"activation_bits": abits})

    # expert_kwargs passthrough is this repo's own API — a regression
    # here must FAIL, not skip.
    model_q = TransformerMoE(cfg(8), group=jax.devices()[:1])
    model = TransformerMoE(cfg(0), group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, 61)
    _, (nll_ref, _) = model.loss(params, tokens, training=False)

    qp = jax.tree.map(lambda x: x, params)
    for i in model.moe_layers:
        blk = dict(qp["blocks"][i])
        mp = dict(blk["moe"])
        mp["experts"] = quant.quantize_expert_params(mp["experts"],
                                                     bits=8)
        blk["moe"] = mp
        qp["blocks"][i] = blk
    _, (nll_q, _) = model_q.loss(qp, tokens, training=False)
    delta = abs(float(nll_q) - float(nll_ref))
    assert math.exp(delta) < 1.15, (float(nll_ref), float(nll_q))


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_ffn_w8a8_matches_reference(bits):
    """Whole-expert fused stream with integer-domain dots (W4A8/W8A8)
    tracks the dequantized fp reference within the two-quantization
    error budget (activation int8 + hidden re-quant int8)."""
    from tutel_tpu.ops import fused_ffn_pallas as fp

    rng = np.random.default_rng(10 + bits)
    e, c, k, h, n = 3, 24, 128, 256, 128
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((e, k, h)) * .05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, h, n)) * .05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((e, h)) * .01, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((e, n)) * .01, jnp.float32)
    q1, q2 = quant.quantize(w1, bits=bits), quant.quantize(w2, bits=bits)
    stream = fp.prepare_fused_ffn(q1, q2, b1, b2)
    assert stream is not None

    counts = jnp.asarray([c, 0, 7], jnp.int32)
    out = fp.fused_ffn_w8a8(x, stream, counts, activation_fn=jax.nn.gelu,
                            interpret=True, chunk=128)
    hid = jax.nn.gelu(jnp.einsum("eck,ekh->ech", x, quant.dequantize(q1))
                      + b1[:, None, :])
    ref = jnp.einsum("ech,ehn->ecn", hid, quant.dequantize(q2)) \
        + b2[:, None, :]
    # compare only live rows (rows past counts carry bias-only values)
    live = ref[0], ref[2, :7]
    got = out[0], out[2, :7]
    for r, g in zip(live, got):
        rel = float(jnp.linalg.norm(g - r) / (jnp.linalg.norm(r) + 1e-9))
        assert rel < 0.05, rel
    # empty expert rows are bias2-only through the quantized hidden path
    assert out.shape == (e, c, n)


def test_w8a8_ffn_prefers_fused_stream():
    """w8a8_ffn routes through the fused whole-expert kernel when a
    stream is attached, and its output matches the two-call path."""
    from tutel_tpu.ops import fused_ffn_pallas as fp

    rng = np.random.default_rng(21)
    e, c, k, h, n = 2, 16, 128, 256, 128
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((e, k, h)) * .05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, h, n)) * .05, jnp.float32)
    params = {"fc1_w": quant.quantize(w1, bits=4),
              "fc2_w": quant.quantize(w2, bits=4)}
    two_call = w8.w8a8_ffn(x, params, None, jax.nn.gelu, n,
                           interpret=True)
    fused_params = fp.prepare_fused_ffn_params(params)
    assert "fused_stream" in fused_params
    out = w8.w8a8_ffn(x, fused_params, None, jax.nn.gelu, n,
                      interpret=True)
    rel = float(jnp.linalg.norm(out - two_call)
                / (jnp.linalg.norm(two_call) + 1e-9))
    # paths differ only in where the hidden re-quant happens
    assert rel < 0.02, rel


def test_w4a8_block_packed_falls_back():
    """Block-packed INT4 (TP regather layout) unpacks outside the
    kernel but stays correct."""
    rng = np.random.default_rng(5)
    e, c, k, n = 2, 16, 256, 128
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, k, n)) * .05, jnp.float32)
    qw = quant.quantize(w, bits=4, shard_blocks=2)
    ref = jnp.einsum("eck,ekn->ecn", x, quant.dequantize(qw))
    out = w8.grouped_gemm_w8a8(x, qw, bm=8, bn=128, interpret=True)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.03, rel
