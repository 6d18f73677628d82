"""Fused single-kernel quantized FFN (ops/fused_ffn_pallas) tests.

Covers the phase-packed stream layout against the dequantize+einsum
reference and the two-call grouped-GEMM path, over bits x bias x dtype
x (K, H, N) shapes, in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tutel_tpu.ops.quant import quantize, dequantize
from tutel_tpu.ops import fused_ffn_pallas as fp
from tutel_tpu.ops import grouped_gemm_pallas as gp


def _ref_ffn(x, fc1, fc2, b1, b2, act):
    w1, w2 = dequantize(fc1), dequantize(fc2)
    y = jnp.einsum("eck,ekh->ech", x, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b1 is not None:
        y = y + b1.astype(y.dtype)[:, None, :]
    y = act(y)
    y = jnp.einsum("ech,ehn->ecn", y, w2.astype(y.dtype),
                   preferred_element_type=jnp.float32).astype(y.dtype)
    if b2 is not None:
        y = y + b2.astype(y.dtype)[:, None, :]
    return y


def _mk(rng, e, c, k, h, n, bits, use_bias, dtype):
    x = jnp.asarray(rng.standard_normal((e, c, k)), dtype)
    w1 = jnp.asarray(rng.standard_normal((e, k, h)) * .05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, h, n)) * .05, jnp.float32)
    b1 = (jnp.asarray(rng.standard_normal((e, h)) * .1, jnp.float32)
          if use_bias else None)
    b2 = (jnp.asarray(rng.standard_normal((e, n)) * .1, jnp.float32)
          if use_bias else None)
    return x, quantize(w1, bits=bits), quantize(w2, bits=bits), b1, b2


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("use_bias", [False, True])
@pytest.mark.parametrize("shape", [(4, 32, 256, 256, 256),
                                   (3, 27, 256, 512, 384),
                                   (2, 8, 256, 1024, 512)])
def test_fused_matches_reference(bits, use_bias, shape):
    e, c, k, h, n = shape
    rng = np.random.default_rng(bits + use_bias * 7 + e)
    x, q1, q2, b1, b2 = _mk(rng, e, c, k, h, n, bits, use_bias,
                            jnp.float32)
    st = fp.prepare_fused_ffn(q1, q2, b1, b2, bw=128)
    assert st is not None
    ref = _ref_ffn(x, q1, q2, b1, b2, jax.nn.gelu)
    refmax = float(jnp.max(jnp.abs(ref))) + 1e-9

    out = fp.fused_ffn_quant(x, st, None, jax.nn.gelu, interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) / refmax < 5e-3

    counts = jnp.asarray(rng.integers(0, c + 1, (e,)), jnp.int32)
    out2 = fp.fused_ffn_quant(x, st, counts, jax.nn.gelu, interpret=True)
    mask = jnp.arange(c)[None, :, None] < counts[:, None, None]
    err = float(jnp.max(jnp.where(mask, jnp.abs(out2 - ref), 0))) / refmax
    assert err < 5e-3


def test_fused_bf16():
    rng = np.random.default_rng(3)
    e, c, k, h, n = 3, 16, 256, 512, 256
    x, q1, q2, b1, b2 = _mk(rng, e, c, k, h, n, 4, True, jnp.bfloat16)
    st = fp.prepare_fused_ffn(q1, q2, b1, b2, bw=128)
    out = fp.fused_ffn_quant(x, st, None, jax.nn.gelu, interpret=True)
    ref = _ref_ffn(x, q1, q2, b1, b2, jax.nn.gelu)
    assert out.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9) \
        < 2e-2


def test_fused_empty_expert_rows_are_bias2():
    rng = np.random.default_rng(5)
    e, c, k, h, n = 2, 8, 256, 256, 256
    x, q1, q2, b1, b2 = _mk(rng, e, c, k, h, n, 8, True, jnp.float32)
    st = fp.prepare_fused_ffn(q1, q2, b1, b2, bw=128)
    counts = jnp.asarray([0, c], jnp.int32)
    out = fp.fused_ffn_quant(x, st, counts, jax.nn.gelu, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.tile(np.asarray(b2[0])[None], (c, 1)),
                               atol=1e-5)


def test_prepare_rejects_unsupported():
    rng = np.random.default_rng(7)
    w1 = jnp.asarray(rng.standard_normal((2, 512, 256)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    # H < K: shrinking FFN falls back
    assert fp.prepare_fused_ffn(quantize(w1, bits=4),
                                quantize(w2, bits=4)) is None
    # mixed bits falls back
    w3 = jnp.asarray(rng.standard_normal((2, 256, 512)), jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((2, 512, 256)), jnp.float32)
    assert fp.prepare_fused_ffn(quantize(w3, bits=4),
                                quantize(w4, bits=8)) is None
    # TP block-packed INT4 falls back
    q3 = quantize(w3, bits=4, shard_blocks=2)
    assert fp.prepare_fused_ffn(q3, quantize(w4, bits=4)) is None


def test_fused_stream_rides_ep_mesh():
    """The phase-packed stream shards over the expert axes like any
    expert leaf: the 8-device EP forward with a prepared stream equals
    the two-call quantized EP forward exactly."""
    from tutel_tpu import moe
    from tutel_tpu.ops import quant

    devices = jax.devices()[:8]
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.5},
        experts={"type": "ffn", "num_experts_per_device": 2,
                 "hidden_size_per_expert": 128, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=64, seeds=(1, 1, 1), group=devices)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    qp = dict(params)
    qp["experts"] = quant.quantize_expert_params(params["experts"],
                                                 bits=4)
    out_plain, _ = layer(layer.shard_params(qp), x)

    qp2 = dict(qp)
    qp2["experts"] = fp.prepare_fused_ffn_params(qp["experts"])
    assert "fused_stream" in qp2["experts"]
    out_fused, _ = layer(layer.shard_params(qp2), x)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out_fused)),
        np.asarray(jax.device_get(out_plain)), atol=1e-4)


def test_fused_stream_rides_ragged_ep():
    """True-dropless ragged EP with a prepared stream: one relayout
    pair + one kernel, equal to the two-call ragged path exactly."""
    from tutel_tpu import moe
    from tutel_tpu.ops import quant

    devices = jax.devices()[:8]
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 128, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=64, seeds=(1, 1, 1), group=devices)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    qp = dict(params)
    qp["experts"] = quant.quantize_expert_params(params["experts"],
                                                 bits=4)
    sp = layer.shard_params(qp)
    bound = layer.resolve_max_recv(sp, x)
    out_plain, _ = layer(sp, x, use_ragged_ep=True, max_recv=bound)

    qp2 = dict(qp)
    qp2["experts"] = fp.prepare_fused_ffn_params(qp["experts"])
    sp2 = layer.shard_params(qp2)
    out_fused, _ = layer(sp2, x, use_ragged_ep=True, max_recv=bound)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out_fused)),
        np.asarray(jax.device_get(out_plain)), atol=1e-4)


def _ref_swiglu(x, q1, q2, q3):
    w1, w2, w3 = (dequantize(q).astype(x.dtype) for q in (q1, q2, q3))
    y1 = jnp.einsum("eck,ekh->ech", x, w1,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    y2 = jnp.einsum("eck,ekh->ech", x, w2,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("ech,ehn->ecn", jax.nn.silu(y1) * y2, w3,
                      preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("shape", [(3, 16, 256, 256, 256),
                                   (2, 8, 256, 512, 384)])
def test_fused_swiglu_matches_reference(bits, shape):
    e, c, k, h, n = shape
    rng = np.random.default_rng(bits + e)
    x = jnp.asarray(rng.standard_normal((e, c, k)), jnp.float32)
    q1 = quantize(jnp.asarray(
        rng.standard_normal((e, k, h)) * .05, jnp.float32), bits=bits)
    q2 = quantize(jnp.asarray(
        rng.standard_normal((e, k, h)) * .05, jnp.float32), bits=bits)
    q3 = quantize(jnp.asarray(
        rng.standard_normal((e, h, n)) * .05, jnp.float32), bits=bits)
    st = fp.prepare_fused_swiglu(q1, q2, q3, bw=128)
    assert st is not None
    ref = _ref_swiglu(x, q1, q2, q3)
    refmax = float(jnp.max(jnp.abs(ref))) + 1e-9

    out = fp.fused_swiglu_quant(x, st, None, interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) / refmax < 5e-3

    counts = jnp.asarray(rng.integers(0, c + 1, (e,)), jnp.int32)
    out2 = fp.fused_swiglu_quant(x, st, counts, interpret=True)
    mask = jnp.arange(c)[None, :, None] < counts[:, None, None]
    assert float(jnp.max(jnp.where(
        mask, jnp.abs(out2 - ref), 0))) / refmax < 5e-3


def test_llama_expert_uses_swiglu_stream():
    from tutel_tpu.experts.llama_ffn import LlamaFFNNetwork
    from tutel_tpu.ops.quant import quantize_expert_params

    rng = np.random.default_rng(13)
    net = LlamaFFNNetwork(model_dim=256, hidden_size_per_expert=512,
                          num_experts_per_device=2)
    p = net.init(jax.random.PRNGKey(0))
    qp = quantize_expert_params(p, bits=4)
    qp2 = fp.prepare_fused_ffn_params(qp)
    assert "fused_stream" in qp2

    class Ctx:
        dispatch_count = jnp.asarray([9, 16], jnp.int32)

    x = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    o1 = net.apply(qp, x, Ctx())
    o2 = net.apply(qp2, x, Ctx())
    mask = jnp.arange(16)[None, :, None] < Ctx.dispatch_count[:, None, None]
    assert float(jnp.max(jnp.where(mask, jnp.abs(o1 - o2), 0))) < 1e-4


def test_quantized_ffn_uses_stream():
    rng = np.random.default_rng(11)
    e, c, k, h, n = 3, 16, 256, 512, 256
    x, q1, q2, _, _ = _mk(rng, e, c, k, h, n, 4, False, jnp.float32)
    params = {"fc1_w": q1, "fc2_w": q2}
    params2 = fp.prepare_fused_ffn_params(params)
    assert "fused_stream" in params2

    class Ctx:
        dispatch_count = jnp.asarray([5, 0, 16], jnp.int32)
        megablocks_size = 1

    out_fused = gp.quantized_ffn(x, params2, Ctx(), jax.nn.gelu, n,
                                 interpret=True)
    out_plain = gp.quantized_ffn(x, params, Ctx(), jax.nn.gelu, n,
                                 interpret=True)
    mask = jnp.arange(c)[None, :, None] < Ctx.dispatch_count[:, None, None]
    assert float(jnp.max(jnp.where(
        mask, jnp.abs(out_fused - out_plain), 0))) < 1e-5


def test_fused_stream_rides_2dh_mesh():
    """2DH layouts shard the stream over ('dcn','ici') like any expert
    leaf; the fused forward equals the two-call quantized 2DH forward."""
    from tutel_tpu import moe
    from tutel_tpu.ops import quant

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.5},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 128, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=64, seeds=(1, 1, 1), use_2dh=True, num_hosts=2,
        group=jax.devices()[:8])
    p = dict(layer.init(jax.random.PRNGKey(0)))
    p["experts"] = quant.quantize_expert_params(p["experts"], bits=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    o1, _ = layer(layer.shard_params(p), x)
    p2 = dict(p)
    p2["experts"] = fp.prepare_fused_ffn_params(p["experts"])
    o2, _ = layer(layer.shard_params(p2), x)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(o2)),
        np.asarray(jax.device_get(o1)), atol=1e-4)


def test_quantized_overlap_invariance():
    """a2a/FFN overlap degree is output-invariant with quantized
    experts (the chunked pipeline calls the quantized FFN per chunk)."""
    from tutel_tpu import moe
    from tutel_tpu.ops import quant

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 128, "has_fc1_bias": False,
                 "has_fc2_bias": False},
        model_dim=64, seeds=(1, 1, 1), group=jax.devices()[:8])
    q = dict(layer.init(jax.random.PRNGKey(0)))
    q["experts"] = quant.quantize_expert_params(q["experts"], bits=8)
    sq = layer.shard_params(q)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    a, _ = layer(sq, x, a2a_ffn_overlap_degree=1)
    b, _ = layer(sq, x, a2a_ffn_overlap_degree=2)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(a)),
        np.asarray(jax.device_get(b)), atol=1e-4)


def test_state_dict_excludes_fused_stream():
    """The stream is derived data: checkpoints must not carry it, and
    load must work from a stream-free state dict."""
    from tutel_tpu import moe
    from tutel_tpu.ops import quant

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 128},
        model_dim=128, seeds=(1, 1, 1), group=jax.devices()[:1])
    p = dict(layer.init(jax.random.PRNGKey(0)))
    p["experts"] = fp.prepare_fused_ffn_params(
        quant.quantize_expert_params(p["experts"], bits=4))
    assert "fused_stream" in p["experts"]
    sd = layer.state_dict(p)
    assert not any("fused" in k for k in sd)
