"""Integer-domain grouped GEMM: INT8 activations x INT8 weights (W8A8).

The weight-only kernels (ops/grouped_gemm_pallas, ops/fused_ffn_pallas)
top out below the pure-stream roofline because the dequant runs on the
VPU in the kernel's critical path: INT4 pays an int32-domain nibble
unpack, and even INT8 pays an int8->bf16 convert of every weight byte
before the MXU will take it. This module moves the whole contraction
into the integer domain instead:

  * activations are quantized per row (symmetric absmax -> int8 +
    f32 row scale) — one cheap pass over [E, C, K];
  * the kernel issues int8 x int8 MXU dots with int32 accumulation
    (`preferred_element_type=jnp.int32`) — NO per-byte weight convert;
  * the result is rescaled by the rank-1 outer product of row scales
    and the weight's per-output-channel scales.

Accuracy: standard W8A8 — the extra error over weight-only INT8 is the
activation rounding (bounded by absmax/127 per element); measured on
the trained-LM harness in tests/test_w8a8.py. Inference-only, like the
reference's megablocks path (reference tutel/custom/custom_kernel.cpp:
874-889 — which is fp-only; integer-domain grouped GEMM has no
reference counterpart).

Opt-in: pass `activation_bits=8` per call or set it on the expert
(experts/ffn.py wires `ctx`-independent usage through quantized_ffn).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedWeight, unpack_int4


def quantize_activations(x, axis=-1):
    """Symmetric per-row INT8: returns (q int8, scales f32) with
    x ~= q * scales (scales broadcast along `axis`)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scales),
                 -128, 127).astype(jnp.int8)
    return q, scales


def _w8a8_kernel(counts_ref, xq_ref, sx_ref, w_ref, sw_ref, o_ref, *,
                 bm, bn, bits, out_dtype):
    e = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[e]

    @pl.when(i * bm < count)
    def _compute():
        if bits == 4:
            # W4A8: unpack split-half nibbles to int8 IN the kernel —
            # the weight stream stays at INT4 bytes, the narrow target
            # is int8 (one fewer VPU op than the bf16 dequant path),
            # and the dot stays on the integer MXU. Cast each half to
            # int8 BEFORE the concat so the [2K, bn] temporary is 1
            # byte/elem, not 4 (VMEM: the int32 unpack domain is
            # required — Mosaic rejects i8/i16 shifts — but only per
            # half).
            v = w_ref[0].astype(jnp.int32)
            q = jnp.concatenate([((v << 28) >> 28).astype(jnp.int8),
                                 (v >> 4).astype(jnp.int8)], axis=0)
        else:
            q = w_ref[0]
        acc = jnp.dot(xq_ref[0], q, preferred_element_type=jnp.int32)
        scaled = acc.astype(jnp.float32) \
            * sx_ref[0, :, 0][:, None] * sw_ref[0, 0, :][None, :]
        o_ref[0] = scaled.astype(out_dtype)

    @pl.when(i * bm >= count)
    def _skip():
        o_ref[0] = jnp.zeros((bm, bn), out_dtype)


def grouped_gemm_w8a8(x, qw: QuantizedWeight, counts=None, *, bm=256,
                      bn=None, interpret=False):
    """out[e] = x[e] @ dequant(qw[e]) with the contraction in int8.

    x: [E, C, K] float activations (quantized per row internally);
    qw: INT8 or INT4 QuantizedWeight [E, K, N]. INT4 (blocks == 1)
    unpacks to int8 INSIDE the kernel, so the weight stream keeps
    INT4's bytes (W4A8); block-packed INT4 (TP regather layouts)
    unpacks outside, doubling stream bytes.
    Returns [E, C, N] in x.dtype. Inference-only.
    """
    e, c, k = x.shape
    ew, kw, n = qw.shape
    assert e == ew and k == kw, (x.shape, qw.shape)
    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    counts = counts.astype(jnp.int32)

    bits = qw.bits
    if bits == 8 or qw.blocks == 1:
        vals = qw.values                       # int8 or packed int4
    else:
        vals = unpack_int4(qw.values, qw.blocks)
        bits = 8
    scales = qw.scales.astype(jnp.float32)               # [E, 1, N]

    xq, sx = quantize_activations(x)                     # int8, [E,C,1]

    bm = min(bm, c)
    kp_rows = vals.shape[1]                              # K or K//2 (int4)
    if bn is None:
        # Largest output tile fitting VMEM (same ~12 MB ladder as
        # grouped_gemm_quant): 2 pipeline buffers of the packed weight
        # block, plus for in-kernel INT4 unpack the int32 domain copy
        # (4B/packed elem) and the two int8 halves + their concat
        # (1B/unpacked elem each). Only divisors of N are considered —
        # a non-divisor pads the weights inside the traced call.
        per_col = 2 * kp_rows
        if bits == 4:
            per_col += 4 * kp_rows + 2 * (2 * kp_rows)
        bn = 256
        for cand in (2048, 1024, 512, 256):
            if cand <= n and n % cand == 0 \
                    and per_col * cand <= 12 * 1024 * 1024:
                bn = cand
                break
    bn = min(bn, n)
    pad_c = (-c) % bm
    pad_n = (-n) % bn
    if pad_c:
        xq = jnp.pad(xq, ((0, 0), (0, pad_c), (0, 0)))
        sx = jnp.pad(sx, ((0, 0), (0, pad_c), (0, 0)))
    if pad_n:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, 0), (0, pad_n)))
    cp, np_ = c + pad_c, n + pad_n
    kp = vals.shape[1]                                   # K or K//2

    kernel = functools.partial(_w8a8_kernel, bm=bm, bn=bn, bits=bits,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e, cp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((1, bm, k), lambda e, i, j, cnt: (e, i, 0)),
                pl.BlockSpec((1, bm, 1), lambda e, i, j, cnt: (e, i, 0)),
                pl.BlockSpec((1, kp, bn), lambda e, i, j, cnt: (e, 0, j)),
                pl.BlockSpec((1, 1, bn), lambda e, i, j, cnt: (e, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, bm, bn),
                                   lambda e, i, j, cnt: (e, i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((e, cp, np_), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * cp * k * np_,
            bytes_accessed=xq.size + vals.size
            + e * cp * np_ * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(counts, xq, sx, vals, scales)
    if pad_c or pad_n:
        out = out[:, :c, :n]
    return out


def w8a8_ffn(x, params, ctx, activation_fn, output_dim,
             interpret=False):
    """Two-layer FFN with both GEMMs in the integer domain (activation
    re-quantized between layers). Mirrors quantized_ffn's bias/count
    semantics."""
    counts = getattr(ctx, "dispatch_count", None) if ctx else None
    fc1_w, fc2_w = params["fc1_w"], params["fc2_w"]
    fc1_b, fc2_b = params.get("fc1_b"), params.get("fc2_b")

    stream = params.get("fused_stream")
    if stream is not None and stream.n >= output_dim:
        from .fused_ffn_pallas import fused_ffn_w8a8, vmem_bytes_w8a8
        # whole-expert phase-packed stream with integer-domain dots
        # (W4A8/W8A8); whole-tile chunks measured fastest on v5e (VMEM
        # is chunk-independent above 512 — benchmarks/aot_vmem_probe.py);
        # shrink the unpack chunk under VMEM pressure, falling back to
        # the two-call path only if chunk=128 won't fit
        for chunk in (2048, 1024, 512, 256, 128):
            if stream.bw % chunk == 0 and \
                    vmem_bytes_w8a8(stream, x.shape[1], x.dtype, chunk) \
                    <= 15 * 1024 * 1024:
                out = fused_ffn_w8a8(x, stream, counts,
                                     activation_fn=activation_fn,
                                     interpret=interpret, chunk=chunk)
                return out[..., :output_dim]

    y = grouped_gemm_w8a8(x, fc1_w, counts, interpret=interpret)
    if fc1_b is not None:
        y = y + fc1_b.astype(y.dtype)[:, None, :]
    y = activation_fn(y)
    y = grouped_gemm_w8a8(y, fc2_w, counts, interpret=interpret)
    if fc2_b is not None:
        bias = fc2_b.astype(y.dtype)[:, None, :]
        if bias.shape[-1] != output_dim:
            bias = jnp.pad(bias, ((0, 0), (0, 0),
                                  (0, output_dim - bias.shape[-1])))
        y = y + bias
    return y
