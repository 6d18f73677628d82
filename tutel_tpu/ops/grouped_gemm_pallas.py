"""Pallas grouped GEMM with fused INT8/INT4 weight dequantization.

The quantized-inference hot path (north star: dropless decode with INT4
expert weights at grouped-GEMM roofline). Capability superset of the
reference's megablocks `sparse_bmm_infer`
(reference: tutel/custom/custom_kernel.cpp:874-889, tutel/experts/ffn.py:70-81):
per-expert GEMMs narrowed to the rows actually routed to each expert, plus
dequant fused into the MXU inner loop.

Layout: dense per-expert buffers x [E, C, K]; quantized weights
QuantizedWeight([E, K, N]); counts [E] gives live rows per expert. Grid is
(E, C/bm, N/bn); each step loads the full-K activation stripe and the
full-K quantized weight tile into VMEM, unpacks nibbles (split-half order:
concat, no relayout — see ops/quant.py), runs one MXU dot with f32
accumulation, and applies the per-output-channel scale as a post-GEMM
column multiply (exact: int4/int8 values are exactly representable in
bf16). Row tiles at or beyond the expert's count are skipped — the
megablocks narrowing — writing zeros.

Inference-only (no VJP), matching the reference megablocks path which is
also inference-only (reference moe_layer.py:278-280).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedWeight


def _gmm_kernel(counts_ref, x_ref, w_ref, s_ref, o_ref, *, bits, bm, bn,
                out_dtype, twodot, blocks):
    e = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[e]

    @pl.when(i * bm < count)
    def _compute():
        wq = w_ref[0]                                   # [Kp, bn] int8
        if bits == 4 and blocks > 1:
            # block-wise split-half packing (TP-regathered K slices,
            # quantize(shard_blocks=...)): unpack each contiguous
            # K-block; concat order == natural K order
            v = wq.astype(jnp.int32)
            kb = v.shape[0] // blocks
            parts = []
            for b in range(blocks):
                vb = v[b * kb:(b + 1) * kb]
                parts.append((vb << 28) >> 28)
                parts.append(vb >> 4)
            q = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
            acc = jnp.dot(x_ref[0], q, preferred_element_type=jnp.float32)
        elif bits == 4:
            # int32-domain nibble unpack (Mosaic rejects i8/i16 shifts
            # and bitwise ops; f32 floor-math is ~50% slower). Two
            # realizations of the dot, selected per-shape by the caller:
            #   twodot: x @ W == x[:, :K/2] @ low + x[:, K/2:] @ high
            #     (split-half layout, ops/quant.py) — avoids the [K, bn]
            #     concat relayout;
            #   concat: one [K, bn] dot after concatenating the halves.
            # Measured on v5e: twodot wins at row tiles >= 32 (up to 7x
            # at aligned decode shapes); concat wins slightly at the
            # sub-sublane row tiles (bm < 32) the tight dropless decode
            # capacity produces.
            v = wq.astype(jnp.int32)
            low = (v << 28) >> 28                       # sign-extend
            high = v >> 4
            if twodot:
                kp = v.shape[0]
                x = x_ref[0]
                acc = jnp.dot(x[:, :kp], low.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(x[:, kp:], high.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            else:
                q = jnp.concatenate([low, high],
                                    axis=0).astype(jnp.bfloat16)
                acc = jnp.dot(x_ref[0], q,
                              preferred_element_type=jnp.float32)
        else:
            q = wq.astype(jnp.bfloat16)
            acc = jnp.dot(x_ref[0], q, preferred_element_type=jnp.float32)
        acc = acc * s_ref[0, 0, :][None, :]
        o_ref[0] = acc.astype(out_dtype)

    @pl.when(i * bm >= count)
    def _skip():
        o_ref[0] = jnp.zeros((bm, bn), out_dtype)


def grouped_gemm_quant(x, qw: QuantizedWeight, counts=None, *, bm=256,
                       bn=None, interpret=False):
    """out[e] = x[e] @ dequant(qw[e]), rows >= counts[e] skipped (zeros).

    Args:
      x: [E, C, K] activations (bf16/f32).
      qw: QuantizedWeight of logical shape [E, K, N].
      counts: [E] int32 live rows per expert (None = all C rows).
      bm, bn: row / output-column tile sizes.
    Returns:
      [E, C, N] in x.dtype.
    """
    e, c, k = x.shape
    ew, kw, n = qw.shape
    assert e == ew and k == kw, (x.shape, qw.shape)
    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    counts = counts.astype(jnp.int32)

    bm = min(bm, c)
    if bn is None:
        # Largest output tile fitting VMEM: 2 pipeline buffers of the
        # packed block plus (int4) the int32 unpack temporary, ~12 MB
        # budget. Measured on v5e: bn=2048 runs the 128-expert decode
        # kernel at 656 GB/s weight-stream vs 594 at bn=1024. Only tiles
        # that divide N are considered — a non-divisor pads the *weights*
        # inside the traced call, a catastrophic per-step copy.
        kp_rows = qw.values.shape[1]
        per_col = 2 * kp_rows + (4 * kp_rows if qw.bits == 4
                                 else 2 * kp_rows)
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
        x = jnp.pad(x, ((0, 0), (0, pad_c), (0, 0)))
    cp, np_ = c + pad_c, n + pad_n
    vals, scales = qw.values, qw.scales
    if pad_n:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, 0), (0, pad_n)))
    kp = vals.shape[1]                                   # K or K//2 (int4)

    import os
    # A/B on v5e at the production configs (128-expert dropless decode):
    # concat 1.061 ms vs twodot 1.162 ms at bm=27, and a wash (2.91 vs
    # 2.90 ms) at bm=160 where the step is MXU-bound — so concat is the
    # default. (An isolated microbench at bm=32 showed twodot 7x ahead;
    # that did not transfer to the real pipeline. Kept selectable for
    # autotuning on other parts.)
    td_env = os.environ.get("TUTEL_TPU_GMM_TWODOT", "")
    twodot = bool(int(td_env)) if td_env else False
    kernel = functools.partial(
        _gmm_kernel, bits=qw.bits, bm=bm, bn=bn, out_dtype=x.dtype,
        twodot=twodot, blocks=qw.blocks)
    flops = 2 * e * cp * k * np_
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e, cp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((1, bm, k), lambda e, i, j, cnt: (e, i, 0)),
                pl.BlockSpec((1, kp, bn), lambda e, i, j, cnt: (e, 0, j)),
                pl.BlockSpec((1, 1, bn), lambda e, i, j, cnt: (e, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, bm, bn),
                                   lambda e, i, j, cnt: (e, i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((e, cp, np_), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + vals.size
            + e * cp * np_ * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(counts, x, vals, scales)
    if pad_c or pad_n:
        out = out[:, :c, :n]
    return out


def quantized_ffn(x, params, ctx, activation_fn, output_dim,
                  interpret=False):
    """Two-layer dropless FFN over dense [E, C, M] buffers with quantized
    weights: grouped-GEMM + fused dequant for fc1 and fc2, with the
    megablocks row-narrowing driven by ctx.dispatch_count."""
    e, c, m = x.shape
    counts = getattr(ctx, "dispatch_count", None)
    if counts is not None:
        mega = max(int(getattr(ctx, "megablocks_size", 1)), 1)
        counts = jnp.minimum((counts + mega - 1) // mega * mega, c)
    fc1_w, fc2_w = params["fc1_w"], params["fc2_w"]
    fc1_b, fc2_b = params.get("fc1_b"), params.get("fc2_b")

    stream = params.get("fused_stream")
    if stream is not None and stream.n >= output_dim:
        from .fused_ffn_pallas import fused_ffn_quant, vmem_bytes
        # single-kernel phase-packed stream (ops/fused_ffn_pallas):
        # biases are folded into the stream at prepare time. chunk=1024
        # measured fastest on v5e (VMEM is chunk-independent above 512
        # — benchmarks/aot_vmem_probe.py); under VMEM pressure shrink
        # the unpack chunk, falling back to the two-call path only if
        # even chunk=128 won't fit.
        for chunk in (1024, 512, 256, 128):
            if vmem_bytes(stream, c, x.dtype, chunk) \
                    <= 15 * 1024 * 1024 and stream.bw % chunk == 0:
                out = fused_ffn_quant(x, stream, counts,
                                      activation_fn=activation_fn,
                                      interpret=interpret, chunk=chunk)
                return out[..., :output_dim]

    import os
    bn = int(os.environ.get("TUTEL_TPU_GMM_BN", "0")) or None
    y = grouped_gemm_quant(x, fc1_w, counts, bn=bn, interpret=interpret)
    if fc1_b is not None:
        y = y + fc1_b.astype(y.dtype)[:, None, :]
    y = activation_fn(y)
    y = grouped_gemm_quant(y, fc2_w, counts, bn=bn, interpret=interpret)
    if fc2_b is not None:
        bias = fc2_b.astype(y.dtype)[:, None, :]
        if bias.shape[-1] != output_dim:
            bias = jnp.pad(bias, ((0, 0), (0, 0),
                                  (0, output_dim - bias.shape[-1])))
        y = y + bias
    return y


def _ragged_to_dense(rows, gs, starts, c_max):
    """rows [N, K] grouped by expert -> dense [E, c_max, K] view.
    dense[e, c] = rows[starts[e] + c] for c < gs[e] (else zero)."""
    n = rows.shape[0]
    e = gs.shape[0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (e, c_max), 1)
    src = jnp.where(cidx < gs[:, None], starts[:, None] + cidx, n)
    return jnp.take(rows, src.reshape(-1), axis=0, mode="fill",
                    fill_value=0).reshape(e, c_max, rows.shape[-1])


def _dense_to_ragged(y, gs, starts, c_max, n):
    """dense [E, c_max, M] -> ragged rows [N, M] (inverse of
    _ragged_to_dense); tail rows past sum(gs) are zero."""
    e = gs.shape[0]
    nout = y.shape[-1]
    rid = jnp.arange(n, dtype=jnp.int32)
    gid = jnp.sum(rid[:, None] >= jnp.cumsum(gs)[None, :],
                  axis=1).astype(jnp.int32)
    gid_c = jnp.clip(gid, 0, e - 1)
    within = rid - starts[gid_c]
    flat_src = jnp.where(
        (rid < jnp.sum(gs)) & (within < c_max),
        gid_c * c_max + within, e * c_max)
    return jnp.take(y.reshape(e * c_max, nout), flat_src, axis=0,
                    mode="fill", fill_value=0)


def _ragged_starts(group_sizes):
    gs = group_sizes.astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(gs)[:-1]])
    return gs, starts


def grouped_gemm_quant_ragged(rows, qw: QuantizedWeight, group_sizes,
                              c_max, *, bn=None, interpret=False):
    """Quantized grouped GEMM over a *ragged* row layout.

    rows [N, K] are grouped contiguously by expert (group_sizes [E]); the
    rows are re-laid into the dense [E, c_max, K] view with two cheap
    gathers so the fused-dequant kernel (weights read once, INT4 packed)
    does the FLOPs. c_max is the static per-expert row bound (bucketed by
    the caller; rows beyond it are dropped, matching capped-dropless).
    Tail rows past sum(group_sizes) are zero.
    """
    import os
    n = rows.shape[0]
    gs, starts = _ragged_starts(group_sizes)
    if bn is None:
        bn = int(os.environ.get("TUTEL_TPU_GMM_BN", "0")) or None
    dense = _ragged_to_dense(rows, gs, starts, c_max)
    y = grouped_gemm_quant(dense, qw, jnp.minimum(gs, c_max), bn=bn,
                           interpret=interpret)
    return _dense_to_ragged(y, gs, starts, c_max, n)


def fused_ffn_quant_ragged(rows, stream, group_sizes, c_max,
                           activation_fn, interpret=False, chunk=None):
    """Whole FFN over the ragged layout through the single fused
    kernel: ONE ragged->dense relayout, one kernel, one dense->ragged
    relayout (the two-call ragged path pays two of each)."""
    from .fused_ffn_pallas import fused_ffn_quant
    n = rows.shape[0]
    gs, starts = _ragged_starts(group_sizes)
    dense = _ragged_to_dense(rows, gs, starts, c_max)
    y = fused_ffn_quant(dense, stream, jnp.minimum(gs, c_max),
                        activation_fn=activation_fn,
                        interpret=interpret, chunk=chunk)
    return _dense_to_ragged(y, gs, starts, c_max, n)
