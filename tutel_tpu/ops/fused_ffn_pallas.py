"""Single-kernel fused quantized expert FFN (fc1 + activation + fc2).

The dropless-decode step is weight-bandwidth bound: it reads every
expert's packed INT4/INT8 fc1+fc2 once per step. Running fc1 and fc2 as
two `pallas_call`s (ops/grouped_gemm_pallas.quantized_ffn) pays two
pipeline warmup/drain bubbles, an HBM round-trip for the [E, C, H]
hidden activations, and per-grid-step fixed costs on 2x the steps. This
module fuses the whole expert FFN into ONE kernel built around a
*phase-packed weight stream*:

  * `prepare_fused_ffn` re-lays the two QuantizedWeights ONCE into a
    single pre-tiled buffer `wstream` [E, T, Kr, bw]: tiles 0..T1-1 are
    fc1 output-column tiles, tiles T1..T-1 are fc2 output-column tiles.
    Scales and biases ride along in `sb` [E, T, 2, bw].
  * the kernel runs grid (E,): ONE ~4 MB DMA brings the expert's entire
    fc1+fc2 stream into VMEM (measured on v5e: per-grid-step fixed
    costs dominate the two-call gap, so fewer/bigger steps win); the
    body walks the tiles in column chunks — unpack nibbles, MXU dot,
    scale — accumulating act(x @ W1 + b1) into a VMEM scratch and then
    emitting hidden @ W2 * s2 + b2 straight to the output block. The
    hidden state never touches HBM and the weight stream never pauses
    between fc1 and fc2.

Measured on v5e at the north-star config (128 experts, 2048^2 INT4,
capacity 27): 0.84 ms vs 0.86 ms for the two-call path, with a
pure-stream ceiling of 0.73 ms for the same 537 MB — i.e. ~87% of the
achievable weight stream with dequant+GEMM+activation riding along.
(Timing by loop differencing — two chained-loop lengths, slope only —
which cancels the remote-tunnel dispatch cost entirely.)

Requires H >= K (expansion FFNs; the split-half INT4 unpack row order
then makes the hidden scratch layout the identity). Everything else
falls back to the two-call path. Capability superset of the reference's
megablocks inference path (reference: tutel/custom/custom_kernel.cpp:
874-889, tutel/experts/ffn.py:70-81). Inference-only (no VJP), like the
reference path (reference moe_layer.py:278-280).

Row semantics: all C rows of a non-empty expert are computed (rows
beyond `counts[e]` see zero inputs, so they carry act(b1) @ W2 + b2);
empty experts produce bias2-only rows. Callers consume rows < counts[e].
"""

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedWeight

# whole-expert stream block budget (double-buffered by Mosaic)
_BLOCK_BUDGET = 5 * 1024 * 1024


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("wstream", "sb"),
    meta_fields=("bits", "k", "h", "n", "t1", "t2", "bw", "kr"),
)
@dataclasses.dataclass(frozen=True)
class FusedFFNStream:
    """Phase-packed weight stream for one grouped FFN (see module doc)."""
    wstream: jnp.ndarray           # int8 [E, T1+T2, Kr, bw]
    sb: jnp.ndarray                # f32 [E, T1+T2, 2, bw] (scales, biases)
    bits: int
    k: int                         # fc1 contraction dim (model dim)
    h: int                         # hidden dim
    n: int                         # fc2 output dim
    t1: int                        # fc1 tiles
    t2: int                        # fc2 tiles
    bw: int                        # tile width (output columns per tile)
    kr: int                        # common packed row count


def prepare_fused_ffn(fc1: QuantizedWeight, fc2: QuantizedWeight,
                      fc1_b=None, fc2_b=None, bw=None):
    """Build the phase-packed stream for a two-layer grouped FFN.

    fc1: [E, K, H], fc2: [E, H, N] QuantizedWeights (same bits,
    blocks == 1 — TP block-packed INT4 is not supported — and H >= K).
    Returns FusedFFNStream, or None if the shapes don't qualify (the
    caller then uses the two-call grouped-GEMM path).
    """
    if not isinstance(fc1, QuantizedWeight) or \
            not isinstance(fc2, QuantizedWeight):
        return None
    if fc1.bits != fc2.bits or fc1.blocks != 1 or fc2.blocks != 1:
        return None
    bits = fc1.bits
    e, k, h = fc1.shape
    e2, h2, n = fc2.shape
    if e != e2 or h != h2 or h < k:
        return None
    kr = fc2.values.shape[1]       # packed rows of fc2 (H or H/2) == Kr
    if bw is None:
        for cand in (2048, 1024, 512, 256, 128):
            if h % cand == 0:
                bw = cand
                break
        else:
            return None
    if h % bw or kr * bw > _BLOCK_BUDGET:
        return None
    t1 = h // bw
    t2 = -(-n // bw)               # fc2 output columns are padded to bw
    if kr * (t1 + t2) * bw > _BLOCK_BUDGET:
        return None

    def tile_cols(vals, scales, bias, ncols, nt):
        v = vals
        s = jnp.broadcast_to(scales.astype(jnp.float32), (e, 1, ncols))
        b = (jnp.zeros((e, 1, ncols), jnp.float32) if bias is None
             else bias.astype(jnp.float32).reshape(e, 1, ncols))
        pad = nt * bw - ncols
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
            s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)))
            b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
        rows = v.shape[1]
        if rows < kr:
            v = jnp.pad(v, ((0, 0), (0, kr - rows), (0, 0)))
        # [E, kr, nt, bw] -> [E, nt, kr, bw]: contiguous pre-tiled stream
        v = v.reshape(e, kr, nt, bw).transpose(0, 2, 1, 3)
        sb = jnp.concatenate([s, b], axis=1)          # [E, 2, nt*bw]
        sb = sb.reshape(e, 2, nt, bw).transpose(0, 2, 1, 3)
        return v, sb

    if fc2_b is not None and fc2_b.shape[-1] != n:
        fc2_b = jnp.pad(fc2_b, ((0, 0), (0, n - fc2_b.shape[-1])))
    v1, sb1 = tile_cols(fc1.values, fc1.scales, fc1_b, h, t1)
    v2, sb2 = tile_cols(fc2.values, fc2.scales, fc2_b, n, t2)
    wstream = jnp.concatenate([v1, v2], axis=1)
    sb = jnp.concatenate([sb1, sb2], axis=1)
    return FusedFFNStream(wstream=wstream, sb=sb, bits=bits, k=k, h=h,
                          n=n, t1=t1, t2=t2, bw=bw, kr=kr)


def vmem_bytes(stream: FusedFFNStream, c, dtype, chunk=512,
               per_tile=False):
    """Estimate of the kernel's VMEM working set for row count c: the
    double-buffered stream + x/out blocks, hidden scratch, and the
    unpack temporaries. Callers fall back to the multi-call grouped
    GEMM when this approaches the ~16 MB VMEM limit.

    per_tile: the SwiGLU kernel streams one [kr, bw] tile per grid
    step (fused_swiglu_quant) instead of the whole expert, and unpacks
    the full tile at once."""
    isize = jnp.dtype(dtype).itemsize
    pack = 2 if stream.bits == 4 else 1
    sub = 16 if dtype == jnp.bfloat16 else 8
    cp = -(-c // sub) * sub
    xw = pack * stream.kr
    t = 1 if per_tile else stream.t1 + stream.t2
    # Mosaic never materializes the whole [kr, chunk] unpack temporary:
    # an AOT compile matrix (benchmarks/aot_vmem_probe.py, v5e libtpu)
    # shows identical compile outcomes for chunk 512/1024/2048 at every
    # row count, so the temp term is capped at 512 columns — an
    # uncapped term would spuriously reject the (measured-faster)
    # whole-tile chunks and push callers onto the two-call path.
    unpack_cols = stream.bw if per_tile else min(chunk, 512)
    out_cols = stream.bw if per_tile else stream.t2 * stream.bw
    return (2 * t * stream.kr * stream.bw            # weight stream x2
            + 2 * t * 2 * stream.bw * 4              # sb x2
            + 2 * cp * xw * isize                    # x block x2
            + 2 * cp * out_cols * isize              # out block x2
            + cp * xw * isize                        # hidden scratch
            + unpack_cols * stream.kr * (4 + 2 * pack))  # unpack temps


def _fused_kernel(counts_ref, x_ref, w_ref, sb_ref, o_ref, h_sc, *,
                  bits, t1, t2, bw, chunk, act, out_dtype):
    e = pl.program_id(0)
    count = counts_ref[e]
    nch = bw // chunk

    def do_tile(t, src, emit):
        # f32 accumulate + scale + bias; the emitters apply the
        # activation (still in f32 — Mosaic rejects some
        # transcendental lowerings on bf16 vectors) and cast at store
        for j in range(nch):
            q = _unpack(w_ref[0, t, :, j * chunk:(j + 1) * chunk], bits)
            acc = jnp.dot(src, q, preferred_element_type=jnp.float32)
            y = acc * sb_ref[0, t, 0, pl.ds(j * chunk, chunk)][None, :]
            y = y + sb_ref[0, t, 1, pl.ds(j * chunk, chunk)][None, :]
            emit(t * bw + j * chunk, y)

    @pl.when(count > 0)
    def _fc1():
        for t in range(t1):
            do_tile(t, x_ref[0],
                    lambda off, y: h_sc.__setitem__(
                        (slice(None), pl.ds(off, chunk)),
                        act(y).astype(h_sc.dtype)))

    @pl.when(count <= 0)
    def _empty():
        h_sc[...] = jnp.zeros_like(h_sc)

    for t in range(t1, t1 + t2):
        do_tile(t, h_sc[...],
                lambda off, y: o_ref.__setitem__(
                    (0, slice(None), pl.ds(off - t1 * bw, chunk)),
                    y.astype(out_dtype)))


def fused_ffn_quant(x, stream: FusedFFNStream, counts=None,
                    activation_fn=jax.nn.gelu, interpret=False,
                    chunk=None):
    """out[e] = act(x[e] @ W1[e] * s1 + b1) @ W2[e] * s2 + b2, one kernel.

    x: [E, C, K]; counts [E] live rows per expert (None = all).
    Returns [E, C, N] in x.dtype. See module doc for invalid-row
    semantics.
    """
    e, c, k = x.shape
    assert k == stream.k, (x.shape, stream.k)
    assert e == stream.wstream.shape[0]
    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    counts = counts.astype(jnp.int32)

    bits, kr, bw = stream.bits, stream.kr, stream.bw
    t1, t2 = stream.t1, stream.t2
    pack = 2 if bits == 4 else 1
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    cp = -(-c // sub) * sub
    xp = _relayout_x(x, bits, kr, cp)
    xw = pack * kr

    # chunk=1024 measured fastest for the bf16-dot kernel on v5e at the
    # north-star config (0.775 ms vs 0.800 at 512 — loop-differenced;
    # benchmarks/bench_fused_kernel.py). VMEM use is chunk-independent
    # (see vmem_bytes calibration note).
    chunk = chunk or int(os.environ.get("TUTEL_TPU_FUSED_CHUNK", "0")) \
        or min(bw, 1024)
    if bw % chunk:
        chunk = min(bw, 512)
    kernel = functools.partial(
        _fused_kernel, bits=bits, t1=t1, t2=t2, bw=bw, chunk=chunk,
        act=activation_fn, out_dtype=x.dtype)
    flops = 2 * e * cp * (k * stream.h + stream.h * stream.n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e,),
            in_specs=[
                pl.BlockSpec((1, cp, xw), lambda e, cnt: (e, 0, 0)),
                pl.BlockSpec((1, t1 + t2, kr, bw),
                             lambda e, cnt: (e, 0, 0, 0)),
                pl.BlockSpec((1, t1 + t2, 2, bw),
                             lambda e, cnt: (e, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, cp, t2 * bw),
                                   lambda e, cnt: (e, 0, 0)),
            scratch_shapes=[pltpu.VMEM((cp, xw), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((e, cp, t2 * bw), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + stream.wstream.size + e * cp * t2 * bw * x.dtype.itemsize,
            transcendentals=e * cp * stream.h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts, xp, stream.wstream, stream.sb)
    return out[:, :c, :stream.n]


def _unpack_i8(wq, bits):
    """[kr, bw] packed tile -> [pack*kr, bw] int8 (split-half order).
    The int32 domain is required for the shifts (Mosaic rejects i8/i16
    shifts); each half is cast to int8 BEFORE the concat so the
    temporary is 1 byte/elem."""
    if bits == 4:
        v = wq.astype(jnp.int32)
        return jnp.concatenate([((v << 28) >> 28).astype(jnp.int8),
                                (v >> 4).astype(jnp.int8)], axis=0)
    return wq


def _fused_w8a8_kernel(counts_ref, xq_ref, sx_ref, w_ref, sb_ref, o_ref,
                       h_sc, hq_sc, ss_sc, *, bits, t1, t2, bw, chunk,
                       act, out_dtype):
    e = pl.program_id(0)
    count = counts_ref[e]
    nch = bw // chunk

    @pl.when(count > 0)
    def _fc1():
        sx = sx_ref[0, :, 0]                       # [cp] f32 row scales
        for t in range(t1):
            for j in range(nch):
                q = _unpack_i8(
                    w_ref[0, t, :, j * chunk:(j + 1) * chunk], bits)
                acc = jnp.dot(xq_ref[0], q,
                              preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * sx[:, None] \
                    * sb_ref[0, t, 0, pl.ds(j * chunk, chunk)][None, :] \
                    + sb_ref[0, t, 1, pl.ds(j * chunk, chunk)][None, :]
                h_sc[:, pl.ds(t * bw + j * chunk, chunk)] = act(y)

    @pl.when(count <= 0)
    def _empty():
        h_sc[...] = jnp.zeros_like(h_sc)

    # Re-quantize the hidden state IN VMEM (per-row symmetric absmax ->
    # int8 + f32 row scale) so fc2 also runs on the integer MXU; the
    # f32 hidden never touches HBM.
    h = h_sc[...]
    absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    sxh = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    hq_sc[...] = jnp.clip(jnp.round(h / sxh), -128, 127).astype(jnp.int8)
    ss_sc[...] = jnp.broadcast_to(sxh, ss_sc.shape)

    for t in range(t1, t1 + t2):
        for j in range(nch):
            q = _unpack_i8(w_ref[0, t, :, j * chunk:(j + 1) * chunk],
                           bits)
            acc = jnp.dot(hq_sc[...], q, preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * ss_sc[:, :1] \
                * sb_ref[0, t, 0, pl.ds(j * chunk, chunk)][None, :] \
                + sb_ref[0, t, 1, pl.ds(j * chunk, chunk)][None, :]
            o_ref[0, :, pl.ds((t - t1) * bw + j * chunk, chunk)] = \
                y.astype(out_dtype)


def vmem_bytes_w8a8(stream: FusedFFNStream, c, dtype, chunk=512):
    """VMEM working-set estimate for fused_ffn_w8a8: double-buffered
    stream + int8 x / f32 out blocks, the f32 + int8 hidden scratches,
    the row-scale scratch, and the in-kernel unpack temporaries
    (capped at 512 columns — Mosaic tiles the unpack internally; see
    the calibration note in vmem_bytes)."""
    isize = jnp.dtype(dtype).itemsize
    pack = 2 if stream.bits == 4 else 1
    cp = -(-c // 32) * 32                        # int8 sublane multiple
    xw = pack * stream.kr
    t = stream.t1 + stream.t2
    return (2 * t * stream.kr * stream.bw        # weight stream x2
            + 2 * t * 2 * stream.bw * 4          # sb x2
            + 2 * cp * xw                        # int8 x block x2
            + 2 * cp * 128 * 4                   # sx block x2 (lane-pad)
            + 2 * cp * stream.t2 * stream.bw * isize   # out block x2
            + cp * xw * 4                        # f32 hidden scratch
            + cp * xw                            # int8 hidden scratch
            + cp * 128 * 4                       # row-scale scratch
            + stream.kr * min(chunk, 512) * (4 + 2 * pack))  # unpack temps


def fused_ffn_w8a8(x, stream: FusedFFNStream, counts=None,
                   activation_fn=jax.nn.gelu, interpret=False,
                   chunk=None):
    """Whole-expert fused FFN with BOTH contractions on the integer MXU
    (W8A8 / W4A8): activations are quantized per row to int8 outside
    the kernel, the INT4/INT8 weight stream is unpacked to int8 (not
    bf16) inside it, dots accumulate in int32, results are rescaled by
    the rank-1 product of row and output-channel scales, and the hidden
    is re-quantized in VMEM between fc1 and fc2. This removes the
    per-byte weight dequant-to-bf16 from the stream's critical path —
    the route past the weight-only kernels' dequant-bound roofline (no
    reference counterpart; the reference's megablocks grouped GEMM is
    fp-only, reference tutel/custom/custom_kernel.cpp:874-889).

    Same row semantics and signature as fused_ffn_quant. Inference-only.
    """
    e, c, k = x.shape
    assert k == stream.k, (x.shape, stream.k)
    assert e == stream.wstream.shape[0]
    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    counts = counts.astype(jnp.int32)

    bits, kr, bw = stream.bits, stream.kr, stream.bw
    t1, t2 = stream.t1, stream.t2
    pack = 2 if bits == 4 else 1
    cp = -(-c // 32) * 32                        # int8 sublane multiple
    from .w8a8_pallas import quantize_activations
    xq, sx = quantize_activations(x)             # int8, f32 [E, C, 1]
    xq = _relayout_x(xq, bits, kr, cp)
    if cp > c:
        sx = jnp.pad(sx, ((0, 0), (0, cp - c), (0, 0)),
                     constant_values=1.0)
    xw = pack * kr

    # whole-tile chunks measured fastest for the integer-dot kernel on
    # v5e (0.772 ms at chunk=2048 vs 0.791 at 512, loop-differenced —
    # benchmarks/bench_fused_kernel.py); VMEM use is chunk-independent
    # (see vmem_bytes calibration note).
    chunk = chunk or int(os.environ.get("TUTEL_TPU_FUSED_CHUNK", "0")) \
        or min(bw, 2048)
    if bw % chunk:
        chunk = min(bw, 512)
    kernel = functools.partial(
        _fused_w8a8_kernel, bits=bits, t1=t1, t2=t2, bw=bw, chunk=chunk,
        act=activation_fn, out_dtype=x.dtype)
    flops = 2 * e * cp * (k * stream.h + stream.h * stream.n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e,),
            in_specs=[
                pl.BlockSpec((1, cp, xw), lambda e, cnt: (e, 0, 0)),
                pl.BlockSpec((1, cp, 1), lambda e, cnt: (e, 0, 0)),
                pl.BlockSpec((1, t1 + t2, kr, bw),
                             lambda e, cnt: (e, 0, 0, 0)),
                pl.BlockSpec((1, t1 + t2, 2, bw),
                             lambda e, cnt: (e, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, cp, t2 * bw),
                                   lambda e, cnt: (e, 0, 0)),
            scratch_shapes=[pltpu.VMEM((cp, xw), jnp.float32),
                            pltpu.VMEM((cp, xw), jnp.int8),
                            pltpu.VMEM((cp, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((e, cp, t2 * bw), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xq.size + stream.wstream.size
            + e * cp * t2 * bw * x.dtype.itemsize,
            transcendentals=e * cp * stream.h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts, xq, sx, stream.wstream, stream.sb)
    return out[:, :c, :stream.n]


def prepare_fused_swiglu(w1: QuantizedWeight, w2: QuantizedWeight,
                         w3: QuantizedWeight, bw=None):
    """Phase-packed stream for a SwiGLU expert (experts/llama_ffn.py):
    out = (act(x@W1) * (x@W2)) @ W3, W1/W2 [E, K, H], W3 [E, H, N].

    Tiles: t1 W1-tiles, then t1 W2-tiles, then t2 W3-tiles. Unlike the
    two-layer stream this one is streamed per-tile (grid (E, T)) — the
    whole-expert block would be kr*(2H+N) bytes, past the VMEM budget
    at production sizes — which still removes the three pipeline
    drains and the two [E, C, H] HBM round-trips of the three-call path.
    Returns None when the shapes don't qualify (caller falls back).
    """
    qs = (w1, w2, w3)
    if any(not isinstance(q, QuantizedWeight) for q in qs):
        return None
    bits = w1.bits
    if any(q.bits != bits or q.blocks != 1 for q in qs):
        return None
    e, k, h = w1.shape
    if w2.shape != (e, k, h):
        return None
    e3, h3, n = w3.shape
    if e3 != e or h3 != h or h < k:
        return None
    kr = w3.values.shape[1]        # packed rows of W3 (H or H/2) == max
    if bw is None:
        for cand in (2048, 1024, 512, 256, 128):
            if h % cand == 0 and 2 * kr * cand <= 12 * 1024 * 1024:
                bw = cand
                break
        else:
            return None
    if h % bw or 2 * kr * bw > 12 * 1024 * 1024:
        return None
    t1 = h // bw
    t2 = -(-n // bw)

    def tile_cols(q, ncols, nt):
        v, s = q.values, jnp.broadcast_to(
            q.scales.astype(jnp.float32), (e, 1, ncols))
        pad = nt * bw - ncols
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
            s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)))
        if v.shape[1] < kr:
            v = jnp.pad(v, ((0, 0), (0, kr - v.shape[1]), (0, 0)))
        v = v.reshape(e, kr, nt, bw).transpose(0, 2, 1, 3)
        s = jnp.concatenate([s, jnp.zeros_like(s)], axis=1)
        s = s.reshape(e, 2, nt, bw).transpose(0, 2, 1, 3)
        return v, s

    parts = [tile_cols(w1, h, t1), tile_cols(w2, h, t1),
             tile_cols(w3, n, t2)]
    wstream = jnp.concatenate([p[0] for p in parts], axis=1)
    sb = jnp.concatenate([p[1] for p in parts], axis=1)
    return FusedFFNStream(wstream=wstream, sb=sb, bits=bits, k=k, h=h,
                          n=n, t1=t1, t2=t2, bw=bw, kr=kr)


def _unpack(wq, bits):
    """[kr, bw] int8 tile -> [pack*kr, bw] bf16 (split-half order)."""
    if bits == 4:
        v = wq.astype(jnp.int32)
        return jnp.concatenate([(v << 28) >> 28, v >> 4],
                               axis=0).astype(jnp.bfloat16)
    return wq.astype(jnp.bfloat16)


def _relayout_x(x, bits, kr, cp):
    """Lay [E, C, K] activations out to match the unpacked weight row
    order — split-half halves each zero-padded from Kq to Kr (identity
    when K == H) — and pad rows to the cp sublane multiple."""
    e, c, k = x.shape
    pack = 2 if bits == 4 else 1
    kq = k // pack
    if kr > kq:
        if bits == 4:
            z = jnp.zeros((e, c, kr - kq), x.dtype)
            xp = jnp.concatenate([x[:, :, :kq], z, x[:, :, kq:], z],
                                 axis=2)
        else:
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, kr - k)))
    else:
        xp = x
    if cp > c:
        xp = jnp.pad(xp, ((0, 0), (0, cp - c), (0, 0)))
    return xp


def _swiglu_kernel(counts_ref, x_ref, w_ref, sb_ref, o_ref, h_sc, *,
                   bits, t1, bw, act, out_dtype):
    e = pl.program_id(0)
    t = pl.program_id(1)
    count = counts_ref[e]

    def dot_tile(src):
        # f32 accumulate + scale; activation/product also run in f32
        # (Mosaic rejects some transcendental lowerings on bf16 vectors)
        q = _unpack(w_ref[0, 0], bits)
        acc = jnp.dot(src, q, preferred_element_type=jnp.float32)
        return acc * sb_ref[0, 0, 0, :][None, :]

    @pl.when((t < t1) & (count > 0))
    def _w1():
        h_sc[:, pl.ds(t * bw, bw)] = act(dot_tile(x_ref[0])).astype(
            h_sc.dtype)

    @pl.when((t >= t1) & (t < 2 * t1) & (count > 0))
    def _w2():
        off = (t - t1) * bw
        cur = h_sc[:, pl.ds(off, bw)].astype(jnp.float32)
        h_sc[:, pl.ds(off, bw)] = (cur * dot_tile(x_ref[0])).astype(
            h_sc.dtype)

    @pl.when((t == 0) & (count <= 0))
    def _empty():
        h_sc[...] = jnp.zeros_like(h_sc)

    @pl.when(t >= 2 * t1)
    def _w3():
        o_ref[0] = dot_tile(h_sc[...]).astype(out_dtype)


def fused_swiglu_quant(x, stream: FusedFFNStream, counts=None,
                       activation_fn=jax.nn.silu, interpret=False):
    """out[e] = (act(x@W1)*(x@W2)) @ W3 in one kernel over the
    prepare_fused_swiglu stream. Same row semantics as fused_ffn_quant
    (no biases — the Llama expert has none)."""
    e, c, k = x.shape
    assert k == stream.k and e == stream.wstream.shape[0]
    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    counts = counts.astype(jnp.int32)

    bits, kr, bw = stream.bits, stream.kr, stream.bw
    t1, t2 = stream.t1, stream.t2
    pack = 2 if bits == 4 else 1
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    cp = -(-c // sub) * sub
    xp = _relayout_x(x, bits, kr, cp)
    xw = pack * kr

    kernel = functools.partial(
        _swiglu_kernel, bits=bits, t1=t1, bw=bw, act=activation_fn,
        out_dtype=x.dtype)
    t = 2 * t1 + t2
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e, t),
            in_specs=[
                pl.BlockSpec((1, cp, xw), lambda e, t, cnt: (e, 0, 0)),
                pl.BlockSpec((1, 1, kr, bw),
                             lambda e, t, cnt: (e, t, 0, 0)),
                pl.BlockSpec((1, 1, 2, bw),
                             lambda e, t, cnt: (e, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, cp, bw),
                lambda e, t, cnt: (e, 0, jnp.maximum(t - 2 * t1, 0))),
            scratch_shapes=[pltpu.VMEM((cp, xw), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((e, cp, t2 * bw), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * cp * (2 * k * stream.h + stream.h * stream.n),
            bytes_accessed=xp.size * xp.dtype.itemsize
            + stream.wstream.size + e * cp * t2 * bw * x.dtype.itemsize,
            transcendentals=e * cp * stream.h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(counts, xp, stream.wstream, stream.sb)
    return out[:, :c, :stream.n]


def prepare_fused_ffn_params(params, bw=None):
    """Attach a fused stream to an expert param dict holding quantized
    fc1_w/fc2_w (as produced by quant.quantize_expert_params). Returns
    a new dict with a "fused_stream" entry (or the dict unchanged when
    the shapes don't qualify)."""
    if "w1" in params and "w3" in params:
        st = prepare_fused_swiglu(params.get("w1"), params.get("w2"),
                                  params.get("w3"), bw=bw)
    else:
        st = prepare_fused_ffn(params.get("fc1_w"), params.get("fc2_w"),
                               params.get("fc1_b"), params.get("fc2_b"),
                               bw=bw)
    if st is None:
        return params
    out = dict(params)
    out["fused_stream"] = st
    return out
