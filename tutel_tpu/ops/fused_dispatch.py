"""Fused dispatch + expert-GEMM Pallas kernels.

The round-1 profile showed the single-device training step paying ~1.3 ms
to materialize the [E, C, M] encode buffer through XLA's row gather
(~378 GB/s) before the fc1 GEMM reads it back. This module fuses the
gather INTO the fc1 GEMM (the role of the reference's
jit_kernels/sparse.py:24-34 dispatch kernel + experts/ffn.py:114-121 fc1,
collapsed into one op):

  * `retile`: [S, M] -> [S, sub, M//sub] layout change as a Pallas kernel.
    bf16 [S, M] tiles interleave row pairs, so single-row DMA is
    impossible on the native layout; the rank-3 view stores each row as a
    contiguous (sub, lanes) face. XLA's reshape does this at ~156 GB/s
    (pure VPU shuffles); the Pallas kernel rides the DMA engine's layout
    conversion and runs at ~1.2 TB/s.
  * `encode_ffn1`: grid (E, C/bm). Each step gathers its bm token rows
    from the retiled x by per-row DMA — all rows of a tile share ONE
    completion semaphore (TPU DMA semaphores count bytes, so a single
    block-sized wait retires every row) and the issue loop for tile i+1
    overlaps tile i's MXU dot — then computes

        y1[e, i*bm:(i+1)*bm, :] = act(gathered @ w[e] + b[e])

    with f32 accumulation, and (optionally) writes the gathered rows out
    as the sorted [E, C, M] buffer. The byproduct costs one pipelined
    stream write and lets the backward reuse today's roofline XLA GEMMs
    (d_w from the sorted buffer, d_x through the decode-shaped gather),
    so training pays the row gather exactly once, hidden behind the MXU.

`fused_encode_ffn1` wraps the two kernels with a custom VJP. Single
device only (under EP the a2a sits between encode and the experts);
eligibility is gated in impls/moe_layer.py.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane(dtype):
    return {1: 32, 2: 16, 4: 8}.get(jnp.dtype(dtype).itemsize, 8)


# ---------------------------------------------------------------------------
# retile: [S, M] <-> [S, sub, M//sub]
# ---------------------------------------------------------------------------

def _retile_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(o_ref.shape)


def retile(x, *, bs=1024, interpret=False):
    """[S, M] -> [S, sub, M//sub] with contiguous per-row faces."""
    s, m = x.shape
    sub = _sublane(x.dtype)
    bs = min(bs, s)
    assert s % bs == 0 and m % (sub * 128) == 0, (x.shape, x.dtype)
    return pl.pallas_call(
        _retile_kernel,
        grid=(s // bs,),
        in_specs=[pl.BlockSpec((bs, m), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bs, sub, m // sub), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, sub, m // sub), x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# fused encode + fc1
# ---------------------------------------------------------------------------

def _encode_ffn1_kernel(inv_smem, b_ref, x3_hbm, w_hbm, y_ref, a_ref,
                        a_scr, w_scr, zeros, gsem, wsem, *, bm, sub, m,
                        n_src, n_i, relu, emit_sorted, has_bias):
    e = pl.program_id(0)
    i = pl.program_id(1)
    step = e * n_i + i
    n_steps = pl.num_programs(0) * n_i

    @pl.when(step == 0)
    def _init_zeros():
        zeros[:] = jnp.zeros_like(zeros)

    def issue_gather(tile, slot):
        base = tile * bm

        def issue(r, carry):
            src = inv_smem[base + r]

            @pl.when(src < n_src)
            def _():
                pltpu.make_async_copy(
                    x3_hbm.at[pl.ds(src, 1)],
                    a_scr.at[slot].at[pl.ds(r, 1)],
                    gsem.at[slot],
                ).start()

            @pl.when(src >= n_src)
            def _():
                pltpu.make_async_copy(
                    zeros, a_scr.at[slot].at[pl.ds(r, 1)],
                    gsem.at[slot],
                ).start()

            return carry

        lax.fori_loop(0, bm, issue, 0)

    # expert weights: one blocking DMA per expert (first i step)
    @pl.when(i == 0)
    def _load_w():
        cp = pltpu.make_async_copy(w_hbm.at[e], w_scr, wsem)
        cp.start()

    @pl.when(step == 0)
    def _warm():
        issue_gather(0, 0)

    @pl.when(step + 1 < n_steps)
    def _next():
        issue_gather(step + 1, (step + 1) % 2)

    # retire this tile's row DMAs with one byte-counted wait
    slot = step % 2
    pltpu.make_async_copy(
        x3_hbm.at[pl.ds(0, bm)], a_scr.at[slot], gsem.at[slot]).wait()

    @pl.when(i == 0)
    def _wait_w():
        pltpu.make_async_copy(w_hbm.at[e], w_scr, wsem).wait()

    a = a_scr[slot].reshape(bm, m)
    if emit_sorted:
        a_ref[0] = a
    acc = jnp.dot(a, w_scr[:], preferred_element_type=jnp.float32)
    if has_bias:
        acc = acc + b_ref[0, 0][None, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y_ref[0] = acc.astype(y_ref.dtype)


def encode_ffn1(x3, inv, w, b=None, *, capacity, bm=256, relu=True,
                emit_sorted=True, interpret=False):
    """Gather rows of x3 by inv into slot order and run fc1.

    Args:
      x3: [S, sub, M//sub] retiled tokens.
      inv: [E*C] int32 slot -> flat k-major row id (k*S + s); empty slots
        carry the sentinel K*S (ops/dispatch.py `_inverse_slot`). Values
        here are *token* ids: pass `inv % S` with the sentinel mapped to
        >= S (see `fused_encode_ffn1`).
      w: [E, M, H]; b: [E, H] or None.
      capacity: static C (E*C == inv.size).
    Returns:
      (y1 [E, C, H], sorted [E, C, M] or None)
    """
    s, sub, lanes = x3.shape
    m = sub * lanes
    e, mw, h = w.shape
    assert mw == m, (x3.shape, w.shape)
    c = capacity
    assert inv.size == e * c, (inv.shape, e, c)
    bm = min(bm, c)
    assert c % bm == 0, (c, bm)
    n_i = c // bm
    has_bias = b is not None
    if b is None:
        b = jnp.zeros((e, h), x3.dtype)
    b = b.reshape(e, 1, h)

    kernel = functools.partial(
        _encode_ffn1_kernel, bm=bm, sub=sub, m=m, n_src=s, n_i=n_i,
        relu=relu, emit_sorted=emit_sorted, has_bias=has_bias)
    flops = 2 * e * c * m * h
    out_shapes = [jax.ShapeDtypeStruct((e, c, h), x3.dtype),
                  jax.ShapeDtypeStruct((e, c, m) if emit_sorted else (1, 1, 1),
                                       x3.dtype)]
    y1, a_sorted = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e, n_i),
            in_specs=[
                pl.BlockSpec((1, 1, h), lambda e, i, inv_ref: (e, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, h), lambda e, i, inv_ref: (e, i, 0)),
                pl.BlockSpec((1, bm, m) if emit_sorted else (1, 1, 1),
                             (lambda e, i, inv_ref: (e, i, 0))
                             if emit_sorted else
                             (lambda e, i, inv_ref: (0, 0, 0))),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, bm, sub, lanes), x3.dtype),
                pltpu.VMEM((m, h), w.dtype),
                pltpu.VMEM((1, sub, lanes), x3.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=e * c * m * 2 * x3.dtype.itemsize
            + e * m * h * w.dtype.itemsize
            + e * c * h * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(inv.astype(jnp.int32), b, x3, w)
    return y1, (a_sorted if emit_sorted else None)
