"""Pallas row-gather kernel for MoE dispatch.

All four dispatch directions (encode fwd/bwd, decode fwd/bwd,
ops/dispatch.py) are "gather rows by index with sentinel->zero". XLA's
gather runs this at roughly half of HBM peak on the profiled shapes; this
kernel streams explicit per-row DMAs directly into the output block
instead (the TPU analogue of the reference's one-thread-block-per-row
CUDA dispatch kernels, reference jit_kernels/sparse.py:24-34).

Mosaic constraint: single-row slices of a rank-2 tiled memref must align
to the sublane tiling, so rows are viewed rank-3 as [S, M/128, 128] —
leading dims of rank-3+ memrefs slice freely and the tiled trailing dims
stay whole. This requires M to be a multiple of 128*sublane
(2048 for bf16, 1024 for f32); `supported()` gates eligibility and
ops/dispatch.py falls back to `jnp.take` otherwise (which also remains
the executable spec; TUTEL_TPU_PALLAS_DISPATCH=0 disables).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane(dtype):
    return {1: 32, 2: 16, 4: 8}.get(jnp.dtype(dtype).itemsize, 8)


def supported(shape, dtype):
    """Can gather_rows handle [S, M] of dtype on TPU?"""
    if len(shape) != 2:
        return False
    m = shape[1]
    return m % 128 == 0 and (m // 128) % _sublane(dtype) == 0


def _gather_rows_kernel(idx_ref, x_hbm, o_ref, sems, *, bm, lanes, n_src):
    t = pl.program_id(0)
    base = t * bm

    def issue(i, carry):
        src = idx_ref[base + i]

        @pl.when(src < n_src)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(src, 1)],
                o_ref.at[pl.ds(i, 1)],
                sems.at[i],
            ).start()

        @pl.when(src >= n_src)
        def _():
            o_ref[pl.ds(i, 1)] = jnp.zeros((1,) + lanes, o_ref.dtype)

        return carry

    lax.fori_loop(0, bm, issue, 0)

    def wait(i, carry):
        src = idx_ref[base + i]

        @pl.when(src < n_src)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(src, 1)],
                o_ref.at[pl.ds(i, 1)],
                sems.at[i],
            ).wait()

        return carry

    lax.fori_loop(0, bm, wait, 0)


def gather_rows(x, idx, *, bm=256, interpret=False):
    """out[i] = x[idx[i]] with idx >= x.shape[0] yielding zeros.

    x: [S, M]; idx: [N] int32; returns [N, M] in x.dtype.
    """
    s, m = x.shape
    assert supported(x.shape, x.dtype) or interpret, (x.shape, x.dtype)
    n = idx.shape[0]
    bm = min(bm, n)
    pad = (-n) % bm
    if pad:
        idx = jnp.pad(idx, (0, pad), constant_values=s)
    np_rows = n + pad
    sub = m // 128
    x3 = x.reshape(s, sub, 128)

    kernel = functools.partial(_gather_rows_kernel, bm=bm,
                               lanes=(sub, 128), n_src=s)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_rows // bm,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bm, sub, 128),
                                   lambda t, idx_ref: (t, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((bm,))],
        ),
        out_shape=jax.ShapeDtypeStruct((np_rows, sub, 128), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * np_rows * m * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(idx.astype(jnp.int32), x3)
    out = out.reshape(np_rows, m)
    return out[:n] if pad else out
