"""Pallas row-gather kernel for MoE dispatch.

All four dispatch directions (encode fwd/bwd, decode fwd/bwd,
ops/dispatch.py) are "gather rows by index with sentinel->zero". XLA's
gather runs this at roughly half of HBM peak on the profiled shapes
(~378 GB/s on v5e for [32768 rows, 2048] bf16); this kernel streams
explicit per-row DMAs instead (the TPU analogue of the reference's
one-thread-block-per-row CUDA dispatch kernels, reference
jit_kernels/sparse.py:24-34).

Design (v2 — the round-1 kernel was *slower* than XLA because it paid a
scalar-core wait loop per row):

  * all `bm` row DMAs of a tile share ONE completion semaphore; TPU DMA
    semaphores count *bytes*, so a single wait for the full tile's byte
    count retires every row copy — the scalar core does one issue loop
    (clamped index + unconditional start, no branches) and one wait;
  * sentinel indices (>= n_src, the dropped-token guard) are clamped to a
    valid row so the byte count stays uniform, then zeroed after the wait
    with one vectorized masked multiply — executed only when the tile
    actually contains sentinels (a scalar count from the issue loop);
  * the grid pipelines output tiles, so tile t+1's gather DMAs overlap
    tile t's write-back.

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


def _gather_rows_kernel(idx_smem, x_hbm, o_ref, zeros, sem, *, bm, n_src):
    t = pl.program_id(0)
    base = t * bm

    @pl.when(t == 0)
    def _init_zeros():
        zeros[:] = jnp.zeros_like(zeros)

    def issue(i, carry):
        src = idx_smem[base + i]

        @pl.when(src < n_src)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(src, 1)],
                o_ref.at[pl.ds(i, 1)],
                sem,
            ).start()

        @pl.when(src >= n_src)
        def _():
            # sentinel (dropped slot): a same-size VMEM->VMEM copy keeps
            # the tile's completion byte count uniform
            pltpu.make_async_copy(
                zeros,
                o_ref.at[pl.ds(i, 1)],
                sem,
            ).start()

        return carry

    lax.fori_loop(0, bm, issue, 0)
    # One wait retires all bm row copies: DMA semaphores count bytes and
    # this descriptor's byte count is exactly bm rows.
    pltpu.make_async_copy(x_hbm.at[pl.ds(0, bm)], o_ref, sem).wait()


def gather_rows(x, idx, *, bm=512, interpret=False):
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
    idx = idx.astype(jnp.int32)

    kernel = functools.partial(_gather_rows_kernel, bm=bm, n_src=s)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_rows // bm,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bm, sub, 128),
                                   lambda t, idx_ref: (t, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, sub, 128), x.dtype),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((np_rows, sub, 128), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * np_rows * m * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(idx, x3)
    out = out.reshape(np_rows, m)
    return out[:n] if pad else out
