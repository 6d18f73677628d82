"""Fused KV-cache row writer: one kernel per decode step, not 4L scatters.

The decode step writes one row (position pos[b], per batch row b) into
each layer's K and V cache — tiny data (~64 KB per tensor) — but the
XLA scatter lowering of `.at[rows, pos].set` measured ~20 ms of the
53.9 ms kv8 decode chunk at the 2k-window serving config (37% of the
chunk for 0.006% of its bytes; docs/RESULTS.md round-4b,
benchmarks/bench_cache_write.py isolates the pattern). This kernel
replaces a step's writes with ONE grid-() pallas_call whose body
batches every row's window DMA (an internal fori_loop over rows
issues all transfers back-to-back before waiting).

Mosaic cannot express a 1-row dynamic slice of a tiled memref (row
granularity breaks the (sublane, lane) tiling), so the kernel is a
read-modify-write at the smallest tile-aligned window: DMA the 8-row
window containing pos[b] into VMEM scratch, select the fresh row in
at sublane pos[b] % 8 (one VPU select), DMA the window back. Scale
columns ([B, kvh, T] with the position on the LANE dim) ride the same
kernel with a 128-lane window. Per step that is 2 small DMAs per
(tensor, row) — ~8 KB value / ~4 KB scale traffic each — instead of a
scatter op per tensor; `input_output_aliases` keeps every cache in
place, and blocks not visited are untouched HBM.

The fresh rows enter as [B, 1, D] auto-blocked VMEM inputs (a (1, D)
block equals the trailing array dims, the one block shape Mosaic
allows at row granularity), so Mosaic double-buffers them across grid
steps; only the cache windows are manual DMAs.

Capability analogue: the reference's decode path updates its caches
inside its fused CUDA kernels (reference tutel/custom/custom_kernel.cpp
forward dispatchers); re-designed here as a Mosaic RMW-window kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WROW = 8     # row-window: multiple of every sublane tile (f32/bf16 8,
              # int8 4 at the HBM tiling Mosaic assigns)
_WCOL = 128   # lane-window: lane tiles are always 128


def _rmw_kernel(pos_ref, *refs, n_r, n_c, nb):
    # operand layout (after the scalar-prefetched pos):
    #   inputs:  n_r row-caches [B,T,D] (HBM, aliased, read via DMA),
    #            n_c col-caches [B,H,T] (HBM, aliased, read via DMA),
    #            pos again as a VMEM [B,1] vector (for the selects),
    #            n_r fresh rows [B,D] (VMEM, whole array),
    #            n_c fresh cols [B,H] (VMEM, whole array)
    #   outputs: n_r + n_c caches (HBM, same buffers)
    #   scratch: per-tensor [B, W, ...] VMEM windows + one DMA
    #            semaphore each
    # ALL rows' window transfers are in flight together (64 x n small
    # DMAs issued back-to-back, ~40 ns each to issue), so the kernel
    # pays ~one DMA completion latency per phase instead of one per
    # row — the per-row pipelined variant measured ~270 us/step at
    # the serving config; this batched form is bounded by issue cost
    # + 2 latencies + the (tiny) window bandwidth.
    n = n_r + n_c
    caches = refs[:n]
    posv = refs[n]
    fresh = refs[n + 1:n + 1 + n]
    outs = refs[n + 1 + n:n + 1 + 2 * n]
    scratch = refs[n + 1 + 2 * n:n + 1 + 3 * n]
    sems = refs[n + 1 + 3 * n:]

    def row_cp(i, bi, dst_cache=None):
        p = pos_ref[bi]
        w0 = (p // _WROW) * _WROW
        win = (caches[i] if dst_cache is None else outs[i]
               ).at[bi, pl.ds(w0, _WROW)]
        s = scratch[i].at[bi]
        return pltpu.make_async_copy(
            *((win, s) if dst_cache is None else (s, win)), sems[i])

    def col_cp(i, bi, dst_cache=None):
        p = pos_ref[bi]
        w0 = (p // _WCOL) * _WCOL
        win = (caches[i] if dst_cache is None else outs[i]
               ).at[bi, slice(None), pl.ds(w0, _WCOL)]
        s = scratch[i].at[bi]
        return pltpu.make_async_copy(
            *((win, s) if dst_cache is None else (s, win)), sems[i])

    cps = [row_cp if i < n_r else col_cp for i in range(n)]

    def phase(write_back):
        def start_body(bi, _):
            for i in range(n):
                cps[i](i, bi, dst_cache=write_back or None).start()
            return 0

        def wait_body(bi, _):
            for i in range(n):
                cps[i](i, bi, dst_cache=write_back or None).wait()
            return 0

        jax.lax.fori_loop(0, nb, start_body, 0)
        jax.lax.fori_loop(0, nb, wait_body, 0)

    phase(write_back=False)

    # select the fresh rows / columns into the windows (one vectorized
    # VPU select per tensor, all batch rows at once). Masks and
    # operands broadcast to the 3D window shape via explicit
    # lax.broadcast_in_dim — Mosaic rejects the trailing-1 reshapes
    # that jnp's None-indexing would introduce.
    pv = posv[...].astype(jnp.int32)                      # [B, 1]

    def b3(x, shape, dims):
        return jax.lax.broadcast_in_dim(x, shape, dims)

    for i in range(n_r):
        shp = scratch[i].shape                            # [B, W, D]
        r = b3(pv % _WROW, shp, (0, 1))                   # over W
        hit = jax.lax.broadcasted_iota(jnp.int32, shp, 1) == r
        scratch[i][...] = jnp.where(
            hit, b3(fresh[i][...], shp, (0, 2)), scratch[i][...])
    for j in range(n_c):
        i = n_r + j
        shp = scratch[i].shape                            # [B, H, W]
        r = b3(pv % _WCOL, shp, (0, 2))                   # over lanes
        hit = jax.lax.broadcasted_iota(jnp.int32, shp, 2) == r
        scratch[i][...] = jnp.where(
            hit, b3(fresh[i][...], shp, (0, 1)), scratch[i][...])

    phase(write_back=True)


def step_vmem_bytes(row_caches, col_caches=()):
    """Scratch bytes write_step allocates: a [B, W, .] window per
    tensor (all batch rows resident so one vectorized select covers
    the whole batch). Callers should fall back to XLA scatters when
    this approaches the ~16 MB VMEM budget (large B x large model)."""
    total = 0
    for c in row_caches:
        total += c.shape[0] * _WROW * c.shape[2] * c.dtype.itemsize
    for c in col_caches:
        total += c.shape[0] * c.shape[1] * _WCOL * c.dtype.itemsize
    return total


def write_step(row_caches, rows, pos, col_caches=(), cols=(), *,
               interpret=False):
    """One decode step's cache writes, fused into a single kernel.

    row_caches[i][b, pos[b], :] = rows[i][b]   ([B, T, D_i] caches)
    col_caches[j][b, :, pos[b]] = cols[j][b]   ([B, H_j, T] caches)

    D_i must be lane-aligned (128 x itemsize-granular windows); T must
    be a multiple of 128 (the lane window of the column caches — the
    same bound the quantized decode-attn kernel already imposes).
    Returns (new_row_caches, new_col_caches); buffers are aliased so a
    donating jit updates every cache in place.
    """
    row_caches, rows = list(row_caches), list(rows)
    col_caches, cols = list(col_caches), list(cols)
    n_r, n_c = len(row_caches), len(col_caches)
    assert n_r == len(rows) and n_c == len(cols)
    assert n_r + n_c > 0
    b = (row_caches[0] if n_r else col_caches[0]).shape[0]
    for c, r in zip(row_caches, rows):
        assert c.ndim == 3 and c.shape[0] == b, c.shape
        assert c.shape[1] % _WROW == 0, c.shape
        assert r.shape == (b, c.shape[2]) and r.dtype == c.dtype, (
            r.shape, c.shape, r.dtype, c.dtype)
    for c, s in zip(col_caches, cols):
        assert c.ndim == 3 and c.shape[0] == b, c.shape
        assert c.shape[2] % _WCOL == 0, c.shape
        assert s.shape == (b, c.shape[1]) and s.dtype == c.dtype, (
            s.shape, c.shape, s.dtype, c.dtype)

    kernel = functools.partial(_rmw_kernel, n_r=n_r, n_c=n_c, nb=b)
    caches = row_caches + col_caches
    fresh = rows + cols
    # memory-space note (round 5, measured): with the pre-round-5 step
    # structure (per-layer writes inside the attention dependency
    # chain), XLA's memory-space assignment bounced the aliased caches
    # through alternate memory (~3 ms/chunk of copies); pinning these
    # specs to pltpu.HBM did NOT remove the bounce — restructuring the
    # step did (fresh-token injection + one end-of-step batched write,
    # models/transformer.py). ANY is kept: the pin measured no effect
    # either way on the new structure.
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY) for _ in caches]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]        # pos vector
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in fresh]
    )
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in caches]
    out_shapes = [jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches]
    scratch = (
        [pltpu.VMEM((b, _WROW, c.shape[2]), c.dtype)
         for c in row_caches]
        + [pltpu.VMEM((b, c.shape[1], _WCOL), c.dtype)
           for c in col_caches]
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch + [pltpu.SemaphoreType.DMA] * len(caches),
        ),
        out_shape=out_shapes,
        input_output_aliases={1 + i: i for i in range(len(caches))},
        interpret=interpret,
    )(pos.astype(jnp.int32), *caches, pos.astype(jnp.int32)[:, None],
      *fresh)
    return list(out[:n_r]), list(out[n_r:])
