"""Collective-communication facade (reference: tutel/net.py:6-12,
tutel/impls/communicate.py:173-632).

On TPU there is no NCCL bootstrap, no dedicated comm stream and no autograd
wrapper zoo: collectives are `jax.lax` primitives used inside `shard_map`,
differentiable by construction, scheduled/overlapped by XLA, and mapped onto
ICI/DCN by the mesh. This module keeps the reference's *calling conventions*
(dim-to-dim all_to_all, zero_gather/zero_scatter flatten-pad helpers) so a
reference user finds the same vocabulary.

All functions here must be called inside a `shard_map`-mapped function, with
`axis` the mesh axis name (or tuple of names, major-to-minor) to communicate
over.
"""

import jax
import jax.numpy as jnp
from jax import lax


def get_world_size(mesh_or_axis=None):
    """Total devices of a Mesh (or 1 when None)."""
    if mesh_or_axis is None:
        return 1
    size = getattr(mesh_or_axis, "size", None)
    return int(size) if size is not None else 1


# ---------------------------------------------------------------------------
# Simple collectives (no special backward; JAX differentiates them natively)
# ---------------------------------------------------------------------------

def simple_all_reduce(x, axis, op="sum"):
    """reference communicate.py:173-179."""
    if op == "sum":
        return lax.psum(x, axis)
    if op == "max":
        return lax.pmax(x, axis)
    if op == "min":
        return lax.pmin(x, axis)
    raise ValueError(f"unsupported reduce op: {op}")


def simple_all_to_all(x, axis):
    """Flat all-to-all over dim 0 (reference communicate.py:181-192)."""
    return lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=True)


def simple_split(x, axis, dim=0):
    """Keep this device's slice of dim (reference communicate.py:194-200)."""
    idx = lax.axis_index(axis)
    size = lax.axis_size(axis)
    assert x.shape[dim] % size == 0
    chunk = x.shape[dim] // size
    return lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=dim)


def simple_reduce_scatter(x, axis, dim=0):
    """reference communicate.py:202-213."""
    return lax.psum_scatter(x, axis, scatter_dimension=dim, tiled=True)


def simple_all_gather(x, axis, dim=0):
    """reference communicate.py:215-223."""
    return lax.all_gather(x, axis, axis=dim, tiled=True)


# ---------------------------------------------------------------------------
# Dim-to-dim all_to_all (the reference's PrimAllToAll.transform signature,
# communicate.py:447-503): scatter `input_dim`, gather `output_dim`.
# ---------------------------------------------------------------------------

def all_to_all(x, input_dim, output_dim, axis):
    """Tutel-convention a2a: `all_to_all(y, 1, 0)` turns a per-device
    [E_global, C, M] into [E_local, W*C, M] and `(0, 1)` reverses it.

    Maps onto lax.all_to_all(split_axis=output_dim, concat_axis=input_dim,
    tiled=True) — validated element-for-element against the reference's
    chunk/concat ordering.
    """
    if input_dim == output_dim:
        return x
    return lax.all_to_all(x, axis, split_axis=output_dim,
                          concat_axis=input_dim, tiled=True)


def all_to_all_2dh(x, input_dim, output_dim, outer_axis, inner_axis):
    """Hierarchical 2DH all-to-all (reference custom_kernel.cpp:656-738,
    PrimAllToAll2D communicate.py:412-430).

    Element-identical to the flat a2a over the tuple axis
    (outer, inner) — verified against `all_to_all(x, ..., (outer, inner))` —
    but decomposed into a local row-block transpose (the reference's
    memStrideCopyKernel), an intra-slice (ICI/inner) exchange, and an
    inter-host (DCN/outer) exchange, so each phase's traffic rides one
    fabric tier. Supports the MoE hot-path patterns (1, 0) and (0, 1).
    """
    if input_dim == output_dim:
        return x
    outer = lax.axis_size(outer_axis)
    inner = lax.axis_size(inner_axis)
    w = outer * inner
    if w == 1:
        return x
    if (input_dim, output_dim) == (1, 0):
        # Rows of dim 0 are grouped by flat destination (outer-major);
        # regroup inner-major so the intra-slice phase exchanges whole
        # inner-destination blocks, then the inter-host phase finishes.
        d0 = x.shape[0]
        xs = x.reshape(outer, inner, d0 // w, *x.shape[1:])
        xs = xs.swapaxes(0, 1).reshape(d0, *x.shape[1:])
        y = lax.all_to_all(xs, inner_axis, split_axis=0, concat_axis=1,
                           tiled=True)
        return lax.all_to_all(y, outer_axis, split_axis=0, concat_axis=1,
                              tiled=True)
    if (input_dim, output_dim) == (0, 1):
        # Exact inverse of the (1, 0) path: undo outer, undo inner, undo
        # the row-block transpose.
        z = lax.all_to_all(x, outer_axis, split_axis=1, concat_axis=0,
                           tiled=True)
        z = lax.all_to_all(z, inner_axis, split_axis=1, concat_axis=0,
                           tiled=True)
        d0 = z.shape[0]
        zs = z.reshape(inner, outer, d0 // w, *z.shape[1:])
        return zs.swapaxes(0, 1).reshape(d0, *z.shape[1:])
    raise NotImplementedError(
        "2DH all-to-all supports (input_dim, output_dim) in "
        "{(1, 0), (0, 1)}; got (%s, %s)" % (input_dim, output_dim))


# ---------------------------------------------------------------------------
# ZeRO-style flatten-pad gather/scatter (reference communicate.py:566-586)
# ---------------------------------------------------------------------------

def zero_gather(x, axis, full_shape=None):
    """All-gather a flat shard and reshape to the full parameter shape."""
    size = lax.axis_size(axis)
    if full_shape is None:
        full_shape = (x.shape[0] * size,) + tuple(x.shape[1:])
    numel = 1
    for d in full_shape:
        numel *= int(d)
    flat = lax.all_gather(x.reshape(-1), axis, axis=0, tiled=True)
    return flat[:numel].reshape(full_shape)


def zero_shard_shape(full_shape, world_size):
    """Per-device flat shard length for a parameter of `full_shape`."""
    numel = 1
    for d in full_shape:
        numel *= int(d)
    return (numel + world_size - 1) // world_size


def spatial_split(x, axis, dim=0):
    """reference communicate.py:589-604."""
    return simple_split(x, axis, dim=dim)
