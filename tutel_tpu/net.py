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
    fabric tier.

    RESTRICTION: unlike `all_to_all` (any dim pair), the hierarchical
    form implements only the MoE hot-path patterns
    (input_dim, output_dim) in {(1, 0), (0, 1)} and raises
    NotImplementedError otherwise — use the flat `all_to_all` over the
    tuple axis (outer, inner) for other dim pairs (element-identical,
    single-tier scheduling).
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


def pre_expert_permute(x, axis):
    """Local relayout between the dispatch a2a and the expert compute
    (reference communicate.py:606-613): rows arrive grouped by SOURCE
    device ([W, E_local*C, ...] flattened); regroup them expert-major so
    each local expert sees one contiguous [W*C]-row block. Pure reshape
    — no collective; `axis` is a mesh axis name (or tuple) or an int
    world size. Inverse of `post_expert_permute`."""
    w = axis if isinstance(axis, int) else lax.axis_size(axis)
    if w == 1:
        return x
    y = x.reshape(w, x.shape[0] // w, *x.shape[1:])
    y = jnp.swapaxes(y, 0, 1)
    return y.reshape(y.shape[0], -1, *x.shape[2:])


def post_expert_permute(x, axis):
    """Inverse of `pre_expert_permute` (reference
    communicate.py:615-622): expert-major rows back to source-major for
    the combine a2a."""
    w = axis if isinstance(axis, int) else lax.axis_size(axis)
    if w == 1:
        return x
    y = x.reshape(x.shape[0], w, x.shape[1] // w, *x.shape[2:])
    y = jnp.swapaxes(y, 0, 1)
    return y.reshape(-1, *y.shape[2:])


# ---------------------------------------------------------------------------
# Variable-length collectives (reference communicate.py:225-255 wrapping
# custom_kernel.cpp:463-518 batch_all_to_all_v / batch_all_gather_v).
# On TPU these ride `lax.ragged_all_to_all` / all_gather; XLA needs a static
# output capacity, so callers pass `output_size` (a bucketed upper bound —
# dropless EP uses the same alignment-bucket trick as the MoE layer).
# ---------------------------------------------------------------------------

def batch_all_to_all_v(tensors, send_counts, axis, output_size=None,
                       native=None):
    """Exchange variable-length row blocks of one or more tensors.

    Args:
      tensors: one array or a list of arrays [N, ...] sharing the same row
        partitioning; rows are grouped by destination device (device d gets
        rows sum(counts[:d]) : sum(counts[:d+1])).
      send_counts: [W] int32 rows destined to each peer.
      axis: mesh axis name (or tuple).
      output_size: static row capacity of the receive buffer (default: N).
      native: use `lax.ragged_all_to_all` (True) or the dense-staging
        fallback (False). Default: decided by the *default* device's
        platform — pass explicitly when the computation targets a
        different backend than jax.devices()[0] (e.g. a virtual CPU mesh
        while a TPU is attached).

    Returns:
      (received_tensors, recv_counts): rows from peer p land contiguously
      in source-major order, tail rows beyond sum(recv_counts) undefined.
    """
    single = not isinstance(tensors, (list, tuple))
    if single:
        tensors = [tensors]
    send_counts = send_counts.astype(jnp.int32)
    # recv_counts[p] = rows peer p sends to me
    recv_counts = lax.all_to_all(send_counts.reshape(-1, 1), axis,
                                 split_axis=0, concat_axis=0,
                                 tiled=True).reshape(-1)
    in_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(send_counts)[:-1]])
    out_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(recv_counts)[:-1]])
    if native is None:
        native = jax.devices()[0].platform == "tpu"
    outs = []
    for t in tensors:
        n = output_size or t.shape[0]
        out_buf = jnp.zeros((n,) + t.shape[1:], dtype=t.dtype)
        if native:
            outs.append(lax.ragged_all_to_all(
                t, out_buf, in_offsets, send_counts, out_offsets,
                recv_counts, axis_name=axis))
        else:
            outs.append(_ragged_a2a_fallback(
                t, out_buf, in_offsets, send_counts, out_offsets,
                recv_counts, axis))
    return (outs[0] if single else outs), recv_counts


def _ragged_a2a_fallback(t, out_buf, in_offsets, send_counts, out_offsets,
                         recv_counts, axis):
    """Dense-staging ragged a2a for backends without the XLA primitive
    (XLA:CPU): stage rows into a [W, N, ...] buffer slotted by destination,
    flat all_to_all, then compact by recv offsets. W-times the payload —
    test/reference path only; TPU uses `lax.ragged_all_to_all`."""
    w = send_counts.shape[0]
    n_in = t.shape[0]
    rows = jnp.arange(n_in, dtype=jnp.int32)
    # staged[d, j] = t[in_offsets[d] + j] for j < send_counts[d]
    src = in_offsets[:, None] + rows[None, :]                  # [W, N]
    valid_s = rows[None, :] < send_counts[:, None]
    src = jnp.where(valid_s, src, n_in)
    staged = jnp.take(t, src.reshape(-1), axis=0, mode="fill",
                      fill_value=0).reshape((w, n_in) + t.shape[1:])
    recvd = lax.all_to_all(staged, axis, split_axis=0, concat_axis=0,
                           tiled=True)                         # [W, N, ...]
    # out[out_offsets[s] + j] = recvd[s, j] for j < recv_counts[s]
    n_out = out_buf.shape[0]
    dst = out_offsets[:, None] + rows[None, :]
    valid_r = rows[None, :] < recv_counts[:, None]
    dst = jnp.where(valid_r, dst, n_out)
    return out_buf.at[dst.reshape(-1)].add(
        recvd.reshape((w * n_in,) + t.shape[1:]), mode="drop")


def _ragged_regroup(t, seg_counts, new_order):
    """Reorder a packed ragged buffer's segments.

    t: [N, ...] rows packed as `len(seg_counts)` contiguous segments;
    seg_counts: [K] rows per segment; new_order: [K] static permutation
    (new position p holds old segment new_order[p]). Pure gather with
    static shapes: each output row looks up its segment via a
    rank-over-cumsum and its source row via offset arithmetic. Tail
    rows past the total stay at whatever the sentinel gather fills.
    """
    n = t.shape[0]
    k = seg_counts.shape[0]
    old_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(seg_counts)[:-1].astype(jnp.int32)])
    new_counts = seg_counts[new_order]
    new_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(new_counts)[:-1].astype(jnp.int32)])
    rows = jnp.arange(n, dtype=jnp.int32)
    # segment (in NEW order) of each output row: rank over new offsets
    seg = jnp.sum(rows[:, None] >= new_off[None, :], axis=1) - 1
    seg = jnp.clip(seg, 0, k - 1)
    src = old_off[new_order[seg]] + (rows - new_off[seg])
    total = jnp.sum(seg_counts)
    src = jnp.where(rows < total, src, n)
    return jnp.take(t, src, axis=0, mode="fill", fill_value=0)


def batch_all_to_all_v_2dh(tensors, send_counts, outer_axis, inner_axis,
                           output_size=None, intermediate_size=None,
                           native=None, count_matrix=None):
    """Hierarchical ragged all-to-all (beyond-reference: the ragged
    analogue of `all_to_all_2dh` / reference custom_kernel.cpp:656-738).

    Element-identical to `batch_all_to_all_v(..., (outer, inner))` —
    rows land source-major in FLAT (outer-major) source order — but
    decomposed into an intra-slice exchange over `inner_axis` (ICI) and
    a cross-slice exchange over `outer_axis` (DCN), so each fabric tier
    carries only the rows that actually cross it. Between the phases
    the packed buffer is re-grouped with counts-driven gathers (the
    ragged analogue of the dense memStrideCopy transpose).

    Args:
      tensors: array or list of [N, ...], rows grouped by FLAT
        destination (d = o * inner + i), counts in `send_counts` [W].
      output_size: static row capacity of the final buffer.
      intermediate_size: static capacity of the phase-1 buffer; default
        outer * output_size (a phase-1 holder stages rows for the
        `outer` final receivers of its column, each bounded by
        output_size).
      count_matrix: optional [W, W] full count matrix C[src, dst] if
        the caller already knows it (e.g. expert-choice's replicated
        plan); otherwise it is all-gathered (W^2 int32 — negligible).

    Returns (received_tensors, recv_counts[W]) like batch_all_to_all_v.
    """
    single = not isinstance(tensors, (list, tuple))
    if single:
        tensors = [tensors]
    o_sz = lax.axis_size(outer_axis)
    i_sz = lax.axis_size(inner_axis)
    w = o_sz * i_sz
    send_counts = send_counts.astype(jnp.int32)
    if count_matrix is None:
        count_matrix = lax.all_gather(
            send_counts, (outer_axis, inner_axis), axis=0, tiled=False
        ).reshape(w, w)
    count_matrix = count_matrix.astype(jnp.int32)
    o_m = lax.axis_index(outer_axis)
    i_m = lax.axis_index(inner_axis)
    me = o_m * i_sz + i_m

    # phase-1 segment regroup: flat (o, i) destination order -> inner-
    # major (i, o), so each inner peer's chunk is contiguous and its
    # rows arrive pre-sorted by final outer destination
    ord_io = (jnp.arange(w, dtype=jnp.int32)
              .reshape(o_sz, i_sz).T.reshape(-1))       # [(i, o)] order
    cnt_a = jnp.sum(send_counts.reshape(o_sz, i_sz), axis=0)   # [I]
    if output_size is None:
        output_size = tensors[0].shape[0]
    if intermediate_size is None:
        intermediate_size = o_sz * output_size
    # m[i_s, o] = rows source (o_m, i_s) sends to (o, i_m): the phase-1
    # holder's per-(source, final-outer) segment counts
    slice_rows = (jnp.arange(i_sz, dtype=jnp.int32) + o_m * i_sz)
    m = count_matrix[slice_rows][:, i_m + i_sz * jnp.arange(
        o_sz, dtype=jnp.int32)]                          # [I, O]
    cnt_b = jnp.sum(m, axis=0)                           # [O]
    # phase-2 segment regroup: (i_s, o) -> (o, i_s)
    ord_oi = (jnp.arange(i_sz * o_sz, dtype=jnp.int32)
              .reshape(i_sz, o_sz).T.reshape(-1))
    recv_counts = count_matrix[:, me]

    outs = []
    for t in tensors:
        ta = _ragged_regroup(t, send_counts, ord_io)
        ra, _ = batch_all_to_all_v(ta, cnt_a, inner_axis,
                                   output_size=intermediate_size,
                                   native=native)
        tb = _ragged_regroup(ra, m.reshape(-1), ord_oi)
        rb, _ = batch_all_to_all_v(tb, cnt_b, outer_axis,
                                   output_size=output_size,
                                   native=native)
        outs.append(rb)
    return (outs[0] if single else outs), recv_counts


def batch_all_gather_v(tensors, count, axis, output_size=None):
    """All-gather variable-length row blocks from every device.

    Args:
      tensors: array or list of [N, ...]; only the first `count` rows are
        meaningful on each device.
      count: scalar int32 valid rows on this device.
      axis: mesh axis name (or tuple).
      output_size: static row capacity per device of the result
        (default: N * world).

    Returns:
      (gathered_tensors, counts): counts is [W]; device d's rows start at
      sum(counts[:d]) in the gathered buffer.
    """
    single = not isinstance(tensors, (list, tuple))
    if single:
        tensors = [tensors]
    count = jnp.asarray(count, jnp.int32).reshape(())
    counts = lax.all_gather(count, axis, axis=0, tiled=False)   # [W]
    w = counts.shape[0]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    outs = []
    for t in tensors:
        n = output_size or t.shape[0] * w
        n_local = t.shape[0]
        # all_gather carries each device's fixed block exactly once on
        # the wire; the variable-length compaction is then a local
        # gather. (The previous scatter-into-zeros + psum realization
        # moved ~2x the total payload per device and paid a TPU scatter.)
        g = lax.all_gather(t, axis, axis=0, tiled=False)   # [W, N, ...]
        k = jnp.arange(n, dtype=jnp.int32)
        src_dev = jnp.sum(k[:, None] >= starts[None, :], axis=1) - 1
        src_dev = jnp.clip(src_dev, 0, w - 1)
        j = k - starts[src_dev]
        src_flat = jnp.where(j < counts[src_dev],
                             src_dev * n_local + j, w * n_local)
        outs.append(jnp.take(
            g.reshape((w * n_local,) + t.shape[1:]), src_flat, axis=0,
            mode="fill", fill_value=0))
    return (outs[0] if single else outs), counts


# ---------------------------------------------------------------------------
# ZeRO-1 distributed optimizer (reference net.py:15-58
# TutelDistributedOptimizer + communicate.py:566-586 zero prims).
# ---------------------------------------------------------------------------

class ZeroOptimizer:
    """ZeRO stage-1 wrapper around an optax GradientTransformation.

    TPU-native mechanics: each parameter is flattened and padded to the
    world size; every device owns one flat shard and keeps optimizer state
    only for it. A step is reduce-scatter(grads) -> local inner update ->
    all-gather(params) — the same choreography as the reference's
    zero_scatter / reduce-scatter / step / zero_gather, expressed with XLA
    collectives inside the caller's shard_map (or used single-device, where
    it degenerates to the inner optimizer).

    Usage inside shard_map over mesh axis `axis`:
        opt = net.ZeroOptimizer(optax.adam(1e-3), axis='e')
        state = opt.init(params, world)       # per-device shard state
        params, state = opt.step(params, grads, state)
    """

    def __init__(self, inner, axis):
        self.inner = inner
        self.axis = axis

    def _shard(self, p, world):
        flat = p.reshape(-1)
        pad = (-flat.shape[0]) % world
        if pad:
            flat = jnp.pad(flat, (0, pad))
        return flat.reshape(world, -1)

    def init(self, params, world):
        """Per-device optimizer state over this device's flat shards."""
        def local_shard(p):
            s = self._shard(p, world)
            idx = lax.axis_index(self.axis) if world > 1 else 0
            return s[idx]
        shards = jax.tree.map(local_shard, params)
        return self.inner.init(shards)

    def step(self, params, grads, state, world):
        if world == 1:
            updates, state = self.inner.update(
                jax.tree.map(lambda g: g.reshape(1, -1)[0], grads), state,
                jax.tree.map(lambda p: p.reshape(-1), params))
            new = jax.tree.map(
                lambda p, u: (p.reshape(-1) + u).reshape(p.shape),
                params, updates)
            return new, state

        def rs(g):
            s = self._shard(g, world)
            return lax.psum_scatter(s, self.axis, scatter_dimension=0,
                                    tiled=False) / 1  # [shard]
        g_shards = jax.tree.map(rs, grads)
        p_shards = jax.tree.map(
            lambda p: self._shard(p, world)[lax.axis_index(self.axis)],
            params)
        updates, state = self.inner.update(g_shards, state, p_shards)
        new_shards = jax.tree.map(lambda p, u: p + u, p_shards, updates)

        def ag(shard, p):
            full = lax.all_gather(shard, self.axis, axis=0,
                                  tiled=True)
            return full[: p.size].reshape(p.shape).astype(p.dtype)
        return jax.tree.map(ag, new_shards, params), state


# ---------------------------------------------------------------------------
# Remaining reference-facade symbols (reference net.py:6-12)
# ---------------------------------------------------------------------------

def get_world_rank(mesh_or_axis=None):
    """Process index (reference communicate.py get_world_rank)."""
    return jax.process_index()


def barrier():
    """Drain outstanding device work (reference net barrier)."""
    jax.effects_barrier()


def create_standalone_group(devices=None):
    """A mesh over an explicit device subset
    (reference communicate.py:44-47)."""
    import numpy as np
    from jax.sharding import Mesh
    devices = tuple(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), ("x",))


def all_to_all_single(x, axis):
    """Flat dim-0 all_to_all (reference communicate.py all_to_all_single)."""
    return simple_all_to_all(x, axis)


# Differentiable aliases: JAX collectives differentiate natively, so the
# reference's autograd-wrapped variants coincide with the simple ones.
all_gather = simple_all_gather
reduce_scatter = simple_reduce_scatter


def allreduce_forward(x, axis):
    """psum in forward, identity in backward
    (reference communicate.py:505-515)."""
    @jax.custom_vjp
    def f(x):
        return lax.psum(x, axis)
    f.defvjp(lambda x: (lax.psum(x, axis), None), lambda _, g: (g,))
    return f(x)


def allreduce_backward(x, axis):
    """identity in forward, psum in backward
    (reference communicate.py:517-527)."""
    @jax.custom_vjp
    def f(x):
        return x
    f.defvjp(lambda x: (x, None), lambda _, g: (lax.psum(g, axis),))
    return f(x)


def zero_scatter(x, axis):
    """Keep this device's flat shard of x, padded to divide evenly
    (reference communicate.py:566-574). Returns (shard, full_numel)."""
    size = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    flat = x.reshape(-1)
    numel = flat.shape[0]
    pad = (-numel) % size
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(size, -1)[idx], numel
