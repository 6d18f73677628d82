"""True-dropless expert parallelism over ragged all-to-all.

The padded EP path ships [E_global, C, M] capacity buffers through the
all-to-all even when most slots are empty. This module sends only the
routed tokens (the reference's batch_all_to_all_v purpose,
reference custom_kernel.cpp:463-490), the full form of SURVEY.md §7 step 6:

  local routing -> expert-sorted ragged rows (ops/ragged.py) ->
  `net.batch_all_to_all_v` (rows grouped by destination device) ->
  local re-sort by expert -> `lax.ragged_dot` grouped FFN ->
  un-sort -> ragged return a2a -> ragged combine.

Static shapes: receive buffers are `max_recv` rows (a bucketed bound the
caller picks — the same alignment-bucket discipline as dropless
capacities). Fully differentiable: the ragged exchanges and permutation
re-sorts carry custom VJPs (a ragged a2a transposes to the reverse
exchange; a permutation gather to its inverse gather), so training grads
match the padded path exactly (tests/test_ragged_ep.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .. import net
from . import ragged as ragged_ops


# ---------------------------------------------------------------------------
# Differentiable building blocks.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ragged_a2a(t, send_counts, recv_counts, axis, output_size, native):
    """Ragged a2a with an explicit VJP: the transpose of a ragged exchange
    is the reverse exchange with the count matrix transposed (exactly the
    return leg), so training works even where the native primitive lacks
    a transpose rule."""
    out, _ = net.batch_all_to_all_v(t, send_counts, axis,
                                    output_size=output_size, native=native)
    return out


def _ragged_a2a_fwd(t, send_counts, recv_counts, axis, output_size, native):
    out, _ = net.batch_all_to_all_v(t, send_counts, axis,
                                    output_size=output_size, native=native)
    return out, (send_counts, recv_counts, t.shape[0])


def _ragged_a2a_bwd(axis, output_size, native, res, g):
    send_counts, recv_counts, n_in = res
    back, _ = net.batch_all_to_all_v(g, recv_counts, axis,
                                     output_size=n_in, native=native)
    return back, None, None


_ragged_a2a.defvjp(_ragged_a2a_fwd, _ragged_a2a_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ragged_a2a_2dh(t, send_counts, recv_counts, outer, inner,
                    output_size, native):
    """Hierarchical ragged a2a (net.batch_all_to_all_v_2dh) with the
    same transpose rule as `_ragged_a2a`: the VJP is the reverse
    exchange with the count matrix transposed, which the hierarchical
    decomposition realizes tier by tier."""
    out, _ = net.batch_all_to_all_v_2dh(t, send_counts, outer, inner,
                                        output_size=output_size,
                                        native=native)
    return out


def _ragged_a2a_2dh_fwd(t, send_counts, recv_counts, outer, inner,
                        output_size, native):
    out = _ragged_a2a_2dh(t, send_counts, recv_counts, outer, inner,
                          output_size, native)
    return out, (send_counts, recv_counts, t.shape[0])


def _ragged_a2a_2dh_bwd(outer, inner, output_size, native, res, g):
    send_counts, recv_counts, n_in = res
    back, _ = net.batch_all_to_all_v_2dh(g, recv_counts, outer, inner,
                                         output_size=n_in, native=native)
    return back, None, None


_ragged_a2a_2dh.defvjp(_ragged_a2a_2dh_fwd, _ragged_a2a_2dh_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _perm_take(x, order, inverse):
    return jnp.take(x, order, axis=0)


def _perm_take_fwd(x, order, inverse):
    return jnp.take(x, order, axis=0), inverse


def _perm_take_bwd(inverse, g):
    # permutation gather transposes to the inverse gather (no scatter)
    return jnp.take(g, inverse, axis=0), None, None


_perm_take.defvjp(_perm_take_fwd, _perm_take_bwd)


def _expert_ids_from_counts(per_src_expert_counts, recv_starts, n_rows):
    """[n_rows] expert-local id per received row (sentinel E_l for tail).

    Received rows are src-major blocks; inside block s the rows are
    expert-sorted with per_src_expert_counts[s, e] rows per expert.
    """
    w, e_l = per_src_expert_counts.shape
    rows = jnp.arange(n_rows, dtype=jnp.int32)
    # block id per row: number of starts <= row (minus 1)
    src = jnp.sum(rows[:, None] >= recv_starts[None, :], axis=1) - 1
    src = jnp.clip(src, 0, w - 1)
    within = rows - recv_starts[src]
    # expert id inside block: count of expert-prefix sums <= within
    csum = jnp.cumsum(per_src_expert_counts, axis=1)          # [W, E_l]
    eid = jnp.sum(within[:, None] >= csum[src, :], axis=1)
    total = recv_starts[-1] + jnp.sum(per_src_expert_counts[-1])
    return jnp.where(rows < total, jnp.clip(eid, 0, e_l - 1), e_l), total


def ragged_ep_forward(x_local, crit, expert_params, expert_apply, axis,
                      max_recv, is_postscore=True, ctx=None, native=None,
                      hier=None):
    """Dropless EP forward with ragged exchanges.

    Args:
      x_local: [S_l, M] this device's tokens.
      crit: local RoutingResult over E_global experts.
      expert_params: local expert params ([E_l, ...] leading dim).
      expert_apply: fn(params, y [E_l? ...], ctx) — invoked through the
        grouped-GEMM path via a ragged [N, M] buffer + group sizes, so it
        must be the grouped flavor (see MOELayer._ragged_expert_fn).
      axis: EP mesh axis name (or tuple).
      max_recv: static row capacity of the receive buffer per device.
      hier: optional (outer_axis, inner_axis) — route both exchanges
        through the hierarchical 2DH ragged a2a (ICI/DCN tier-scoped;
        element-identical row ordering, so everything downstream is
        unchanged).
    Returns:
      [S_l, M] combined output.
    """
    w = lax.axis_size(axis) if not isinstance(axis, tuple) else 1
    if isinstance(axis, tuple):
        w = 1
        for a in axis:
            w *= lax.axis_size(a)
    e_g = crit.num_global_experts
    assert e_g % w == 0, (e_g, w)
    e_l = e_g // w

    rd = ragged_ops.make_ragged(crit)
    rows = ragged_ops.encode_ragged(x_local, rd, is_postscore=is_postscore)
    t = rows.shape[0]                                     # K * S_l

    # per-destination-device row counts (experts are contiguous per device)
    send_counts = jnp.sum(rd.group_sizes.reshape(w, e_l), axis=1)
    # per-(src, local-expert) counts: each src sends me its counts for my
    # expert range
    counts_matrix = net.simple_all_to_all(
        rd.group_sizes.reshape(w, e_l), axis)             # [W, E_l]
    recv_counts = jnp.sum(counts_matrix, axis=1).astype(jnp.int32)  # [W]

    if hier is not None:
        recv_rows = _ragged_a2a_2dh(rows, send_counts, recv_counts,
                                    hier[0], hier[1], max_recv, native)
    else:
        recv_rows = _ragged_a2a(rows, send_counts, recv_counts, axis,
                                max_recv, native)

    recv_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(recv_counts)[:-1]])
    eid, total = _expert_ids_from_counts(counts_matrix, recv_starts,
                                         max_recv)
    # stable sort by expert id groups rows for the grouped GEMM
    order = jnp.argsort(eid, stable=True).astype(jnp.int32)
    inverse = jnp.argsort(order).astype(jnp.int32)
    grouped = _perm_take(recv_rows, order, inverse)
    group_sizes = jnp.sum(counts_matrix, axis=0).astype(jnp.int32)  # [E_l]

    y = expert_apply(expert_params, grouped, group_sizes, ctx)

    y = _perm_take(y, inverse, order)                     # back to src-major
    if hier is not None:
        back_rows = _ragged_a2a_2dh(y, recv_counts, send_counts,
                                    hier[0], hier[1], t, native)
    else:
        back_rows = _ragged_a2a(y, recv_counts, send_counts, axis, t,
                                native)
    return ragged_ops.decode_ragged(back_rows, rd,
                                    is_postscore=is_postscore)
