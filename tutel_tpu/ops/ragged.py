"""Dropless (megablocks-style) ragged token layout.

The reference's dropless inference path keeps the padded [E, C, M] buffer and
narrows each expert's GEMM to ceil(count / sparse_size) * sparse_size rows
(reference: tutel/experts/ffn.py:70-81, custom_kernel.cpp:874-889). On TPU the
natural dropless layout is *sorted-ragged*: sort the (token, k) pairs by
expert id so each expert's rows are contiguous, run a grouped GEMM over the
ragged groups (lax.ragged_dot / the Pallas kernel in grouped_gemm.py), then
unsort. No capacity, no padding waste, and the sort is a cheap
O(S k log(Sk)) int32 op against the GEMM cost.

encode_ragged / decode_ragged are exact inverses of each other and
numerically match fast_encode/fast_decode with capacity >= max count.
"""

from typing import NamedTuple

import jax.numpy as jnp

from .routing import RoutingResult


class RaggedDispatch(NamedTuple):
    """Sorted-ragged routing layout for one MoE invocation."""
    num_global_experts: int       # static E
    sort_order: jnp.ndarray       # [T] int32: positions into the flat (k, s)
    inverse_order: jnp.ndarray    # [T] int32: scatter-back permutation
    group_sizes: jnp.ndarray      # [E] int32 tokens per expert
    gates: jnp.ndarray            # [K, S]
    top_k: int                    # static K


def make_ragged(crit: RoutingResult) -> RaggedDispatch:
    """Build the sorted-ragged layout from a routing decision.

    T = K * S rows; row t of the dispatched buffer holds the sort_order[t]-th
    (k, s) pair, grouped contiguously by expert id (stable within expert by
    (k, s) order, matching the reference's location assignment order).
    """
    k, s = crit.indices.shape
    flat_expert = crit.indices.reshape(-1)              # [T] k-major
    # Stable sort keeps (k, s) order within each expert.
    order = jnp.argsort(flat_expert, stable=True).astype(jnp.int32)
    inverse = jnp.argsort(order).astype(jnp.int32)
    return RaggedDispatch(
        num_global_experts=crit.num_global_experts,
        sort_order=order,
        inverse_order=inverse,
        group_sizes=crit.dispatch_count,
        gates=crit.gates,
        top_k=k,
    )


def encode_ragged(data, rd: RaggedDispatch, is_postscore=True):
    """[S, M] tokens -> [T, M] rows sorted by expert id (T = K*S)."""
    s, m = data.shape
    token_of_row = rd.sort_order % s                    # k-major flat -> s
    rows = jnp.take(data, token_of_row, axis=0)
    if not is_postscore:
        g = rd.gates.reshape(-1)[rd.sort_order].astype(data.dtype)
        rows = rows * g[:, None]
    return rows


def decode_ragged(rows, rd: RaggedDispatch, is_postscore=True):
    """[T, M] expert outputs (sorted layout) -> [S, M] combined tokens."""
    t, m = rows.shape
    k = rd.top_k
    s = t // k
    unsorted = jnp.take(rows, rd.inverse_order, axis=0).reshape(k, s, m)
    if is_postscore:
        unsorted = unsorted * rd.gates.astype(rows.dtype)[:, :, None]
    return jnp.sum(unsorted, axis=0)
