"""Top-k token routing for sparse MoE — the TPU-native `extract_critical`.

Behavioral parity with the reference routing math
(reference: tutel/impls/fast_dispatch.py:138-204) as pure, jit-friendly jnp:

  * top-k over softmax scores -> per-k expert indices + gate values
  * location assignment by exclusive cumsum over a k-major (K*S, E) one-hot
    mask stream (the k>1 `acc_base` offsets of the reference fall out of the
    k-major ordering for free)
  * optional batch-prioritized routing (sort tokens by -max score before the
    cumsum; reference fast_dispatch.py:138-141,155-157)
  * gate normalization after top-k (reference fast_dispatch.py:173-175)
  * capacity modes: padded (factor > 0), dropless (== 0) and capped-dropless
    (< 0), with alignment round-up (reference fast_dispatch.py:188-199)

XLA note: everything here is static-shape. Data-dependent capacity (dropless
modes) is exposed as a traced scalar (`required_capacity`); the MoE layer
resolves it to a *static* bucketed capacity on the host and re-dispatches to a
cached compiled variant — that is how Tutel's "no recompilation penalty"
dynamic switching is realized under XLA (see impls/moe_layer.py).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import losses


class RoutingResult(NamedTuple):
    """Static-shape routing decision for one MoE invocation.

    Fields mirror the reference's `crit` tuple
    (reference fast_dispatch.py:204): (num_global_experts, indices_s,
    locations_s, gates_s, capacity, dispatch_count).
    """
    num_global_experts: int          # static python int E
    indices: jnp.ndarray             # [K, S] int32 expert id per (k, token)
    locations: jnp.ndarray           # [K, S] int32 row within the expert
    gates: jnp.ndarray               # [K, S] gate weight per (k, token)
    capacity: int                    # static python int C
    dispatch_count: jnp.ndarray      # [E] int32 tokens routed per expert

    @property
    def top_k(self):
        return self.indices.shape[0]


def cumsum_sub_one(mask, axis=0):
    """Inclusive cumsum minus one (reference jit_kernels/gating.py:19-24)."""
    return jnp.cumsum(mask, axis=axis) - 1


def compute_locations(masks_kse, importance_order: Optional[jnp.ndarray] = None):
    """Per-(k, token) slot index inside its expert's buffer.

    Args:
      masks_kse: [K, S, E] one-hot (int32) expert assignment masks.
      importance_order: optional [S] permutation; when given, tokens are
        ranked in this order within every k before the cumsum
        (batch-prioritized routing).

    Returns:
      locations [K, S] int32 and per-expert totals [E] int32.
    """
    k, s, e = masks_kse.shape
    flat = masks_kse.reshape(k * s, e)
    if importance_order is not None:
        # Reorder every k-segment by importance, cumsum, then un-sort.
        offsets = (jnp.arange(k, dtype=importance_order.dtype) * s)[:, None]
        perm = (importance_order[None, :] + offsets).reshape(-1)
        csum_sorted = cumsum_sub_one(flat[perm], axis=0)
        inv = jnp.argsort(perm)
        csum = csum_sorted[inv]
    else:
        csum = cumsum_sub_one(flat, axis=0)
    # One-hot gather: each row has exactly one hot column.
    locations = jnp.sum(csum * flat, axis=1).reshape(k, s).astype(jnp.int32)
    counts = jnp.sum(flat, axis=0).astype(jnp.int32)
    return locations, counts


def compute_static_capacity(num_samples, num_global_experts, top_k,
                            capacity_factor, alignment=1):
    """Padded-mode static capacity (reference fast_dispatch.py:188-190,197-199).

    Only valid for capacity_factor > 0. All args are python ints/floats; the
    result is a python int usable as a static shape.
    """
    assert capacity_factor > 0, "static capacity needs capacity_factor > 0"
    samples_per_expert = (num_samples + num_global_experts - 1) // num_global_experts
    capacity = top_k * int(capacity_factor * samples_per_expert)
    return align_capacity(capacity, alignment)


def align_capacity(capacity, alignment):
    """Round capacity up to a multiple of `alignment`
    (reference fast_dispatch.py:197-199)."""
    remainder = capacity % alignment
    if remainder > 0:
        capacity = capacity + alignment - remainder
    return int(capacity)


def capped_capacity_limit(num_samples, num_global_experts, top_k,
                          capacity_factor):
    """Upper bound for capacity_factor < 0 mode
    (reference fast_dispatch.py:194-195)."""
    samples_per_expert = (num_samples + num_global_experts - 1) // num_global_experts
    return top_k * int(-capacity_factor * samples_per_expert)


def extract_critical(scores, top_k, capacity, loss_fn=losses.gshard_loss,
                     batch_prioritized_routing=False, normalize_gate=True,
                     token_mask=None):
    """Route tokens to experts with a *static* capacity.

    Args:
      scores: [S, E] softmax gate scores.
      top_k: static int K (already clamped to <= E by the caller).
      capacity: static int C per expert (use compute_static_capacity /
        the dropless two-phase flow in the MoE layer to obtain it).
      loss_fn: callable(scores, topk_indices) -> aux loss, or None.
      batch_prioritized_routing: rank tokens by -max(score) when assigning
        expert buffer slots, so higher-scoring tokens are dropped last.
      normalize_gate: renormalize the k gate values to sum to 1 (only for
        top_k > 1; reference fast_dispatch.py:173-175).
      token_mask: optional [S] bool/int; False rows are padding tokens that
        take no expert slot and produce zero output (the SPMD realization
        of the reference's `inequivalent_tokens` variable per-rank token
        counts, reference fast_dispatch.py:182-185 — static shapes stay
        equal across shards, validity is data).

    Returns:
      (RoutingResult, l_aux). Tokens whose location >= capacity are dropped
      at dispatch time (their scatter is masked out).
    """
    num_samples, num_global_experts = scores.shape
    top_k = min(int(top_k), num_global_experts)
    if int(capacity) < 1:
        raise ValueError(
            f"capacity must be >= 1, got {capacity}; raise capacity_factor "
            "or alignment (a zero-size expert buffer cannot be dispatched)")

    _, topk_indices = jax.lax.top_k(scores, top_k)          # [S, K]
    indices_ks = topk_indices.T.astype(jnp.int32)           # [K, S]

    masks_kse = jax.nn.one_hot(indices_ks, num_global_experts,
                               dtype=jnp.int32)             # [K, S, E]
    if token_mask is not None:
        tm = token_mask.astype(jnp.int32)
        masks_kse = masks_kse * tm[None, :, None]
    # Gate per (k, token) = score at the selected expert. One-hot
    # contraction instead of take_along_axis: [S, small-E] gathers lower
    # to a pathological layout on TPU (profiled at ~4 GB/s), the masked
    # sum is a VPU-friendly elementwise+reduce.
    gates_ks = jnp.sum(
        jax.nn.one_hot(indices_ks, num_global_experts,
                       dtype=scores.dtype) * scores[None], axis=2)  # [K, S]
    if token_mask is not None:
        gates_ks = gates_ks * token_mask.astype(gates_ks.dtype)[None, :]

    l_aux = loss_fn(scores, topk_indices) if loss_fn is not None else None

    if batch_prioritized_routing:
        importance = -jnp.max(scores, axis=1)
        order = jnp.argsort(importance)
    else:
        order = None
    locations_ks, counts = compute_locations(masks_kse, order)
    if token_mask is not None:
        # padding tokens consumed no slot; mark them dropped outright
        locations_ks = jnp.where(
            token_mask.astype(bool)[None, :], locations_ks, -1)

    if top_k > 1 and normalize_gate:
        denom = jnp.clip(jnp.sum(gates_ks, axis=0),
                         jnp.finfo(gates_ks.dtype).eps, None)
        gates_ks = gates_ks / denom

    result = RoutingResult(
        num_global_experts=num_global_experts,
        indices=indices_ks,
        locations=locations_ks,
        gates=gates_ks,
        capacity=int(capacity),
        dispatch_count=counts,
    )
    return result, l_aux


def required_capacity(dispatch_count):
    """Traced scalar: max tokens any expert received (dropless capacity).

    Equivalent to the reference's `locations2.max() + 1`
    (fast_dispatch.py:191-193); cross-device MAX reduction is the caller's
    responsibility (psum/pmax on the mesh, or host sync).
    """
    return jnp.max(dispatch_count)
