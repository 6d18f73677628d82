"""Sparse token dispatch (encode) and combine (decode) for MoE.

TPU-native replacement for the reference's JIT CUDA dispatch kernels
(reference: tutel/jit_kernels/sparse.py:17-133 and
tutel/impls/fast_dispatch.py:16-136):

  * `fast_encode`:  [S, M] tokens -> [E, C, M] per-expert buffers
  * `fast_decode`:  [E, C, M] expert outputs -> [S, M] weighted combine

Design notes (TPU-first):
  - Encode is an XLA scatter with *unique* indices (slot indices come from an
    exclusive cumsum, so no collisions); decode is a gather + weighted sum.
    Both are natively differentiable in JAX — scatter's VJP is gather and
    vice versa — so the reference's three hand-written kernels
    (fwd / bwd_data / bwd_gate) and the decode-fwd == encode-bwd symmetry
    (reference fast_dispatch.py:50-66) come for free from autodiff.
  - Dropped tokens (location >= capacity) are routed to a clamped index and
    masked, matching the reference kernels' `if (locations[i] < capacity)`
    guard (reference jit_kernels/sparse.py:24-34).
  - A Pallas hot-path kernel lives in ops/dispatch_pallas.py; this module is
    the executable spec and the CPU/interpret reference for it.

`is_postscore=True` multiplies gates at decode; False multiplies at encode
(reference fast_dispatch.py:124-134).
"""

import jax
import jax.numpy as jnp

from .routing import RoutingResult


def _flat_slot(crit: RoutingResult):
    """[K, S] flattened slot index e*C + loc, with dropped tokens clamped out.

    Returns (flat_idx, valid_mask) where invalid entries point at E*C (one
    past the end) so `.at[...].add(mode='drop')` discards them.
    """
    e_times_c = crit.num_global_experts * crit.capacity
    valid = (crit.locations >= 0) & (crit.locations < crit.capacity)
    flat = crit.indices.astype(jnp.int32) * crit.capacity + crit.locations
    flat = jnp.where(valid, flat, e_times_c)
    return flat, valid


def fast_encode(data, crit: RoutingResult, is_postscore=True):
    """Scatter tokens into per-expert buffers.

    Args:
      data: [S, M] tokens.
      crit: routing decision (static capacity C).
      is_postscore: if False, gate values scale tokens here at encode.

    Returns:
      [E, C, M] dispatched buffer (zeros at unused slots).
    """
    s, m = data.shape
    e, c = crit.num_global_experts, crit.capacity
    flat_idx, valid = _flat_slot(crit)

    if is_postscore:
        src = jnp.broadcast_to(data[None], (crit.top_k, s, m))
    else:
        src = crit.gates.astype(data.dtype)[:, :, None] * data[None]

    out = jnp.zeros((e * c, m), dtype=data.dtype)
    # Unique slots by construction -> add == set; 'drop' discards clamped rows.
    out = out.at[flat_idx.reshape(-1)].add(
        src.reshape(-1, m), mode="drop",
        indices_are_sorted=False, unique_indices=False)
    return out.reshape(e, c, m)


def fast_decode(data, crit: RoutingResult, is_postscore=True):
    """Gather expert outputs back to token order and combine over k.

    Args:
      data: [E, C, M] expert outputs.
      crit: routing decision used at encode time.
      is_postscore: if True, gate values scale the combine here.

    Returns:
      [S, M] combined output.
    """
    e, c, m = data.shape
    assert e == crit.num_global_experts and c == crit.capacity
    flat_idx, valid = _flat_slot(crit)
    flat = data.reshape(e * c, m)

    # mode='fill' returns 0 for the clamped (dropped) index e*c.
    rows = flat.at[flat_idx].get(mode="fill", fill_value=0)     # [K, S, M]
    if is_postscore:
        gates = jnp.where(valid, crit.gates, 0).astype(data.dtype)
        rows = gates[:, :, None] * rows
    else:
        rows = jnp.where(valid[:, :, None], rows, 0)
    return jnp.sum(rows, axis=0)


def fast_encode_onehot(data, crit: RoutingResult, is_postscore=True):
    """MXU-friendly encode via one-hot matmul (for small E*C).

    dispatched[e*C+c, :] = sum_s onehot[s, e*C+c] * data[s, :]. Costs
    S*(E*C)*M MACs but runs entirely on the systolic array; profitable when
    E*C is small relative to the matmul-bound budget.
    """
    s, m = data.shape
    e, c = crit.num_global_experts, crit.capacity
    flat_idx, valid = _flat_slot(crit)
    scale = (jnp.where(valid, 1.0, 0.0) if is_postscore
             else jnp.where(valid, crit.gates, 0.0)).astype(data.dtype)
    # [K, S, E*C] one-hot; sum over k then contract over s.
    oh = jax.nn.one_hot(flat_idx, e * c, dtype=data.dtype) * scale[:, :, None]
    oh = jnp.sum(oh, axis=0)                                    # [S, E*C]
    out = jnp.einsum("sn,sm->nm", oh, data,
                     preferred_element_type=jnp.float32).astype(data.dtype)
    return out.reshape(e, c, m)
