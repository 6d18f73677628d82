"""Sparse token dispatch (encode) and combine (decode) for MoE.

TPU-native replacement for the reference's JIT CUDA dispatch kernels
(reference: tutel/jit_kernels/sparse.py:17-133 and
tutel/impls/fast_dispatch.py:16-136):

  * `fast_encode`:  [S, M] tokens -> [E, C, M] per-expert buffers
  * `fast_decode`:  [E, C, M] expert outputs -> [S, M] weighted combine

Design notes (TPU-first):
  - On TPU, row *gathers* vectorize across lanes while row *scatters*
    serialize. Both directions are therefore expressed as gathers: encode
    inverts the token->slot map once (a tiny [K*S] int32 scatter, unique by
    construction) and gathers token rows into slot order; decode gathers
    slot rows back into token order.
  - Custom VJPs keep the backward passes gather-only too, mirroring the
    reference's three kernels (fwd / bwd_data / bwd_gate) and its
    decode-fwd == encode-bwd symmetry (reference fast_dispatch.py:50-66):
      encode bwd_data  == gather by the forward token->slot map (= decode)
      decode bwd_data  == gather by the inverted slot->token map (= encode)
      decode bwd_gate  == per-(k, token) dot products, fp32 accumulation
        (reference sparse.py:74-133's warp-reduce).
  - Dropped tokens (location >= capacity) clamp to an out-of-range index;
    gathers fill 0 and the int32 scatter drops them, matching the reference
    kernels' `if (locations[i] < capacity)` guard (sparse.py:24-34).

`is_postscore=True` multiplies gates at decode; False multiplies at encode
(reference fast_dispatch.py:124-134).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .routing import RoutingResult


def _flat_slot(crit: RoutingResult):
    """[K, S] flattened slot index e*C + loc, with dropped tokens clamped out.

    Returns (flat_idx, valid_mask) where invalid entries point at E*C (one
    past the end) so scatters drop them and gathers fill zeros.
    """
    e_times_c = crit.num_global_experts * crit.capacity
    valid = (crit.locations >= 0) & (crit.locations < crit.capacity)
    flat = crit.indices.astype(jnp.int32) * crit.capacity + crit.locations
    flat = jnp.where(valid, flat, e_times_c)
    return flat, valid


def _inverse_slot(crit: RoutingResult):
    """[E*C] int32 slot -> flat (k-major) row id k*S + s; empty slots get the
    sentinel K*S. One tiny int32 scatter (unique indices by construction)."""
    k, s = crit.indices.shape
    e_times_c = crit.num_global_experts * crit.capacity
    flat_idx, _ = _flat_slot(crit)
    row_ids = jnp.arange(k * s, dtype=jnp.int32)
    inv = jnp.full((e_times_c,), k * s, dtype=jnp.int32)
    return inv.at[flat_idx.reshape(-1)].set(row_ids, mode="drop",
                                            unique_indices=True)


def _take_rows(data, idx):
    """Gather rows with out-of-range -> 0 (the dropped-token guard).

    XLA's vectorized gather emission won this path's A/B on v5e: a
    Pallas per-row-DMA kernel measured slower (~40 ns/row issue cost
    against a 42 ns/row budget) and was removed in round 3 (history:
    ops/dispatch_pallas.py / ops/fused_dispatch.py in git).
    TUTEL_TPU_GATHER_MODE=clipwhere selects the clip+mask emission."""
    import os
    if os.environ.get("TUTEL_TPU_GATHER_MODE") == "clipwhere":
        n = data.shape[0]
        rows = jnp.take(data, jnp.minimum(idx, n - 1), axis=0, mode="clip")
        return jnp.where((idx < n).reshape(idx.shape + (1,) * (data.ndim - 1)),
                         rows, 0)
    return jnp.take(data, idx, axis=0, mode="fill", fill_value=0)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _encode(data, gates_flat, flat_idx, inv, prescore: bool):
    return _encode_fwd_impl(data, gates_flat, flat_idx, inv, prescore)


def _encode_fwd_impl(data, gates_flat, flat_idx, inv, prescore):
    s = data.shape[0]
    token = jnp.where(inv < flat_idx.size, inv % s, s)   # sentinel -> fill
    out = _take_rows(data, token)                        # [E*C, M]
    if prescore:
        g = _take_rows(gates_flat[:, None], inv).astype(data.dtype)
        out = out * g
    return out


def _encode_vjp_fwd(data, gates_flat, flat_idx, inv, prescore):
    out = _encode_fwd_impl(data, gates_flat, flat_idx, inv, prescore)
    return out, (data, gates_flat, flat_idx, inv)


def _encode_vjp_bwd(prescore, res, g_out):
    data, gates_flat, flat_idx, inv = res
    k = flat_idx.shape[0]
    s = flat_idx.shape[1]
    m = g_out.shape[-1]
    # bwd_data: gather expert-buffer grads back to token order (this is the
    # decode-shaped gather; reference sparse.py:45-63).
    rows = _take_rows(g_out, flat_idx.reshape(-1)).reshape(k, s, m)
    if prescore:
        gk = gates_flat.reshape(k, s).astype(g_out.dtype)
        d_data = jnp.sum(rows * gk[:, :, None], axis=0)
        # bwd_gate: per-(k, token) dot, fp32 accumulation
        # (reference sparse.py:74-133).
        d_gates = jnp.einsum(
            "ksm,sm->ks", rows, data.astype(g_out.dtype),
            preferred_element_type=jnp.float32).astype(gates_flat.dtype)
    else:
        d_data = jnp.sum(rows, axis=0)
        d_gates = jnp.zeros_like(gates_flat)
    return d_data.astype(data.dtype), d_gates.reshape(-1), None, None


_encode.defvjp(_encode_vjp_fwd, _encode_vjp_bwd)


def fast_encode(data, crit: RoutingResult, is_postscore=True):
    """Dispatch tokens into per-expert buffers.

    Args:
      data: [S, M] tokens.
      crit: routing decision (static capacity C).
      is_postscore: if False, gate values scale tokens here at encode.

    Returns:
      [E, C, M] dispatched buffer (zeros at unused slots).
    """
    s, m = data.shape
    e, c = crit.num_global_experts, crit.capacity
    flat_idx, _ = _flat_slot(crit)
    inv = _inverse_slot(crit)
    gates_flat = crit.gates.reshape(-1)
    out = _encode(data, gates_flat, flat_idx, inv, not is_postscore)
    return out.reshape(e, c, m)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _decode(data_flat, gates_flat, flat_idx, inv, postscore: bool):
    return _decode_fwd_impl(data_flat, gates_flat, flat_idx, inv, postscore)


def _decode_fwd_impl(data_flat, gates_flat, flat_idx, inv, postscore):
    k, s = flat_idx.shape
    m = data_flat.shape[-1]
    rows = _take_rows(data_flat, flat_idx.reshape(-1)).reshape(k, s, m)
    if postscore:
        gk = gates_flat.reshape(k, s).astype(rows.dtype)
        rows = rows * gk[:, :, None]
    return jnp.sum(rows, axis=0)


def _decode_vjp_fwd(data_flat, gates_flat, flat_idx, inv, postscore):
    out = _decode_fwd_impl(data_flat, gates_flat, flat_idx, inv, postscore)
    return out, (data_flat, gates_flat, flat_idx, inv)


def _decode_vjp_bwd(postscore, res, g):
    data_flat, gates_flat, flat_idx, inv = res
    k, s = flat_idx.shape
    # bwd_data: encode-shaped gather of token grads into slot order
    # (the decode-fwd == encode-bwd symmetry, reference fast_dispatch.py:50).
    token = jnp.where(inv < k * s, inv % s, s)
    d_rows = _take_rows(g, token)                         # [E*C, M]
    if postscore:
        gd = _take_rows(gates_flat[:, None], inv).astype(g.dtype)
        d_data = d_rows * gd
        # bwd_gate: d_gates[k,s] = <g[s], data[slot(k,s)]>, fp32 accum.
        rows = _take_rows(data_flat, flat_idx.reshape(-1)).reshape(
            k, s, data_flat.shape[-1])
        d_gates = jnp.einsum(
            "ksm,sm->ks", rows.astype(jnp.float32), g.astype(jnp.float32),
            preferred_element_type=jnp.float32).astype(gates_flat.dtype)
    else:
        d_data = d_rows
        d_gates = jnp.zeros_like(gates_flat)
    return d_data.astype(data_flat.dtype), d_gates.reshape(-1), None, None


_decode.defvjp(_decode_vjp_fwd, _decode_vjp_bwd)


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
    flat_idx, _ = _flat_slot(crit)
    inv = _inverse_slot(crit)
    gates_flat = crit.gates.reshape(-1)
    return _decode(data.reshape(e * c, m), gates_flat, flat_idx, inv,
                   is_postscore)


# ---------------------------------------------------------------------------
# Dense dispatch: the top_k == num_global_experts degenerate case
# ---------------------------------------------------------------------------

def dense_gates(crit: RoutingResult):
    """[S, E] gate weight of token s at expert e (0 where unrouted).

    When top_k == E every token routes to every expert, so the (k, slot)
    indirection collapses: this is the full gate matrix.
    """
    g = jax.nn.one_hot(crit.indices, crit.num_global_experts,
                       dtype=crit.gates.dtype)          # [K, S, E]
    return jnp.sum(g * crit.gates[:, :, None], axis=0)  # [S, E]


def dense_encode(data, crit: RoutingResult, is_postscore=True):
    """Dispatch when top_k == E and capacity >= S: every expert sees every
    token, so encode is a broadcast in token order — no row gather, no
    slot permutation. XLA fuses the broadcast into the expert GEMM's
    operand load, so this removes the entire encode cost of the general
    path (the profiled ~660 us XLA row gather per direction).

    Exact-equivalence argument: with no drops (capacity >= S) the general
    path's slot layout is just a per-expert permutation of the same token
    rows; experts apply row-wise and the combine sums gate*expert(token)
    over the token's (k) entries, so the permutation is invisible —
    dense_decode(expert(dense_encode(x))) == fast_decode(expert(
    fast_encode(x))) for any row-wise expert.

    Returns [E, S, M].
    """
    s, m = data.shape
    e = crit.num_global_experts
    if is_postscore:
        return jnp.broadcast_to(data[None], (e, s, m))
    g_es = dense_gates(crit).astype(data.dtype)         # [S, E]
    return g_es.T[:, :, None] * data[None]


def dense_decode(data, crit: RoutingResult, is_postscore=True):
    """Combine for the dense-dispatch path: weighted sum over experts.

    data: [E, S, M] expert outputs; returns [S, M].
    """
    g_es = dense_gates(crit).astype(data.dtype)         # [S, E]
    if is_postscore:
        return jnp.einsum("se,esm->sm", g_es, data)
    return jnp.sum(data, axis=0)


# ---------------------------------------------------------------------------
# Reference implementations (scatter-based executable spec; used by tests
# to validate the gather-based hot path above)
# ---------------------------------------------------------------------------

def fast_encode_scatter(data, crit: RoutingResult, is_postscore=True):
    """Direct scatter encode: the numerics oracle for `fast_encode`."""
    s, m = data.shape
    e, c = crit.num_global_experts, crit.capacity
    flat_idx, valid = _flat_slot(crit)
    if is_postscore:
        src = jnp.broadcast_to(data[None], (crit.top_k, s, m))
    else:
        src = crit.gates.astype(data.dtype)[:, :, None] * data[None]
    out = jnp.zeros((e * c, m), dtype=data.dtype)
    out = out.at[flat_idx.reshape(-1)].add(src.reshape(-1, m), mode="drop")
    return out.reshape(e, c, m)


def fast_decode_gather(data, crit: RoutingResult, is_postscore=True):
    """Direct gather decode: the numerics oracle for `fast_decode`."""
    e, c, m = data.shape
    flat_idx, valid = _flat_slot(crit)
    flat = data.reshape(e * c, m)
    rows = flat.at[flat_idx].get(mode="fill", fill_value=0)
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
    oh = jax.nn.one_hot(flat_idx, e * c, dtype=data.dtype) * scale[:, :, None]
    oh = jnp.sum(oh, axis=0)                                    # [S, E*C]
    out = jnp.einsum("sn,sm->nm", oh, data,
                     preferred_element_type=jnp.float32).astype(data.dtype)
    return out.reshape(e, c, m)


class TutelMoeFastDispatcher:
    """Reusable dispatcher object (reference fast_dispatch.py:85-136
    `TutelMoeFastDispatcher`): `update(...)` installs a routing decision,
    then `encode`/`decode` apply it. Stateless math — the object only
    carries the RoutingResult; kernel caching is jit's job."""

    def __init__(self, num_global_experts, capacity, model_dim,
                 dispatch_dtype=None):
        self.num_global_experts = int(num_global_experts)
        self.capacity = int(capacity)
        self.model_dim = int(model_dim)
        self.dtype = dispatch_dtype
        self._crit = None
        self.is_postscore = True
        self._original_dtype = None

    def update(self, indices_, locations_, gates_, capacity=None,
               is_postscore=True):
        import jax.numpy as jnp
        if capacity is not None:
            self.capacity = int(capacity)
        self.is_postscore = is_postscore
        ind = jnp.asarray(indices_, jnp.int32)
        if ind.ndim == 1:
            ind = ind[None]
        loc = jnp.asarray(locations_, jnp.int32)
        if loc.ndim == 1:
            loc = loc[None]
        g = jnp.asarray(gates_)
        if g.ndim == 1:
            g = g[None]
        counts = jnp.sum(jax.nn.one_hot(
            ind.reshape(-1), self.num_global_experts, dtype=jnp.int32),
            axis=0)
        self._crit = RoutingResult(
            num_global_experts=self.num_global_experts, indices=ind,
            locations=loc, gates=g, capacity=self.capacity,
            dispatch_count=counts)

    def encode(self, data):
        assert self._crit is not None, "call update() first"
        self._original_dtype = data.dtype
        d = data if self.dtype is None else data.astype(self.dtype)
        return fast_encode(d, self._crit, self.is_postscore)

    def decode(self, data):
        assert self._crit is not None, "call update() first"
        out = fast_decode(data, self._crit, self.is_postscore)
        # Restore the caller's dtype when dispatch_dtype compressed the
        # payload (reference GatingDecoder's original_dtype restore,
        # fast_dispatch.py:66-82).
        if self.dtype is not None and self._original_dtype is not None:
            out = out.astype(self._original_dtype)
        return out


fast_dispatcher = TutelMoeFastDispatcher
