"""Grouped (per-expert) GEMM for dropless MoE.

TPU-native replacement for the reference's `sparse_bmm_infer` megablocks path
(reference: tutel/custom/custom_kernel.cpp:874-889, tutel/experts/ffn.py:70-81).

Two implementations behind one interface:
  * `grouped_gemm(lhs, rhs, group_sizes)` — XLA `lax.ragged_dot`, which the
    TPU backend lowers to a tiled MXU loop with ragged group bounds.
  * A Pallas kernel with fused INT8/INT4 weight dequantization lives in
    grouped_gemm_pallas.py (the quantized-inference hot path).

Layout: lhs is the sorted-ragged [T, K_dim] activation matrix
(ops/ragged.py), rhs is [E, K_dim, N] per-expert weights, group_sizes [E]
are per-expert row counts summing to <= T. Rows past sum(group_sizes) are
padding and produce zeros.
"""

import jax.numpy as jnp
from jax import lax


def grouped_gemm(lhs, rhs, group_sizes, preferred_element_type=jnp.float32):
    """Per-group matmul: out[t] = lhs[t] @ rhs[g(t)].

    Args:
      lhs: [T, K] activations, rows grouped contiguously by expert.
      rhs: [E, K, N] per-expert weights.
      group_sizes: [E] int32 rows per expert (sum <= T; tail rows are
        treated as belonging to no group and yield zeros via clamping to the
        last group — callers mask them).
    Returns:
      [T, N] in lhs dtype.
    """
    out = lax.ragged_dot(
        lhs, rhs.astype(lhs.dtype), group_sizes.astype(jnp.int32),
        preferred_element_type=preferred_element_type)
    return out.astype(lhs.dtype)


def grouped_bias_add(rows, bias, group_sizes):
    """Add per-expert bias to ragged rows: rows[t] += bias[g(t)].

    g(t) computed from the cumulative group sizes; tail padding rows get the
    last expert's bias (harmless: they are dropped at decode).
    """
    t = rows.shape[0]
    e = bias.shape[0]
    starts = jnp.cumsum(group_sizes)                      # [E] exclusive ends
    row_ids = jnp.arange(t, dtype=group_sizes.dtype)
    # expert id of row t = number of groups fully before t.
    gid = jnp.sum(row_ids[:, None] >= starts[None, :], axis=1)
    gid = jnp.clip(gid, 0, e - 1)
    return rows + jnp.take(bias, gid, axis=0).astype(rows.dtype)


def megablocks_ffn(x, params, ctx, activation_fn, output_dim):
    """Dropless 2-layer FFN over the *dense* [E, C, M] buffer.

    Capability parity with the reference's sparse_bmm megablocks branch
    (ffn.py:70-81): compute only ~ceil(count/block)*block rows per expert.
    On TPU we express this by flattening to ragged form via the per-expert
    dispatch counts, running the grouped GEMM, and scattering back. Rows
    beyond each expert's count are zero in the input, so a simpler dense
    fallback is numerically identical; we use ragged_dot when counts are
    available to skip the padded tail.
    """
    e, c, m = x.shape
    counts = getattr(ctx, "dispatch_count", None)
    mega = max(int(getattr(ctx, "megablocks_size", 1)), 1)
    fc1_w, fc2_w = params["fc1_w"], params["fc2_w"]
    fc1_b, fc2_b = params.get("fc1_b"), params.get("fc2_b")

    if counts is None:
        counts = jnp.full((e,), c, dtype=jnp.int32)
    # Round counts up to the megablocks block size, clamp to capacity
    # (reference ffn.py:72-73).
    counts = jnp.minimum((counts + mega - 1) // mega * mega, c).astype(jnp.int32)

    # Gather each expert's first counts[e] rows into a contiguous ragged
    # buffer of static size T = E*C (upper bound).
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    total = jnp.sum(counts)
    t_max = e * c
    row_ids = jnp.arange(t_max, dtype=jnp.int32)
    gid = jnp.sum(row_ids[:, None] >= jnp.cumsum(counts)[None, :], axis=1)
    gid = jnp.clip(gid, 0, e - 1).astype(jnp.int32)
    within = row_ids - jnp.take(starts, gid)
    src = gid * c + jnp.where(row_ids < total, within, 0)
    flat = x.reshape(e * c, m)
    ragged = jnp.take(flat, src, axis=0)

    y = grouped_gemm(ragged, fc1_w, counts)
    if fc1_b is not None:
        y = grouped_bias_add(y, fc1_b, counts)
    y = activation_fn(y)
    y = grouped_gemm(y, fc2_w, counts)
    if fc2_b is not None:
        bias = fc2_b
        if bias.shape[-1] != output_dim:
            bias = jnp.pad(bias, ((0, 0), (0, output_dim - bias.shape[-1])))
        y = grouped_bias_add(y, bias, counts)

    # Scatter back to the dense [E, C, M] layout; padding rows dropped.
    dst = jnp.where(row_ids < total, gid * c + within, t_max)
    out = jnp.zeros((e * c, output_dim), dtype=y.dtype)
    out = out.at[dst].add(y, mode="drop")
    return out.reshape(e, c, output_dim)
