"""Expert-choice routing (Zhou et al., 2022): experts pick tokens.

Beyond-reference capability (the reference ships only token-choice
top-k gates — tutel/gates/top.py, cosine_top.py). In expert-choice
(EC) routing each expert selects its own top-`capacity` tokens by
router score, so expert load is perfectly balanced BY CONSTRUCTION:
no capacity overflow, no dropped-token asymmetry, no gshard balance
loss needed. Tokens may be picked by several experts (their outputs
sum, weighted by the router gate) or by none (output zero — models
use a residual connection around the MoE block, as the reference
examples do).

TPU shape: the selection is one `lax.top_k` over the token axis per
expert, encode is a pure row gather by [E, C] token ids, and decode is
one segment scatter-add — all static shapes, no sorting network, no
cumsum chain. The optional auxiliary is the router z-loss
(logsumexp^2) which regularizes logit scale; there is nothing to
balance.

Single-program scope: the expert's top-C runs over the tokens visible
in this call (under an outer shard_map that is the device-local shard
— "local expert choice"). Cross-device EC would need a score gather;
the MOELayer integration therefore requires world_size == 1.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class ECRouting(NamedTuple):
    """indices[e, c] = token id chosen by expert e for its slot c."""
    indices: jnp.ndarray             # [E, C] int32
    gates: jnp.ndarray               # [E, C] score weight (post-softmax)
    capacity: int                    # static C


def expert_choice_routing(scores, capacity, token_mask=None):
    """Select each expert's top-`capacity` tokens.

    Args:
      scores: [S, E] router probabilities (softmax over experts, like
        token-choice — the gate weight of a chosen (e, token) pair is
        its score).
      capacity: static int C <= S.
      token_mask: optional [S] bool; masked-out tokens are never chosen
        (their score is sent to -inf) and get zero gates.
    Returns ECRouting.
    """
    s, e = scores.shape
    capacity = int(min(capacity, s))
    ranked = scores.T                                    # [E, S]
    if token_mask is not None:
        ranked = jnp.where(token_mask[None, :], ranked, -jnp.inf)
    top_vals, top_idx = lax.top_k(ranked, capacity)      # [E, C]
    gates = jnp.where(jnp.isfinite(top_vals), top_vals, 0.0)
    return ECRouting(indices=top_idx.astype(jnp.int32),
                     gates=gates.astype(scores.dtype), capacity=capacity)


def ec_encode(x, ec: ECRouting, is_postscore=True):
    """[S, M] tokens -> [E, C, M] expert buffers (row gather)."""
    y = jnp.take(x, ec.indices.reshape(-1), axis=0)
    y = y.reshape(ec.indices.shape + (x.shape[-1],))
    if not is_postscore:
        y = y * ec.gates[..., None].astype(y.dtype)
    return y


def ec_decode(y, ec: ECRouting, num_tokens, is_postscore=True):
    """[E, C, M] expert outputs -> [S, M] combined (scatter-add)."""
    if is_postscore:
        y = y * ec.gates[..., None].astype(y.dtype)
    else:
        # prescore zeroed the INPUT rows of dead slots (gate == 0 —
        # masked tokens, or softmax underflow), but a biased expert
        # maps zero input to nonzero output; mask the contribution so
        # dead slots don't scatter bias rows to arbitrary tokens
        y = y * (ec.gates[..., None] != 0).astype(y.dtype)
    flat_idx = ec.indices.reshape(-1)
    flat_y = y.reshape(-1, y.shape[-1])
    out = jnp.zeros((num_tokens, y.shape[-1]), y.dtype)
    return out.at[flat_idx].add(flat_y)


def router_z_loss(logits, token_mask=None):
    """z-loss = mean_s (logsumexp_e logits)^2 (ST-MoE) — the standard
    EC auxiliary; keeps router logits from drifting (there is no load
    to balance)."""
    z = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1) ** 2
    if token_mask is not None:
        denom = jnp.maximum(jnp.sum(token_mask), 1)
        return jnp.sum(jnp.where(token_mask, z, 0.0)) / denom
    return jnp.mean(z)


def expert_choice_forward(scores, logits, x, expert_fn, capacity,
                          is_postscore=True, token_mask=None):
    """Full EC flow: route -> gather -> expert_fn([E, C, M]) ->
    scatter-combine. Returns ([S, M], z_loss)."""
    ec = expert_choice_routing(scores, capacity, token_mask)
    y = ec_encode(x, ec, is_postscore)
    y = expert_fn(y)
    out = ec_decode(y, ec, x.shape[0], is_postscore)
    return out, router_z_loss(logits, token_mask)
