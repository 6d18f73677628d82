"""Auxiliary load-balancing losses for MoE gating.

Behavioral parity with the reference implementation
(reference: tutel/impls/losses.py:12-43) expressed as pure jnp functions.
"""

import jax
import jax.numpy as jnp


def one_hot_with_dtype(indices, num_classes, dtype, hot_value=1.0):
    """One-hot with a configurable hot value (reference losses.py:7-10)."""
    oh = jax.nn.one_hot(indices, num_classes, dtype=dtype)
    if hot_value != 1.0:
        oh = oh * jnp.asarray(hot_value, dtype=dtype)
    return oh


def gshard_loss(scores_w_noise, top_ids):
    """GShard load-balance loss (reference losses.py:12-19).

    l_aux = sum_e(me_e * ce_e) / S  with ce scaled by E/S via the one-hot
    hot_value, i.e. mean(me * ce) * E in the usual formulation.

    Args:
      scores_w_noise: [S, E] softmax scores (possibly noised).
      top_ids: [S, K] top-k expert ids; only the top-1 column is used.
    """
    num_samples = scores_w_noise.shape[0]
    num_global_experts = scores_w_noise.shape[1]
    mask = one_hot_with_dtype(
        top_ids[:, 0], num_global_experts, dtype=scores_w_noise.dtype,
        hot_value=num_global_experts / num_samples)
    me = jnp.sum(scores_w_noise, axis=0)
    ce = jnp.sum(mask, axis=0)
    return jnp.sum(me * ce) / num_samples


def _normal_cdf(x, loc, scale):
    return 0.5 * (1.0 + jax.lax.erf((x - loc) / (scale * jnp.sqrt(2.0))))


def load_importance_loss(scores_wo_noise, topk_logits, num_global_experts,
                         gate_noise):
    """Noisy top-k load + importance loss (reference losses.py:21-43).

    Args:
      scores_wo_noise: [S, E] softmax over un-noised logits.
      topk_logits: [S, K] noised logits gathered at the top-k ids.
      num_global_experts: E.
      gate_noise: noise std multiplier; must be > 0.
    """
    assert gate_noise > 0, (
        "`gate_noise` must be > 0 for normalization in load_importance_loss().")
    # Importance loss: coefficient of variation^2 of per-expert importance.
    # ddof=1 matches the reference's unbiased Tensor.var() default.
    impi = jnp.sum(scores_wo_noise.astype(jnp.float32), axis=0)
    l_imp = jnp.var(impi, ddof=1) / (jnp.mean(impi) ** 2 + 1e-10)

    # Load loss: prob of each expert's score exceeding the k-th threshold
    # under the injected Normal(0, gate_noise / E) noise.
    threshold = topk_logits[:, -1].reshape(-1, 1).astype(jnp.float32)
    diff = scores_wo_noise.astype(jnp.float32) - threshold
    prob = _normal_cdf(diff, 0.0, gate_noise / num_global_experts)
    load = jnp.sum(prob, axis=0)
    l_load = jnp.var(load, ddof=1) / (jnp.mean(load) ** 2 + 1e-10)

    return (l_imp + l_load) / 2.0
