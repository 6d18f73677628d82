"""Parameter initializers matching common Linear-layer conventions."""

import math

import jax
import jax.numpy as jnp


def linear_uniform(key, shape, fan_in, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the standard Linear weight/bias
    init (kaiming-uniform with a=sqrt(5) collapses to this bound)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype=jnp.float32,
                              minval=-bound, maxval=bound).astype(dtype)


def normal(key, shape, std=0.01, dtype=jnp.float32):
    return (jax.random.normal(key, shape, dtype=jnp.float32) * std).astype(dtype)
