"""Llama-style SwiGLU expert (reference: tutel/experts/llama_ffn.py:7-48).

y = W3( silu(x W1) * (x W2) )  per expert, batched over local experts.

Sharding note: the reference flattens each weight and ZeRO-shards it across
`sharded_count` ranks, all-gathering per forward (llama_ffn.py:9-16,33-36).
On TPU the same capability is expressed declaratively: the MoE layer places
these [E, M, H] / [E, H, M] tensors on the mesh with a sharded PartitionSpec
and XLA inserts the all-gather — see parallel/moe_shard.py.
"""

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..utils import initializers


@dataclasses.dataclass
class LlamaFFNNetwork:
    model_dim: int
    hidden_size_per_expert: int
    num_experts_per_device: int = 1
    sharded_count: int = 1
    activation_fn: Callable = jax.nn.silu
    has_fc1_bias: bool = False
    has_fc2_bias: bool = False

    def __post_init__(self):
        self.hidden_size = self.hidden_size_per_expert
        self.output_dim = self.model_dim

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        e, m, h = (self.num_experts_per_device, self.model_dim,
                   self.hidden_size_per_expert)
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "w1": initializers.normal(k1, (e, m, h), std=0.01, dtype=dtype),
            "w2": initializers.normal(k2, (e, m, h), std=0.01, dtype=dtype),
            "w3": initializers.normal(k3, (e, h, m), std=0.01, dtype=dtype),
        }

    def apply(self, params, x, ctx=None):
        """x: [E_local, rows, M] -> [E_local, rows, M]."""
        w1 = params["w1"].astype(x.dtype)
        w2 = params["w2"].astype(x.dtype)
        w3 = params["w3"].astype(x.dtype)
        y1 = jnp.einsum("ecm,emh->ech", x, w1,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        y2 = jnp.einsum("ecm,emh->ech", x, w2,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        y = self.activation_fn(y1) * y2
        return jnp.einsum("ech,ehm->ecm", y, w3,
                          preferred_element_type=jnp.float32).astype(x.dtype)


ExpertModule = LlamaFFNNetwork
