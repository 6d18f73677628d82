"""Cosine-similarity top-k gate (reference: tutel/gates/cosine_top.py:7-37).

Logits = cosine(proj(x), sim_matrix) * exp(clamp(temperature, max)).
"""

import dataclasses
import math
from typing import Any, Dict

import jax.numpy as jnp

from ..utils import initializers


@dataclasses.dataclass
class CosineTopKGate:
    model_dim: int
    num_global_experts: int
    k: int = 1
    fp32_gate: bool = False
    proj_dim: int = 256
    init_t: float = 0.5
    capacity_factor: float = 1.0
    gate_noise: float = 0.0

    def __post_init__(self):
        self.top_k = min(self.num_global_experts, int(self.k))
        self.clamp_max = math.log(1.0 / 0.01)

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        import jax
        k_w, k_b, k_sim = jax.random.split(key, 3)
        return {
            "temperature": jnp.full([1], math.log(1.0 / self.init_t),
                                    dtype=jnp.float32),
            "proj_w": initializers.linear_uniform(
                k_w, (self.model_dim, self.proj_dim),
                fan_in=self.model_dim, dtype=dtype),
            "proj_b": initializers.linear_uniform(
                k_b, (self.proj_dim,), fan_in=self.model_dim, dtype=dtype),
            "sim_matrix": initializers.normal(
                k_sim, (self.proj_dim, self.num_global_experts),
                std=0.01, dtype=dtype),
        }

    def apply(self, params, x):
        proj_w, sim_matrix = params["proj_w"], params["sim_matrix"]
        bias = params["proj_b"]
        if self.fp32_gate:
            x = x.astype(jnp.float32)
            proj_w = proj_w.astype(jnp.float32)
            sim_matrix = sim_matrix.astype(jnp.float32)
            bias = bias.astype(jnp.float32)
        proj = jnp.matmul(x.astype(proj_w.dtype), proj_w,
                          preferred_element_type=jnp.float32) + bias
        # L2-normalize rows of the projection and columns of sim_matrix.
        proj = proj / jnp.clip(
            jnp.linalg.norm(proj, axis=1, keepdims=True), 1e-12, None)
        sim = sim_matrix / jnp.clip(
            jnp.linalg.norm(sim_matrix, axis=0, keepdims=True), 1e-12, None)
        logits = jnp.matmul(proj, sim.astype(proj.dtype),
                            preferred_element_type=jnp.float32)
        logit_scale = jnp.exp(jnp.clip(params["temperature"].astype(jnp.float32),
                                       None, self.clamp_max))
        return logits * logit_scale


Gate = CosineTopKGate
