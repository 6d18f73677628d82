"""Linear top-k gate (reference: tutel/gates/top.py:6-25).

Functional form: `init(key, ...) -> params`, `apply(params, x, ...) -> logits`.
The gate protocol mirrors the reference's Gate-module contract
(reference tutel/impls/moe_layer.py:222-226): a gate owns `top_k`,
`gate_noise` and `capacity_factor` attributes plus a logits function.
"""

import dataclasses
import os
from typing import Any, Dict

import jax.numpy as jnp

from ..utils import initializers


@dataclasses.dataclass
class LinearTopKGate:
    model_dim: int
    num_global_experts: int
    k: int = 1
    fp32_gate: bool = False
    capacity_factor: float = None
    gate_noise: float = 0.0

    def __post_init__(self):
        self.top_k = min(self.num_global_experts, int(self.k))
        if self.capacity_factor is None:
            # CAP_FACTOR env default (reference moe_layer.py:226)
            self.capacity_factor = float(os.environ.get("CAP_FACTOR", 1.0))

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        wg_dtype = jnp.float32 if self.fp32_gate else dtype
        # Stored [M, E] (input-major) — the TPU-friendly layout for x @ wg.
        return {"wg": initializers.linear_uniform(
            key, (self.model_dim, self.num_global_experts),
            fan_in=self.model_dim, dtype=wg_dtype)}

    def apply(self, params, x):
        wg = params["wg"]
        if self.fp32_gate:
            wg = wg.astype(jnp.float32)
            x = x.astype(jnp.float32)
        else:
            x = x.astype(wg.dtype)
        return jnp.matmul(x, wg, preferred_element_type=jnp.float32)


Gate = LinearTopKGate
