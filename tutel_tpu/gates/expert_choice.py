"""Expert-choice gate (Zhou et al., 2022) — beyond-reference.

A linear router whose selection runs expert-side: each expert picks its
top-`capacity` tokens (capacity = capacity_factor * S / E), so load is
perfectly balanced by construction. The class carries the same protocol
attributes as the token-choice gates (top_k / gate_noise /
capacity_factor — reference tutel/impls/moe_layer.py:222-226) plus
`expert_choice = True`, which switches MOELayer into the EC flow
(ops/expert_choice.py): gather-encode, expert FFN, scatter-combine,
router z-loss auxiliary.
"""

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ..utils import initializers


@dataclasses.dataclass
class ExpertChoiceGate:
    model_dim: int
    num_global_experts: int
    capacity_factor: float = 2.0     # avg experts-per-token (C*E/S)
    fp32_gate: bool = False
    gate_noise: float = 0.0
    k: int = 1                       # accepted for model-config compat;
                                     # the EC selection ignores it
    expert_choice = True             # switches MOELayer to the EC flow
    top_k = 1                        # protocol filler; unused in EC

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        wg_dtype = jnp.float32 if self.fp32_gate else dtype
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


Gate = ExpertChoiceGate
