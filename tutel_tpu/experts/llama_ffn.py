"""Llama-style SwiGLU expert (reference: tutel/experts/llama_ffn.py:7-48).

y = W3( silu(x W1) * (x W2) )  per expert, batched over local experts.

Sharding note: the reference flattens each weight and ZeRO-shards it across
`sharded_count` ranks, all-gathering per forward (llama_ffn.py:9-16,33-36).
On TPU the same capability is expressed declaratively: the MoE layer places
these [E, M, H] / [E, H, M] tensors on the mesh with a sharded PartitionSpec
and XLA inserts the all-gather — see impls/moe_layer.py
(_expert_specs / _gather_expert_params).
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
        from ..ops.quant import QuantizedWeight
        if isinstance(params["w1"], QuantizedWeight):
            return self._apply_quantized(params, x, ctx)
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

    def _apply_quantized(self, params, x, ctx=None):
        """Weight-only INT8/INT4 SwiGLU via the fused-dequant grouped GEMM
        (single-device row narrowing from ctx.dispatch_count, like ffn)."""
        import os
        from ..ops.grouped_gemm_pallas import grouped_gemm_quant
        counts = getattr(ctx, "dispatch_count", None) if ctx else None
        interpret = jax.devices()[0].platform != "tpu"

        stream = params.get("fused_stream")
        if stream is not None:
            # single-kernel SwiGLU stream (ops/fused_ffn_pallas)
            from ..ops.fused_ffn_pallas import (fused_swiglu_quant,
                                                vmem_bytes)
            if vmem_bytes(stream, x.shape[1], x.dtype, per_tile=True) \
                    <= 15 * 1024 * 1024:
                return fused_swiglu_quant(
                    x, stream, counts, activation_fn=self.activation_fn,
                    interpret=interpret)

        bn = int(os.environ.get("TUTEL_TPU_GMM_BN", "1024"))
        y1 = grouped_gemm_quant(x, params["w1"], counts, bn=bn,
                                interpret=interpret)
        y2 = grouped_gemm_quant(x, params["w2"], counts, bn=bn,
                                interpret=interpret)
        y = self.activation_fn(y1) * y2
        return grouped_gemm_quant(y, params["w3"], counts, bn=bn,
                                  interpret=interpret)


ExpertModule = LlamaFFNNetwork
