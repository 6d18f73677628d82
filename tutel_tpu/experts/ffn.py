"""Batched per-expert two-layer FFN (reference: tutel/experts/ffn.py:7-124).

Expert protocol (mirroring reference moe_layer.py:250-253): an expert owns
`init(key, dtype) -> params` and `apply(params, x, ctx) -> y` where
x is [E_local, rows, model_dim] and ctx carries per-call dynamic state
(megablocks_size, dispatch_count, adaptive_degree, sharded_count ...).

TPU-first layout: weights are stored input-major —
fc1_w [E, M, H], fc2_w [E, H, O] — so the expert matmuls are plain einsums
that XLA tiles straight onto the MXU (the reference stores [E, H, M] and
permutes per call, ffn.py:114).

When `ctx.megablocks_size > 0` and per-expert token counts are available,
the dropless grouped-GEMM path in ops/grouped_gemm.py is used instead of the
dense batched matmul (reference ffn.py:70-81 + custom_kernel.cpp:874-889).
"""

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils import initializers


@dataclasses.dataclass
class FusedExpertsNetwork:
    model_dim: int
    hidden_size_per_expert: int
    num_experts_per_device: int = 1
    sharded_count: int = 1
    activation_fn: Optional[Callable] = None
    output_dim: Optional[int] = None
    has_fc1_bias: bool = True
    has_fc2_bias: bool = True
    activation_bits: int = 0       # 8 = W8A8 integer-domain GEMMs
                                   # (ops/w8a8_pallas; inference-only)

    def __post_init__(self):
        assert self.hidden_size_per_expert % self.sharded_count == 0, (
            f"Can't evenly divide hidden_size_per_expert "
            f"({self.hidden_size_per_expert}) to {self.sharded_count} slices.")
        # Hidden dim owned by this shard (expert-slicing model parallelism,
        # reference ffn.py:16).
        self.hidden_size = self.hidden_size_per_expert // self.sharded_count
        self.output_dim = self.output_dim or self.model_dim
        if self.activation_fn is None:
            self.activation_fn = jax.nn.relu

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        e, m, h, o = (self.num_experts_per_device, self.model_dim,
                      self.hidden_size, self.output_dim)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "fc1_w": initializers.linear_uniform(k1, (e, m, h), fan_in=m,
                                                 dtype=dtype),
            "fc2_w": initializers.linear_uniform(k2, (e, h, o), fan_in=h,
                                                 dtype=dtype),
        }
        if self.has_fc1_bias:
            params["fc1_b"] = initializers.linear_uniform(
                k3, (e, h), fan_in=m, dtype=dtype)
        if self.has_fc2_bias:
            # fc2 bias is sharded over sharded_count (reference ffn.py:33).
            ob = (o + self.sharded_count - 1) // self.sharded_count
            params["fc2_b"] = initializers.linear_uniform(
                k4, (e, ob), fan_in=h, dtype=dtype)
        return params

    def apply(self, params, x, ctx=None):
        """x: [E_local, rows, M] -> [E_local, rows, output_dim]."""
        if int(os.environ.get("SKIP_EXPERT", "0")) != 0:
            return x  # reference ffn.py:58
        fc1_w, fc2_w = params["fc1_w"], params["fc2_w"]
        fc1_b = params.get("fc1_b")
        fc2_b = params.get("fc2_b")

        from ..ops.quant import QuantizedWeight
        if isinstance(fc1_w, QuantizedWeight):
            # interpret on non-TPU backends; the *target* platform comes
            # from the layer (ctx), not jax.devices()[0] — a virtual CPU
            # mesh may be in use while a TPU is attached.
            platform = getattr(ctx, "platform", None) \
                or jax.devices()[0].platform
            if self.activation_bits == 8:
                # W8A8: both GEMMs in the integer domain — no per-byte
                # weight dequant on the kernel's critical path
                from ..ops import w8a8_pallas
                return w8a8_pallas.w8a8_ffn(
                    x, params, ctx, activation_fn=self.activation_fn,
                    output_dim=self.output_dim,
                    interpret=platform != "tpu")
            # Weight-only INT8/INT4 inference: Pallas grouped GEMM with
            # fused dequant and megablocks row-narrowing.
            from ..ops import grouped_gemm_pallas
            return grouped_gemm_pallas.quantized_ffn(
                x, params, ctx, activation_fn=self.activation_fn,
                output_dim=self.output_dim,
                interpret=platform != "tpu")

        if ctx is not None and getattr(ctx, "megablocks_size", 0) > 0:
            from ..ops import grouped_gemm
            return grouped_gemm.megablocks_ffn(
                x, params, ctx, activation_fn=self.activation_fn,
                output_dim=self.output_dim)

        pe = jnp.float32 if x.dtype == jnp.float32 else None
        y = jnp.einsum("ecm,emh->ech", x, fc1_w.astype(x.dtype),
                       preferred_element_type=pe).astype(x.dtype)
        if fc1_b is not None:
            y = y + fc1_b.astype(y.dtype)[:, None, :]
        y = self.activation_fn(y)
        y = jnp.einsum("ech,eho->eco", y, fc2_w.astype(y.dtype),
                       preferred_element_type=pe).astype(y.dtype)
        if fc2_b is not None:
            bias = fc2_b.astype(y.dtype)[:, None, :]
            if bias.shape[-1] != self.output_dim:
                pad = self.output_dim - bias.shape[-1]
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad)))
            # Note: when adaptive_r > 1 the r partial-sum replicas each add
            # this bias once; the MoE layer pre-scales the gathered bias by
            # 1/r (reference ffn.py:108-109) before it reaches here.
            y = y + bias
        return y


ExpertModule = FusedExpertsNetwork


def _grouped_apply_ffn(self, params, rows, group_sizes, ctx=None):
    """Ragged-rows flavor for the true-dropless EP path (ops/ragged_ep.py):
    rows [N, M] grouped by local expert with group_sizes [E_l]."""
    from ..ops import grouped_gemm
    from ..ops.quant import QuantizedWeight
    fc1_w, fc2_w = params["fc1_w"], params["fc2_w"]
    if isinstance(fc1_w, QuantizedWeight):
        # keep the INT4/INT8 fused-dequant kernel on the ragged layout
        from ..ops.grouped_gemm_pallas import grouped_gemm_quant_ragged
        platform = getattr(ctx, "platform", None) \
            or jax.devices()[0].platform
        interpret = platform != "tpu"
        c_max = int(getattr(ctx, "ragged_c_max", 0) or rows.shape[0])

        stream = params.get("fused_stream")
        if stream is not None and stream.n >= self.output_dim:
            from ..ops.fused_ffn_pallas import vmem_bytes
            from ..ops.grouped_gemm_pallas import fused_ffn_quant_ragged
            # same chunk ladder as the dense path: the validated chunk
            # is passed through so the kernel can't exceed the budget
            for chunk in (512, 256, 128):
                if stream.bw % chunk == 0 and \
                        vmem_bytes(stream, c_max, rows.dtype, chunk) \
                        <= 15 * 1024 * 1024:
                    y = fused_ffn_quant_ragged(
                        rows, stream, group_sizes, c_max,
                        activation_fn=self.activation_fn,
                        interpret=interpret, chunk=chunk)
                    return y[..., :self.output_dim]
        y = grouped_gemm_quant_ragged(rows, fc1_w, group_sizes, c_max,
                                      interpret=interpret)
        if params.get("fc1_b") is not None:
            y = grouped_gemm.grouped_bias_add(y, params["fc1_b"],
                                              group_sizes)
        y = self.activation_fn(y)
        y = grouped_gemm_quant_ragged(y, fc2_w, group_sizes, c_max,
                                      interpret=interpret)
        if params.get("fc2_b") is not None:
            bias = params["fc2_b"]
            if bias.shape[-1] != self.output_dim:
                bias = jnp.pad(
                    bias, ((0, 0),
                           (0, self.output_dim - bias.shape[-1])))
            y = grouped_gemm.grouped_bias_add(y, bias, group_sizes)
        return y
    y = grouped_gemm.grouped_gemm(rows, fc1_w, group_sizes)
    if params.get("fc1_b") is not None:
        y = grouped_gemm.grouped_bias_add(y, params["fc1_b"], group_sizes)
    y = self.activation_fn(y)
    y = grouped_gemm.grouped_gemm(y, fc2_w, group_sizes)
    if params.get("fc2_b") is not None:
        bias = params["fc2_b"]
        if bias.shape[-1] != self.output_dim:
            bias = jnp.pad(bias, ((0, 0),
                                  (0, self.output_dim - bias.shape[-1])))
        y = grouped_gemm.grouped_bias_add(y, bias, group_sizes)
    return y


FusedExpertsNetwork.apply_grouped = _grouped_apply_ffn
