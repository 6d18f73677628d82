"""The MoE layer orchestrator.

TPU-native re-design of the reference's MOELayer
(reference: tutel/impls/moe_layer.py:42-365). Same capability surface:

  * expert-count math incl. fractional experts (`num_local_experts=-r`)
  * parallel modes: data / model / auto / adaptive:r, switchable per call
  * per-call dynamic overrides: capacity_factor, top_k,
    a2a_ffn_overlap_degree, adaptive_r, megablocks_size, gate_index
  * capacity modes: padded (cf>0), dropless (cf==0), capped dropless (cf<0)
  * multiple gates, pluggable experts, postscore/prescore, batch-prioritized
    routing, gshard / load-importance losses

Architecture (TPU-first, not a port):

  * One *global-arrays* API: params and activations are global jax arrays;
    parallelism is a `shard_map` over a ('e', 'r', 'g') mesh
    (parallel/mesh.py) with `lax.all_to_all` on the expert/capacity dims —
    the XLA equivalent of the reference's NCCL a2a on dims (1, 0)
    (reference moe_layer.py:349-351).
  * Dynamic switching without recompilation penalty: every combination of
    static knobs (top_k, capacity bucket, r, overlap degree, ...) is a
    cached compiled variant; data-dependent capacities (dropless modes) are
    resolved by a tiny cached "count" program + host rounding to an
    alignment bucket, then dispatched to the matching variant. Tutel gets
    this from eager execution; here the variant cache is the mechanism
    (SURVEY.md section 7, step 8).
"""

import dataclasses
import math
import os
from types import SimpleNamespace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import net
from ..ops import dispatch as dispatch_ops
from ..ops import losses as losses_ops
from ..ops import routing as routing_ops
from ..parallel import mesh as mesh_lib
from .. import gates as gates_registry
from .. import experts as experts_registry


def _lcm(a, b):
    return a * b // math.gcd(a, b)


@dataclasses.dataclass(frozen=True)
class _VariantCfg:
    """Static configuration of one compiled forward variant."""
    gate_index: int
    top_k: int
    capacity: int
    adaptive_r: int            # 0 = data-parallel experts (no a2a)
    overlap_degree: int
    megablocks_size: int
    training: bool
    use_2dh: bool
    batch_prioritized: bool
    a2a_dtype: Any = None            # payload dtype for the a2a (bf16/fp8)
    has_valid: bool = False          # per-shard valid-token masking
    ragged_max_recv: int = 0         # >0: true-dropless ragged EP path
    dense_dispatch: bool = False     # top_k == E degenerate-routing path
    expert_choice: bool = False      # experts-pick-tokens routing (EC)


class MOELayer:
    """Tutel-capability MoE layer for JAX/TPU."""

    @staticmethod
    def global_expert_count(num_local_experts, world_size=1):
        """reference moe_layer.py:45-55 incl. the fractional float form."""
        if not isinstance(num_local_experts, int):
            num_local_experts = -int(1 / (num_local_experts + 1e-5))
        if num_local_experts == 0:
            raise Exception(
                "num_local_experts resolved to 0 (got %r); use a positive "
                "count, a negative shard degree, or a fractional float"
                % num_local_experts)
        if num_local_experts > 0:
            return num_local_experts * world_size
        assert world_size % -num_local_experts == 0, (
            f"num_local_experts={num_local_experts} shards each expert "
            f"across {-num_local_experts} devices, which must divide the "
            f"global device count ({world_size}).")
        return world_size // -num_local_experts

    def __init__(
        self,
        gate_type,
        model_dim: int,
        experts=None,
        scan_expert_func=None,
        result_func=None,
        group=None,                      # device sequence or ParallelEnv
        seeds=None,
        a2a_ffn_overlap_degree=1,
        is_postscore=True,
        batch_prioritized_routing=False,
        normalize_gate=True,
        is_gshard_loss=True,
        parallel_type="adaptive:1",
        use_2dh=False,
        remat_experts=False,             # jax.checkpoint the expert FFN
        dtype=jnp.float32,
        a2a_dtype=None,                  # cast a2a payload (e.g. bf16, fp8)
        capacity_bucket: int = 0,        # extra capacity rounding quantum
        num_hosts: Optional[int] = None, # dcn axis size for use_2dh
        **kwargs,
    ):
        assert model_dim % 2 == 0, (
            "model_dim must be even, got %s" % model_dim)
        for k in kwargs:
            raise Exception(
                "MOELayer got an unrecognized constructor argument: %s" % k)

        # --- devices / world ------------------------------------------------
        if group is None:
            self.devices = tuple(jax.devices())
        elif hasattr(group, "devices"):
            self.devices = tuple(group.devices)
        else:
            self.devices = tuple(group)
        self.world_size = len(self.devices)

        self.result_func = result_func
        self.model_dim = model_dim
        self.is_postscore = is_postscore
        # Debug env knobs with reference semantics (SURVEY.md section 5
        # config list): SKIP_MOE (moe_layer.py:114,256), BATCH_PRIO
        # (moe_layer.py:149), SKIP_A2A (communicate.py:40,184).
        self.skip_moe = int(os.environ.get("SKIP_MOE", "0")) != 0
        self.skip_a2a = int(os.environ.get("SKIP_A2A", "0")) != 0
        self.batch_prioritized_routing = batch_prioritized_routing
        if int(os.environ.get("BATCH_PRIO", "0")) != 0:
            self.batch_prioritized_routing = True
        self.normalize_gate = normalize_gate
        self.is_gshard_loss = is_gshard_loss
        self.a2a_ffn_overlap_degree = a2a_ffn_overlap_degree
        self.use_2dh = use_2dh
        self.remat_experts = remat_experts
        self.dtype = dtype
        self.a2a_dtype = a2a_dtype
        self.capacity_bucket = capacity_bucket
        self.num_hosts = num_hosts or mesh_lib.infer_num_hosts(self.devices)

        # --- expert-count math (reference moe_layer.py:116-129) -------------
        experts = dict(experts or {})
        self.num_local_experts = experts.pop(
            "count_per_node", experts.pop("num_experts_per_device", 1))
        if self.num_local_experts == -1:
            self.num_local_experts = 1
        self.num_global_experts = MOELayer.global_expert_count(
            self.num_local_experts, self.world_size)
        if self.num_global_experts < self.world_size:
            self.sharded_count = self.world_size // self.num_global_experts
            self.num_local_experts = 1
        else:
            self.sharded_count = 1
        self.auto_parallel, self.adaptive_degree = False, self.sharded_count
        self.valid_rs = [0] + [i for i in range(1, self.sharded_count + 1)
                               if self.sharded_count % i == 0]

        if parallel_type.startswith("adaptive:"):
            self.adaptive_degree = int(parallel_type.split(":", 1)[1])
            self.adaptive_degree = min(max(self.adaptive_degree, 0),
                                       self.sharded_count)
            if self.adaptive_degree not in self.valid_rs:
                raise Exception(
                    "Unexpected value of adaptive_degree: %d, expecting a "
                    "candidate within %s." % (self.adaptive_degree,
                                              self.valid_rs))
        elif self.sharded_count == 1:
            pass
        elif parallel_type in ("data", "model"):
            self.adaptive_degree = (1 if parallel_type == "data"
                                    else self.sharded_count)
        elif parallel_type == "auto":
            self.auto_parallel, self.adaptive_degree = True, 1
        else:
            raise Exception(
                "Unrecognized parallel type specified: %s" % parallel_type)

        # --- experts ---------------------------------------------------------
        experts_type = experts.pop("type")
        extra = dict(experts)
        if experts_type == "custom":
            expert_cls = extra.pop("module")
        else:
            expert_cls = experts_registry.resolve(experts_type)
        # Local-view module (what runs on each device) and a global-view
        # module (used for parameter init and checkpoints).
        self.experts = expert_cls(
            model_dim=self.model_dim,
            num_experts_per_device=self.num_local_experts,
            sharded_count=self.sharded_count, **extra)
        self.experts_global = expert_cls(
            model_dim=self.model_dim,
            num_experts_per_device=self.num_global_experts,
            sharded_count=1, **extra)
        self.scan_expert_func = scan_expert_func

        # --- gates (reference moe_layer.py:197-230) --------------------------
        if isinstance(gate_type, str):
            import re
            assert re.match(r"^Top[0-9]+Gate$", gate_type), (
                "Unrecognized gate_type: %s" % gate_type)
            gate_type = {"type": "top", "k": int(gate_type[3:-4])}
        if not isinstance(gate_type, list):
            gate_type = [gate_type]
        self.gates = []
        for single in gate_type:
            single = dict(single)
            g_type = single.pop("type")
            if g_type == "custom":
                gate_cls = single.pop("module")
            else:
                gate_cls = gates_registry.resolve(g_type)
            self.gates.append(gate_cls(
                model_dim=self.model_dim,
                num_global_experts=self.num_global_experts, **single))

        self.seeds = seeds
        self._jit_cache: Dict[Any, Any] = {}
        self._count_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init(self, key=None) -> Dict[str, Any]:
        """Create global-shape parameters.

        Expert params have the *global* logical shape (e.g. fc1_w
        [E_global, M, H_full]); sharding is declarative via
        `shard_params`. Gate params are replicated.
        """
        if key is None:
            seeds = self.seeds or (1, 1, 1)
            gate_key = jax.random.PRNGKey(seeds[0] if seeds[0] is not None else 1)
            expert_key = jax.random.PRNGKey(seeds[1] if seeds[1] is not None else 1)
        else:
            gate_key, expert_key = jax.random.split(key)
        gate_params = []
        for gi, gate in enumerate(self.gates):
            gate_params.append(gate.init(jax.random.fold_in(gate_key, gi),
                                         dtype=self.dtype))
        expert_params = self.experts_global.init(expert_key, dtype=self.dtype)
        if self.scan_expert_func is not None:
            for name, p in expert_params.items():
                self.scan_expert_func(name, p)
        return {"gates": gate_params, "experts": expert_params}

    def _expert_shard_axes(self):
        """param name -> (expert_dim, shard_dim) for the expert params."""
        default = {
            "fc1_w": (0, 2), "fc1_b": (0, 1),
            "fc2_w": (0, 1), "fc2_b": (0, 1),
            "w1": (0, 2), "w2": (0, 2), "w3": (0, 1),
        }
        return getattr(self.experts, "shard_axes", lambda: default)() \
            if hasattr(self.experts, "shard_axes") else default

    def _expert_specs(self, ep_axes):
        """PartitionSpecs for expert params on the current mesh."""
        shard_axes = self._expert_shard_axes()
        specs = {}
        for name, (e_dim, s_dim) in shard_axes.items():
            spec = [None, None, None, None]
            if self.sharded_count == 1:
                spec[e_dim] = ep_axes  # experts sharded over the whole world
            else:
                spec[e_dim] = "e"
                if s_dim is not None:
                    spec[s_dim] = ("r", "g")
            specs[name] = P(*spec[:4])
        return specs

    def _gate_param_struct(self, params):
        return [jax.tree.map(lambda _: P(), g) for g in params["gates"]]

    def shard_params(self, params, adaptive_r=None):
        """Place params on the mesh with their canonical shardings.

        Works in multi-controller (multi-host) runs too: when the mesh
        spans processes, `jax.device_put` cannot target non-addressable
        devices, so each process contributes its addressable shards via
        `jax.make_array_from_callback` (params are deterministic from the
        seeds, so every process holds the same host copy)."""
        if self.world_size == 1:
            return params
        mesh = self._mesh(adaptive_r if adaptive_r is not None
                          else max(self.adaptive_degree, 1))

        def put(v, spec):
            sharding = NamedSharding(mesh, spec)
            if jax.process_count() > 1:
                import numpy as np
                host = np.asarray(v)
                return jax.make_array_from_callback(
                    host.shape, sharding, lambda idx: host[idx])
            return jax.device_put(v, sharding)

        ep_axes = self._ep_axes()
        especs = self._expert_specs(ep_axes)

        def put_expert(k, v):
            from ..ops.quant import QuantizedWeight
            from ..ops.fused_ffn_pallas import FusedFFNStream
            if isinstance(v, FusedFFNStream):
                import dataclasses
                if self.sharded_count > 1:
                    raise ValueError(
                        "fused weight streams don't support "
                        "expert-slicing TP (sharded_count="
                        f"{self.sharded_count}); drop the "
                        "'fused_stream' entry for TP layouts")
                return dataclasses.replace(
                    v, wstream=put(v.wstream, P(ep_axes)),
                    sb=put(v.sb, P(ep_axes)))
            spec = especs.get(k, (ep_axes,))
            self._check_quant_sliceable(k, v, spec)
            if isinstance(v, QuantizedWeight):
                # values carry the full spec; scales are [E, 1, N] — drop
                # the shard axis on any size-1 dim (TP x quantized
                # weights: a K-sliced matrix keeps replicated scales).
                sspec = [s if v.scales.shape[i] != 1 else None
                         for i, s in enumerate(spec[:v.scales.ndim])]
                return QuantizedWeight(
                    values=put(v.values, P(*spec[:v.values.ndim])),
                    scales=put(v.scales, P(*sspec)),
                    bits=v.bits, orig_k=v.orig_k, blocks=v.blocks)
            return put(v, P(*spec[:v.ndim]))

        out = dict(params)
        out["experts"] = {
            k: put_expert(k, v) for k, v in params["experts"].items()}
        out["gates"] = [
            jax.tree.map(lambda v: put(v, P()), g)
            for g in params["gates"]]
        return out

    # ------------------------------------------------------------------
    # Mesh plumbing
    # ------------------------------------------------------------------

    def _ep_axes(self):
        return ("dcn", "ici") if self._flat_2dh() else ("e", "r", "g")

    def _flat_2dh(self):
        return self.use_2dh and self.sharded_count == 1

    def _mesh(self, adaptive_r):
        import numpy as np
        if self._flat_2dh():
            arr = np.asarray(self.devices, dtype=object).reshape(
                self.num_hosts, self.world_size // self.num_hosts)
            return Mesh(arr, ("dcn", "ici"))
        r = max(adaptive_r, 1)
        g = self.sharded_count // r
        arr = np.asarray(self.devices, dtype=object).reshape(
            self.world_size // self.sharded_count, r, g)
        return Mesh(arr, ("e", "r", "g"))

    # ------------------------------------------------------------------
    # Capacity / alignment math (reference moe_layer.py:298-301,
    # fast_dispatch.py:188-199)
    # ------------------------------------------------------------------

    def _alignment(self, overlap_degree, megablocks_size):
        mega_up = max(megablocks_size, 1)
        base = self.sharded_count * overlap_degree
        alignment = (base + mega_up - 1) // mega_up * mega_up
        if alignment > 256:
            alignment = (alignment + 127) // 128 * 128
        # The reshape/chunk steps need capacity % (sharded*degree) == 0; the
        # reference asserts this at overlap time (overlap.py:10-11), we bake
        # it into the rounding quantum.
        alignment = _lcm(alignment, base)
        if self.capacity_bucket:
            alignment = _lcm(alignment, self.capacity_bucket)
        return alignment

    def _static_capacity(self, local_samples, top_k, capacity_factor,
                         overlap_degree, megablocks_size):
        alignment = self._alignment(overlap_degree, megablocks_size)
        return routing_ops.compute_static_capacity(
            local_samples, self.num_global_experts, top_k, capacity_factor,
            alignment=alignment)

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------

    def __call__(self, params, x, key=None, gate_index=0,
                 capacity_factor=None, top_k=None,
                 a2a_ffn_overlap_degree=None, reserve_dims=1,
                 inequivalent_tokens=False, valid_tokens=None,
                 adaptive_r=None, megablocks_size=0, training=False,
                 capacity_override=None, use_ragged_ep=False,
                 max_recv=None):
        """Forward pass. Returns (output, l_aux).

        Mirrors the reference forward's per-call dynamic arguments
        (reference moe_layer.py:255). All of them resolve to a static
        variant key; switching between previously seen values costs a dict
        lookup (no recompilation).

        Dropless modes (capacity_factor <= 0) resolve the data-dependent
        capacity with a tiny cached count program + host sync (the same
        sync Tutel pays, fast_dispatch.py:191-193). Inside an enclosing
        `jax.jit` trace no host sync is possible, so the layer falls back
        to the worst-case capacity (top_k * local tokens, always lossless);
        pass `capacity_override` (from `resolve_capacity`, bucketed) to keep
        tight buffers under an outer jit.

        Variable per-rank token counts (the reference's
        `inequivalent_tokens`, fast_dispatch.py:182-185): static shapes
        stay equal across shards; validity is data. `valid_tokens` may be

          * a scalar — the number of valid tokens in the *globally packed*
            flat buffer (rows [0, n) valid, the tail is padding); per-shard
            valid counts are derived as clip(n - shard*local, 0, local);
          * a [world_size] vector — per-shard valid counts directly (each
            shard masks its first valid_tokens[shard] rows). This is the
            SPMD form of `inequivalent_tokens=True`.

        Padding rows take no expert slot, contribute nothing to l_aux, and
        produce zero output. `inequivalent_tokens=True` requires
        `valid_tokens`; the reference's MAX-sample-count sync is subsumed
        by the equal static shapes.
        """
        if self.skip_moe:
            # reference moe_layer.py:256-258: bypass entirely
            out = self.result_func(x) if self.result_func else x
            return out, jnp.zeros((), jnp.float32)
        if inequivalent_tokens and valid_tokens is None:
            raise ValueError(
                "inequivalent_tokens=True: per-rank token counts differ, "
                "but no validity data was given. Under SPMD the shapes stay "
                "equal across shards (the reference's MAX-sample-count "
                "sync, fast_dispatch.py:182-185, is implicit); pass "
                "valid_tokens (scalar global count or [world_size] "
                "per-shard counts) so padding rows are masked out.")
        gate = self.gates[gate_index]
        if a2a_ffn_overlap_degree is not None:
            self.a2a_ffn_overlap_degree = a2a_ffn_overlap_degree
        overlap_degree = self.a2a_ffn_overlap_degree
        top_k = int(top_k or gate.top_k)
        top_k = min(top_k, self.num_global_experts)
        if adaptive_r is not None:
            self.adaptive_degree = adaptive_r
        r = self.adaptive_degree
        assert r in self.valid_rs, (
            f"adaptive_r={r} not within valid candidates {self.valid_rs}")

        if megablocks_size > 0:
            # reference moe_layer.py:278-280: megablocks is a single-device
            # multi-local-expert inference optimization.
            if self.num_local_experts <= 1 or training or self.world_size > 1:
                megablocks_size = 0

        cf = capacity_factor if capacity_factor is not None \
            else gate.capacity_factor

        original_shape = x.shape
        assert len(original_shape) >= 2, (
            "Input data must be at least 2D tensor: (s)amples, .., "
            "(m)odel_dim")
        reserve_shape = original_shape[-reserve_dims:]
        flat_m = 1
        for d in reserve_shape:
            flat_m *= int(d)
        x2 = x.reshape(-1, flat_m).astype(self.dtype)
        num_samples = x2.shape[0]
        assert num_samples % self.world_size == 0, (
            f"global token count {num_samples} must divide the "
            f"{self.world_size}-device world")
        local_samples = num_samples // self.world_size

        if key is None:
            key = jax.random.PRNGKey(0)

        # --- resolve static capacity -----------------------------------
        alignment = self._alignment(overlap_degree, megablocks_size)
        ec_mode = bool(getattr(gate, "expert_choice", False))
        if ec_mode:
            # Expert-choice: capacity_factor is the average number of
            # experts per token, so C = cf * S / E; balanced by
            # construction (ops/expert_choice.py). Under EP (and
            # expert-slicing TP) the top-C sees the global token pool
            # via a score-only all_gather; activations travel by a
            # ragged a2a sized by the selection (O(capacity) wire,
            # x sharded_count under TP since every slice holder needs
            # the rows). On a 2DH ('dcn','ici') mesh the exchange runs
            # flat over both tiers (a hierarchical ragged decomposition
            # is a perf refinement, not a correctness need). Ragged EP
            # is token-choice machinery — EC's exchange is already
            # exactly-sized, so the flag has nothing to add.
            assert not use_ragged_ep, (
                "expert-choice routing has its own exactly-sized ragged "
                "exchange; use_ragged_ep does not apply")
            if capacity_override is not None:
                cap = int(capacity_override)
            else:
                assert cf > 0, "expert-choice needs capacity_factor > 0"
                cap = max(1, int(cf * num_samples
                                 / self.num_global_experts))
            capacity = min(routing_ops.align_capacity(cap, alignment),
                           num_samples)
        elif capacity_override is not None:
            capacity = routing_ops.align_capacity(
                int(capacity_override), alignment)
        elif cf > 0:
            capacity = self._static_capacity(
                local_samples, top_k, cf, overlap_degree, megablocks_size)
        elif isinstance(x, jax.core.Tracer):
            # Enclosing jit: no host sync available; use the lossless
            # worst case (every local token lands on one expert).
            capacity = local_samples
            if cf < 0:
                capacity = min(capacity, routing_ops.capped_capacity_limit(
                    local_samples, self.num_global_experts, top_k, cf))
            capacity = routing_ops.align_capacity(capacity, alignment)
        else:
            needed = int(self._count_forward(
                params, x2, key, gate_index, top_k, training))
            capacity = max(1, needed)
            if cf < 0:
                capacity = min(capacity, routing_ops.capped_capacity_limit(
                    local_samples, self.num_global_experts, top_k, cf))
            capacity = routing_ops.align_capacity(capacity, alignment)
        if not ec_mode:
            capacity = min(capacity,
                           routing_ops.align_capacity(
                               top_k * local_samples,
                               self._alignment(overlap_degree,
                                               megablocks_size)))

        if self.auto_parallel and adaptive_r is None \
                and self.sharded_count > 1:
            # reference moe_layer.py:335-336: model-parallel when
            # replicating the dispatched activations r-fold costs less
            # than re-gathering the expert weights every step.
            local_param_numel = sum(
                leaf.size for leaf in jax.tree.leaves(params["experts"])
            ) // self.world_size
            y_numel = self.num_global_experts * capacity * flat_m
            use_mp = y_numel * (self.sharded_count - 1) * 2 \
                < local_param_numel
            r = self.sharded_count if use_mp else 1
            self.adaptive_degree = r

        ragged_max_recv = 0
        if use_ragged_ep:
            # True-dropless ragged EP (ops/ragged_ep.py): tokens ride
            # lax.ragged_all_to_all instead of padded capacity buffers.
            assert self.world_size > 1 and self.sharded_count == 1, (
                "ragged EP needs a multi-device pure-EP layout")
            assert cf == 0 and valid_tokens is None \
                and megablocks_size == 0, (
                "ragged EP is the dropless path "
                "(capacity_factor=0, no masking/megablocks)")
            t_rows = top_k * local_samples
            worst = routing_ops.align_capacity(
                self.world_size * t_rows, 128)
            if max_recv:
                # Explicit caller bound. Rows beyond it are dropped by the
                # ragged all-to-all (come back zero); only pass this when
                # the routing skew is genuinely bounded.
                ragged_max_recv = min(int(max_recv), worst)
            elif isinstance(x, jax.core.Tracer):
                # No host sync under an outer jit: use the lossless worst
                # case (every device routes everything to one device's
                # experts). Pass max_recv from `resolve_max_recv` to keep
                # the buffer tight.
                ragged_max_recv = worst
            else:
                # Probe the real bound (pmax over per-device received-row
                # totals) — the same two-phase discipline as dropless
                # capacities, so skewed routing can never silently
                # truncate.
                needed = int(self._ragged_count_forward(
                    params, x2, key, gate_index, top_k, training))
                ragged_max_recv = min(
                    routing_ops.align_capacity(max(needed, 1), 128), worst)

        # Degenerate routing: when every token routes to every expert
        # (top_k == E) and nothing is dropped, dispatch is algebraically a
        # broadcast + weighted combine — no row gathers, no slot
        # permutation (ops/dispatch.py dense_encode). Single-device only:
        # under EP the a2a needs the slot layout.
        dense_dispatch = (
            self.world_size == 1
            and not ec_mode
            and top_k == self.num_global_experts
            and capacity >= local_samples
            and megablocks_size == 0
            and os.environ.get("TUTEL_TPU_DENSE_DISPATCH", "1") != "0")

        cfg = _VariantCfg(
            gate_index=gate_index, top_k=top_k, capacity=capacity,
            adaptive_r=r, overlap_degree=overlap_degree,
            megablocks_size=megablocks_size, training=training,
            use_2dh=self._flat_2dh(),
            batch_prioritized=self.batch_prioritized_routing,
            a2a_dtype=self.a2a_dtype,
            has_valid=valid_tokens is not None,
            ragged_max_recv=ragged_max_recv,
            dense_dispatch=dense_dispatch,
            expert_choice=ec_mode)

        fn = self._jit_cache.get(cfg)
        if fn is None:
            fn = jax.jit(self._build_forward(cfg),
                         compiler_options=self._compiler_options(cfg))
            self._jit_cache[cfg] = fn
        if valid_tokens is not None:
            vt = jnp.asarray(valid_tokens, jnp.int32).reshape(-1)
            if vt.size == 1:
                # scalar = global valid count over the packed flat buffer;
                # shard i owns rows [i*local, (i+1)*local)
                starts = jnp.arange(self.world_size, dtype=jnp.int32) \
                    * local_samples
                valid = jnp.clip(vt[0] - starts, 0, local_samples)
            else:
                assert vt.size == self.world_size, (
                    f"valid_tokens must be a scalar or a "
                    f"[world_size={self.world_size}] vector, got {vt.size}")
                valid = vt
            out, l_aux = fn(params, x2, key, valid)
        else:
            out, l_aux = fn(params, x2, key)
        out = out.reshape(*original_shape[:-reserve_dims],
                          *reserve_shape[:-1], -1)
        if self.result_func is not None:
            out = self.result_func(out)
        return out, l_aux

    # alias matching reference naming
    forward = __call__

    def resolve_capacity(self, params, x, key=None, gate_index=0, top_k=None,
                         training=False, reserve_dims=1,
                         a2a_ffn_overlap_degree=None, megablocks_size=0):
        """Host-side dropless capacity query (bucketed to the alignment
        quantum). Use the result as `capacity_override` inside an enclosing
        jit to keep dropless buffers tight."""
        gate = self.gates[gate_index]
        top_k = min(int(top_k or gate.top_k), self.num_global_experts)
        flat_m = 1
        for d in x.shape[-reserve_dims:]:
            flat_m *= int(d)
        x2 = x.reshape(-1, flat_m).astype(self.dtype)
        if key is None:
            key = jax.random.PRNGKey(0)
        needed = int(self._count_forward(
            params, x2, key, gate_index, top_k, training))
        alignment = self._alignment(
            a2a_ffn_overlap_degree or self.a2a_ffn_overlap_degree,
            megablocks_size)
        return routing_ops.align_capacity(max(1, needed), alignment)

    def param_specs(self, params):
        """PartitionSpec pytree matching `params`, for composing this
        layer under an OUTER shard_map on a mesh that carries the
        layer's expert axes (PP x EP, SP x EP): pass the result as the
        in_specs entry for the layer's params next to `local_forward`.
        Mirrors `shard_params` placement: experts sharded over the
        expert axes (QuantizedWeight scales keep size-1 dims
        replicated; fused streams shard like any expert leaf), gates
        replicated."""
        if self.world_size == 1:
            return jax.tree.map(lambda _: P(), params)
        from ..ops.quant import QuantizedWeight
        from ..ops.fused_ffn_pallas import FusedFFNStream
        ep_axes = self._ep_axes()
        especs = self._expert_specs(ep_axes)

        def espec(k, v):
            if isinstance(v, FusedFFNStream):
                if self.sharded_count > 1:
                    raise ValueError(
                        "fused weight streams don't support "
                        "expert-slicing TP")
                import dataclasses
                return dataclasses.replace(
                    v, wstream=P(ep_axes), sb=P(ep_axes))
            spec = especs.get(k, (ep_axes,))
            self._check_quant_sliceable(k, v, spec)
            if isinstance(v, QuantizedWeight):
                sspec = [s if v.scales.shape[i] != 1 else None
                         for i, s in enumerate(spec[:v.scales.ndim])]
                return QuantizedWeight(
                    values=P(*spec[:v.values.ndim]), scales=P(*sspec),
                    bits=v.bits, orig_k=v.orig_k, blocks=v.blocks)
            return P(*spec[:v.ndim])

        out = dict(params)
        out["experts"] = {k: espec(k, v)
                          for k, v in params["experts"].items()}
        out["gates"] = [jax.tree.map(lambda _: P(), g)
                        for g in params["gates"]]
        return out

    def local_forward(self, gate_index=0, capacity_factor=None,
                      top_k=None, adaptive_r=None, training=False,
                      capacity_override=None):
        """Per-device forward for composing under an OUTER shard_map.

        Use this to nest the MoE layer inside a larger SPMD program —
        e.g. PP x EP on a combined ('pp', 'e', 'r', 'g') mesh, where a
        pipeline schedule owns the 'pp' axis and this layer's expert
        collectives ride the ('e', 'r', 'g') axes of the SAME mesh
        (nothing like this exists in the reference, which has no
        pipeline parallelism — SURVEY.md §2.3).

        Returns fn(params, x_local, key) -> (out_local, l_aux) where
        x_local is THIS device's token shard [local_samples, M]. The
        capacity must be statically resolvable: pass capacity_factor>0
        or capacity_override (from `resolve_capacity`); the dropless
        host-probe path needs the top-level `__call__`.
        """
        gate = self.gates[gate_index]
        tk = min(int(top_k or gate.top_k), self.num_global_experts)
        cf = capacity_factor if capacity_factor is not None \
            else gate.capacity_factor
        r = adaptive_r if adaptive_r is not None else self.adaptive_degree
        assert r in self.valid_rs, (r, self.valid_rs)
        overlap = self.a2a_ffn_overlap_degree

        ec_mode = bool(getattr(gate, "expert_choice", False))

        def fn(params, x_local, key):
            local_samples = x_local.shape[0]
            align = self._alignment(overlap, 0)
            if ec_mode:
                # EC capacity: cf = avg experts per token over the
                # GLOBAL token pool (the EP branch of the body gathers
                # scores/activations across the expert axes)
                num_samples = local_samples * self.world_size
                if capacity_override is not None:
                    cap = int(capacity_override)
                else:
                    assert cf > 0, "expert-choice needs capacity_factor > 0"
                    cap = max(1, int(cf * num_samples
                                     / self.num_global_experts))
                capacity = min(routing_ops.align_capacity(cap, align),
                               num_samples)
            elif capacity_override is not None:
                capacity = routing_ops.align_capacity(
                    int(capacity_override), align)
            else:
                assert cf > 0, (
                    "local_forward needs a static capacity: pass "
                    "capacity_factor > 0 or capacity_override")
                capacity = self._static_capacity(
                    local_samples, tk, cf, overlap, 0)
            if not ec_mode:
                capacity = min(capacity, routing_ops.align_capacity(
                    tk * local_samples, align))
            cfg = _VariantCfg(
                gate_index=gate_index, top_k=tk, capacity=capacity,
                adaptive_r=r, overlap_degree=overlap,
                megablocks_size=0, training=training,
                use_2dh=self._flat_2dh(),
                batch_prioritized=self.batch_prioritized_routing,
                a2a_dtype=self.a2a_dtype, has_valid=False,
                ragged_max_recv=0, dense_dispatch=False,
                expert_choice=ec_mode)
            body = self._build_body(cfg)
            return body(params["gates"][gate_index], params["experts"],
                        x_local.astype(self.dtype), key)
        return fn

    def _compiler_options(self, cfg: _VariantCfg):
        """XLA options per variant. The chunked a2a/FFN pipeline
        (reference overlap.py:8-67) only overlaps if XLA splits the
        all-to-alls into async start/done pairs and schedules the expert
        dots inside the in-flight windows; on TPU that is opt-in.
        tests/test_overlap_hlo.py asserts the resulting schedule."""
        if cfg.overlap_degree > 1 and self.devices \
                and getattr(self.devices[0], "platform", None) == "tpu":
            return {"xla_tpu_enable_async_all_to_all": "True",
                    "xla_tpu_enable_latency_hiding_scheduler": "True"}
        return None

    # ------------------------------------------------------------------
    # Compiled-variant builders
    # ------------------------------------------------------------------

    def _routing_local(self, cfg: _VariantCfg, gate_params, x_local, key,
                       token_mask=None):
        """Per-device routing: logits -> noised scores -> extract_critical."""
        gate = self.gates[cfg.gate_index]
        logits = gate.apply(gate_params, x_local)
        if cfg.training and gate.gate_noise > 0:
            noise = jax.random.normal(key, logits.shape, dtype=logits.dtype)
            logits_w_noise = logits + gate.gate_noise * noise \
                / self.num_global_experts
        else:
            logits_w_noise = logits
        scores = jax.nn.softmax(logits_w_noise, axis=1)
        if self.is_gshard_loss:
            loss_fn = losses_ops.gshard_loss
        else:
            def loss_fn(s, topk_ids):
                return losses_ops.load_importance_loss(
                    jax.nn.softmax(logits, axis=1),
                    jnp.take_along_axis(logits_w_noise, topk_ids, axis=1),
                    self.num_global_experts, gate.gate_noise)
        return routing_ops.extract_critical(
            scores, cfg.top_k, capacity=cfg.capacity, loss_fn=loss_fn,
            batch_prioritized_routing=cfg.batch_prioritized,
            normalize_gate=self.normalize_gate, token_mask=token_mask)

    def _apply_experts(self, eff_params, y, ctx):
        if self.remat_experts:
            # rematerialize expert activations in backward: trades FLOPs
            # for HBM (jax.checkpoint; SURVEY.md-recommended knob for
            # memory-bound training)
            return jax.checkpoint(
                lambda p, t: self.experts.apply(p, t, ctx))(eff_params, y)
        return self.experts.apply(eff_params, y, ctx)

    def _expert_ctx(self, cfg: _VariantCfg, crit):
        # dispatch_count indexes the *local* routing decision; after the EP
        # all-to-all the expert buffer holds rows from every device, so
        # count-based row narrowing (megablocks / quantized grouped GEMM)
        # is only sound single-device (reference moe_layer.py:278-280
        # scopes megablocks the same way).
        return SimpleNamespace(
            megablocks_size=cfg.megablocks_size,
            dispatch_count=crit.dispatch_count if self.world_size == 1
            else None,
            adaptive_degree=max(cfg.adaptive_r, 1),
            sharded_count=self.sharded_count,
            num_global_experts=self.num_global_experts,
            platform=self.devices[0].platform,
        )

    def _check_quant_sliceable(self, name, v, spec):
        """Slicing an INT4 weight's PACKED contraction dim (dim 1 of
        [E, Kq, N] values) only commutes with nibble unpacking when the
        packing was done per shard block (quantize(shard_blocks=
        sharded_count)). Quantizing with the default blocks=1 and then
        TP-slicing silently interleaves split-half pairs — guard it."""
        from ..ops.quant import QuantizedWeight
        if not isinstance(v, QuantizedWeight) or v.bits != 4 \
                or self.sharded_count <= 1:
            return
        k_sliced = len(spec) > 1 and spec[1] is not None
        if k_sliced and v.blocks != self.sharded_count:
            raise ValueError(
                f"INT4 expert weight {name!r} is K-sliced over "
                f"sharded_count={self.sharded_count} but was packed "
                f"with shard_blocks={v.blocks}; slicing would "
                f"interleave nibble-packing halves. Quantize with "
                f"quantize_expert_params(..., sharded_count="
                f"{self.sharded_count}).")

    def _local_quant_view(self, expert_params):
        """Inside the shard_map body, K-sliced INT4 weights are plain
        split-half packings of their LOCAL K range (quantize packed
        per shard block precisely so slicing and unpacking commute) —
        rewrite the global blocks metadata to the local view so every
        consumer (kernel, dequantize, regather) sees this array's true
        packing."""
        if self.sharded_count <= 1:
            return expert_params
        import dataclasses
        from ..ops.quant import QuantizedWeight
        shard_axes = self._expert_shard_axes()
        out = {}
        for name, p in expert_params.items():
            if isinstance(p, QuantizedWeight) and p.bits == 4 \
                    and p.blocks > 1 \
                    and shard_axes.get(name, (0, None))[1] is not None:
                p = dataclasses.replace(p, blocks=1)
            out[name] = p
        return out

    def _gather_expert_params(self, expert_params, cfg: _VariantCfg):
        """Regather sharded expert weights for the chosen adaptive_r
        (reference experts/ffn.py:83-109 zero_gather choreography)."""
        from ..ops.quant import QuantizedWeight
        shard_axes = self._expert_shard_axes()
        r = cfg.adaptive_r

        def gather(p, axes, dim, k_shards=1):
            """all_gather that understands QuantizedWeight leaves: the
            packed values gather on `dim`; the [E, 1, N] scales gather
            only where their dim is real (size > 1) — a K-sliced
            quantized matrix keeps its scales replicated.

            k_shards: number of contiguous K-slices this gather
            concatenates (INT4 K-sliced weights are nibble-packed
            *per shard block* — quantize(shard_blocks=...) — so a
            gather of n slices yields an n-block split-half layout;
            the grouped-GEMM kernel and dequantize unpack it
            block-aware via the blocks field)."""
            if isinstance(p, QuantizedWeight):
                vals = lax.all_gather(p.values, axes, axis=dim, tiled=True)
                scales = p.scales
                if scales.shape[dim] != 1:
                    scales = lax.all_gather(scales, axes, axis=dim,
                                            tiled=True)
                # block count only grows when concatenating K-slices —
                # dim 1 is the (packed) contraction dim of [E, K, N]
                blocks = p.blocks * (
                    k_shards if p.bits == 4 and dim == 1 else 1)
                return QuantizedWeight(values=vals, scales=scales,
                                       bits=p.bits, orig_k=p.orig_k,
                                       blocks=blocks)
            return lax.all_gather(p, axes, axis=dim, tiled=True)

        g_size = self.sharded_count // max(r, 1)
        out = {}
        for name, p in expert_params.items():
            e_dim, s_dim = shard_axes.get(name, (0, None))
            if r == 0:
                # DP-expert mode: gather everything to global shapes.
                if self.sharded_count > 1:
                    if s_dim is not None:
                        p = gather(p, "g", s_dim, k_shards=g_size)
                        p = gather(p, "r", s_dim,
                                   k_shards=self.sharded_count // g_size)
                    p = gather(p, "e", e_dim)
                elif cfg.use_2dh:
                    p = gather(p, ("dcn", "ici"), e_dim)
                else:
                    p = gather(p, ("e", "r", "g"), e_dim)
            elif self.sharded_count > 1 and s_dim is not None:
                if name == "fc2_b":
                    # Output-dim bias: needs the full vector on every rank,
                    # scaled so r partial-sum replicas add it once
                    # (reference ffn.py:104-109).
                    p = lax.all_gather(p, "g", axis=s_dim, tiled=True)
                    p = lax.all_gather(p, "r", axis=s_dim, tiled=True)
                    if r > 1:
                        p = p / r
                elif cfg.adaptive_r < self.sharded_count:
                    # Hidden-dim shards regathered to H/r per replica.
                    p = gather(p, "g", s_dim, k_shards=g_size)
            out[name] = p
        return out

    def _build_body(self, cfg: _VariantCfg):
        """Per-device forward for static cfg: body(gate_params,
        expert_params, x_local, key[, valid]) -> (out_local, l_aux).
        Collectives run over this layer's expert axes, so the body
        composes under any outer shard_map whose mesh carries them
        (see `local_forward` for the public PP x EP hook)."""
        ep_axes = self._ep_axes()
        w = self.world_size
        e_global = self.num_global_experts

        def body(gate_params, expert_params, x_local, key, valid=None):
            expert_params = self._local_quant_view(expert_params)
            idx = lax.axis_index(ep_axes) if w > 1 else 0
            local_key = jax.random.fold_in(key, idx)
            token_mask = None
            if valid is not None:
                token_mask = jnp.arange(
                    x_local.shape[0], dtype=jnp.int32) < valid[0]
            if cfg.expert_choice:
                # experts-pick-tokens flow (ops/expert_choice.py):
                # top-C gather -> expert FFN -> scatter combine; the
                # auxiliary is the router z-loss (load is balanced by
                # construction)
                from ..ops import expert_choice as ec_ops
                gate = self.gates[cfg.gate_index]
                logits = gate.apply(gate_params, x_local)
                if cfg.training and gate.gate_noise > 0:
                    noise = jax.random.normal(local_key, logits.shape,
                                              dtype=logits.dtype)
                    logits = logits + gate.gate_noise * noise / e_global
                scores = jax.nn.softmax(logits, axis=1)
                sharded = self.sharded_count
                e_local = e_global * max(sharded, 1) // max(w, 1) \
                    if w > 1 else e_global
                ctx = SimpleNamespace(
                    megablocks_size=0,
                    dispatch_count=jnp.full((e_local,), cfg.capacity,
                                            jnp.int32),
                    adaptive_degree=max(cfg.adaptive_r, 1),
                    sharded_count=sharded,
                    num_global_experts=e_global,
                    platform=self.devices[0].platform)
                if w == 1:
                    ec = ec_ops.expert_choice_routing(
                        scores, cfg.capacity, token_mask)
                    y = ec_ops.ec_encode(x_local, ec, self.is_postscore)
                    y = self._apply_experts(expert_params, y, ctx)
                    out = ec_ops.ec_decode(
                        y, ec, x_local.shape[0], self.is_postscore,
                        native=self.devices[0].platform == "tpu")
                    return out, ec_ops.router_z_loss(logits, token_mask)

                # EP (x TP): the EC top-C must see every token's SCORE,
                # but only the selected tokens' ACTIVATIONS. Gather the
                # tiny [S, E] score matrix (and mask), run the
                # replicated top-C everywhere, then move just the chosen
                # rows with a ragged a2a sized exactly E_local*C on the
                # receive side — wire cost O(capacity * M) per leg, not
                # the O(W * S * M) of a full-activation all_gather
                # (ops/expert_choice.py ec_ep_* for the plan/exchange).
                # Under expert-slicing TP the `sharded` devices of one
                # mesh 'e' row each receive the same rows (replicas in
                # the plan), compute partial (r-sliced) or duplicate
                # (gathered, g-fold) expert outputs, and the combine's
                # scatter-ADD performs the partial-sum reduction on each
                # token's owner — duplicates are pre-scaled by 1/g so
                # the sum counts every expert once (bias rides the
                # regather's fc*_b/r discipline, summing to one bias).
                native = self.devices[0].platform == "tpu"
                sc_g = lax.all_gather(scores, ep_axes, axis=0,
                                      tiled=True)
                mask_g = None
                if token_mask is not None:
                    mask_g = lax.all_gather(token_mask, ep_axes,
                                            axis=0, tiled=True)
                ec = ec_ops.expert_choice_routing(sc_g, cfg.capacity,
                                                  mask_g)
                s_loc = x_local.shape[0]
                if cfg.adaptive_r == 0:
                    # data-parallel experts (token-choice's no-a2a
                    # branch): full weights gathered locally, so each
                    # device computes the slots its OWN tokens won —
                    # zero activation wire. Dead (foreign) slots carry
                    # gate 0 and OOB indices; encode clamps them to
                    # junk rows that the gate zeroes, decode drops them.
                    eff = self._gather_expert_params(expert_params, cfg)
                    mine = (ec.indices // s_loc) == idx
                    loc = ec_ops.ECRouting(
                        indices=jnp.where(
                            mine, ec.indices - idx * s_loc,
                            s_loc).astype(jnp.int32),
                        gates=jnp.where(mine, ec.gates, 0),
                        capacity=ec.capacity)
                    ctx.dispatch_count = jnp.full(
                        (e_global,), cfg.capacity, jnp.int32)
                    y = ec_ops.ec_encode(
                        jnp.pad(x_local, ((0, 1), (0, 0))), loc,
                        self.is_postscore)
                    y = self._apply_experts(eff, y, ctx)
                    out = ec_ops.ec_decode(y, loc, s_loc,
                                           self.is_postscore,
                                           native=native)
                    zsum, zcnt = ec_ops.router_z_loss_parts(logits,
                                                            token_mask)
                    return out, (lax.psum(zsum, ep_axes)
                                 / jnp.maximum(lax.psum(zcnt, ep_axes),
                                               1))
                plan = ec_ops.ec_ep_plan(ec.indices, idx,
                                         x_local.shape[0], w,
                                         replicas=max(sharded, 1))
                row = idx // max(sharded, 1)
                gates_local = lax.dynamic_slice_in_dim(
                    ec.gates, row * e_local, e_local, 0)
                # on the hierarchical mesh, route the exchange tier by
                # tier (ICI intra-slice, DCN across hosts)
                hier = ("dcn", "ici") if cfg.use_2dh else None
                y = ec_ops.ec_ep_dispatch(x_local, plan, ep_axes,
                                          e_local, ec.capacity,
                                          native=native, hier=hier)
                if not self.is_postscore:
                    y = y * gates_local[..., None].astype(y.dtype)
                eff = expert_params
                if sharded > 1:
                    eff = self._gather_expert_params(expert_params, cfg)
                y = self._apply_experts(eff, y, ctx)
                if self.is_postscore:
                    y = y * gates_local[..., None].astype(y.dtype)
                else:
                    # dead slots (gate 0) must not scatter expert-bias
                    # rows to arbitrary tokens (see ec_decode)
                    y = y * (gates_local[..., None] != 0).astype(y.dtype)
                dup = (sharded // cfg.adaptive_r if cfg.adaptive_r > 0
                       else sharded)
                if dup > 1:
                    y = y / dup
                out = ec_ops.ec_ep_combine(y, plan, x_local.shape[0],
                                           ep_axes, native=native,
                                           hier=hier)
                # valid-count-weighted z-loss: psum the (sum, count)
                # parts so unequal per-shard masks average correctly
                zsum, zcnt = ec_ops.router_z_loss_parts(logits,
                                                        token_mask)
                return out, (lax.psum(zsum, ep_axes)
                             / jnp.maximum(lax.psum(zcnt, ep_axes), 1))

            crit, l_aux = self._routing_local(
                cfg, gate_params, x_local, local_key, token_mask)
            ctx = self._expert_ctx(cfg, crit)

            if cfg.ragged_max_recv:
                from ..ops import ragged_ep

                def grouped_apply(p, rows, gs, c):
                    return self.experts.apply_grouped(p, rows, gs, c)

                out = ragged_ep.ragged_ep_forward(
                    x_local, crit, expert_params, grouped_apply, ep_axes,
                    cfg.ragged_max_recv, is_postscore=self.is_postscore,
                    ctx=ctx,
                    native=self.devices[0].platform == "tpu",
                    hier=("dcn", "ici") if cfg.use_2dh else None)
                return out, lax.pmean(l_aux, ep_axes)

            if cfg.dense_dispatch:
                y = dispatch_ops.dense_encode(x_local, crit,
                                              self.is_postscore)
                y = self._apply_experts(expert_params, y, ctx)
                out = dispatch_ops.dense_decode(y, crit, self.is_postscore)
                return out, l_aux

            y = dispatch_ops.fast_encode(x_local, crit, self.is_postscore)

            if w == 1:
                y = self._apply_experts(expert_params, y, ctx)
            elif cfg.adaptive_r == 0:
                eff = self._gather_expert_params(expert_params, cfg)
                y = self._apply_experts(eff, y, ctx)
            else:
                r = cfg.adaptive_r
                if e_global < w:
                    if r > 1:
                        y = jnp.tile(y, (1, r, 1))
                    y = y.reshape(w, -1, y.shape[-1])
                eff = expert_params
                if self.sharded_count > 1:
                    eff = self._gather_expert_params(expert_params, cfg)

                def a2a(t, in_dim, out_dim):
                    if self.skip_a2a:
                        return t
                    ct = t if cfg.a2a_dtype is None \
                        else t.astype(cfg.a2a_dtype)
                    if cfg.use_2dh:
                        ct = net.all_to_all_2dh(ct, in_dim, out_dim,
                                                "dcn", "ici")
                    else:
                        ct = net.all_to_all(ct, in_dim, out_dim, ep_axes)
                    return ct if cfg.a2a_dtype is None \
                        else ct.astype(t.dtype)

                deg = cfg.overlap_degree
                if deg > 1:
                    # Chunked a2a/FFN pipeline (reference overlap.py:8-67):
                    # per-chunk a2a -> expert -> a2a; XLA's async collectives
                    # overlap chunk i's FFN with chunk i+1's a2a.
                    chunks = jnp.split(y, deg, axis=1)
                    outs = []
                    for c in chunks:
                        c = a2a(c, 1, 0)
                        c = self._apply_experts(eff, c, ctx)
                        outs.append(a2a(c, 0, 1))
                    y = jnp.concatenate(outs, axis=1)
                else:
                    y = a2a(y, 1, 0)
                    y = self._apply_experts(eff, y, ctx)
                    y = a2a(y, 0, 1)

                if e_global < w:
                    y = y.reshape(e_global, r, -1, y.shape[-1])
                    y = jnp.sum(y, axis=1) if r > 1 else y.reshape(
                        e_global, -1, y.shape[-1])

            out = dispatch_ops.fast_decode(y, crit, self.is_postscore)
            if w > 1:
                l_aux = lax.pmean(l_aux, ep_axes)
            return out, l_aux

        return body

    def _build_forward(self, cfg: _VariantCfg):
        """Return fn(params, x2, key) -> (out, l_aux) for static cfg."""
        ep_axes = self._ep_axes()
        w = self.world_size
        body = self._build_body(cfg)

        if w == 1:
            if cfg.has_valid:
                def fn(params, x2, key, valid):
                    return body(params["gates"][cfg.gate_index],
                                params["experts"], x2, key, valid)
            else:
                def fn(params, x2, key):
                    return body(params["gates"][cfg.gate_index],
                                params["experts"], x2, key)
            return fn

        mesh = self._mesh(cfg.adaptive_r)
        especs = self._expert_specs(ep_axes)

        def expert_spec(k, v):
            from ..ops.quant import QuantizedWeight
            from ..ops.fused_ffn_pallas import FusedFFNStream
            if isinstance(v, FusedFFNStream):
                # phase-packed weight stream: [E, T, Kr, bw] + sb —
                # expert-dim sharded like any expert leaf. Pure EP
                # only: the stream holds full-H weights, while TP
                # devices compute H/s partial sums.
                if self.sharded_count > 1:
                    raise ValueError(
                        "fused weight streams don't support "
                        "expert-slicing TP (sharded_count="
                        f"{self.sharded_count}); drop the "
                        "'fused_stream' entry for TP layouts")
                return FusedFFNStream(
                    wstream=P(ep_axes), sb=P(ep_axes), bits=v.bits,
                    k=v.k, h=v.h, n=v.n, t1=v.t1, t2=v.t2, bw=v.bw,
                    kr=v.kr)
            spec = especs.get(k, (ep_axes,))
            self._check_quant_sliceable(k, v, spec)
            if isinstance(v, QuantizedWeight):
                # per-leaf specs: scales are [E, 1, N] — no shard axis on
                # their size-1 dims (TP keeps K-sliced scales replicated)
                sspec = [s if v.scales.shape[i] != 1 else None
                         for i, s in enumerate(spec[:v.scales.ndim])]
                return QuantizedWeight(
                    values=P(*spec[:v.values.ndim]), scales=P(*sspec),
                    bits=v.bits, orig_k=v.orig_k, blocks=v.blocks)
            return P(*spec[:v.ndim])

        def fn(params, x2, key, valid=None):
            expert_params = params["experts"]
            in_specs = [
                jax.tree.map(lambda _: P(), params["gates"][cfg.gate_index]),
                {k: expert_spec(k, v) for k, v in expert_params.items()},
                P(ep_axes),
                P(),
            ]
            call_args = [params["gates"][cfg.gate_index], expert_params,
                         x2, key]
            if cfg.has_valid:
                in_specs.append(P(ep_axes))
                call_args.append(valid)
            shmapped = jax.shard_map(
                body, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=(P(ep_axes), P()), check_vma=False)
            return shmapped(*call_args)
        return fn

    # ------------------------------------------------------------------
    # Dropless capacity counting (two-phase dispatch)
    # ------------------------------------------------------------------

    def _count_forward(self, params, x2, key, gate_index, top_k, training):
        ckey = (gate_index, top_k, training)
        fn = self._count_cache.get(ckey)
        if fn is None:
            fn = jax.jit(self._build_count(gate_index, top_k, training))
            self._count_cache[ckey] = fn
        return fn(params, x2, key)

    def count_needed_traceable(self, gate_index=0, top_k=None,
                               training=False):
        """Traceable dropless-capacity probe for enclosing jits.

        Returns fn(params, x2, key, token_mask=None) -> scalar int32:
        the capacity the routing of x2 actually needs (max tokens any
        expert received from any shard; the reference's
        `locations2.max() + 1`, fast_dispatch.py:191-193). Unlike
        `resolve_capacity` this is pure traced computation — no host
        sync — so callers (e.g. the serving engine's
        speculative-capacity chunks) can carry the needed capacity
        through a lax.scan and validate a speculated buffer size after
        the fact. With world_size > 1 the probe runs per shard under
        the layer's own mesh with a pmax over the EP axes, matching
        `capacity_override`'s per-(expert, shard) buffer semantics;
        token_mask (a GLOBAL [S] bool array) shards over the token axis
        exactly like the layer's input.
        """
        gate = self.gates[gate_index]
        tk = min(int(top_k or gate.top_k), self.num_global_experts)
        cfg = _VariantCfg(
            gate_index=gate_index, top_k=tk, capacity=1,
            adaptive_r=max(self.adaptive_degree, 1), overlap_degree=1,
            megablocks_size=0, training=training, use_2dh=self._flat_2dh(),
            batch_prioritized=self.batch_prioritized_routing)

        if self.world_size == 1:
            def fn(params, x2, key, token_mask=None):
                # match the layer body's key derivation exactly
                # (_build_body folds in the device index, 0 here) so a
                # training=True probe with gate_noise predicts the same
                # routing the layer will execute
                local_key = jax.random.fold_in(key, 0)
                crit, _ = self._routing_local(
                    cfg, params["gates"][gate_index], x2, local_key,
                    token_mask)
                return routing_ops.required_capacity(crit.dispatch_count)
            return fn

        ep_axes = self._ep_axes()
        mesh = self._mesh(max(self.adaptive_degree, 1))

        def body(gate_params, x_local, key, mask_local):
            idx = lax.axis_index(ep_axes)
            local_key = jax.random.fold_in(key, idx)
            crit, _ = self._routing_local(
                cfg, gate_params, x_local, local_key, mask_local)
            return lax.pmax(
                routing_ops.required_capacity(crit.dispatch_count),
                ep_axes)

        def fn(params, x2, key, token_mask=None):
            gp = params["gates"][gate_index]
            gspec = jax.tree.map(lambda _: P(), gp)
            if token_mask is None:
                shmapped = jax.shard_map(
                    lambda g, x, k: body(g, x, k, None), mesh=mesh,
                    in_specs=(gspec, P(ep_axes), P()),
                    out_specs=P(), check_vma=False)
                return shmapped(gp, x2, key)
            shmapped = jax.shard_map(
                body, mesh=mesh,
                in_specs=(gspec, P(ep_axes), P(), P(ep_axes)),
                out_specs=P(), check_vma=False)
            return shmapped(gp, x2, key, token_mask)
        return fn

    def _build_count(self, gate_index, top_k, training):
        ep_axes = self._ep_axes()
        w = self.world_size
        cfg = _VariantCfg(
            gate_index=gate_index, top_k=top_k, capacity=1,
            adaptive_r=max(self.adaptive_degree, 1), overlap_degree=1,
            megablocks_size=0, training=training, use_2dh=self._flat_2dh(),
            batch_prioritized=self.batch_prioritized_routing)

        def body(gate_params, x_local, key):
            idx = lax.axis_index(ep_axes) if w > 1 else 0
            local_key = jax.random.fold_in(key, idx)
            crit, _ = self._routing_local(cfg, gate_params, x_local, local_key)
            needed = routing_ops.required_capacity(crit.dispatch_count)
            if w > 1:
                needed = lax.pmax(needed, ep_axes)
            return needed

        if w == 1:
            return lambda params, x2, key: body(
                params["gates"][gate_index], x2, key)

        mesh = self._mesh(max(self.adaptive_degree, 1))

        def fn(params, x2, key):
            shmapped = jax.shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree.map(lambda _: P(),
                                       params["gates"][gate_index]),
                          P(ep_axes), P()),
                out_specs=P(), check_vma=False)
            return shmapped(params["gates"][gate_index], x2, key)
        return fn

    def _ragged_count_forward(self, params, x2, key, gate_index, top_k,
                              training):
        """Max rows any device receives in the ragged EP exchange."""
        ckey = ("ragged", gate_index, top_k, training)
        fn = self._count_cache.get(ckey)
        if fn is None:
            fn = jax.jit(self._build_ragged_count(gate_index, top_k,
                                                  training))
            self._count_cache[ckey] = fn
        return fn(params, x2, key)

    def _build_ragged_count(self, gate_index, top_k, training):
        """Count program for ragged EP receive-buffer sizing: device d
        receives sum over all sources of their per-expert counts for d's
        expert range; the bound is the max over devices."""
        ep_axes = self._ep_axes()
        w = self.world_size
        e_l = self.num_global_experts // w
        cfg = _VariantCfg(
            gate_index=gate_index, top_k=top_k, capacity=1,
            adaptive_r=1, overlap_degree=1, megablocks_size=0,
            training=training, use_2dh=False,
            batch_prioritized=self.batch_prioritized_routing)

        def body(gate_params, x_local, key):
            idx = lax.axis_index(ep_axes)
            local_key = jax.random.fold_in(key, idx)
            crit, _ = self._routing_local(cfg, gate_params, x_local,
                                          local_key)
            # global per-expert totals -> per-device receive totals
            global_counts = lax.psum(crit.dispatch_count, ep_axes)
            per_device = jnp.sum(global_counts.reshape(w, e_l), axis=1)
            return jnp.max(per_device)

        mesh = self._mesh(1)

        def fn(params, x2, key):
            shmapped = jax.shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree.map(lambda _: P(),
                                       params["gates"][gate_index]),
                          P(ep_axes), P()),
                out_specs=P(), check_vma=False)
            return shmapped(params["gates"][gate_index], x2, key)
        return fn

    def resolve_max_recv(self, params, x, key=None, gate_index=0,
                         top_k=None, training=False, reserve_dims=1,
                         slack=1.0):
        """Host-side ragged-EP receive-bound query (bucketed to 128).

        The probed bound is exact for THIS (params, x, key) routing.
        Reusing it across steps is only safe while routing stays at
        least as balanced as the probe — with gate noise, evolving
        params, or different batches a later step can exceed it, and
        rows past `max_recv` are silently dropped by the ragged
        all-to-all. For cross-step reuse pass `slack` > 1 (the bound is
        multiplied then re-bucketed, capped at the lossless worst
        case), or re-probe periodically."""
        gate = self.gates[gate_index]
        top_k = min(int(top_k or gate.top_k), self.num_global_experts)
        flat_m = 1
        for d in x.shape[-reserve_dims:]:
            flat_m *= int(d)
        x2 = x.reshape(-1, flat_m).astype(self.dtype)
        if key is None:
            key = jax.random.PRNGKey(0)
        needed = int(self._ragged_count_forward(
            params, x2, key, gate_index, top_k, training))
        local_samples = x2.shape[0] // self.world_size
        worst = routing_ops.align_capacity(
            self.world_size * top_k * local_samples, 128)
        needed = int(max(needed, 1) * max(slack, 1.0))
        return min(routing_ops.align_capacity(needed, 128), worst)

    # ------------------------------------------------------------------
    # Checkpoint format (reference moe_layer.py:57-75)
    # ------------------------------------------------------------------

    def state_dict(self, params, prefix=""):
        """Flat {name: np.ndarray} with the `_num_global_experts` marker
        buffer the checkpoint tools key on (reference moe_layer.py:63)."""
        import numpy as np
        out = {prefix + "_num_global_experts":
               np.asarray(self.num_global_experts)}
        for n, p in self.get_parameter_iterator(params, "gate"):
            out[prefix + n] = np.asarray(p)
        for n, p in self.get_parameter_iterator(params, "local_experts"):
            out[prefix + n] = np.asarray(jax.device_get(p))
        return out

    def load_state_dict(self, params, state, prefix="", strict=False):
        """Tolerant load into a params pytree (reference moe_layer.py:57-75):
        missing entries keep their initialized values (with a warning);
        shape mismatches are resolved by numel-preserving reshape."""
        import logging
        import numpy as np
        marker = prefix + "_num_global_experts"
        if marker in state:
            ckpt_e = int(np.asarray(state[marker]))
            assert ckpt_e == self.num_global_experts, (
                f"Checkpoint has {ckpt_e} global experts, model expects "
                f"{self.num_global_experts}; use tutel_tpu.checkpoint."
                "gather/scatter to re-shard the checkpoint first.")
        elif strict:
            raise KeyError(marker)
        else:
            logging.warning(
                "Loading a legacy checkpoint without `_num_global_experts`.")

        def fill(name, p):
            key = prefix + name
            if key not in state:
                if strict:
                    raise KeyError(key)
                logging.warning("Missing checkpoint entry %s; keeping "
                                "initialized value.", key)
                return p
            v = jnp.asarray(np.asarray(state[key]), dtype=p.dtype)
            if v.shape != p.shape:
                assert v.size == p.size, (
                    f"Checkpoint entry {key} has {v.size} elements, "
                    f"expected {p.size}.")
                v = v.reshape(p.shape)
            return v

        out = {"gates": [], "experts": {}}
        for gi, g in enumerate(params["gates"]):
            out["gates"].append(
                {n: fill(f"gates.{gi}.{n}", p) for n, p in g.items()})
        out["experts"] = {
            n: fill(f"experts.{n}", p)
            for n, p in params["experts"].items()}
        return out

    def get_parameter_iterator(self, params, param_type):
        """reference moe_layer.py:242-248."""
        if param_type == "gate":
            for gi, g in enumerate(params["gates"]):
                for n, p in g.items():
                    yield f"gates.{gi}.{n}", p
        elif param_type == "local_experts":
            for n, p in params["experts"].items():
                if n == "fused_stream":
                    # derived data (phase-packed weight relayout,
                    # ops/fused_ffn_pallas) — never checkpointed;
                    # re-prepare after load
                    continue
                yield f"experts.{n}", p
        else:
            raise Exception(
                "Specified parameter type is not recognized: %s. Valid "
                "`param_type` includes: gate, local_experts." % param_type)

    def extra_repr(self):
        return "Top-K(s) = %s, Total-Experts = %d [managed by %d device(s)]," % (
            [f"k={x.top_k}, noise={x.gate_noise}" for x in self.gates],
            self.num_global_experts, self.world_size)


moe_layer = MOELayer
