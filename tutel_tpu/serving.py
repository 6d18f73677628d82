"""Continuous-batching MoE decode engine.

North-star component (BASELINE.md: "continuous batching, decode-step
driver with dynamic capacity_factor / top_k per batch") with no reference
counterpart — the reference stops at the layer. Design:

  * a fixed-capacity slot buffer [max_batch] of active sequences; requests
    join/leave between steps (continuous batching). Static shapes always:
    partial fill is expressed through the layer's `valid_tokens` masking,
    so join/leave never recompiles.
  * per-step dynamic knobs (top_k, capacity bucket) resolve through the
    MoE layer's compiled-variant cache — switching is a dict lookup.
  * dropless capacity uses the content-independent worst case (the fill
    bucket: top-k experts are distinct per token, so no expert can receive
    more rows than there are active tokens) — lossless for every routing
    outcome, zero host probes, one compiled variant per fill bucket.
  * with world_size > 1 the engine's globally packed buffer maps onto the
    layer's scalar `valid_tokens` semantics: the layer derives per-shard
    valid counts clip(n - shard*local, 0, local), so shard>0 padding rows
    neither consume capacity nor pollute l_aux.

The engine is model-agnostic: it drives any `step_fn(params, x, valid,
key) -> y` built around MOELayer(s); `MoeDecodeEngine` wires the common
single-layer case.
"""

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Request:
    uid: Any
    state: jnp.ndarray            # [model_dim] current token embedding
    remaining: int                # decode steps left


class MoeDecodeEngine:
    """Continuous batching over a MOELayer-based decode step."""

    def __init__(self, layer, params, max_batch: int,
                 top_k: Optional[int] = None, capacity_bucket: int = 8):
        self.layer = layer
        self.params = params
        self.max_batch = int(max_batch)
        self.top_k = top_k
        self.capacity_bucket = max(int(capacity_bucket), 1)
        m = layer.model_dim
        self._buf = jnp.zeros((self.max_batch, m), layer.dtype)
        self._slots: List[Optional[Request]] = [None] * self.max_batch
        self._free = list(range(self.max_batch))[::-1]
        self._capacity_cache: Dict[int, int] = {}
        self._step = 0
        self.stats = {"steps": 0, "tokens": 0, "joined": 0, "finished": 0}

    # -- admission ------------------------------------------------------

    def try_add(self, request: Request) -> bool:
        """Admit a request if a slot is free (continuous batching join)."""
        if not self._free:
            return False
        slot = self._free.pop()
        self._slots[slot] = request
        self._buf = self._buf.at[slot].set(
            request.state.astype(self._buf.dtype))
        self.stats["joined"] += 1
        return True

    @property
    def active(self) -> int:
        return self.max_batch - len(self._free)

    # -- capacity bucketing --------------------------------------------

    def _bucket(self, n: int) -> int:
        b = self.capacity_bucket
        return max(b, (n + b - 1) // b * b)

    def _capacity_for(self, fill_bucket: int, key) -> int:
        cap = self._capacity_cache.get(fill_bucket)
        if cap is None:
            # Content-independent worst case: a token's top-k experts are
            # distinct, so no expert can receive more rows than there are
            # active tokens. capacity = the fill bucket is therefore
            # lossless for *every* routing outcome — unlike a probed value,
            # it can never go stale when a later step routes more skewed
            # than the probed one. At decode batch sizes the padding is
            # cheap (the grouped GEMM narrows by dispatch_count anyway).
            cap = max(fill_bucket, 1)
            self._capacity_cache[fill_bucket] = cap
        return cap

    # -- the decode step ------------------------------------------------

    def step(self, key=None) -> Dict[Any, jnp.ndarray]:
        """Run one dropless decode step over all active slots.

        Returns {uid: output vector} for sequences that produced a token
        this step; finished sequences leave their slots.
        """
        if self.active == 0:
            return {}
        if key is None:
            key = jax.random.PRNGKey(self._step)
        self._step += 1

        n_valid = self.active
        # pack active slots into the leading positions (static shapes;
        # valid_tokens masks the tail)
        order = [i for i, r in enumerate(self._slots) if r is not None] + \
                [i for i, r in enumerate(self._slots) if r is None]
        perm = jnp.asarray(order, jnp.int32)
        packed = jnp.take(self._buf, perm, axis=0)

        cap = self._capacity_for(self._bucket(n_valid), key)
        out, _ = self.layer(
            self.params, packed, key=key, top_k=self.top_k,
            valid_tokens=n_valid, capacity_override=cap)

        results: Dict[Any, jnp.ndarray] = {}
        out_rows = out  # [max_batch, M]; row j corresponds to order[j]
        for j, slot in enumerate(order[:n_valid]):
            req = self._slots[slot]
            results[req.uid] = out_rows[j]
            req.remaining -= 1
            req.state = out_rows[j]
            self._buf = self._buf.at[slot].set(out_rows[j])
            if req.remaining <= 0:
                self._slots[slot] = None
                self._free.append(slot)
                self.stats["finished"] += 1
        self.stats["steps"] += 1
        self.stats["tokens"] += n_valid
        return results

    def run(self, requests: List[Request], key=None,
            max_steps: int = 10_000) -> Dict[Any, jnp.ndarray]:
        """Drive the engine until every request finishes; requests join as
        slots free up. Returns each uid's final output."""
        pending = list(requests)[::-1]
        finals: Dict[Any, jnp.ndarray] = {}
        if key is None:
            key = jax.random.PRNGKey(0)
        for _ in range(max_steps):
            while pending and self.try_add(pending[-1]):
                pending.pop()
            if self.active == 0 and not pending:
                break
            key, sk = jax.random.split(key)
            for uid, out in self.step(sk).items():
                finals[uid] = out
        return finals
