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
  * dropless capacity is SPECULATIVE by default: chunks run at a small
    multiple of the average per-expert load and carry a traced
    needed-capacity probe; a chunk whose routing overflowed the
    speculation is replayed from its pre-chunk state at the observed
    capacity — dropless semantics preserved: routing and dispatch
    decisions are identical to the worst case (gating never sees the
    buffer size), outputs match up to float reduction order (the
    smaller buffer changes XLA's dot tiling; ~1e-10 at bf16-scale
    magnitudes), and the rare retry on pathological skew costs one
    extra chunk. speculative_capacity=0 restores the
    content-independent worst case (the fill bucket: top-k experts are
    distinct per token, so no expert can receive more rows than there
    are active tokens) — lossless with zero probes, but maximally
    pessimistic: at 256 slots / 128 experts it runs 64x the average
    load and measured 4.05x slower per device chunk (57.6 vs 14.2 ms,
    docs/RESULTS.md serving table).
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
import numpy as np
from jax import lax


def _maybe_fuse_expert_stream(params, layer=None):
    """Prepare the single-kernel fused weight stream for quantized
    expert params (ops/fused_ffn_pallas) — a one-time relayout the
    engines do on behalf of the caller (auto_fuse=True). No-op when
    the experts aren't quantized, the shapes don't qualify, or the
    layer expert-slices its weights (the fused kernel holds full-H
    streams; TP computes H/s partial sums — unsupported)."""
    if layer is not None and getattr(layer, "sharded_count", 1) > 1:
        return params
    experts = params.get("experts") if isinstance(params, dict) else None
    if not isinstance(experts, dict) or "fused_stream" in experts:
        return params
    from .ops.quant import QuantizedWeight
    if not any(isinstance(v, QuantizedWeight) for v in experts.values()):
        return params
    from .ops.fused_ffn_pallas import prepare_fused_ffn_params
    fused = prepare_fused_ffn_params(experts)
    if fused is experts:
        return params
    out = dict(params)
    out["experts"] = fused
    return out


@dataclasses.dataclass
class Request:
    uid: Any
    state: jnp.ndarray            # [model_dim] current token embedding
    remaining: int                # decode steps left


@dataclasses.dataclass
class LmRequest:
    uid: Any
    prompt: np.ndarray            # [Tp] int32 token ids
    max_new_tokens: int
    stop_token: Optional[int] = None   # retire on emitting this id
    #   (included in the output; ignored under fetch=False chunks —
    #   the host never sees the tokens there)


class MoeDecodeEngine:
    """Continuous batching over a MOELayer-based decode step."""

    def __init__(self, layer, params, max_batch: int,
                 top_k: Optional[int] = None, capacity_bucket: int = 8,
                 auto_fuse: bool = True,
                 speculative_capacity: float = 8.0,
                 state_update: str = "replace"):
        self.layer = layer
        if auto_fuse:
            params = _maybe_fuse_expert_stream(params, layer)
        self.params = params
        self.max_batch = int(max_batch)
        self.top_k = top_k
        self.capacity_bucket = max(int(capacity_bucket), 1)
        # How a decode step folds the layer output into the slot state:
        #   "replace"       state' = moe(state)   (historical default)
        #   "residual_norm" state' = rmsnorm(state + moe(state))
        # "replace" is DEGENERATE as a multi-step workload: an untrained
        # MoE layer is contractive, so states underflow to exactly zero
        # within a few steps (measured: bf16 rms 1.0 -> 0.17 -> 0.03 ->
        # ... -> 0 by step 6), after which the all-zero gate logits tie
        # and top-k routes every token to the same experts — worst-case
        # capacity by degeneracy, and 'throughput' over zero vectors.
        # "residual_norm" is the transformer-block shape (pre-LN residual
        # trunk) and keeps states on the unit manifold, so routing load
        # stays near top_k*S/E like real hidden states do.
        if state_update not in ("replace", "residual_norm"):
            raise ValueError(f"unknown state_update {state_update!r}")
        self.state_update = state_update
        m = layer.model_dim
        self._buf = jnp.zeros((self.max_batch, m), layer.dtype)
        self._slots: List[Optional[Request]] = [None] * self.max_batch
        self._free = list(range(self.max_batch))[::-1]
        self._staged: List[Any] = []   # (slot, state) admissions to flush
        self._capacity_cache: Dict[int, int] = {}
        self._step = 0
        self.stats = {"steps": 0, "tokens": 0, "joined": 0, "finished": 0,
                      "spec_retries": 0}
        # Speculative dropless capacity: the content-independent worst
        # case (capacity == active tokens) is lossless but maximally
        # pessimistic — at 256 slots / 128 experts the average load is
        # top_k*S/E ≈ 4 rows/expert while the worst-case buffer carries
        # 256. With speculative_capacity = margin m > 0, chunks run at
        # capacity ≈ m * average (bucketed) and carry a traced
        # needed-capacity probe (MOELayer.count_needed_traceable)
        # through the scan; if any step's routing exceeded the
        # speculated buffer the chunk is REPLAYED from its pre-chunk
        # state at the observed capacity — dropless semantics are
        # preserved exactly, and the (rare) retry costs one extra chunk.
        # 0 disables (always worst-case). Auto-disabled for expert-
        # choice gates (their capacity is exact by construction);
        # multi-device layers probe per shard with a pmax over the EP
        # axes (count_needed_traceable handles both).
        gate0 = layer.gates[0]
        self.speculative_capacity = float(speculative_capacity or 0)
        if getattr(gate0, "expert_choice", False):
            self.speculative_capacity = 0.0
        self._count_fn = None
        # observed-need hints are SHARED across engines on the layer
        # (like the compiled-chunk cache): a retry discovers a capacity
        # and compiles its chunk once; later engine instances driving
        # the same layer start from that capacity instead of
        # re-discovering (and re-compiling) it. Keyed by (top_k, fill
        # bucket); different params sharing a layer can only make the
        # hint conservative (a too-large cap costs speed, never
        # correctness — too small just retries once).
        hints = getattr(layer, "_serving_spec_hints", None)
        if hints is None:
            hints = layer._serving_spec_hints = {}
        self._spec_hint = hints        # (top_k, fill bucket) -> needed
        self._order_cache = None       # device perm/inv/mask, see below
        self._key_dev = jax.random.PRNGKey(0)   # device-resident chain
        self._spec_over = jnp.asarray(False)
        if self.speculative_capacity > 0:
            self._count_fn = layer.count_needed_traceable(
                gate_index=0, top_k=top_k, training=False)

    # -- admission ------------------------------------------------------

    def try_add(self, request: Request) -> bool:
        """Admit a request if a slot is free (continuous batching join).

        Admissions are staged host-side and flushed as ONE batched
        buffer write at the next step — per-row device scatters would
        cost one dispatch each, which dominates wall time on
        latency-bound links (remote-attached devices)."""
        if not self._free:
            return False
        slot = self._free.pop()
        self._slots[slot] = request
        self._staged.append((slot, request.state))
        self.stats["joined"] += 1
        return True

    def _flush_admissions(self):
        if not self._staged:
            return
        slots = jnp.asarray([s for s, _ in self._staged], jnp.int32)
        states = [st for _, st in self._staged]
        if all(isinstance(st, np.ndarray) for st in states):
            stack = jnp.asarray(np.stack(states), self._buf.dtype)
        else:
            stack = jnp.stack(
                [jnp.asarray(st) for st in states]).astype(self._buf.dtype)
        self._buf = self._buf.at[slots].set(stack)
        self._staged = []

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

    def _worst_cap(self, n_valid: int) -> int:
        """Content-independent lossless capacity for `n_valid` active
        tokens. Multi-device: capacity_override is a per-(expert,
        SOURCE-SHARD) buffer and each shard holds ceil(max_batch/W)
        rows of the packed buffer, so the lossless bound is the
        shard-local fill, not the global one — a W-fold tightening
        for worst-case EP decode."""
        worst = self._capacity_for(self._bucket(n_valid), None)
        if self.layer.world_size > 1:
            local = -(-self.max_batch // self.layer.world_size)
            worst = min(worst, self._bucket(min(n_valid, local)))
        return worst

    # -- speculative dropless capacity -----------------------------------

    def _spec_cap(self, n_valid: int, worst: int) -> int:
        """Speculated capacity: margin x the average per-expert load,
        raised to the largest routing need OBSERVED at this fill (the
        hint a previous chunk's probe reported — retries never repeat
        for a stationary workload), bucket-aligned, clipped to
        [bucket, worst]. Multi-device: capacity_override is a
        per-(expert, source-shard) buffer, so the average is over the
        largest SHARD's valid tokens (the layer maps scalar
        valid_tokens to clip(n - shard*local, 0, local))."""
        tk = min(int(self.top_k or self.layer.gates[0].top_k),
                 self.layer.num_global_experts)
        w = self.layer.world_size
        s_loc = min(n_valid, -(-self.max_batch // w)) if w > 1 else n_valid
        avg = -(-tk * s_loc // self.layer.num_global_experts)
        cap = int(avg * self.speculative_capacity)
        hint = self._spec_hint.get(
            (self.top_k, self._bucket(n_valid)), 0)
        cap = max(cap, hint)
        cap = -(-cap // self.capacity_bucket) * self.capacity_bucket
        return max(self.capacity_bucket, min(cap, worst))

    def _layer_cache(self):
        # the compiled-chunk cache lives on the LAYER so every engine
        # driving the same layer shares warm executables (a per-engine
        # cache would recompile the scan for each new engine instance)
        cache = getattr(self.layer, "_serving_chunk_cache", None)
        if cache is None:
            cache = self.layer._serving_chunk_cache = {}
        return cache

    def _order_arrays(self, order, n_valid):
        """Device-resident pack permutation / inverse / active mask,
        cached while slot occupancy is unchanged. On a remote-attached
        device every host->device transfer is a link round-trip, so the
        steady-state chunk (no joins/leaves) must not re-upload them."""
        okey = (tuple(order), n_valid)
        cached = self._order_cache
        if cached is not None and cached[0] == okey:
            return cached[1], cached[2], cached[3]
        perm = jnp.asarray(order, jnp.int32)
        inv = jnp.asarray(np.argsort(order), jnp.int32)
        amask = jnp.asarray([r is not None for r in self._slots], bool)
        self._order_cache = (okey, perm, inv, amask)
        return perm, inv, amask

    def _chunk_fn(self, n_steps: int, n_valid: int, cap: int,
                  with_probe: bool):
        """ONE compiled dispatch for a whole chunk: pack, n_steps of
        the layer, write-back, and the key-chain advance all happen
        inside the jit — the host contributes zero per-chunk device
        ops and zero transfers (the per-chunk PRNGKey/split and the
        perm/mask uploads measured ~35 ms/chunk of link stalls on the
        remote tunnel, dwarfing the sub-ms decode step itself).

        with_probe=True also threads the traced needed-capacity probe
        through the scan and returns (max needed, overflowed) so the
        speculative caller can validate the buffer it guessed.

        Returns run(params, buf, perm, inv, amask, key) ->
        (new_buf, out, next_key[, mx, over]).
        """
        cache = self._layer_cache()
        ck = ("v2", with_probe, n_steps, n_valid, cap, self.top_k,
              self.state_update)
        run = cache.get(ck)
        if run is None:
            layer, top_k = self.layer, self.top_k
            count_fn = self._count_fn
            residual = self.state_update == "residual_norm"

            # params must flow through the jit boundary as an
            # argument — a closure over self.params would bake the
            # (possibly hundreds of MB of) expert weights into the
            # compiled program as literal constants.
            def run(params, buf, perm, inv, amask, key):
                packed = jnp.take(buf, perm, axis=0)
                next_key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n_steps)
                mask = jnp.arange(packed.shape[0]) < n_valid

                def body(carry, k):
                    b, mx = carry
                    if with_probe:
                        needed = count_fn(params, b, k, mask)
                        mx = jnp.maximum(mx, needed)
                    o, _ = layer(params, b, key=k, top_k=top_k,
                                 valid_tokens=n_valid,
                                 capacity_override=cap)
                    if residual:
                        r = (b + o).astype(jnp.float32)
                        o = (r * jax.lax.rsqrt(
                            jnp.mean(r * r, axis=-1, keepdims=True)
                            + 1e-6)).astype(b.dtype)
                    return (o, mx), None
                (out, mx), _ = jax.lax.scan(
                    body, (packed, jnp.int32(0)), keys)
                new_buf = jnp.where(amask[:, None],
                                    jnp.take(out, inv, axis=0), buf)
                if with_probe:
                    return new_buf, out, next_key, mx, mx > cap
                return new_buf, out, next_key
            run = jax.jit(run)
            cache[ck] = run
        return run

    def _run_speculative(self, perm, inv, amask, n_valid, n_steps, key,
                         worst, fetch):
        """Run one chunk at the speculated capacity; replay from the
        (immutable) pre-chunk buffer at the observed capacity if any
        step's routing overflowed the speculation. Returns
        (new_buf, out, next_key, out_np or None)."""
        cap = self._spec_cap(n_valid, worst)
        out_np = None
        while True:
            new_buf, out, next_key, mx, over = self._chunk_fn(
                n_steps, n_valid, cap, with_probe=True)(
                self.params, self._buf, perm, inv, amask, key)
            if cap >= worst:
                break                      # lossless by construction
            if not fetch:
                # benchmarking mode: no host sync allowed — record the
                # overflow flag device-side; spec_overflow checks it
                self._spec_over = jnp.logical_or(self._spec_over, over)
                break
            # the overflow check rides the output fetch the caller
            # needs anyway — no extra round-trip on the happy path
            out_np, mx_host = jax.device_get((out[:n_valid], mx))
            fb = self._bucket(n_valid)
            hk = (self.top_k, fb)
            self._spec_hint[hk] = max(self._spec_hint.get(hk, 0),
                                      int(mx_host))
            if int(mx_host) <= cap:
                break
            self.stats["spec_retries"] += 1
            out_np = None
            cap = min(worst, self._bucket(int(mx_host)))
        return new_buf, out, next_key, (
            np.asarray(out_np) if out_np is not None else None)

    @property
    def spec_overflow(self) -> bool:
        """True if any fetch=False speculative chunk overflowed its
        buffer (its outputs are invalid — benchmarking mode only;
        fetch=True chunks replay on overflow and are always dropless)."""
        v = getattr(self, "_spec_over", None)
        return bool(v) if v is not None else False

    # -- the decode step ------------------------------------------------

    def step(self, key=None) -> Dict[Any, jnp.ndarray]:
        """Run one dropless decode step over all active slots.

        Returns {uid: output vector} for sequences that produced a token
        this step; finished sequences leave their slots.
        """
        return self.step_chunk(1, key=key)

    def step_chunk(self, n_steps: int, key=None, fetch: bool = True
                   ) -> Dict[Any, jnp.ndarray]:
        """Run `n_steps` decode steps in ONE device dispatch.

        Continuous batching admits/retires requests only at chunk
        boundaries, so when the queue is idle the engine amortizes the
        host-dispatch round trip over the whole chunk (the analogue of
        multi-step scheduling in serving stacks); chunk=1 is the plain
        per-step loop. All buffer updates are vectorized — no per-row
        device ops on the host path.

        fetch=False skips the device->host output transfer entirely:
        the chunk's dispatches enqueue asynchronously, states stay in
        the device-side slot buffer, and {} is returned. Retirement is
        time-based so bookkeeping still advances, but a request retired
        under fetch=False loses its final output — use it for chained
        steady-state chunks (device-time benchmarking, speculative
        scheduling) and fetch the last chunk normally.

        CAVEAT (speculative_capacity > 0): fetch=False chunks cannot
        replay on overflow (no host sync is allowed), so an overflowed
        chunk's row-dropping state is committed silently. After any
        fetch=False chunk, check `spec_overflow` (one device sync)
        before trusting subsequent outputs — if True, the dropless
        guarantee was lost for that run. fetch=True chunks are always
        dropless (they replay).
        """
        if self.active == 0:
            return {}
        self._flush_admissions()
        # never decode past the shortest remaining budget — a direct
        # step_chunk caller would otherwise over-advance a request's
        # state and retire it late (run() also clamps, defensively)
        n_steps = max(1, min(
            n_steps,
            min(r.remaining for r in self._slots if r is not None)))
        self._step += n_steps

        n_valid = self.active
        # pack active slots into the leading positions (static shapes;
        # valid_tokens masks the tail). The pack/write-back permutation
        # arrays are cached device-side while occupancy is unchanged,
        # and the key chain is device-resident: when `key` is None the
        # chunk costs ZERO host->device transfers (each upload is a
        # link round-trip on a remote-attached device).
        order = [i for i, r in enumerate(self._slots) if r is not None] + \
                [i for i, r in enumerate(self._slots) if r is None]
        perm, inv, amask = self._order_arrays(order, n_valid)
        worst = self._worst_cap(n_valid)
        key_in = self._key_dev if key is None else key

        out_np = None
        if self.speculative_capacity > 0:
            new_buf, out, next_key, out_np = self._run_speculative(
                perm, inv, amask, n_valid, n_steps, key_in, worst, fetch)
        else:
            new_buf, out, next_key = self._chunk_fn(
                n_steps, n_valid, worst, with_probe=False)(
                self.params, self._buf, perm, inv, amask, key_in)
        # commit: pack, scan, and write-back all ran inside the one
        # compiled dispatch; the buffer swap is a host pointer move
        self._buf = new_buf
        if key is None:
            self._key_dev = next_key

        if not fetch:
            for slot in order[:n_valid]:
                req = self._slots[slot]
                req.remaining -= n_steps
                if req.remaining <= 0:
                    self._slots[slot] = None
                    self._free.append(slot)
                    self.stats["finished"] += 1
            self.stats["steps"] += n_steps
            self.stats["tokens"] += n_valid * n_steps
            return {}

        # ONE batched device->host transfer for this chunk's outputs;
        # per-row lazy slices would be one device op (and one link
        # round-trip) each. (The speculative path may have fetched the
        # outputs already — its overflow check rides the same transfer.)
        if out_np is None:
            out_np = np.asarray(jax.device_get(out[:n_valid]))

        results: Dict[Any, jnp.ndarray] = {}
        for j, slot in enumerate(order[:n_valid]):
            req = self._slots[slot]
            results[req.uid] = out_np[j]
            req.remaining -= n_steps
            req.state = out_np[j]
            if req.remaining <= 0:
                self._slots[slot] = None
                self._free.append(slot)
                self.stats["finished"] += 1
        self.stats["steps"] += n_steps
        self.stats["tokens"] += n_valid * n_steps
        return results

    def run(self, requests: List[Request], key=None,
            max_steps: int = 10_000, chunk: int = 1
            ) -> Dict[Any, jnp.ndarray]:
        """Drive the engine until every request finishes; requests join as
        slots free up. Returns each uid's final output.

        chunk > 1 enables multi-step scheduling: when no request can
        join (queue drained or batch full), up to `chunk` decode steps
        run in one device dispatch (bounded by the shortest remaining
        length so retirement still happens on time)."""
        pending = list(requests)[::-1]
        finals: Dict[Any, jnp.ndarray] = {}
        if key is None:
            key = jax.random.PRNGKey(0)
        steps_done = 0
        while steps_done < max_steps:
            while pending and self.try_add(pending[-1]):
                pending.pop()
            if self.active == 0 and not pending:
                break
            k = 1
            if chunk > 1:
                # the admission loop above ran until no request could
                # join, so multi-step scheduling is always safe here
                k = min(chunk,
                        min(r.remaining for r in self._slots
                            if r is not None))
                k = max(k, 1)
            key, sk = jax.random.split(key)
            for uid, out in self.step_chunk(k, key=sk).items():
                finals[uid] = out
            steps_done += k
        return finals


def _make_token_selector(sampler):
    """Token-selection fn(logits [B, V], key) -> [B] int32.

    sampler None/{} = greedy argmax (bit-identical to the historical
    path; the key is ignored). Otherwise a dict with any of:
      temperature: softmax temperature (0 = greedy)
      top_k: keep only the k highest logits
      top_p: nucleus sampling — keep the smallest prefix of the
        sorted distribution whose mass reaches p (the top token is
        always kept, so p -> 0 degenerates to greedy)
    Filters compose: top_k then top_p, then categorical sampling.
    """
    if not sampler:
        return lambda logits, key: jnp.argmax(
            logits, axis=-1).astype(jnp.int32)
    t = float(sampler.get("temperature", 1.0))
    top_k = int(sampler.get("top_k", 0))
    top_p = float(sampler.get("top_p", 0.0))
    if t == 0.0:
        return lambda logits, key: jnp.argmax(
            logits, axis=-1).astype(jnp.int32)

    def select(logits, key):
        l = logits.astype(jnp.float32) / t
        if top_k > 0 and top_k < l.shape[-1]:
            kth = lax.top_k(l, top_k)[0][..., -1:]
            l = jnp.where(l < kth, -jnp.inf, l)
        if top_p > 0.0:
            order = jnp.argsort(-l, axis=-1)
            l_sorted = jnp.take_along_axis(l, order, axis=-1)
            p_sorted = jax.nn.softmax(l_sorted, axis=-1)
            csum = jnp.cumsum(p_sorted, axis=-1)
            keep = (csum - p_sorted) < top_p      # top token always kept
            mask = jnp.zeros_like(keep).at[
                jnp.arange(l.shape[0])[:, None], order].set(keep)
            l = jnp.where(mask, l, -jnp.inf)
        return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)

    return select


class LmDecodeEngine:
    """Continuous-batching token generation over a TransformerMoE.

    The full-model serving path (the single-layer `MoeDecodeEngine`
    drives a MOELayer over embedding vectors; this drives the whole LM):
    a [max_batch]-slot KV cache, prompt prefill on admission, chunked
    decode with greedy or sampled token selection.

    Same O(1)-dispatches-per-chunk discipline as MoeDecodeEngine:
    admissions flush as one batched prefill + cache scatter per distinct
    prompt length, the chunked decode scan is one dispatch (compiled
    per (chunk,) and shared across engine instances via the model), and
    generated tokens come back as one [chunk, B] fetch.

    sampler: None = greedy (exact vs the full forward); or a dict with
    temperature / top_k / top_p / seed (see `_make_token_selector`).
    Sampled runs are deterministic for a fixed seed and admission
    sequence (the key stream advances per chunk and per step).
    """

    def __init__(self, model, params, max_batch: int,
                 moe_overrides: Optional[dict] = None,
                 auto_fuse: bool = True,
                 sampler: Optional[dict] = None,
                 speculative_capacity: float = 0.0,
                 capacity_bucket: int = 8,
                 attn_bucket: int = 64,
                 prefill_bucket: int = 64):
        self.model = model
        if auto_fuse and isinstance(params, dict) \
                and isinstance(params.get("blocks"), list):
            moe_layers = getattr(model, "moe_layers", {})
            params = dict(params)
            params["blocks"] = [
                ({**blk, "moe": _maybe_fuse_expert_stream(
                    blk["moe"], moe_layers.get(i))}
                 if isinstance(blk, dict) and "moe" in blk else blk)
                for i, blk in enumerate(params["blocks"])]
        self.params = params
        self.max_batch = int(max_batch)
        self.moe_overrides = dict(moe_overrides or {})
        self.sampler = dict(sampler or {})
        self._select = _make_token_selector(self.sampler)
        self._key = jax.random.PRNGKey(int(self.sampler.get("seed", 0)))
        # the prefill/decode executable caches live on the shared model
        # so engines reuse warm compiles — but the jitted closures bake
        # in moe_overrides (and the sampling config), so both must be
        # part of the cache key
        self._ov_key = (tuple(sorted(self.moe_overrides.items()))
                        + tuple(sorted(
                            (k, v) for k, v in self.sampler.items()
                            if k != "seed")))
        self.cache = model.init_cache(self.max_batch)
        self._tok = jnp.zeros((self.max_batch,), jnp.int32)
        self._pos = jnp.zeros((self.max_batch,), jnp.int32)
        self._slots: List[Optional[LmRequest]] = [None] * self.max_batch
        self._free = list(range(self.max_batch))[::-1]
        self._remaining = [0] * self.max_batch
        self._staged: List[Any] = []   # (slot, LmRequest)
        self._generated: Dict[Any, List[int]] = {}
        self.stats = {"steps": 0, "tokens": 0, "joined": 0, "finished": 0,
                      "spec_retries": 0}
        # Speculative dropless capacity for the DECODE chunks, same
        # scheme as MoeDecodeEngine (margin x average per-expert load,
        # traced needed-capacity probe via apply_decode(capacity_probe),
        # replay-on-overflow): at 256 slots / 128 experts the worst-case
        # buffer is 64x the average load and measured 4.05x slower per
        # chunk on the single-layer engine (docs/RESULTS.md). OPT-IN
        # here (default 0 = off), for two reasons: (a) the replayed
        # chunk's logits match the worst case only up to float reduction
        # order (different capacity -> different XLA dot tiling), so an
        # argmax TIE can select a different token — the engine's
        # exact-vs-full-forward guarantee holds only with speculation
        # off; (b) speculation enforces dropless decode via
        # capacity_override, superseding any capacity_factor in
        # moe_overrides. Auto-disabled for multi-device / expert-choice
        # MoE layers (the probe is single-device; EC capacity is exact).
        self.capacity_bucket = max(int(capacity_bucket), 1)
        self.speculative_capacity = float(speculative_capacity or 0)
        for lay in getattr(model, "moe_layers", {}).values():
            if lay.world_size > 1 or getattr(lay.gates[0],
                                             "expert_choice", False):
                self.speculative_capacity = 0.0
        if not getattr(model, "moe_layers", None):
            self.speculative_capacity = 0.0
        # shared across engines on the model, same rationale as the
        # MoeDecodeEngine layer-level hints (a hint only raises the
        # speculated cap; stale-params hints cost speed, not tokens)
        hints = getattr(model, "_serving_spec_hints", None)
        if hints is None:
            hints = model._serving_spec_hints = {}
        self._spec_hints = hints       # (ov_key, max_batch) -> needed
        # Bucketed attention windows: the full decode step reads the
        # whole [B, max_len] KV cache every token (the measured dominant
        # HBM cost of LM decode — 2.1 GB/step at B=256, T=256, 4
        # layers), but the engine knows every live position exactly
        # (prompt length + tokens generated, tracked host-side with no
        # sync), so chunks read only ceil((max live pos + chunk) /
        # attn_bucket) * attn_bucket positions — EXACT (positions past
        # pos are masked to zero probability either way) and compiled
        # once per bucket. 0 disables (always read max_len).
        self.attn_bucket = int(attn_bucket)
        # Prompt-length-bucketed admission: prefill executables are
        # keyed on the PADDED length bucket, not the exact prompt
        # length, so a workload of varied prompt lengths compiles
        # O(buckets) prefill variants instead of O(distinct lengths)
        # (the same no-recompile discipline as the variant cache /
        # attn_bucket; exactness argument in TransformerMoE.prefill's
        # prompt_lens doc). 0 = exact-length grouping. Auto-disabled
        # when moe_overrides carries a capacity_factor (a capacity-
        # limited prefill lets pad tokens displace real ones). The parallel
        # prefill already pads internally to its 64-position chunk, so
        # the default bucket adds no work it wasn't doing.
        self.prefill_bucket = int(prefill_bucket)
        self._host_pos = [0] * self.max_batch
        self._spec_over = jnp.asarray(False)

    @property
    def active(self) -> int:
        return self.max_batch - len(self._free)

    def try_add(self, request: LmRequest) -> bool:
        if not self._free:
            return False
        tp = len(request.prompt)
        budget = self.model.cfg.max_len - tp - 1
        if budget <= 0:
            raise ValueError(
                f"prompt length {tp} leaves no room under "
                f"max_len={self.model.cfg.max_len}")
        slot = self._free.pop()
        self._slots[slot] = request
        self._remaining[slot] = min(request.max_new_tokens, budget)
        self._staged.append((slot, request))
        self._generated[request.uid] = []
        self.stats["joined"] += 1
        return True

    # -- prefill (admission flush) --------------------------------------

    def _prefill_fn(self, tp: int, n: int, bucketed: bool):
        cache = getattr(self.model, "_serving_prefill_cache", None)
        if cache is None:
            cache = self.model._serving_prefill_cache = {}
        fn = cache.get((tp, n, bucketed, self._ov_key))
        if fn is None:
            model, ov = self.model, self.moe_overrides
            select = self._select

            if bucketed:
                def fn(params, prompts, group_cache, lens, key):
                    logits, group_cache = model.prefill(
                        params, prompts, group_cache, moe_overrides=ov,
                        prompt_lens=lens)
                    return select(logits, key), group_cache
            else:
                def fn(params, prompts, group_cache, lens, key):
                    logits, group_cache = model.prefill(
                        params, prompts, group_cache, moe_overrides=ov)
                    return select(logits, key), group_cache

            fn = jax.jit(fn)
            cache[(tp, n, bucketed, self._ov_key)] = fn
        return fn

    def _flush_admissions(self):
        if not self._staged:
            return
        # group by prompt-length BUCKET (exact length when
        # prefill_bucket=0): each group is one prefill pass + one
        # cache-row scatter per layer; mixed true lengths inside a
        # bucket ride the model's prompt_lens contract
        q = self.prefill_bucket
        if q > 0 and "capacity_factor" in self.moe_overrides:
            # a capacity-LIMITED prefill makes pad tokens compete with
            # real prompt tokens for expert slots, breaking the
            # bucketed == exact admission contract (the lossless
            # per-chunk default cannot drop; an explicit
            # capacity_factor can) — group by exact length instead
            q = 0
        max_len = self.model.cfg.max_len

        def bucket(tp):
            return min(-(-tp // q) * q, max_len) if q > 0 else tp

        by_len: Dict[int, List[Any]] = {}
        for slot, req in self._staged:
            by_len.setdefault(bucket(len(req.prompt)), []).append(
                (slot, req))
        self._staged = []
        for bl, group in by_len.items():
            slots = jnp.asarray([s for s, _ in group], jnp.int32)
            lens = [len(r.prompt) for _, r in group]
            bucketed = q > 0 and any(l != bl for l in lens)
            prompts = jnp.asarray(np.stack(
                [np.pad(np.asarray(r.prompt, np.int32),
                        (0, bl - len(r.prompt)))
                 for _, r in group]))
            n = len(group)
            self._key, sk = jax.random.split(self._key)
            first_tok, gc = self._prefill_fn(bl, n, bucketed)(
                self.params, prompts, self.model.init_cache(n),
                jnp.asarray(lens, jnp.int32), sk)
            for i, layer_cache in enumerate(gc):
                # generic over the cache layout (bf16 {"k","v"} or the
                # INT8 {"k","v","k_s","v_s"} form — dim 0 is always B)
                self.cache[i] = {
                    kk: self.cache[i][kk].at[slots].set(layer_cache[kk])
                    for kk in self.cache[i]}
            self._tok = self._tok.at[slots].set(first_tok)
            self._pos = self._pos.at[slots].set(
                jnp.asarray(lens, jnp.int32))
            for (slot, _), l in zip(group, lens):
                self._host_pos[slot] = l
            # the prefill's selection is the first generated token
            for j, (slot, req) in enumerate(group):
                tok = int(first_tok[j])
                self._generated[req.uid].append(tok)
                self._remaining[slot] -= 1
                if req.stop_token is not None and tok == req.stop_token:
                    self._remaining[slot] = 0   # retires at next sweep

    # -- chunked decode -------------------------------------------------

    def _decode_fn(self, n_steps: int, cap: Optional[int] = None,
                   with_probe: bool = False,
                   attn_len: Optional[int] = None):
        """One compiled dispatch for a decode chunk, including the
        sampling-key-chain advance (the per-chunk host-side
        PRNGKey/split was one extra device op per chunk — a link
        round-trip on a remote-attached device).

        cap != None decodes with `capacity_override=cap` on every MoE
        layer; with_probe=True additionally threads the traced
        needed-capacity probe (apply_decode(capacity_probe=True))
        through the scan and returns (max needed, overflowed);
        attn_len bounds the per-step KV-cache read (exact — see
        TransformerMoE._attn_step).

        Returns run(params, kv, tok, pos, key) ->
        (kv, tok, pos, toks, next_key[, mx, over])."""
        cache = getattr(self.model, "_serving_decode_cache", None)
        if cache is None:
            cache = self.model._serving_decode_cache = {}
        ck = ("v2", n_steps, cap, with_probe, attn_len) + self._ov_key
        fn = cache.get(ck)
        if fn is None:
            model, ov = self.model, self.moe_overrides
            if cap is not None:
                ov = {**ov, "capacity_override": cap}
            select = self._select

            def fn(params, kv, tok, pos, key):
                next_key, sub = jax.random.split(key)

                def body(carry, _):
                    kv, tok, pos, k, mx = carry
                    if with_probe:
                        logits, kv, _aux, needed = model.apply_decode(
                            params, tok, kv, pos, moe_overrides=ov,
                            capacity_probe=True, attn_len=attn_len)
                        mx = jnp.maximum(mx, needed)
                    else:
                        logits, kv, _aux = model.apply_decode(
                            params, tok, kv, pos, moe_overrides=ov,
                            attn_len=attn_len)
                    k, sk = jax.random.split(k)
                    nxt = select(logits, sk)
                    return (kv, nxt, pos + 1, k, mx), nxt

                (kv, tok, pos, _, mx), toks = jax.lax.scan(
                    body, (kv, tok, pos, sub, jnp.int32(0)), None,
                    length=n_steps)
                if with_probe:
                    return kv, tok, pos, toks, next_key, mx, mx > cap
                return kv, tok, pos, toks, next_key

            # donate the cache/token/position buffers so XLA updates the
            # KV cache IN PLACE across the dispatch boundary — without
            # donation every chunk copies the full [B, max_len] cache
            # (measured ~14 ms/chunk at B=64, T=2048, 4 layers). The
            # SPECULATIVE path donates the cache too (round 4): a
            # replay-on-overflow does not need the pre-chunk cache,
            # because the chunk only WRITES positions >= each row's
            # pos, and every such cell is masked (never read) until
            # the step that writes it — so a replay from the post-chunk
            # cache reads only cells that are either committed (< pos)
            # or rewritten by the replay itself before being read.
            # Only tok/pos must stay undonated there (the replay
            # restarts from the pre-chunk tokens/positions).
            donate = (1,) if with_probe else (1, 2, 3)
            fn = jax.jit(fn, donate_argnums=donate,
                         compiler_options=self._chunk_compiler_options())
            cache[ck] = fn
        return fn

    def _chunk_compiler_options(self):
        """XLA options for the decode-chunk compile, env-overridable
        (TUTEL_TPU_DECODE_MSA=0 disables memory-space assignment for
        the chunk executable). Measured at the 2k kv8+GQA serving
        config (round 5): on the pre-round-5 step — per-layer RMW
        writes inside the attention dependency chain — MSA bounced the
        full aliased caches through alternate memory every step and
        msa_off won by ~1.1 ms/chunk; after fresh-token injection +
        the end-of-step batched write the bounce is gone and MSA's
        weight prefetching wins by ~4 ms/chunk. One residual ~31
        MB/step cache bounce survives the restructure;
        xla_msa_max_outstanding_prefetches=0 removes EVERY cache copy
        from the HLO and measured ~1 ms/chunk faster than the stock
        pipeline (16.56 vs 17.55 ms no-probe at kv8+GQA), so that is
        the quantized-KV default. TUTEL_TPU_DECODE_MSA: "0" = MSA off
        entirely, "1" = stock pipeline, unset = measured default."""
        import os
        import jax as _jax
        if _jax.default_backend() != "tpu":
            return None          # MSA options exist only on the TPU compiler
        env = os.environ.get("TUTEL_TPU_DECODE_MSA", "")
        if env == "0":
            return {"xla_msa_enable": "false"}
        if env == "1":
            return None
        if getattr(self.model.cfg, "kv_bits", 0) in (8, 4):
            return {"xla_msa_max_outstanding_prefetches": "0"}
        return None

    def _attn_len(self, n_steps: int) -> Optional[int]:
        """Static attention-window bound for the next n_steps: largest
        live position + the chunk, attn_bucket-aligned, None (= read
        max_len) when disabled or the bound reaches max_len. Inactive
        slots decode junk whose positions are irrelevant (their rows
        are never read back), so only active slots bound the window."""
        if self.attn_bucket <= 0:
            return None
        mp = max((self._host_pos[s] for s, r in enumerate(self._slots)
                  if r is not None), default=0)
        b = self.attn_bucket
        t = min((mp + n_steps + b - 1) // b * b, self.model.cfg.max_len)
        return None if t >= self.model.cfg.max_len else t

    def _lm_spec_cap(self) -> int:
        """Speculated dropless capacity for a decode step: margin x the
        average per-expert load over the FULL slot buffer (every slot
        row routes, occupied or not), raised to the largest observed
        need, bucket-aligned, clipped to [bucket, max_batch]."""
        tk = self.moe_overrides.get("top_k") or self.model.cfg.top_k
        e = min(l.num_global_experts
                for l in self.model.moe_layers.values())
        tk = min(int(tk), e)
        avg = -(-tk * self.max_batch // e)
        hint = self._spec_hints.get((self._ov_key, self.max_batch), 0)
        cap = max(int(avg * self.speculative_capacity), hint)
        cap = -(-cap // self.capacity_bucket) * self.capacity_bucket
        return max(self.capacity_bucket, min(cap, self.max_batch))

    @property
    def spec_overflow(self) -> bool:
        """True if any fetch=False speculative chunk overflowed its
        buffer (its tokens are invalid — benchmarking mode only;
        fetch=True chunks replay on overflow and stay dropless)."""
        return bool(self._spec_over)

    def step_chunk(self, n_steps: int, fetch: bool = True
                   ) -> Dict[Any, List[int]]:
        """Decode `n_steps` greedy tokens for every active slot in ONE
        device dispatch. Returns {uid: new tokens this chunk}.

        fetch=False skips the device->host token transfer: the chunk
        enqueues asynchronously and {} is returned. The KV cache and
        position state stay correct (decode continues from the true
        device-side state), but this chunk's generated tokens are NOT
        recorded in the host-side history — a device-time benchmarking
        mode, not a serving mode. With speculative_capacity > 0 a
        fetch=False chunk also cannot replay on overflow: check
        `spec_overflow` after the run — if True, some chunk dropped
        rows and the dropless guarantee was lost (fetch=True chunks
        always replay and stay dropless)."""
        self._flush_admissions()
        # a request whose budget was consumed by the prefill's first
        # token retires without decoding
        for slot, req in enumerate(self._slots):
            if req is not None and self._remaining[slot] <= 0:
                self._slots[slot] = None
                self._free.append(slot)
                self.stats["finished"] += 1
        if self.active == 0:
            return {}
        n_steps = max(1, min(
            n_steps, *[self._remaining[s] for s, r in
                       enumerate(self._slots) if r is not None]))
        toks_np = None
        attn_len = self._attn_len(n_steps)
        if self.speculative_capacity > 0:
            # run at the speculated capacity; replay this chunk from
            # the pre-chunk tok/pos at the observed capacity if any
            # step's routing overflowed the speculation. The KV cache
            # is DONATED even here: the replay reads only cells it
            # rewrites first or that the chunk never touched (see
            # _decode_fn's donation note), so it restarts from the
            # post-chunk cache buffer, not a preserved copy.
            pre_tok, pre_pos = self._tok, self._pos
            key, cap = self._key, self._lm_spec_cap()
            kv_in = self.cache
            while True:
                kv, tok, pos, toks, nkey, mx, over = self._decode_fn(
                    n_steps, cap=cap, with_probe=True,
                    attn_len=attn_len)(
                    self.params, kv_in, pre_tok, pre_pos, key)
                kv_in = kv
                if cap >= self.max_batch:
                    break                  # lossless by construction
                if not fetch:
                    # no host sync allowed: record the overflow flag
                    # device-side (see spec_overflow)
                    self._spec_over = jnp.logical_or(self._spec_over,
                                                     over)
                    break
                # the overflow check rides the token fetch the caller
                # needs anyway — no extra round-trip on the happy path
                toks_np, mx_host = jax.device_get((toks, mx))
                hk = (self._ov_key, self.max_batch)
                self._spec_hints[hk] = max(
                    self._spec_hints.get(hk, 0), int(mx_host))
                if int(mx_host) <= cap:
                    break
                self.stats["spec_retries"] += 1
                toks_np = None
                cap = min(self.max_batch,
                          -(-int(mx_host) // self.capacity_bucket)
                          * self.capacity_bucket)
            self.cache, self._tok, self._pos, self._key = \
                kv, tok, pos, nkey
        else:
            (self.cache, self._tok, self._pos, toks,
             self._key) = self._decode_fn(n_steps, attn_len=attn_len)(
                self.params, self.cache, self._tok, self._pos, self._key)
        for slot, req in enumerate(self._slots):
            if req is not None:
                self._host_pos[slot] += n_steps
        if not fetch:
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                self._remaining[slot] -= n_steps
                self.stats["tokens"] += n_steps
                if self._remaining[slot] <= 0:
                    self._slots[slot] = None
                    self._free.append(slot)
                    self.stats["finished"] += 1
            self.stats["steps"] += n_steps
            return {}
        # ONE batched device->host transfer per chunk (the speculative
        # path may have fetched already — its overflow check rides the
        # same transfer)
        if toks_np is None:
            toks_np = jax.device_get(toks)             # [n_steps, B]
        toks_np = np.asarray(toks_np)

        results: Dict[Any, List[int]] = {}
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            new = toks_np[:, slot].tolist()
            stopped = False
            if req.stop_token is not None and req.stop_token in new:
                # truncate at (and include) the stop token; tokens the
                # chunk decoded past it are discarded host-side
                new = new[:new.index(req.stop_token) + 1]
                stopped = True
            self._generated[req.uid].extend(new)
            results[req.uid] = new
            self._remaining[slot] -= n_steps
            self.stats["tokens"] += len(new)
            if stopped or self._remaining[slot] <= 0:
                self._slots[slot] = None
                self._free.append(slot)
                self.stats["finished"] += 1
        self.stats["steps"] += n_steps
        return results

    def run(self, requests: List[LmRequest], chunk: int = 8,
            max_steps: int = 100_000) -> Dict[Any, np.ndarray]:
        """Drive until every request finishes; returns each uid's full
        generated token sequence (prompt not included)."""
        pending = list(requests)[::-1]
        steps = 0
        while steps < max_steps:
            while pending and self.try_add(pending[-1]):
                pending.pop()
            if self.active == 0 and not pending:
                break
            self.step_chunk(chunk)
            steps += chunk
        return {uid: np.asarray(toks, np.int32)
                for uid, toks in self._generated.items()}
