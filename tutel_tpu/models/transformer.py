"""Decoder-only Transformer LM with MoE FFN blocks.

Capability counterpart of the reference's fairseq integration
(reference examples/fairseq_moe/fairseq_patch.diff:44-54: every `MOE`-th
decoder FFN is replaced by a `moe_layer`; aux losses are collected across
layers and added to the task loss with weight `L_AUX_WT`,
fairseq_patch.diff:119-128). Here the integration is functional: the model
returns (logits, l_aux_sum), no global-cache side channel.

TPU-first: bf16-friendly, static shapes, causal attention as one fused
einsum chain, pre-LN blocks, MoE layers built once and driven through the
variant cache (per-call top_k / capacity_factor overrides pass through
`forward(..., moe_overrides={...})`).
"""

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..impls.moe_layer import MOELayer


@dataclasses.dataclass(frozen=True)
class TransformerMoEConfig:
    vocab_size: int = 256
    max_len: int = 256
    model_dim: int = 128
    num_heads: int = 4
    num_layers: int = 4
    ffn_hidden: int = 512
    moe_every: int = 2                 # every Nth block uses MoE FFN
    num_local_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    expert_hidden: int = 512
    expert_type: str = "ffn"
    gate_type: str = "top"
    dtype: Any = jnp.float32
    expert_kwargs: Any = None          # extra expert-module fields
                                       # (e.g. activation_bits=8)
    kv_bits: int = 0                   # 8 = INT8 KV cache (serving:
                                       # halves the dominant HBM cost
                                       # of decode, per-(pos, head)
                                       # symmetric scales); 4 = INT4
                                       # nibble-packed (quarter bytes,
                                       # same scale layout); 0 = dtype
    num_kv_heads: int = 0              # grouped-query attention: K/V
                                       # heads (0 = num_heads, i.e.
                                       # MHA). Shrinks the KV cache
                                       # and its decode bandwidth by
                                       # num_heads/num_kv_heads; query
                                       # head h reads KV group
                                       # h % num_kv_heads


class TransformerMoE:
    """Functional model: `init(key) -> params`, `apply(params, tokens)`."""

    def __init__(self, config: TransformerMoEConfig, group=None,
                 parallel_type="adaptive:1"):
        self.cfg = config
        self.moe_layers: Dict[int, MOELayer] = {}
        for i in range(config.num_layers):
            if config.moe_every > 0 and (i + 1) % config.moe_every == 0:
                self.moe_layers[i] = MOELayer(
                    gate_type={"type": config.gate_type, "k": config.top_k,
                               "capacity_factor": config.capacity_factor},
                    experts={"type": config.expert_type,
                             "num_experts_per_device":
                                 config.num_local_experts,
                             "hidden_size_per_expert": config.expert_hidden,
                             **(config.expert_kwargs or {})},
                    model_dim=config.model_dim,
                    dtype=config.dtype,
                    parallel_type=parallel_type,
                    group=group,
                )

    # ------------------------------------------------------------------

    @property
    def _kvh(self) -> int:
        """KV heads (grouped-query attention); == num_heads for MHA."""
        cfg = self.cfg
        kvh = cfg.num_kv_heads or cfg.num_heads
        assert cfg.num_heads % kvh == 0, (cfg.num_heads, kvh)
        return kvh

    def _split_qkv(self, qkv, lead_shape):
        """Split the fused qkv projection into q [.., nh, hd] and
        k, v [.., kvh, hd] (the GQA-aware form of jnp.split)."""
        cfg = self.cfg
        nh, kvh = cfg.num_heads, self._kvh
        hd = cfg.model_dim // nh
        d = cfg.model_dim
        kvd = kvh * hd
        q = qkv[..., :d].reshape(*lead_shape, nh, hd)
        k = qkv[..., d:d + kvd].reshape(*lead_shape, kvh, hd)
        v = qkv[..., d + kvd:].reshape(*lead_shape, kvh, hd)
        return q, k, v

    def init(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        d = cfg.model_dim
        keys = jax.random.split(key, cfg.num_layers + 2)
        scale = d ** -0.5
        qkv_dim = d + 2 * self._kvh * (d // cfg.num_heads)
        params: Dict[str, Any] = {
            "embed": jax.random.normal(keys[0], (cfg.vocab_size, d),
                                       cfg.dtype) * scale,
            "pos": jax.random.normal(keys[1], (cfg.max_len, d),
                                     cfg.dtype) * scale,
            "final_ln": {"scale": jnp.ones((d,), cfg.dtype),
                         "bias": jnp.zeros((d,), cfg.dtype)},
            "blocks": [],
        }
        for i in range(cfg.num_layers):
            bk = jax.random.split(keys[i + 2], 6)
            block = {
                "ln1": {"scale": jnp.ones((d,), cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
                "ln2": {"scale": jnp.ones((d,), cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
                "wqkv": jax.random.normal(bk[0], (d, qkv_dim),
                                          cfg.dtype) * scale,
                "wo": jax.random.normal(bk[1], (d, d), cfg.dtype) * scale,
            }
            if i in self.moe_layers:
                block["moe"] = self.moe_layers[i].init(bk[2])
            else:
                h = cfg.ffn_hidden
                block["ffn"] = {
                    "w1": jax.random.normal(bk[3], (d, h), cfg.dtype)
                    * scale,
                    "b1": jnp.zeros((h,), cfg.dtype),
                    "w2": jax.random.normal(bk[4], (h, d), cfg.dtype)
                    * (h ** -0.5),
                    "b2": jnp.zeros((d,), cfg.dtype),
                }
            params["blocks"].append(block)
        return params

    # ------------------------------------------------------------------

    @staticmethod
    def _ln(p, x):
        # statistics in f32 (bf16 mean/var over 2048 lanes loses ~3
        # decimal digits), elementwise normalize in the model dtype
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + 1e-5)
        y = (x - mu.astype(x.dtype)) * r.astype(x.dtype)
        return y * p["scale"] + p["bias"]

    def _attn(self, block, x):
        # NOTE (round 4, measured): the stock TPU flash-attention
        # Pallas kernel (jax.experimental.pallas.ops.tpu.flash_attention,
        # causal, custom VJP) was wired here and LOST to this XLA form
        # on v5e training at both regimes — 249 vs 216 ms/step at
        # B=32 T=512 and 355 vs 288 ms at B=8 T=2048 (loop-differenced
        # fwd+bwd+SGD, benchmarks/bench_lm_train.py) — so it was
        # removed; XLA's fused attention is the production path.
        cfg = self.cfg
        b, t, d = x.shape
        nh, hd = cfg.num_heads, d // cfg.num_heads
        kvh = self._kvh
        mq = nh // kvh
        qkv = jnp.einsum("btd,de->bte", x, block["wqkv"],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q, k, v = self._split_qkv(qkv, (b, t))
        # GQA group convention: head h = m*kvh + g reads KV group g,
        # i.e. g(h) = h % kvh — the reshape (mq, kvh) realizes it
        q = q.reshape(b, t, mq, kvh, hd)
        scores = jnp.einsum("bqmgd,bkgd->bmgqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        mask = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(mask[None, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bmgqk,bkgd->bqmgd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, t, d)
        return jnp.einsum("btd,de->bte", out, block["wo"],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def _moe_call(self, i, moe_params, h, key, **overrides):
        """Call MoE layer i on activations h [..., d], padding the
        flattened token count up to a multiple of the layer's world
        size with `valid_tokens` masking — so the LM (and its serving
        engine) runs under EP at ANY batch/prompt size, the same
        partial-fill contract MoeDecodeEngine uses (scalar
        valid_tokens = global packed fill; the padded tail is masked
        out of routing, capacity, and the aux loss)."""
        layer = self.moe_layers[i]
        w = layer.world_size
        shape = h.shape
        n = 1
        for s in shape[:-1]:
            n *= int(s)
        if w <= 1 or n % w == 0 or "valid_tokens" in overrides:
            return layer(moe_params, h, key=key, **overrides)
        pad = (-n) % w
        hp = jnp.concatenate(
            [h.reshape(n, shape[-1]),
             jnp.zeros((pad, shape[-1]), h.dtype)], axis=0)
        out, l_aux = layer(moe_params, hp, key=key, valid_tokens=n,
                           **overrides)
        return out[:n].reshape(shape), l_aux

    def apply(self, params, tokens, key=None, training=False,
              moe_overrides: Optional[dict] = None):
        """tokens [B, T] int32 -> (logits [B, T, V], l_aux_sum)."""
        cfg = self.cfg
        b, t = tokens.shape
        if key is None:
            key = jax.random.PRNGKey(0)
        x = params["embed"][tokens] + params["pos"][None, :t]
        x = x.astype(cfg.dtype)
        l_aux_sum = jnp.float32(0)
        overrides = dict(moe_overrides or {})
        for i, block in enumerate(params["blocks"]):
            x = x + self._attn(block, self._ln(block["ln1"], x))
            h = self._ln(block["ln2"], x)
            if i in self.moe_layers:
                out, l_aux = self._moe_call(
                    i, block["moe"], h, jax.random.fold_in(key, i),
                    training=training, **overrides)
                x = x + out
                l_aux_sum = l_aux_sum + l_aux.astype(jnp.float32)
            else:
                f = block["ffn"]
                hdn = jnp.einsum("btd,dh->bth", h, f["w1"],
                                 preferred_element_type=jnp.float32)
                hdn = jax.nn.gelu(hdn + f["b1"]).astype(cfg.dtype)
                o = jnp.einsum("bth,hd->btd", hdn, f["w2"],
                               preferred_element_type=jnp.float32)
                x = x + (o + f["b2"]).astype(cfg.dtype)
        x = self._ln(params["final_ln"], x)
        # bf16 operands + f32 MXU accumulation; for bf16 models the
        # logits STORE in bf16 too (round 5): an f32 [B, T, V] logits
        # tensor makes the backward vocab matmuls consume an f32
        # cotangent — f32xbf16 runs at half the MXU rate — and doubles
        # the CE reduction traffic (together ~12 ms of the 207 ms
        # training step). The loss reductions still accumulate in f32
        # (_nll upcasts inside the fused reduce); f32 models keep f32
        # logits, so CPU/test numerics are unchanged.
        pe = jnp.float32 if x.dtype == jnp.float32 else None
        logits = jnp.einsum("btd,vd->btv", x,
                            params["embed"].astype(x.dtype),
                            preferred_element_type=pe)
        return logits, l_aux_sum

    # ------------------------------------------------------------------
    # Sequence/context parallelism (Ulysses-style SP x EP)
    # ------------------------------------------------------------------

    def _moe_mesh(self):
        """The mesh + expert axes the embedded MoE layers run on; the
        SP token shard rides the SAME flattened axes, so sequence
        parallelism and expert parallelism share one device mesh."""
        layers = list(self.moe_layers.values())
        if not layers:
            raise ValueError(
                "apply_seqpar derives its mesh from the MoE layers; "
                "this model has none (moe_every=0)")
        l0 = layers[0]
        for l in layers[1:]:
            if l.world_size != l0.world_size or l.devices != l0.devices:
                raise ValueError(
                    "all MoE layers must share one device group for "
                    "sequence parallelism")
        return (l0._mesh(max(l0.adaptive_degree, 1)), l0._ep_axes(),
                l0.world_size)

    def _attn_seqpar(self, block, x, axes):
        """Ulysses-style sequence-parallel attention: x [B, T/P, d].

        The head<->sequence all-to-all pair re-shards [B, T/P, NH, hd]
        to [B, T, NH/P, hd] (each device sees the FULL sequence for its
        head subset), computes ordinary causal attention, and re-shards
        back — wire cost 3+1 activation-sized a2a, the SP pattern the
        reference only sketches (spatial_split,
        reference tutel/impls/communicate.py:589-604, and parted's A2A
        re-sharding, reference tutel/parted/patterns.py:91-109; SURVEY
        §5 long-context owes capability parity, delivered here).

        Grouped-query attention (round 5, P <= KVH): K/V shard their
        OWN head axis (only KVH/P heads travel — for GQA the K/V legs
        move NH/KVH-fold less wire than the query legs), and the query
        heads are pre-permuted group-major so the a2a lands each
        device exactly the mq query heads of each of its KVH/P local
        groups; the output leg inverts the permutation. With MHA the
        permutation is the identity and this reduces to the classic
        Ulysses pair."""
        cfg = self.cfg
        b, tl, d = x.shape
        nh, hd = cfg.num_heads, d // cfg.num_heads
        kvh = self._kvh
        mq = nh // kvh
        qkv = jnp.einsum("btd,de->bte", x, block["wqkv"],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q, k, v = self._split_qkv(qkv, (b, tl))
        if mq > 1:
            # group-major head order: position g*mq + j holds query
            # head j*kvh + g (the h % kvh group convention), so a
            # P-way contiguous head split co-locates each group's
            # queries with its K/V head
            perm = jnp.asarray([j * kvh + g for g in range(kvh)
                                for j in range(mq)])
            q = jnp.take(q, perm, axis=2)
        # scatter heads / gather sequence (device j's token block lands
        # at sequence offset j*tl, so global order is preserved)
        q, k, v = (jax.lax.all_to_all(a, axes, split_axis=2,
                                      concat_axis=1, tiled=True)
                   for a in (q, k, v))
        t = q.shape[1]
        gl = k.shape[2]                     # kvh/P local K/V groups
        q = q.reshape(b, t, gl, mq, hd)     # group-major local layout
        scores = jnp.einsum("bqgmd,bkgd->bgmqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        mask = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(mask[None, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bgmqk,bkgd->bqgmd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, t, gl * mq, hd)
        # scatter sequence / gather heads — the exact inverse
        out = jax.lax.all_to_all(out, axes, split_axis=1, concat_axis=2,
                                 tiled=True)
        if mq > 1:
            inv = jnp.asarray([(h % kvh) * mq + h // kvh
                               for h in range(nh)])
            out = jnp.take(out, inv, axis=2)
        out = out.reshape(b, tl, d)
        return jnp.einsum("btd,de->bte", out, block["wo"],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def _attn_ringpar(self, block, x, axes, sp):
        """Ring (context-parallel) attention: x [B, T/P, d].

        Flash-style blockwise attention with an online softmax: each
        device keeps its QUERY block resident and rotates the K/V
        blocks around the mesh-axis ring with `lax.ppermute` — P steps,
        step j consuming the block that originated on device
        (i - j) mod P, causal-masked by GLOBAL position. Accumulators
        (running max m, denominator l, numerator acc) are f32; the
        normalization divides once at the end, so the result equals
        ordinary softmax attention exactly (up to f32 summation order).

        Contrast with the Ulysses pair (`_attn_seqpar`): the head axis
        is never re-sharded, so the SP degree is NOT bounded by
        num_heads and grouped-query attention works unchanged (only
        the kvh K/V heads travel — for GQA that is LESS wire than
        Ulysses' full-head q/out legs). This is the blockwise form of
        Liu et al.'s Ring Attention, built from the same collective
        vocabulary the reference sketches for re-sharding (reference
        tutel/impls/communicate.py:589-604 spatial_split; SURVEY §5
        long-context capability parity)."""
        cfg = self.cfg
        b, tl, d = x.shape
        nh, hd = cfg.num_heads, d // cfg.num_heads
        kvh = self._kvh
        mq = nh // kvh
        qkv = jnp.einsum("btd,de->bte", x, block["wqkv"],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q, k, v = self._split_qkv(qkv, (b, tl))
        qg = q.reshape(b, tl, mq, kvh, hd)
        i = jax.lax.axis_index(axes)
        scale = hd ** -0.5
        q_pos = i * tl + jnp.arange(tl)                        # [tl]
        fwd_perm = [(r, (r + 1) % sp) for r in range(sp)]

        # ONE lax.scan step per ring position (round 5): the unrolled
        # form's HLO grew O(sp) and its un-remat'd backward kept every
        # step's [.., tl, tl] score tile alive — hostile at pod scale.
        # The scan body is jax.checkpoint'ed, so the backward keeps
        # only the per-step carry (the rotating K/V block + the online
        # softmax state, the minimum an exact ring backward needs) and
        # recomputes the tiles. The rotation is issued BEFORE the
        # step's dots — it has no data dependence on them, so the
        # latency-hiding scheduler overlaps the ppermute wire with the
        # score/PV compute (asserted on scheduled HLO by
        # tests/test_overlap_hlo.py::test_ring_permute_overlaps_dots).
        def ring_step(carry, j):
            m, den, acc, k_blk, v_blk = carry
            k_nxt = jax.lax.ppermute(k_blk, axes, fwd_perm)
            v_nxt = jax.lax.ppermute(v_blk, axes, fwd_perm)
            src = (i - j) % sp
            k_pos = src * tl + jnp.arange(tl)                  # [tl]
            scores = jnp.einsum("bqmgd,bkgd->bmgqk", qg, k_blk,
                                preferred_element_type=jnp.float32)
            scores = scores * scale
            mask = k_pos[None, :] <= q_pos[:, None]            # [tl, tl]
            scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
            blk_max = jnp.max(scores, axis=-1)                 # [b,m,g,q]
            new_m = jnp.maximum(m, blk_max)
            safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
            p = jnp.where(mask[None, None, None],
                          jnp.exp(scores - safe_m[..., None]), 0.0)
            alpha = jnp.where(jnp.isfinite(m),
                              jnp.exp(m - safe_m), 0.0)        # [b,m,g,q]
            den = den * alpha + jnp.sum(p, axis=-1)
            pv = jnp.einsum("bmgqk,bkgd->bqmgd", p, v_blk,
                            preferred_element_type=jnp.float32)
            acc = acc * alpha.transpose(0, 3, 1, 2)[..., None] + pv
            return (new_m, den, acc, k_nxt, v_nxt), None

        init = (jnp.full((b, mq, kvh, tl), -jnp.inf, jnp.float32),
                jnp.zeros((b, mq, kvh, tl), jnp.float32),
                jnp.zeros((b, tl, mq, kvh, hd), jnp.float32),
                k, v)
        (m, den, acc, _, _), _ = jax.lax.scan(
            jax.checkpoint(ring_step), init, jnp.arange(sp))
        out = acc / den.transpose(0, 3, 1, 2)[..., None]
        out = out.astype(x.dtype).reshape(b, tl, d)
        return jnp.einsum("btd,de->bte", out, block["wo"],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def seqpar_specs(self, params):
        """(mesh, token_axes, param_specs, logits_spec) for the
        sequence-parallel forward — exposed so callers can build their
        own enclosing shard_map/jit around `apply_seqpar`'s body."""
        mesh, axes, _sp = self._moe_mesh()
        blocks = []
        for i, block in enumerate(params["blocks"]):
            bs = {k: jax.tree.map(lambda _: P(), v)
                  for k, v in block.items() if k != "moe"}
            if "moe" in block:
                bs["moe"] = self.moe_layers[i].param_specs(block["moe"])
            blocks.append(bs)
        pspec = {"embed": P(), "pos": P(),
                 "final_ln": jax.tree.map(lambda _: P(),
                                          params["final_ln"]),
                 "blocks": blocks}
        return mesh, axes, pspec, P(None, axes, None)

    def apply_seqpar(self, params, tokens, key=None, training=False,
                     moe_overrides: Optional[dict] = None,
                     attn_mode: str = "ulysses"):
        """Sequence-parallel forward: tokens [B, T] with T sharded over
        the MoE layers' device mesh -> (logits [B, T, V], l_aux_sum).

        The whole transformer runs under ONE shard_map on the MoE mesh:
        each device holds T/P tokens; attention runs context-parallel
        per `attn_mode`; the MoE layers consume the token shard
        directly through `local_forward`, so their expert all-to-all
        rides the SAME mesh axes — SP composes with EP (and expert-
        slicing TP) with zero re-sharding between attention and MoE.
        Numerically equal to `apply` on one device whenever routing
        drops nothing (pinned by tests/test_seqpar.py).

        attn_mode:
          * "ulysses" — head<->sequence all-to-all pair around a full
            attention (`_attn_seqpar`). Requires num_kv_heads % P == 0
            (so num_heads % P == 0 too): the a2a shards the head axes,
            with GQA query heads permuted group-major so each device
            gets whole groups (round 5 — previously MHA-only).
          * "ring" — blockwise ring attention (`_attn_ringpar`): K/V
            blocks rotate over ppermute with an online softmax. No
            head-count bound (use it when P > num_kv_heads); the K/V
            axis stays sequence-sharded throughout (memory O(T/P) per
            device).

        Requires T % P == 0 (P = the MoE world size). moe_overrides
        supports top_k / capacity_factor / capacity_override
        (static-capacity forms — the host-probe dropless path can't
        run under shard_map)."""
        cfg = self.cfg
        if attn_mode not in ("ulysses", "ring"):
            raise ValueError(f"attn_mode={attn_mode!r} "
                             "(expected 'ulysses' or 'ring')")
        mesh, axes, sp = self._moe_mesh()
        if sp == 1:
            return self.apply(params, tokens, key=key, training=training,
                              moe_overrides=moe_overrides)
        b, t = tokens.shape
        if t % sp:
            raise ValueError(
                f"sequence length {t} must divide the {sp}-device "
                "SP world")
        if attn_mode == "ulysses" and self._kvh % sp:
            raise ValueError(
                f"num_kv_heads {self._kvh} must divide the {sp}-device "
                "SP world for attn_mode='ulysses' (its all-to-all "
                "shards whole KV groups; use 'ring' when P exceeds "
                "the KV head count)")
        if key is None:
            key = jax.random.PRNGKey(0)
        ov = dict(moe_overrides or {})
        moe_fns = {i: self.moe_layers[i].local_forward(
            capacity_factor=ov.get("capacity_factor"),
            top_k=ov.get("top_k"),
            capacity_override=ov.get("capacity_override"),
            training=training) for i in self.moe_layers}

        def fwd(params, tokens_local, key):
            idx = jax.lax.axis_index(axes)
            tl = tokens_local.shape[1]
            pos_p = jax.lax.dynamic_slice_in_dim(params["pos"],
                                                 idx * tl, tl)
            x = (params["embed"][tokens_local]
                 + pos_p[None]).astype(cfg.dtype)
            l_aux_sum = jnp.float32(0)
            for i, block in enumerate(params["blocks"]):
                h1 = self._ln(block["ln1"], x)
                if attn_mode == "ring":
                    x = x + self._attn_ringpar(block, h1, axes, sp)
                else:
                    x = x + self._attn_seqpar(block, h1, axes)
                h = self._ln(block["ln2"], x)
                if i in self.moe_layers:
                    out, l_aux = moe_fns[i](
                        block["moe"], h.reshape(-1, h.shape[-1]),
                        jax.random.fold_in(key, i))
                    x = x + out.reshape(x.shape).astype(cfg.dtype)
                    l_aux_sum = l_aux_sum + l_aux.astype(jnp.float32)
                else:
                    f = block["ffn"]
                    hdn = jnp.einsum("btd,dh->bth", h, f["w1"],
                                     preferred_element_type=jnp.float32)
                    hdn = jax.nn.gelu(hdn + f["b1"]).astype(cfg.dtype)
                    o = jnp.einsum("bth,hd->btd", hdn, f["w2"],
                                   preferred_element_type=jnp.float32)
                    x = x + (o + f["b2"]).astype(cfg.dtype)
            x = self._ln(params["final_ln"], x)
            # same logits-dtype rule as `apply` (round 5): bf16 models
            # store bf16 logits so the backward vocab matmul's
            # cotangent runs at the bf16 MXU rate
            pe = jnp.float32 if x.dtype == jnp.float32 else None
            logits = jnp.einsum("btd,vd->btv", x,
                                params["embed"].astype(x.dtype),
                                preferred_element_type=pe)
            # the MoE body's l_aux is already pmeaned over the expert
            # axes; the pmean here is an idempotent replication proof
            return logits, jax.lax.pmean(l_aux_sum, axes)

        _, _, pspec, lspec = self.seqpar_specs(params)
        fn = jax.shard_map(fwd, mesh=mesh,
                           in_specs=(pspec, P(None, axes), P()),
                           out_specs=(lspec, P()), check_vma=False)
        return fn(params, tokens, key)

    def loss_seqpar(self, params, tokens, key=None, training=True,
                    l_aux_wt=0.01, moe_overrides=None,
                    attn_mode: str = "ulysses"):
        """Sequence-parallel next-token loss (the SP form of `loss`).

        Like `loss`, the FULL sequence runs the forward (every matmul
        keeps its natural T tiling — the T-1 sliced form measured
        ~2% slower at the training bench's T=512 because 511 is not a
        lane multiple) and the logits are shifted afterwards, so the
        SEQUENCE LENGTH MUST SATISFY T % P == 0 (or (T-1) % P == 0
        for datasets sized max_len+1, which keep the sliced form —
        the positional table bounds the forward)."""
        if tokens.shape[1] > self.cfg.max_len:
            logits, l_aux = self.apply_seqpar(
                params, tokens[:, :-1], key=key, training=training,
                moe_overrides=moe_overrides, attn_mode=attn_mode)
            nll = self._nll(logits, tokens[:, 1:])
        else:
            logits, l_aux = self.apply_seqpar(
                params, tokens, key=key, training=training,
                moe_overrides=moe_overrides, attn_mode=attn_mode)
            nll = self._nll_shifted(logits, tokens)
        return nll + l_aux_wt * l_aux, (nll, l_aux)

    # ------------------------------------------------------------------
    # Incremental decode (KV cache) — the serving path
    # ------------------------------------------------------------------

    def init_cache(self, batch: int):
        """Per-block KV cache for incremental decode, stored FLAT
        [B, max_len, kvh*hd] — the exact layout the flash-decode
        kernel consumes. A tiled [.., kvh, hd] -> [.., kvh*hd]
        reshape is NOT a bitcast on TPU: storing the cache 4D cost a
        physical whole-cache copy per decode step (4.1 ms on the ~2 GB
        int8 cache at the 2k-window serving config;
        benchmarks/profile_lm_decode.py found it), so every dtype
        stores kernel-shaped and the XLA fallback un-flattens only its
        read window.

        kv_bits=8 stores int8 values + per-(head, position) f32 scales
        ("k_s"/"v_s" [B, nh, max_len]) — the KV read is the measured
        dominant HBM cost of LM decode (docs/RESULTS.md), so halving
        its bytes is the serving-side lever the quantized experts
        already pulled for weights."""
        cfg = self.cfg
        kvh, hd = self._kvh, cfg.model_dim // cfg.num_heads
        if cfg.kv_bits == 8:
            z = lambda: jnp.zeros((batch, cfg.max_len, kvh * hd),
                                  jnp.int8)
            s = lambda: jnp.ones((batch, kvh, cfg.max_len), jnp.float32)
            return [{"k": z(), "v": z(), "k_s": s(), "v_s": s()}
                    for _ in range(cfg.num_layers)]
        if cfg.kv_bits == 4:
            # nibble-packed flat slab [B, T, kvh*hd//2]: byte column c
            # holds value column c (low nibble) and c + D/2 (high) of
            # the flattened [kvh*hd] row — the full-width split-half
            # layout ops/decode_attn_pallas._unpack4_slab expects
            assert (kvh * hd) % 2 == 0
            z = lambda: jnp.zeros((batch, cfg.max_len, kvh * hd // 2),
                                  jnp.int8)
            s = lambda: jnp.ones((batch, kvh, cfg.max_len), jnp.float32)
            return [{"k": z(), "v": z(), "k_s": s(), "v_s": s()}
                    for _ in range(cfg.num_layers)]
        assert cfg.kv_bits == 0, f"kv_bits={cfg.kv_bits} (0, 8 or 4)"
        z = lambda: jnp.zeros((batch, cfg.max_len, kvh * hd), cfg.dtype)
        return [{"k": z(), "v": z()} for _ in range(cfg.num_layers)]

    @staticmethod
    def _kv_quantize(x):
        """Per-(row, head) symmetric INT8: x [B, nh, hd] ->
        (int8 values, f32 scales [B, nh])."""
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
        q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127)
        return q.astype(jnp.int8), s

    @staticmethod
    def _kv_quantize4(x):
        """Per-(row, head) symmetric INT4, nibble-packed: x [B, kvh, hd]
        -> (int8 packed [B, kvh*hd//2], f32 scales [B, kvh]) in the
        full-width split-half layout (byte c = flat value c | flat
        value c + D/2 << 4)."""
        b = x.shape[0]
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 7.0, 1e-10)
        q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(
            jnp.int32).reshape(b, -1)                      # [B, D]
        dp = q.shape[-1] // 2
        packed = (q[:, :dp] & 0xF) | ((q[:, dp:] & 0xF) << 4)
        return packed.astype(jnp.int8), s

    @staticmethod
    def _kv_dequant4(packed, scales, kvh, hd, read_len):
        """Inverse of `_kv_quantize4` over a cache window: packed
        [B, T, D/2] int8 + scales [B, kvh, T] -> [B, read_len, kvh, hd]
        f32 (the XLA fallback / test-oracle read path)."""
        p = packed[:, :read_len].astype(jnp.int32)
        low = (p << 28) >> 28
        high = p >> 4
        flat = jnp.concatenate([low, high], axis=-1).astype(jnp.float32)
        vals = flat.reshape(*flat.shape[:2], kvh, hd)
        sc = scales[:, :, :read_len].transpose(0, 2, 1)[..., None]
        return vals * sc

    def _attn_step(self, block, x, layer_cache, pos, attn_len=None,
                   defer_write=False):
        """One-token attention: x [B, d], layer_cache {"k","v"[,scales]}
        (flat [B, T, kvh*hd] slabs — see init_cache), pos [B]. Returns
        (out, new layer_cache, pending) where pending is None unless
        defer_write=True on the kernel path: then the cache is NOT
        written here — the fresh K/V row (stored form + scales) comes
        back as a dict and the attention kernel consumes it directly
        (fresh-token injection), so the caller can batch EVERY layer's
        cache write into one end-of-step RMW kernel.

        attn_len (static) bounds the cache READ to the first attn_len
        positions — EXACT whenever every row's pos < attn_len, because
        positions past pos are masked to -1e30 before the softmax and
        contribute exactly zero probability either way. The full decode
        step otherwise reads the whole [B, max_len] cache every token
        (2.1 GB/step at B=256, T=256, 4 layers — the measured dominant
        HBM cost of LM decode), so a serving engine that knows the max
        live position can cut attention reads to O(actual length); see
        LmDecodeEngine's attn_bucket. kv_bits=8 halves those bytes
        again: K/V store int8 with per-(head, position) scales."""
        cfg = self.cfg
        b, d = x.shape
        nh, hd = cfg.num_heads, d // cfg.num_heads
        kvh = self._kvh
        mq = nh // kvh
        kv_q = cfg.kv_bits in (8, 4)
        qkv = jnp.einsum("bd,de->be", x, block["wqkv"],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q, k, v = self._split_qkv(qkv, (b,))
        import os as _os
        rows = jnp.arange(b)
        cache = dict(layer_cache)
        kern = self._attn_kernel_mode(d)
        # the WRITE kernel's eligibility is independent of the
        # flash-decode kernel's VMEM ladder: a model_dim too big for
        # the attention slabs must still use the fused RMW write (the
        # XLA lane-dim scale scatter it replaces is the documented
        # catastrophic lowering), so snapshot the mode before the
        # attention guard below can downgrade `kern`
        kern_write = kern
        _skip = _os.environ.get("TUTEL_TPU_SKIP_KV_WRITE", "")
        skip_vals = _skip in ("1", "vals")       # PROFILING ONLY:
        skip_scales = _skip in ("1", "scales")
        # attribute the cache-write cost of a decode step by measuring
        # with the writes elided (numerics are garbage — never use
        # outside a perf experiment; see benchmarks/bench_cache_write.py)

        def write_kv(kq, vq, scales=None):
            # QUANTIZED caches write through ONE fused Pallas RMW
            # kernel per layer: the lane-dim SCALE scatter
            # (`.at[rows, :, pos]` — position on the lane dim) is what
            # XLA lowers catastrophically (18.8 of the 53.9 ms kv8
            # decode chunk at the 2k serving config; the row-granular
            # value scatters are ~1 ms and the float path keeps them —
            # the kernel measured slightly WORSE than XLA there).
            # See ops/kv_write_pallas.py and docs/RESULTS.md round-4b.
            if kern_write and scales is not None and not (skip_vals
                                                          or skip_scales):
                from ..ops.kv_write_pallas import (write_step,
                                                   step_vmem_bytes)
                rcs = [cache["k"], cache["v"]]
                ccs = [cache["k_s"], cache["v_s"]]
                if step_vmem_bytes(rcs, ccs) <= 10 * 2**20:
                    rc, cc = write_step(
                        rcs, [kq, vq], pos, col_caches=ccs,
                        cols=list(scales),
                        interpret=(kern_write == "interpret"))
                    cache["k"], cache["v"] = rc
                    cache["k_s"], cache["v_s"] = cc
                    return
            if not skip_vals:
                cache["k"] = cache["k"].at[rows, pos].set(kq)
                cache["v"] = cache["v"].at[rows, pos].set(vq)
            if scales is not None and not skip_scales:
                cache["k_s"] = cache["k_s"].at[rows, :, pos].set(
                    scales[0])
                cache["v_s"] = cache["v_s"].at[rows, :, pos].set(
                    scales[1])

        t = cfg.max_len if attn_len is None else min(int(attn_len),
                                                     cfg.max_len)
        wc = None
        if kern:
            # VMEM guard: shrink the streamed K/V slab under pressure
            # (e.g. bf16 model_dim=4096 needs wc<=256: the default
            # 512-row double-buffered slabs would be ~16.8 MB), and
            # fall back to the XLA windowed path when even the minimum
            # slab cannot fit — mirroring the fused-FFN ladder.
            from ..ops.decode_attn_pallas import pick_wc
            itemsize = 1 if kv_q else jnp.dtype(x.dtype).itemsize
            wc = pick_wc(cfg.max_len, kvh * hd, itemsize, nh=nh,
                         quantized=kv_q, mq=mq, kv_bits=cfg.kv_bits)
            if wc is None:
                import os
                if os.environ.get("TUTEL_TPU_DECODE_ATTN", "") == "1":
                    raise ValueError(
                        f"TUTEL_TPU_DECODE_ATTN=1 but model_dim={d} "
                        "exceeds the decode-attn kernel's VMEM budget "
                        "even at the minimum window chunk")
                kern = ""
        defer = bool(defer_write and kern)
        pending = None
        if kv_q:
            if cfg.kv_bits == 8:
                # flat [B, d] rows into the flat [B, T, d] slab
                kq, ks = self._kv_quantize(k)
                vq, vs = self._kv_quantize(v)
                kq, vq = kq.reshape(b, -1), vq.reshape(b, -1)
            else:
                kq, ks = self._kv_quantize4(k)
                vq, vs = self._kv_quantize4(v)
            if defer:
                pending = {"rows": (kq, vq), "cols": (ks, vs)}
            else:
                write_kv(kq, vq, scales=(ks, vs))
        else:
            kq, vq = k.reshape(b, -1), v.reshape(b, -1)
            ks = vs = None
            if defer:
                pending = {"rows": (kq, vq), "cols": None}
            else:
                # flat [B, d] rows into the flat [B, T, d] slab
                write_kv(kq, vq)
        ck, cv = cache["k"], cache["v"]
        if kern:
            # fused flash-decode Pallas kernel: streams each row's K/V
            # window through VMEM once (XLA's slice+matvec lowering
            # measured 1.3-2.5x slower on v5e; ops/decode_attn_pallas).
            # Deferred mode passes the fresh row to the kernel instead
            # of reading it back from the cache.
            from ..ops.decode_attn_pallas import decode_attn
            out = decode_attn(
                q, ck, cv, pos, attn_len=t, wc=wc,
                k_scale=cache["k_s"] if kv_q else None,
                v_scale=cache["v_s"] if kv_q else None,
                kv_bits=cfg.kv_bits,
                interpret=(kern == "interpret"),
                k_new=kq if defer else None,
                v_new=vq if defer else None,
                k_new_scale=ks if defer else None,
                v_new_scale=vs if defer else None)
        else:
            if cfg.kv_bits == 4:
                # unpack + dequantize the read window (test/CPU path;
                # the kernel path unpacks nibbles in VMEM and folds the
                # scales into its score/softmax tiles)
                rk = self._kv_dequant4(ck, cache["k_s"], kvh, hd, t)
                rv = self._kv_dequant4(cv, cache["v_s"], kvh, hd, t)
            else:
                # un-flatten only the read window (test/CPU path; the
                # kernel consumes the stored flat layout directly)
                rk = ck[:, :t].reshape(b, t, kvh, hd)
                rv = cv[:, :t].reshape(b, t, kvh, hd)
            if cfg.kv_bits == 8:
                # dequantize the read window (test/CPU path; the kernel
                # path folds the scales into its score/softmax tiles)
                ks = cache["k_s"][:, :, :t].transpose(0, 2, 1)
                vs = cache["v_s"][:, :, :t].transpose(0, 2, 1)
                rk = rk.astype(jnp.float32) * ks[..., None]
                rv = rv.astype(jnp.float32) * vs[..., None]
            # GQA: query head h = m*kvh + g attends KV group g
            qg = q.reshape(b, mq, kvh, hd)
            scores = jnp.einsum("bmgd,btgd->bmgt", qg, rk,
                                preferred_element_type=jnp.float32)
            scores = scores * (hd ** -0.5)
            mask = jnp.arange(t)[None, :] <= pos[:, None]
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            out = jnp.einsum("bmgt,btgd->bmgd", probs, rv,
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
        out = out.reshape(b, d)
        return jnp.einsum("bd,de->be", out, block["wo"],
                          preferred_element_type=jnp.float32).astype(
            x.dtype), cache, pending

    def _attn_kernel_mode(self, d):
        """'' = XLA path, 'native' = Pallas flash-decode kernel,
        'interpret' = kernel in interpret mode (tests off-TPU).

        Auto (env TUTEL_TPU_DECODE_ATTN unset): kernel on TPU when the
        shapes satisfy its tiling (lane-aligned model dim, 16-aligned
        cache length). '0' disables; '1' forces (interpret off-TPU)."""
        import os
        env = os.environ.get("TUTEL_TPU_DECODE_ATTN", "")
        if env == "0":
            return ""
        # the INT8/INT4-KV kernel's scale slabs put the window on the
        # lane dim, so the cache length must be 128-aligned there; the
        # INT4 packed slab additionally halves the stored lane width,
        # which must itself stay 128-aligned
        t_align = 128 if self.cfg.kv_bits in (8, 4) else 16
        aligned = d % 128 == 0 and self.cfg.max_len % t_align == 0
        if self.cfg.kv_bits == 4:
            hd = d // self.cfg.num_heads
            aligned = aligned and (self._kvh * hd // 2) % 128 == 0
        if not aligned:
            if env == "1":
                raise ValueError(
                    f"TUTEL_TPU_DECODE_ATTN=1 but model_dim={d} / "
                    f"max_len={self.cfg.max_len} don't satisfy the "
                    "kernel tiling (d % 128, max_len % 16; kv_bits=4 "
                    "also needs a 128-aligned packed slab width)")
            return ""
        if jax.default_backend() == "tpu":
            return "native"
        return "interpret" if env == "1" else ""

    def _flush_kv_writes(self, cache_list, pendings, pos):
        """Apply every layer's deferred KV-cache write in as few RMW
        kernels as possible (see ops/kv_write_pallas.write_step).

        The flash-decode kernel consumed the fresh rows directly
        (fresh-token injection), so nothing in THIS step reads the
        caches after here — only the next decode step does. Batching
        all 2L row caches + 2L scale columns into one grid-() kernel
        pays ~2 DMA-phase latencies per STEP instead of per LAYER
        (the per-layer form measured ~2.3 ms/chunk over the no-writes
        floor at the 2k kv8 serving config for ~0.2 MB of writes —
        mostly phase latency). Float caches keep XLA row scatters
        (measured at parity with the kernel, and their [B, 8, D] bf16
        windows would double the batched kernel's VMEM scratch).
        Groups split greedily under the kernel's VMEM budget."""
        import os as _os
        _skip = _os.environ.get("TUTEL_TPU_SKIP_KV_WRITE", "")
        skip_vals = _skip in ("1", "vals")
        skip_scales = _skip in ("1", "scales")
        if _skip == "1":
            return cache_list
        rows = None
        group = []           # (layer_idx, row_caches, rows, cols, colv)
        group_bytes = 0

        def flush(group):
            if not group:
                return
            from ..ops.kv_write_pallas import write_step
            interpret = (self._attn_kernel_mode(self.cfg.model_dim)
                         == "interpret")
            rcs, rvs, ccs, cvs, owners = [], [], [], [], []
            for li, rc, rv, cc, cv in group:
                owners.append((li, len(rcs), len(ccs), len(rc), len(cc)))
                rcs += rc
                rvs += rv
                ccs += cc
                cvs += cv
            out_r, out_c = write_step(rcs, rvs, pos, col_caches=ccs,
                                      cols=cvs, interpret=interpret)
            for li, r0, c0, nr, nc in owners:
                lc = dict(cache_list[li])
                if nr:
                    lc["k"], lc["v"] = out_r[r0], out_r[r0 + 1]
                if nc:
                    lc["k_s"], lc["v_s"] = out_c[c0], out_c[c0 + 1]
                cache_list[li] = lc

        def scatter(lc, pend):
            # shared XLA fallback (float caches, and quantized layers
            # whose window scratch alone exceeds the kernel budget)
            lc = dict(lc)
            if not skip_vals:
                kq, vq = pend["rows"]
                lc["k"] = lc["k"].at[rows, pos].set(kq)
                lc["v"] = lc["v"].at[rows, pos].set(vq)
            if pend["cols"] is not None and not skip_scales:
                ks, vs = pend["cols"]
                lc["k_s"] = lc["k_s"].at[rows, :, pos].set(ks)
                lc["v_s"] = lc["v_s"].at[rows, :, pos].set(vs)
            return lc

        from ..ops.kv_write_pallas import step_vmem_bytes
        budget = 10 * 2 ** 20
        for li, pend in enumerate(pendings):
            if pend is None:
                continue
            lc = cache_list[li]
            if rows is None:
                b = pend["rows"][0].shape[0]
                rows = jnp.arange(b)
            if pend["cols"] is None:
                # float cache: deferred XLA row scatters (the RMW
                # kernel measured at parity there and its bf16 windows
                # would double the batched scratch)
                cache_list[li] = scatter(lc, pend)
                continue
            rc = [] if skip_vals else [lc["k"], lc["v"]]
            rv = [] if skip_vals else list(pend["rows"])
            cc = [] if skip_scales else [lc["k_s"], lc["v_s"]]
            cv = [] if skip_scales else list(pend["cols"])
            nb = step_vmem_bytes(rc, cc)
            if nb > budget:
                cache_list[li] = scatter(lc, pend)
                continue
            if group_bytes + nb > budget:
                flush(group)
                group, group_bytes = [], 0
            group.append((li, rc, rv, cc, cv))
            group_bytes += nb
        flush(group)
        return cache_list

    def _prefill_kernel_mode(self):
        """'' = XLA einsum chain, 'native'/'interpret' = the prefill
        flash kernel (ops/decode_attn_pallas.prefill_attn). Auto: on
        TPU when the shapes satisfy its tiling (head_dim % 128; the
        quantized scale slabs additionally need a 128-aligned cache
        length, and kv4 an even KV-head count). TUTEL_TPU_PREFILL_ATTN
        = '0' disables, '1' forces (interpret off-TPU)."""
        import os
        cfg = self.cfg
        env = os.environ.get("TUTEL_TPU_PREFILL_ATTN", "")
        if env == "0":
            return ""
        hd = cfg.model_dim // cfg.num_heads
        ok = hd % 128 == 0 and cfg.max_len % 16 == 0
        if cfg.kv_bits in (8, 4):
            ok = ok and cfg.max_len % 128 == 0
        if cfg.kv_bits == 4:
            ok = ok and self._kvh % 2 == 0
        if not ok:
            if env == "1":
                raise ValueError(
                    "TUTEL_TPU_PREFILL_ATTN=1 but the model shapes "
                    "don't satisfy the prefill kernel tiling "
                    "(head_dim % 128; 128-aligned max_len for "
                    "quantized caches; even KV heads for kv4)")
            return ""
        if jax.default_backend() == "tpu":
            return "native"
        return "interpret" if env == "1" else ""

    def _decode_count_fn(self, i: int, top_k):
        """Cached per-MoE-layer traced needed-capacity probe (see
        MOELayer.count_needed_traceable) for `apply_decode`'s
        capacity_probe option."""
        cache = getattr(self, "_count_fn_cache", None)
        if cache is None:
            cache = self._count_fn_cache = {}
        fn = cache.get((i, top_k))
        if fn is None:
            fn = self.moe_layers[i].count_needed_traceable(
                gate_index=0, top_k=top_k, training=False)
            cache[(i, top_k)] = fn
        return fn

    def apply_decode(self, params, tokens, cache, pos, key=None,
                     moe_overrides: Optional[dict] = None,
                     capacity_probe: bool = False,
                     attn_len: Optional[int] = None):
        """One decode step: tokens [B] int32 at positions pos [B].

        Returns (logits [B, V], new_cache, l_aux_sum). Numerically the
        same computation as `apply` at those positions (pinned by
        tests/test_transformer.py decode-==-full test).

        capacity_probe=True additionally returns a traced int32 scalar:
        the max dropless capacity any MoE layer's routing of THIS step
        actually needed (max over layers of tokens-per-expert). Costs
        one extra gate matmul per MoE layer (~30 us/step measured on
        v5e at [256, 2048]x[2048, 128]); lets a serving engine run
        decode at a small speculated `capacity_override` and replay the
        rare chunk whose routing overflowed it — see
        LmDecodeEngine(speculative_capacity=...)."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        x = params["embed"][tokens] + params["pos"][pos]
        x = x.astype(cfg.dtype)
        l_aux_sum = jnp.float32(0)
        overrides = dict(moe_overrides or {})
        needed_max = jnp.int32(0)
        new_cache = []
        pendings = []
        for i, block in enumerate(params["blocks"]):
            a, lc, pend = self._attn_step(
                block, self._ln(block["ln1"], x),
                cache[i], pos, attn_len=attn_len, defer_write=True)
            pendings.append(pend)
            new_cache.append(lc)
            x = x + a
            h = self._ln(block["ln2"], x)
            if i in self.moe_layers:
                lk = jax.random.fold_in(key, i)
                if capacity_probe:
                    fn = self._decode_count_fn(
                        i, overrides.get("top_k"))
                    w = self.moe_layers[i].world_size
                    n = h.shape[0]
                    if w > 1 and n % w:
                        # same EP padding contract as _moe_call: the
                        # probe's token_mask drops the padded rows
                        pad = (-n) % w
                        hp = jnp.concatenate(
                            [h, jnp.zeros((pad, h.shape[-1]),
                                          h.dtype)], axis=0)
                        needed = fn(block["moe"], hp, lk,
                                    token_mask=jnp.arange(n + pad) < n)
                    else:
                        needed = fn(block["moe"], h, lk)
                    needed_max = jnp.maximum(needed_max, needed)
                out, l_aux = self._moe_call(
                    i, block["moe"], h, lk, **overrides)
                x = x + out
                l_aux_sum = l_aux_sum + l_aux.astype(jnp.float32)
            else:
                f = block["ffn"]
                hdn = jnp.einsum("bd,dh->bh", h, f["w1"],
                                 preferred_element_type=jnp.float32)
                hdn = jax.nn.gelu(hdn + f["b1"]).astype(cfg.dtype)
                o = jnp.einsum("bh,hd->bd", hdn, f["w2"],
                               preferred_element_type=jnp.float32)
                x = x + (o + f["b2"]).astype(cfg.dtype)
        new_cache = self._flush_kv_writes(new_cache, pendings, pos)
        x = self._ln(params["final_ln"], x)
        # same logits-dtype rule as `apply` (round 5): keeps the
        # engine's decode argmax consistent with the full-forward
        # oracle on TPU, and the [B, V] reduction reads half the bytes
        pe = jnp.float32 if x.dtype == jnp.float32 else None
        logits = jnp.einsum("bd,vd->bv", x,
                            params["embed"].astype(x.dtype),
                            preferred_element_type=pe)
        if capacity_probe:
            return logits, new_cache, l_aux_sum, needed_max
        return logits, new_cache, l_aux_sum

    def prefill(self, params, prompts, cache, key=None,
                moe_overrides: Optional[dict] = None,
                parallel: bool = True, prompt_lens=None):
        """Write prompts [B, Tp] into the cache; returns
        (logits_last [B, V], cache) where logits_last predicts the
        token after each prompt's last position.

        prompt_lens [B] int32 (parallel path only): per-row TRUE
        prompt lengths when Tp is a padded length bucket — logits_last
        is taken at each row's prompt_lens[b]-1 instead of Tp-1. Rows
        are exact for their true prefix: the padded tail's K/V cells
        are written (garbage) but a row's positions past its own
        length are masked out of every later read until the decode
        chain rewrites them, and the MoE chunks run at the lossless
        per-chunk capacity, so pad tokens cannot displace real ones
        (an explicit capacity_factor override re-introduces
        competition — don't combine it with length bucketing).
        This is what makes prompt-length-bucketed admission exact
        (LmDecodeEngine prefill_bucket); the no-recompile analogue of
        the reference's alignment rounding (reference
        tutel/impls/fast_dispatch.py:197-199).

        parallel=True (round 4, the default): ONE causal forward over
        the whole prompt — attention is a single [Tp, Tp] masked pass
        per layer and each MoE layer routes all B*Tp prompt tokens in
        one dispatch, so admission cost is O(1) forward instead of the
        scan's Tp sequential decode steps (at Tp=1664 the scan runs
        1664 serial attention/MoE steps; the parallel pass is ~2
        orders faster). K/V are written into the cache exactly as the
        decode chain would store them (kv_bits=8: quantize-then-store,
        and the prefill ATTENDS THROUGH the dequantized stored values,
        so its logits match the chained-decode numerics, not a
        higher-precision variant). parallel=False keeps the
        scan-of-apply_decode form (the oracle the equality test pins
        the parallel path against).

        Note on keys: the two forms fold the PRNG key differently per
        position; they are identical whenever routing is deterministic
        (gate_noise=0 / training=False — always true in serving)."""
        b, tp = prompts.shape
        if key is None:
            key = jax.random.PRNGKey(0)
        if parallel:
            return self._prefill_parallel(params, prompts, cache, key,
                                          moe_overrides,
                                          prompt_lens=prompt_lens)
        if prompt_lens is not None:
            raise NotImplementedError(
                "prompt_lens requires the parallel prefill path (the "
                "scan oracle returns only the final step's logits)")

        def step(carry, t):
            cache, _ = carry
            logits, cache, _aux = self.apply_decode(
                params, prompts[:, t], cache,
                jnp.full((b,), t, jnp.int32),
                key=jax.random.fold_in(key, t),
                moe_overrides=moe_overrides, attn_len=tp)
            return (cache, logits), None

        ldt = (jnp.float32 if self.cfg.dtype == jnp.float32
               else self.cfg.dtype)     # apply_decode's logits dtype
        (cache, logits), _ = jax.lax.scan(
            step, (cache, jnp.zeros((b, self.cfg.vocab_size), ldt)),
            jnp.arange(tp))
        return logits, cache

    def _prefill_parallel(self, params, prompts, cache, key,
                          moe_overrides, tc: int = 128,
                          prompt_lens=None):
        """Chunked-parallel prefill: a lax.scan over position chunks of
        `tc`. Each chunk runs ONE causal attention pass (its queries
        against the cache window written so far + itself) and ONE MoE
        dispatch over b*tc tokens, with a content-independent lossless
        capacity (b*tc — a chunk's tokens cannot exceed that on any
        expert), so the caller's decode-scale capacity_override never
        mis-sizes the prompt routing. tc bounds both the MoE buffer
        (E x b*tc x M) and the transient attention scores."""
        cfg = self.cfg
        b, tp = prompts.shape
        nh, hd = cfg.num_heads, cfg.model_dim // cfg.num_heads
        kvh = self._kvh
        mq = nh // kvh
        kv_q = cfg.kv_bits == 8
        kv_q4 = cfg.kv_bits == 4
        tc = max(1, min(tc, tp))
        # the padded prompt must stay inside the cache; shrink the
        # chunk until it does (tc=1 degenerates to tp_pad == tp)
        while -(-tp // tc) * tc > cfg.max_len:
            tc = max(1, tc // 2)
        tp_pad = -(-tp // tc) * tc
        n_chunks = tp_pad // tc
        prompts_p = jnp.pad(prompts, ((0, 0), (0, tp_pad - tp)))
        x_all = (params["embed"][prompts_p]
                 + params["pos"][None, :tp_pad]).astype(cfg.dtype)
        ov = dict(moe_overrides or {})
        # decode-scale capacity overrides don't apply to a b*tc-token
        # chunk; an explicit capacity_factor still rules if given
        ov.pop("capacity_override", None)
        if "capacity_factor" not in ov:
            ov["capacity_override"] = b * tc
        dus = jax.lax.dynamic_update_slice_in_dim
        pk = self._prefill_kernel_mode()

        def chunk_step(cache, ci, *, read_len):
            start = ci * tc
            x = jax.lax.dynamic_slice_in_dim(x_all, start, tc, axis=1)
            # rows r of this chunk sit at positions start + r
            r_pos = start + jnp.arange(tc)[:, None]          # [tc, 1]
            t_iota = jnp.arange(read_len)[None, :]           # [1, W]
            mask = t_iota <= r_pos                           # [tc, W]
            new_cache = []
            for i, block in enumerate(params["blocks"]):
                h1 = self._ln(block["ln1"], x)
                qkv = jnp.einsum("btd,de->bte", h1, block["wqkv"],
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
                q, k, v = self._split_qkv(qkv, (b, tc))
                lc = dict(cache[i])
                if kv_q4:
                    kq, ks = self._kv_quantize4(
                        k.reshape(b * tc, kvh, hd))
                    vq, vs = self._kv_quantize4(
                        v.reshape(b * tc, kvh, hd))
                    lc["k"] = dus(lc["k"],
                                  kq.reshape(b, tc, -1), start, 1)
                    lc["v"] = dus(lc["v"],
                                  vq.reshape(b, tc, -1), start, 1)
                    lc["k_s"] = dus(
                        lc["k_s"],
                        ks.reshape(b, tc, kvh).transpose(0, 2, 1),
                        start, 2)
                    lc["v_s"] = dus(
                        lc["v_s"],
                        vs.reshape(b, tc, kvh).transpose(0, 2, 1),
                        start, 2)
                    # attend THROUGH the dequantized stored values, so
                    # prefill logits match the chained-decode numerics
                    # (the kernel path dequantizes in VMEM instead)
                    if not pk:
                        rk = self._kv_dequant4(
                            lc["k"], lc["k_s"], kvh, hd,
                            read_len).astype(x.dtype)
                        rv = self._kv_dequant4(
                            lc["v"], lc["v_s"], kvh, hd,
                            read_len).astype(x.dtype)
                elif kv_q:
                    kq, ks = self._kv_quantize(
                        k.reshape(b * tc, kvh, hd))
                    vq, vs = self._kv_quantize(
                        v.reshape(b * tc, kvh, hd))
                    lc["k"] = dus(lc["k"],
                                  kq.reshape(b, tc, kvh * hd), start, 1)
                    lc["v"] = dus(lc["v"],
                                  vq.reshape(b, tc, kvh * hd), start, 1)
                    lc["k_s"] = dus(
                        lc["k_s"],
                        ks.reshape(b, tc, kvh).transpose(0, 2, 1),
                        start, 2)
                    lc["v_s"] = dus(
                        lc["v_s"],
                        vs.reshape(b, tc, kvh).transpose(0, 2, 1),
                        start, 2)
                    # attend THROUGH the dequantized stored values, so
                    # prefill logits match the chained-decode numerics
                    # (the kernel path dequantizes in VMEM instead)
                    if not pk:
                        rk = (lc["k"][:, :read_len].reshape(
                            b, read_len, kvh, hd).astype(jnp.float32)
                              * lc["k_s"][:, :, :read_len].transpose(
                                  0, 2, 1)[..., None]).astype(x.dtype)
                        rv = (lc["v"][:, :read_len].reshape(
                            b, read_len, kvh, hd).astype(jnp.float32)
                              * lc["v_s"][:, :, :read_len].transpose(
                                  0, 2, 1)[..., None]).astype(x.dtype)
                else:
                    lc["k"] = dus(lc["k"], k.reshape(b, tc, kvh * hd),
                                  start, 1)
                    lc["v"] = dus(lc["v"], v.reshape(b, tc, kvh * hd),
                                  start, 1)
                    if not pk:
                        rk = lc["k"][:, :read_len].reshape(
                            b, read_len, kvh, hd)
                        rv = lc["v"][:, :read_len].reshape(
                            b, read_len, kvh, hd)
                new_cache.append(lc)
                if pk:
                    # streamed flash prefill: no [b, tc, W] score
                    # materialization, quantized dequant in VMEM
                    from ..ops.decode_attn_pallas import prefill_attn
                    a = prefill_attn(
                        q, lc["k"], lc["v"], start,
                        k_scale=lc.get("k_s"), v_scale=lc.get("v_s"),
                        attn_len=read_len, kv_bits=cfg.kv_bits,
                        interpret=(pk == "interpret"))
                    a = a.reshape(b, tc, cfg.model_dim)
                else:
                    qg = q.reshape(b, tc, mq, kvh, hd)
                    scores = jnp.einsum(
                        "bqmgd,bkgd->bmgqk", qg, rk,
                        preferred_element_type=jnp.float32)
                    scores = scores * (hd ** -0.5)
                    scores = jnp.where(mask[None, None, None], scores,
                                       -1e30)
                    probs = jax.nn.softmax(scores,
                                           axis=-1).astype(x.dtype)
                    a = jnp.einsum("bmgqk,bkgd->bqmgd", probs, rv,
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype)
                    a = a.reshape(b, tc, cfg.model_dim)
                a = jnp.einsum("btd,de->bte", a, block["wo"],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
                x = x + a
                h = self._ln(block["ln2"], x)
                if i in self.moe_layers:
                    out, _l_aux = self._moe_call(
                        i, block["moe"], h,
                        jax.random.fold_in(key, i), **ov)
                    x = x + out
                else:
                    f = block["ffn"]
                    hdn = jnp.einsum("btd,dh->bth", h, f["w1"],
                                     preferred_element_type=jnp.float32)
                    hdn = jax.nn.gelu(hdn + f["b1"]).astype(cfg.dtype)
                    o = jnp.einsum("bth,hd->btd", hdn, f["w2"],
                                   preferred_element_type=jnp.float32)
                    x = x + (o + f["b2"]).astype(cfg.dtype)
            return new_cache, x

        # SEGMENTED window growth (round 5): a single scan must read a
        # static tp_pad-wide cache window in EVERY chunk, making the
        # attention (and kv8/kv4 dequant) traffic O(Tp^2). Splitting
        # the chunk range into a few scans whose static windows grow
        # with the written prefix halves that integral (measured
        # 752 -> 502 ms at the 64x1664 kv8+GQA admission at tc=64;
        # 467 ms at the tc=128 default — 1.61x, 228k tokens/s) at the cost
        # of NSEG scan bodies in the trace. Windows align to 128 (the
        # quantized-cache slab quantum); correctness is unchanged —
        # every chunk's window covers all positions it may attend.
        import functools as _ft
        nseg = min(4, n_chunks)
        hs_parts = []
        ci0 = 0
        for si in range(nseg):
            ce = n_chunks * (si + 1) // nseg
            if ce <= ci0:
                continue
            w = min(tp_pad, -(-(ce * tc) // 128) * 128)
            step = _ft.partial(chunk_step, read_len=w)
            cache, hseg = jax.lax.scan(step, cache,
                                       jnp.arange(ci0, ce))
            hs_parts.append(hseg)
            ci0 = ce
        hs = (jnp.concatenate(hs_parts, axis=0)
              if len(hs_parts) > 1 else hs_parts[0])
        # hs: [n_chunks, b, tc, d]; the prompt's last position tp-1
        # lives at chunk (tp-1)//tc, offset (tp-1)%tc (both static) —
        # or per-row at prompt_lens[b]-1 under length bucketing
        if prompt_lens is None:
            hl = hs[(tp - 1) // tc][:, (tp - 1) % tc]
        else:
            h_all = hs.transpose(1, 0, 2, 3).reshape(b, tp_pad, -1)
            idx = jnp.clip(prompt_lens.astype(jnp.int32) - 1, 0,
                           tp_pad - 1)
            hl = jnp.take_along_axis(
                h_all, idx[:, None, None], axis=1)[:, 0]
        xl = self._ln(params["final_ln"], hl)
        pe = jnp.float32 if xl.dtype == jnp.float32 else None
        logits = jnp.einsum("bd,vd->bv", xl,
                            params["embed"].astype(xl.dtype),
                            preferred_element_type=pe)
        return logits, cache

    def loss(self, params, tokens, key=None, training=True,
             l_aux_wt=0.01, moe_overrides=None):
        """Next-token cross-entropy + weighted aux loss
        (the fairseq patch's L_AUX_WT, fairseq_patch.diff:119-128).

        The forward runs the FULL sequence and the logits are shifted
        afterwards (round 5): slicing tokens[:, :-1] first made every
        step matmul T-1 = 511 rows/lanes at the training bench and
        measured ~4 ms/step slower than the aligned full-T form (the
        trailing position's logits are dropped; its tokens do
        participate in MoE routing, as in standard shifted-LM
        training). When T exceeds max_len (datasets sized max_len+1
        for the shift), the sliced form is kept — the positional
        table bounds the forward."""
        if tokens.shape[1] > self.cfg.max_len:
            logits, l_aux = self.apply(params, tokens[:, :-1], key=key,
                                       training=training,
                                       moe_overrides=moe_overrides)
            nll = self._nll(logits, tokens[:, 1:])
        else:
            logits, l_aux = self.apply(params, tokens, key=key,
                                       training=training,
                                       moe_overrides=moe_overrides)
            nll = self._nll_shifted(logits, tokens)
        return nll + l_aux_wt * l_aux, (nll, l_aux)

    @staticmethod
    def _nll_shifted(logits, tokens):
        """Shifted next-token nll over FULL-sequence logits, reducing
        BEFORE slicing: logits[:, :-1] on the [B, T, V] tensor would
        be a 2 GB copy at the training bench config, while the [B, T]
        per-position losses slice for free (measured 202.7 ->
        200.3 ms/step)."""
        tpad = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)           # [B, T]
        tgt = jnp.take_along_axis(
            logits, tpad[..., None], axis=-1)[..., 0]
        return jnp.mean((lse - tgt.astype(jnp.float32))[:, :-1])

    @staticmethod
    def _nll(logits, targets):
        """Fused next-token cross-entropy: mean(logsumexp - target
        logit). Equal to -mean(take(log_softmax)) but never
        materializes the [B, T, V] log-probability tensor — at the
        training bench config that tensor is 2.1 GB f32 and its
        subtract alone measured 6.3 ms/step (round-5 MFU
        decomposition, benchmarks/profile_lm_train.py)."""
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)           # [B, T]
        tgt = jnp.take_along_axis(
            logits, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(lse - tgt.astype(jnp.float32))
