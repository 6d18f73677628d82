"""Vision Transformer with MoE FFN blocks (ViT-MoE).

The reference's vision-MoE story is SwinV2-MoE: an external model whose
checkpoints the reference converts (reference doc/CHECKPOINT.md:28-45);
its fairseq patch shows the integration pattern. Here the vision family
is first-class: patch embedding -> pre-LN encoder blocks (bidirectional
attention) with MoE FFNs every Nth block -> mean-pool -> classifier.
Checkpoints nest each MoE layer's state under `blocks.{i}.moe` and carry
the `_num_global_experts` markers, so the gather/scatter CLIs re-shard
them with `--namespace` exactly like SwinV2-MoE.
"""

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..impls.moe_layer import MOELayer


@dataclasses.dataclass(frozen=True)
class VisionMoEConfig:
    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 10
    model_dim: int = 64
    num_heads: int = 4
    num_layers: int = 4
    ffn_hidden: int = 128
    moe_every: int = 2
    num_local_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    expert_hidden: int = 128
    dtype: Any = jnp.float32

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


class VisionMoE:
    """Functional ViT-MoE: `init(key) -> params`, `apply(params, images)`
    returns (logits, l_aux_sum)."""

    def __init__(self, config: VisionMoEConfig, group=None,
                 parallel_type="adaptive:1"):
        self.cfg = config
        self.moe_layers: Dict[int, MOELayer] = {}
        for i in range(config.num_layers):
            if config.moe_every > 0 and (i + 1) % config.moe_every == 0:
                self.moe_layers[i] = MOELayer(
                    gate_type={"type": "top", "k": config.top_k,
                               "capacity_factor": config.capacity_factor},
                    experts={"type": "ffn",
                             "num_experts_per_device":
                                 config.num_local_experts,
                             "hidden_size_per_expert": config.expert_hidden},
                    model_dim=config.model_dim, dtype=config.dtype,
                    parallel_type=parallel_type, group=group)

    def init(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        d = cfg.model_dim
        p = cfg.patch_size
        keys = jax.random.split(key, cfg.num_layers + 3)
        scale = d ** -0.5
        params: Dict[str, Any] = {
            "patch_w": jax.random.normal(
                keys[0], (p * p * cfg.in_channels, d), cfg.dtype)
            * (p * p * cfg.in_channels) ** -0.5,
            "pos": jax.random.normal(keys[1], (cfg.num_patches, d),
                                     cfg.dtype) * scale,
            "head_w": jax.random.normal(keys[2], (d, cfg.num_classes),
                                        cfg.dtype) * scale,
            "final_ln": {"scale": jnp.ones((d,), cfg.dtype),
                         "bias": jnp.zeros((d,), cfg.dtype)},
            "blocks": [],
        }
        for i in range(cfg.num_layers):
            bk = jax.random.split(keys[i + 3], 4)
            block = {
                "ln1": {"scale": jnp.ones((d,), cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
                "ln2": {"scale": jnp.ones((d,), cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
                "wqkv": jax.random.normal(bk[0], (d, 3 * d), cfg.dtype)
                * scale,
                "wo": jax.random.normal(bk[1], (d, d), cfg.dtype) * scale,
            }
            if i in self.moe_layers:
                block["moe"] = self.moe_layers[i].init(bk[2])
            else:
                h = cfg.ffn_hidden
                block["ffn"] = {
                    "w1": jax.random.normal(bk[2], (d, h), cfg.dtype)
                    * scale,
                    "b1": jnp.zeros((h,), cfg.dtype),
                    "w2": jax.random.normal(bk[3], (h, d), cfg.dtype)
                    * (h ** -0.5),
                    "b2": jnp.zeros((d,), cfg.dtype),
                }
            params["blocks"].append(block)
        return params

    @staticmethod
    def _ln(p, x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * p["scale"].astype(jnp.float32)
                + p["bias"].astype(jnp.float32)).astype(x.dtype)

    def _attn(self, block, x):
        b, t, d = x.shape
        nh, hd = self.cfg.num_heads, d // self.cfg.num_heads
        qkv = jnp.einsum("btd,de->bte", x, block["wqkv"],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nh, hd)
        v = v.reshape(b, t, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.einsum("btd,de->bte", out.reshape(b, t, d), block["wo"],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def _patchify(self, params, images):
        cfg = self.cfg
        b, hgt, wid, c = images.shape
        p = cfg.patch_size
        x = images.reshape(b, hgt // p, p, wid // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, cfg.num_patches,
                                                  p * p * c)
        x = jnp.einsum("bnp,pd->bnd", x.astype(jnp.float32),
                       params["patch_w"].astype(jnp.float32))
        return (x + params["pos"][None].astype(jnp.float32)).astype(
            cfg.dtype)

    def apply(self, params, images, key=None, training=False,
              moe_overrides: Optional[dict] = None):
        """images [B, H, W, C] -> (logits [B, num_classes], l_aux_sum)."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        x = self._patchify(params, images)
        l_aux_sum = jnp.float32(0)
        overrides = dict(moe_overrides or {})
        for i, block in enumerate(params["blocks"]):
            x = x + self._attn(block, self._ln(block["ln1"], x))
            h = self._ln(block["ln2"], x)
            if i in self.moe_layers:
                out, l_aux = self.moe_layers[i](
                    block["moe"], h, key=jax.random.fold_in(key, i),
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
        x = self._ln(params["final_ln"], jnp.mean(x, axis=1))
        logits = jnp.einsum("bd,dc->bc", x.astype(jnp.float32),
                            params["head_w"].astype(jnp.float32))
        return logits, l_aux_sum

    def loss(self, params, images, labels, key=None, training=True,
             l_aux_wt=0.01, moe_overrides=None):
        logits, l_aux = self.apply(params, images, key=key,
                                   training=training,
                                   moe_overrides=moe_overrides)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.mean(logp[jnp.arange(labels.shape[0]), labels])
        return nll + l_aux_wt * l_aux, (nll, logits)

    # checkpoint integration (SwinV2-MoE-style namespaced state)

    def moe_state_dict(self, params):
        """Flat state with blocks.{i}.moe. prefixes + marker entries —
        re-shardable by the gather/scatter CLIs."""
        out = {}
        for i, layer in self.moe_layers.items():
            out.update(layer.state_dict(params["blocks"][i]["moe"],
                                        prefix=f"blocks.{i}.moe."))
        return out

    def load_moe_state_dict(self, params, state):
        out = dict(params)
        out["blocks"] = list(params["blocks"])
        for i, layer in self.moe_layers.items():
            blk = dict(out["blocks"][i])
            blk["moe"] = layer.load_state_dict(
                blk["moe"], state, prefix=f"blocks.{i}.moe.")
            out["blocks"][i] = blk
        return out
