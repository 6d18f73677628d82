"""Custom gate + custom expert modules (reference:
tutel/examples/helloworld_custom_gate_expert.py).

Demonstrates the pluggable protocols (reference moe_layer.py:161-165,
201-204 `custom` types):
  gate:   class(model_dim, num_global_experts, **opts) with
          init(key, dtype) / apply(params, x) -> logits and attrs
          top_k / gate_noise / capacity_factor
  expert: class(model_dim, num_experts_per_device, sharded_count, **opts)
          with init(key, dtype) / apply(params, x, ctx) where
          x is [E_local, rows, M].

Run: python -m tutel_tpu.examples.helloworld_custom_gate_expert [--device cpu]
"""

import argparse
import dataclasses


def build_modules():
    import jax
    import jax.numpy as jnp

    @dataclasses.dataclass
    class SkipgramGate:
        """Custom gate: logits from the elementwise product of the token
        with a learned per-expert prototype."""
        model_dim: int
        num_global_experts: int
        k: int = 2
        capacity_factor: float = 1.0
        gate_noise: float = 0.0

        def __post_init__(self):
            self.top_k = min(self.num_global_experts, self.k)

        def init(self, key, dtype=jnp.float32):
            return {"proto": jax.random.normal(
                key, (self.num_global_experts, self.model_dim),
                dtype) * self.model_dim ** -0.5}

        def apply(self, params, x):
            return jnp.einsum("sm,em->se", x.astype(jnp.float32),
                              params["proto"].astype(jnp.float32))

    @dataclasses.dataclass
    class GatedResidualExpert:
        """Custom expert: gated residual MLP (x + sigmoid(xW1) * (xW2))."""
        model_dim: int
        num_experts_per_device: int = 1
        sharded_count: int = 1
        hidden_size_per_expert: int = 256

        def __post_init__(self):
            assert self.hidden_size_per_expert % self.sharded_count == 0
            self.hidden = self.hidden_size_per_expert // self.sharded_count

        def init(self, key, dtype=jnp.float32):
            e, m, h = self.num_experts_per_device, self.model_dim, self.hidden
            k1, k2, k3 = jax.random.split(key, 3)
            s = m ** -0.5
            return {"w_gate": jax.random.normal(k1, (e, m, h), dtype) * s,
                    "w_up": jax.random.normal(k2, (e, m, h), dtype) * s,
                    "w_down": jax.random.normal(k3, (e, h, m), dtype)
                    * self.hidden ** -0.5}

        def shard_axes(self):
            return {"w_gate": (0, 2), "w_up": (0, 2), "w_down": (0, 1)}

        def apply(self, params, x, ctx=None):
            g = jnp.einsum("ecm,emh->ech", x, params["w_gate"].astype(x.dtype))
            u = jnp.einsum("ecm,emh->ech", x, params["w_up"].astype(x.dtype))
            y = jax.nn.sigmoid(g) * u
            return x + jnp.einsum("ech,ehm->ecm", y,
                                  params["w_down"].astype(x.dtype))

    return SkipgramGate, GatedResidualExpert


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe

    SkipgramGate, GatedResidualExpert = build_modules()
    layer = moe.moe_layer(
        gate_type={"type": "custom", "module": SkipgramGate, "k": args.top},
        experts={"type": "custom", "module": GatedResidualExpert,
                 "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.num_tokens, args.model_dim))

    @jax.jit
    def loss_fn(params, x):
        out, l_aux = layer(params, x)
        return jnp.mean(out ** 2) + 0.01 * l_aux

    for i in range(args.num_steps):
        loss = loss_fn(params, x)
        grads = jax.jit(jax.grad(loss_fn))(params, x)
        params = jax.tree.map(lambda p, g: p - 1e-3 * g.astype(p.dtype),
                              params, grads)
        log(f"STEP-{i}: loss = {float(loss):.5f}")
    return float(loss)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_tokens", type=int, default=256)
    parser.add_argument("--model_dim", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=256)
    parser.add_argument("--num_experts", type=int, default=4)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--num_steps", type=int, default=5)
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
