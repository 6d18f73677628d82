"""Custom expert with ZeRO-sharded parameters (reference:
tutel/examples/helloworld_custom_expert_sharded.py).

The capability demonstrated: a *user-defined* expert whose parameter is
stored as a flat shard across the devices sharing each expert
(sharded_count = world / num_global_experts) and regathered for use —
the reference gathers per forward with `net.zero_gather` over the
sharded subgroup (reference lines 64-90); here the expert declares
`shard_axes` and the MOELayer's regather protocol
(impls/moe_layer.py `_gather_expert_params`) delivers the full flat
parameter to `apply`, which reshapes and applies it. `parallel_type`
"data" keeps one full-weight replica per device (the reference demo's
effective layout); adaptive_r=0 (all-experts-local DP) also works.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tutel_tpu.examples.helloworld_custom_expert_sharded --device cpu
"""

import argparse
import dataclasses


@dataclasses.dataclass
class CustomShardedExpert:
    """W: logical [E_local, M, M], stored as a flat shard per device."""
    model_dim: int
    num_experts_per_device: int = 1
    sharded_count: int = 1
    my_config: str = "relu"

    def shard_axes(self):
        # param name -> (expert dim, shard dim): dim 1 of the flat view
        # is sliced across the ('r', 'g') mesh axes.
        return {"w": (0, 1)}

    def init(self, key, dtype):
        import jax
        e, m = self.num_experts_per_device, self.model_dim
        numel = m * m
        assert numel % self.sharded_count == 0
        w = jax.random.normal(key, (e, numel), dtype) * 0.001
        return {"w": w}

    def apply(self, params, x, ctx=None):
        import jax
        import jax.numpy as jnp
        e, rows, m = x.shape
        w = params["w"]                      # full flat after regather
        assert w.shape[-1] == m * m, (
            "expected the regathered full parameter; run with "
            "parallel_type='data' (r=1) or adaptive_r=0")
        w_full = w.reshape(e, m, m)
        y = jnp.einsum("ecm,emn->ecn", x, w_full.astype(x.dtype))
        if self.my_config == "relu":
            y = jax.nn.relu(y)
        return y


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_tokens", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=32)
    parser.add_argument("--num_local_experts", type=int, default=-2)
    parser.add_argument("--top", type=int, default=1)
    parser.add_argument("--num_steps", type=int, default=5)
    parser.add_argument("--device", type=str, default="")
    return parser.parse_args(argv)


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe, system

    env = system.init_data_model_parallel()
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "custom", "module": CustomShardedExpert,
                 "num_experts_per_device": args.num_local_experts,
                 "my_config": "relu"},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        parallel_type="data", group=env)
    log(f"sharded_count = {layer.sharded_count}, "
        f"num_global_experts = {layer.num_global_experts}")
    params = layer.shard_params(layer.init(jax.random.PRNGKey(1)))
    n = sum(p.size for _, p in
            layer.get_parameter_iterator(params, "local_experts"))
    log(f"[Statistics] param count for MoE local_experts = {n}.")

    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size * args.num_tokens, args.model_dim))

    losses = []
    for i in range(args.num_steps):
        def loss_fn(p):
            out, l_aux = layer(p, x, key=jax.random.PRNGKey(i),
                               training=True)
            return jnp.mean(out ** 2) + l_aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(lambda p, g: p - 1e-2 * g.astype(p.dtype),
                              params, grads)
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.6f}")
    return losses


if __name__ == "__main__":
    run(build_args())
