"""Expert-choice MoE training demo (beyond-reference capability: the
reference ships only token-choice gates — tutel/gates/).

Each expert picks its own top-C tokens (C = capacity_factor * S / E),
so expert load is perfectly balanced by construction — no capacity
overflow, no dropped-token asymmetry, and no gshard balance loss; the
auxiliary is the router z-loss. Runs single-device or under pure EP
(the layer gathers router scores + activations across the expert axes
so local experts select from the global token pool).

Run: python -m tutel_tpu.examples.helloworld_expert_choice --device cpu
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
     python -m tutel_tpu.examples.helloworld_expert_choice \\
         --device cpu --num_devices 8
"""

import argparse


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--num_devices", type=int, default=1)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--num_tokens", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=64)
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--num_local_experts", type=int, default=4)
    parser.add_argument("--capacity_factor", type=float, default=2.0)
    parser.add_argument("--zloss_weight", type=float, default=1e-3)
    parser.add_argument("--num_steps", type=int, default=20)
    parser.add_argument("--lr", type=float, default=5e-2)
    return parser.parse_args(argv)


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe

    devices = jax.devices()[:args.num_devices]
    layer = moe.moe_layer(
        gate_type={"type": "expert_choice",
                   "capacity_factor": args.capacity_factor,
                   "gate_noise": 0.0},
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1), group=devices)

    params = layer.init(jax.random.PRNGKey(1))
    if len(devices) > 1:
        params = layer.shard_params(params)
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch * args.num_tokens, args.model_dim))
    target = jnp.tanh(jnp.roll(x, 1, axis=1))

    def loss_fn(params, key):
        out, z_loss = layer(params, x, key=key, training=True)
        return jnp.mean((out - target) ** 2) \
            + args.zloss_weight * z_loss

    @jax.jit
    def step(params, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, sub)
        params = jax.tree.map(
            lambda p, g: p - args.lr * g.astype(p.dtype), params, grads)
        return params, key, loss

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(args.num_steps):
        params, key, loss = step(params, key)
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.5f}")
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    log(f"\n[Summary] expert-choice loss {losses[0]:.4f} -> "
        f"{losses[-1]:.4f} over {args.num_steps} steps "
        f"({len(devices)} device(s)).")
    return losses


if __name__ == "__main__":
    run(build_args())
