"""Mixed-precision MoE training (reference: tutel/examples/helloworld_amp.py).

The reference wraps the forward in torch.cuda.amp autocast (fp16 compute,
fp32 master weights + loss scaling). The TPU-native story is bf16 mixed
precision: master parameters stay float32, the layer computes in bf16
(`dtype=jnp.bfloat16` casts activations; expert weights are cast at the
point of use, experts/ffn.py apply), and gradients flow back to the fp32
masters — bf16's fp32-matched exponent range makes GradScaler
unnecessary, so there is no scaler state to manage.

Run: python -m tutel_tpu.examples.helloworld_amp --device cpu
"""

import argparse


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_tokens", type=int, default=128)
    parser.add_argument("--model_dim", type=int, default=64)
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--num_local_experts", type=int, default=2)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--num_steps", type=int, default=10)
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
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        dtype=jnp.bfloat16,              # compute dtype (the autocast)
        group=env)

    # master params in float32: init defaults to the compute dtype, so
    # re-init the pytree at fp32 — the layer casts at the point of use.
    layer_fp32 = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1), dtype=jnp.float32,
        group=env)
    params = layer.shard_params(layer_fp32.init(jax.random.PRNGKey(1)))
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))

    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size * args.num_tokens, args.model_dim),
        dtype=jnp.bfloat16)

    @jax.jit
    def train_step(params, x, key):
        def loss_fn(p):
            out, l_aux = layer(p, x, key=key, training=True)
            return jnp.mean(out.astype(jnp.float32) ** 2) + l_aux
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # fp32 master update from the mixed-precision backward
        new_params = jax.tree.map(
            lambda p, g: p - 1e-2 * g.astype(jnp.float32), params, grads)
        return new_params, loss

    losses = []
    for i in range(args.num_steps):
        params, loss = train_step(params, x, jax.random.PRNGKey(i))
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.6f} (params fp32, "
            f"compute bf16)")
    return losses


if __name__ == "__main__":
    run(build_args())
