"""Data-parallel training with MoE expert sharding (reference:
tutel/examples/helloworld_ddp.py).

The reference coordinates DDP all-reduce with `skip_allreduce` masks and
`_ddp_params_and_buffers_to_ignore` so expert params stay local while
dense params all-reduce (reference helloworld_ddp.py:84-90,
README.md:160-171). Under JAX SPMD the same outcome is declarative: expert
params carry expert-sharded PartitionSpecs, dense (gate) params are
replicated, and jit inserts the gradient psum for replicated params
automatically — there is nothing to mask by hand.

This example trains the helloworld model with tokens sharded over all
devices (pure DP on the data axis, EP across experts) and checks the gate
gradient really is globally reduced.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tutel_tpu.examples.helloworld_ddp --device cpu
"""

import argparse
import time


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe, system

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    env = system.init_data_model_parallel()
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device":
                 args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1), dtype=dtype, group=env)
    params = layer.shard_params(layer.init(jax.random.PRNGKey(1)))

    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size, args.num_tokens, args.model_dim)).astype(dtype)
    y_label = jnp.zeros((args.batch_size,), dtype=jnp.int32)

    def loss_fn(params, x, key):
        out, l_aux = layer(params, x, key=key, training=True)
        logits = jax.nn.log_softmax(
            jnp.sum(out.astype(jnp.float32), axis=2), axis=1)
        nll = -jnp.mean(logits[jnp.arange(logits.shape[0]), y_label])
        return nll + 0.01 * l_aux

    @jax.jit
    def train_step(params, x, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, key)
        new_params = jax.tree.map(
            lambda p, g: p - args.lr * g.astype(p.dtype), params, grads)
        return new_params, loss, grads

    key = jax.random.PRNGKey(2)
    for i in range(args.num_steps):
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        params, loss, grads = train_step(params, x, sk)
        jax.block_until_ready(loss)
        log(f"STEP-{i}: loss = {float(loss):.5f}, "
            f"step_time = {time.perf_counter()-t0:.4f} s")

    # gate grads are replicated (i.e. already all-reduced across the data
    # axis) — the DDP guarantee the reference engineers by hand.
    gate_grad = grads["gates"][0]["wg"]
    log(f"[Check] gate grad sharding spans "
        f"{len(gate_grad.sharding.device_set)} devices "
        f"(replicated = {gate_grad.sharding.is_fully_replicated}).")
    assert gate_grad.sharding.is_fully_replicated
    return float(loss)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_tokens", type=int, default=256)
    parser.add_argument("--model_dim", type=int, default=256)
    parser.add_argument("--hidden_size", type=int, default=256)
    parser.add_argument("--num_local_experts", type=int, default=1)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--num_steps", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
