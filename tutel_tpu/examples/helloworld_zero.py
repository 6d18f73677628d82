"""ZeRO-1 distributed optimizer demo (reference:
tutel/examples/helloworld_ddp_tutel.py + net.TutelDistributedOptimizer,
reference net.py:15-58).

Pure data parallelism with sharded optimizer state: tokens split across
the mesh, model replicated, and `net.ZeroOptimizer` keeps Adam state only
for each device's flat parameter shard — its reduce-scatter doubles as
the DP gradient all-reduce (the reference's choreography,
communicate.py:566-586).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tutel_tpu.examples.helloworld_zero --device cpu
"""

import argparse

import numpy as np


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from jax import lax
    import optax
    from jax.sharding import Mesh, PartitionSpec as P
    from tutel_tpu import moe, net

    devices = jax.devices()
    w = len(devices)
    # single-device layer math; DP is the outer shard_map over tokens
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=devices[:1])
    params = layer.init(jax.random.PRNGKey(1))
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size * args.num_tokens, args.model_dim))
    assert x.shape[0] % w == 0

    mesh = Mesh(np.asarray(devices), ("z",))
    opt = net.ZeroOptimizer(optax.adam(args.lr), axis="z")

    def zero_init(p):
        return opt.init(p, w)

    def train_body(params, opt_state, x_local, key):
        def loss_fn(p):
            out, l_aux = layer(p, x_local,
                               key=jax.random.fold_in(
                                   key, lax.axis_index("z")),
                               training=True)
            return jnp.mean(out.astype(jnp.float32) ** 2) + 0.01 * l_aux
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # ZeRO step: psum_scatter(grads) -> local Adam on my shard ->
        # all_gather(params). The scatter IS the DP all-reduce.
        params, opt_state = opt.step(params, grads, opt_state, w)
        return params, opt_state, lax.pmean(loss, "z")

    # optimizer-state out_specs: flat shards are z-sharded, scalar leaves
    # (Adam's step count) replicated
    shard_template = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(((p.size + w - 1) // w,), p.dtype),
        params)
    state_shape = jax.eval_shape(optax.adam(args.lr).init, shard_template)
    state_specs = jax.tree.map(
        lambda s: P("z") if len(s.shape) else P(), state_shape)

    init_state = jax.jit(jax.shard_map(
        zero_init, mesh=mesh, in_specs=P(), out_specs=state_specs,
        check_vma=False))
    train = jax.jit(jax.shard_map(
        train_body, mesh=mesh, in_specs=(P(), state_specs, P("z"), P()),
        out_specs=(P(), state_specs, P()), check_vma=False))

    opt_state = init_state(params)
    key = jax.random.PRNGKey(2)
    for i in range(args.num_steps):
        key, sk = jax.random.split(key)
        params, opt_state, loss = train(params, opt_state, x, sk)
        log(f"STEP-{i}: loss = {float(jnp.mean(loss)):.5f}")
    shard = jax.tree.leaves(opt_state)[0]
    log(f"[Check] optimizer-state leaf is 1/{w} of its parameter: "
        f"shape {shard.shape}")
    return float(jnp.mean(loss))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--num_tokens", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--num_experts", type=int, default=2)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--num_steps", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
