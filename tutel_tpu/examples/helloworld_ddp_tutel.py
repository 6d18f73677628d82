"""DDP with tutel's own gradient all-reduce (reference:
tutel/examples/helloworld_ddp_tutel.py).

Where helloworld_ddp relies on the framework's automatic gradient
reduction (declarative shardings; jit inserts the psum), this variant
reproduces the reference's *manual* data-parallel protocol: grads are
computed per shard inside a `shard_map` and reduced explicitly with
`net.simple_all_reduce`, honoring the `skip_allreduce` mask that
`scan_expert_func` stamps on expert parameters (reference
helloworld.py:124,136-140 + README.md:160-171) — expert grads stay
local (they are expert-parallel, not replicated), gate grads all-reduce.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tutel_tpu.examples.helloworld_ddp_tutel --device cpu
"""

import argparse


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_tokens", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=32)
    parser.add_argument("--hidden_size", type=int, default=64)
    parser.add_argument("--num_local_experts", type=int, default=1)
    parser.add_argument("--top", type=int, default=2)
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    from tutel_tpu import moe, net, system

    env = system.init_data_model_parallel()
    devices = env.devices
    w = len(devices)

    skip_mask = {}   # param name -> True when grads must NOT all-reduce

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        # the reference marks expert params with skip_allreduce=True
        scan_expert_func=lambda name, p: skip_mask.setdefault(name, True),
        group=devices)
    params = layer.init(jax.random.PRNGKey(1))
    log(f"skip_allreduce marks: {sorted(skip_mask)}")

    mesh = Mesh(np.array(devices), ("dp",))
    local_tokens = args.batch_size * args.num_tokens

    # per-shard single-device layer: the manual-DDP protocol runs the
    # model on each shard's local tokens, experts sharded by hand
    local_layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.0},
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=devices[:1])

    def shard_step(gate_params, expert_params, x_local, key):
        p = {"gates": [gate_params], "experts": expert_params}

        def loss_fn(p):
            out, l_aux = local_layer(p, x_local, key=key, training=True)
            return jnp.mean(out ** 2) + l_aux

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # tutel-style DDP: explicit all-reduce of non-expert grads only
        gate_grads = jax.tree.map(
            lambda g: net.simple_all_reduce(g, "dp") / w,
            grads["gates"][0])
        expert_grads = grads["experts"]       # skip_allreduce: stay local
        return gate_grads, expert_grads, net.simple_all_reduce(
            loss, "dp") / w

    step = jax.jit(jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P()),
        out_specs=(P(), P("dp"), P()), check_vma=False))

    x = jax.random.normal(
        jax.random.PRNGKey(0), (w * local_tokens, args.model_dim))
    gate_params = params["gates"][0]
    # per-device expert shards stacked on a leading dp dim
    expert_params = jax.tree.map(
        lambda p: jnp.broadcast_to(p[None], (w,) + p.shape).reshape(
            (w * p.shape[0],) + p.shape[1:]), params["experts"])

    losses = []
    for i in range(args.num_steps):
        g_g, g_e, loss = step(gate_params, expert_params, x,
                              jax.random.PRNGKey(i))
        gate_params = jax.tree.map(lambda p, g: p - 1e-2 * g,
                                   gate_params, g_g)
        expert_params = jax.tree.map(lambda p, g: p - 1e-2 * g,
                                     expert_params, g_e)
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.6f}")
    return losses


if __name__ == "__main__":
    run(build_args())
