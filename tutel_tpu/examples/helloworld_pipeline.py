"""Pipeline-parallel MoE training demo (beyond-reference capability:
SURVEY.md §2.3 marks pipeline parallelism ABSENT in the reference).

Four residual MoE blocks form a 4-stage GPipe pipeline over a `pp` mesh
axis; each stage owns its block's experts locally (EP-within-stage by
layout — the experts of stage s live on stage s's device). Activations
hop stages via `lax.ppermute` (ICI-neighbor traffic); the schedule is a
static `lax.scan`, so the whole training step is one compiled program
and `jax.grad` gives the GPipe backward schedule automatically.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tutel_tpu.examples.helloworld_pipeline --device cpu
"""

import argparse


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--num_stages", type=int, default=4)
    parser.add_argument("--n_micro", type=int, default=8)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=32)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--num_experts", type=int, default=4)
    parser.add_argument("--num_steps", type=int, default=5)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--remat", action="store_true")
    return parser.parse_args(argv)


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    import numpy as np
    from tutel_tpu import moe
    from tutel_tpu.parallel import pipeline, stack_stage_params

    devices = jax.devices()[:args.num_stages]
    mesh = jax.sharding.Mesh(np.array(devices), ("pp",))

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=jax.devices()[:1])

    stacked = stack_stage_params(
        [layer.init(jax.random.PRNGKey(i)) for i in range(args.num_stages)])
    key = jax.random.PRNGKey(0)

    def stage(p, x):
        out, l_aux = layer(p, x, key=key)
        return x + out, l_aux

    fwd = pipeline(stage, args.num_stages, mesh, n_micro=args.n_micro,
                   remat=args.remat, has_aux=True)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.model_dim))
    target = jnp.sin(jnp.cumsum(x, axis=-1))

    def loss_fn(params):
        y, l_aux = fwd(params, x)
        return jnp.mean((y - target) ** 2) + 0.01 * l_aux

    @jax.jit
    def train_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree.map(lambda p, g: p - args.lr * g, params,
                            grads), loss

    losses = []
    params = stacked
    for step in range(args.num_steps):
        params, loss = train_step(params)
        losses.append(float(loss))
        log(f"STEP-{step}: loss = {losses[-1]:.6f}")
    return losses


def main():
    run(build_args())


if __name__ == "__main__":
    main()
