"""1F1B pipeline-parallel MoE training demo (beyond-reference: the
reference has no pipeline parallelism at all — SURVEY.md §2.3).

Same model as helloworld_pipeline, driven by the explicit 1F1B
schedule (`parallel.pipeline_1f1b`): each tick interleaves one
microbatch's forward with an earlier microbatch's backward, so at most
2S-1 activations are in flight per stage regardless of n_micro, and
parameter gradients accumulate on the stage that owns them. Gradients
are exactly the GPipe/sequential gradients.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
     python -m tutel_tpu.examples.helloworld_1f1b --device cpu
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
    from tutel_tpu.parallel import pipeline_1f1b, stack_stage_params

    devices = jax.devices()[:args.num_stages]
    mesh = jax.sharding.Mesh(np.array(devices), ("pp",))

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn",
                 "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=jax.devices()[:1])

    stacked = stack_stage_params(
        [layer.init(jax.random.PRNGKey(i))
         for i in range(args.num_stages)])
    key = jax.random.PRNGKey(0)

    def stage(p, x):
        out, l_aux = layer(p, x, key=key)
        return x + out, l_aux

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.model_dim))

    # token-sum loss per microbatch (see pipeline_1f1b docstring):
    # minimize output energy — a simple but real training signal
    def loss_fn(y):
        return jnp.sum(y.astype(jnp.float32) ** 2) / args.batch

    train = pipeline_1f1b(stage, loss_fn, args.num_stages, mesh,
                          n_micro=args.n_micro, has_aux=True)

    @jax.jit
    def step(params):
        loss, grads = train(params, x)
        params = jax.tree.map(
            lambda p, g: p - args.lr * g.astype(p.dtype), params, grads)
        return params, loss

    losses = []
    for i in range(args.num_steps):
        stacked, loss = step(stacked)
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.6f}")
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    log(f"\n[Summary] 1F1B loss {losses[0]:.5f} -> {losses[-1]:.5f} "
        f"over {args.num_steps} steps ({args.num_stages} stages, "
        f"{args.n_micro} microbatches).")
    return losses


if __name__ == "__main__":
    run(build_args())
