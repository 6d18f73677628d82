"""MoE from the low-level ops, no MOELayer (reference:
tutel/examples/helloworld_from_scratch.py).

Builds the full pipeline by hand from the ops API:
gate matmul -> softmax -> `extract_critical` -> `fast_encode` ->
batched expert FFN -> `fast_decode`, plus the gshard aux loss — the same
flow MOELayer orchestrates (SURVEY.md section 3.2), useful as an
integration template for custom architectures.

Run: python -m tutel_tpu.examples.helloworld_from_scratch [--device cpu]
"""

import argparse


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu.ops import (extract_critical, fast_encode, fast_decode,
                               routing)

    e, m, h, s, k = (args.num_experts, args.model_dim, args.hidden_size,
                     args.num_tokens, args.top)
    key = jax.random.PRNGKey(0)
    kg, k1, k2, kx = jax.random.split(key, 4)
    params = {
        "wg": jax.random.normal(kg, (m, e)) * m ** -0.5,
        "fc1": jax.random.normal(k1, (e, m, h)) * m ** -0.5,
        "fc2": jax.random.normal(k2, (e, h, m)) * h ** -0.5,
    }
    x = jax.random.normal(kx, (s, m))
    capacity = routing.compute_static_capacity(s, e, k, args.capacity_factor)

    def moe_forward(params, x):
        scores = jax.nn.softmax(x @ params["wg"], axis=1)
        crit, l_aux = extract_critical(scores, k, capacity=capacity)
        y = fast_encode(x, crit)                       # [E, C, M]
        y = jnp.einsum("ecm,emh->ech", y, params["fc1"])
        y = jax.nn.relu(y)
        y = jnp.einsum("ech,ehm->ecm", y, params["fc2"])
        return fast_decode(y, crit), l_aux             # [S, M]

    @jax.jit
    def train_step(params, x):
        def loss_fn(p):
            out, l_aux = moe_forward(p, x)
            return jnp.mean(out ** 2) + 0.01 * l_aux
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads), loss

    for i in range(args.num_steps):
        params, loss = train_step(params, x)
        log(f"STEP-{i}: loss = {float(loss):.5f}")
    return float(loss)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_tokens", type=int, default=256)
    parser.add_argument("--model_dim", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=256)
    parser.add_argument("--num_experts", type=int, default=4)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--capacity_factor", type=float, default=1.0)
    parser.add_argument("--num_steps", type=int, default=5)
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
