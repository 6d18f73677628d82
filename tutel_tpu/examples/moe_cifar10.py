"""Convnet + MoE classifier on CIFAR-10 (reference:
tutel/examples/moe_cifar10.py).

Deeper 3-block convnet than moe_mnist, MoE head with cosine gate option
(reference moe_cifar10.py uses CosineTopKGate), same dynamic top-k eval.
Loads cifar10.npz from --data_dir when present, else a synthetic
color-texture dataset (no network egress here).

Run: python -m tutel_tpu.examples.moe_cifar10 --epochs 1 [--device cpu]
"""

import argparse
import os

import numpy as np


def load_dataset(data_dir, n_train=4096, n_test=1024):
    path = os.path.join(data_dir or "", "cifar10.npz")
    if data_dir and os.path.exists(path):
        with np.load(path) as z:
            return (z["x_train"].astype(np.float32) / 255.0,
                    z["y_train"].astype(np.int32),
                    z["x_test"].astype(np.float32) / 255.0,
                    z["y_test"].astype(np.int32))
    rng = np.random.RandomState(0)
    def make(n):
        ys = rng.randint(0, 10, size=n).astype(np.int32)
        xs = rng.randn(n, 32, 32, 3).astype(np.float32) * 0.3
        for i, y in enumerate(ys):
            xs[i, :, :, y % 3] += np.sin(
                np.arange(32) * (y + 1) * 0.4)[None, :].astype(np.float32)
        return xs, ys
    return make(n_train) + make(n_test)


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import functools
    import jax.numpy as jnp
    from tutel_tpu import moe

    data = load_dataset(args.data_dir)
    xtr, ytr, xte, yte = data[0], data[1], data[2], data[3]

    dims = (3, 32, 64, 128)
    gate = ({"type": "cosine_top", "k": args.top, "capacity_factor": 1.5}
            if args.gate_type == "cosine" else
            {"type": "top", "k": args.top, "capacity_factor": 1.5})
    layer = moe.moe_layer(
        gate_type=gate,
        experts={"type": args.expert_type,
                 "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden_size,
                 "output_dim": 10},
        model_dim=dims[-1] * 4 * 4, seeds=(1, 1, 1),
        group=jax.devices()[:1])

    def init_params(key):
        ks = jax.random.split(key, len(dims))
        convs = [jax.random.normal(ks[i], (3, 3, dims[i], dims[i + 1]))
                 * (2.0 / (9 * dims[i])) ** 0.5
                 for i in range(len(dims) - 1)]
        return {"convs": convs, "moe": layer.init(ks[-1])}

    def features(p, imgs):
        x = imgs
        for w in p["convs"]:
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return x.reshape(x.shape[0], 1, -1)

    def loss_fn(p, imgs, labels, key, top_k=None, training=True):
        out, l_aux = layer(p["moe"], features(p, imgs), key=key,
                           top_k=top_k, training=training)
        logits = jax.nn.log_softmax(out[:, 0, :], axis=1)
        nll = -jnp.mean(logits[jnp.arange(labels.shape[0]), labels])
        return nll + 0.01 * l_aux, logits

    @functools.partial(jax.jit, static_argnames=("top_k",))
    def train_step(p, imgs, labels, key, top_k):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, imgs, labels, key, top_k)
        p = jax.tree.map(lambda a, g: a - args.lr * g.astype(a.dtype),
                         p, grads)
        return p, loss

    @functools.partial(jax.jit, static_argnames=("top_k",))
    def eval_step(p, imgs, labels, key, top_k):
        _, logits = loss_fn(p, imgs, labels, key, top_k, training=False)
        return jnp.sum(jnp.argmax(logits, axis=1) == labels)

    params = init_params(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    bs = args.batch_size
    accs = {}
    for epoch in range(args.epochs):
        for i in range(0, len(xtr) - bs + 1, bs):
            key, sk = jax.random.split(key)
            params, loss = train_step(
                params, jnp.asarray(xtr[i:i + bs]),
                jnp.asarray(ytr[i:i + bs]), sk, args.top)
            if (i // bs) % 20 == 0:
                log(f"epoch {epoch} step {i//bs}: loss = {float(loss):.4f}")
        for k in sorted({1, 2, min(layer.num_global_experts, 8)}):
            correct = 0
            for i in range(0, len(xte) - bs + 1, bs):
                key, sk = jax.random.split(key)
                correct += int(eval_step(
                    params, jnp.asarray(xte[i:i + bs]),
                    jnp.asarray(yte[i:i + bs]), sk, k))
            accs[k] = correct / (len(xte) // bs * bs)
            log(f"epoch {epoch}: eval top_k={k} accuracy = {accs[k]:.4f}")
    return accs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--num_experts", type=int, default=4)
    parser.add_argument("--hidden_size", type=int, default=256)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--gate_type", type=str, default="cosine")
    parser.add_argument("--expert_type", type=str, default="ffn")
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
