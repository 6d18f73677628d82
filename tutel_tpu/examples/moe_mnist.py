"""End-to-end convnet + MoE classifier on MNIST (reference:
tutel/examples/moe_mnist.py).

Same model shape as the reference: two conv layers -> dropout -> an MoE
layer with 2-layer FFN experts as the classifier head -> log_softmax; the
eval loop re-runs with top_k switched to 1 / 2 / min(E, 8) per call — the
dynamic-top-k capability (reference moe_mnist.py:104-123).

Dataset: loads MNIST from --data_dir if the raw numpy files exist there;
otherwise falls back to a deterministic synthetic digit-like dataset (this
environment has no network egress; the training mechanics are identical).

Run: python -m tutel_tpu.examples.moe_mnist --epochs 1 [--device cpu]
"""

import argparse
import os

import numpy as np


def load_dataset(data_dir, n_train=4096, n_test=1024):
    path = os.path.join(data_dir or "", "mnist.npz")
    if data_dir and os.path.exists(path):
        with np.load(path) as z:
            return (z["x_train"].astype(np.float32) / 255.0,
                    z["y_train"].astype(np.int32),
                    z["x_test"].astype(np.float32) / 255.0,
                    z["y_test"].astype(np.int32))
    # synthetic fallback: 10 classes of noisy oriented-bar images
    rng = np.random.RandomState(0)
    def make(n):
        ys = rng.randint(0, 10, size=n).astype(np.int32)
        xs = rng.randn(n, 28, 28).astype(np.float32) * 0.3
        for i, y in enumerate(ys):
            xs[i, 2 + y * 2:5 + y * 2, 4:24] += 2.0    # class-coded bar
            xs[i, 4:24, 2 + y * 2:5 + y * 2] += 1.0
        return xs, ys
    xtr, ytr = make(n_train)
    xte, yte = make(n_test)
    return xtr, ytr, xte, yte


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe

    xtr, ytr, xte, yte = load_dataset(args.data_dir)

    conv_dim = 32
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "capacity_factor": 1.5},
        experts={"type": "ffn", "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden_size,
                 "output_dim": 10, "activation_fn": jax.nn.relu},
        model_dim=conv_dim * 7 * 7, seeds=(1, 1, 1),
        group=jax.devices()[:1])

    def init_params(key):
        k1, k2, k3 = jax.random.split(key, 3)
        conv1 = jax.random.normal(k1, (3, 3, 1, 16)) * 0.1
        conv2 = jax.random.normal(k2, (3, 3, 16, conv_dim)) * 0.1
        return {"conv1": conv1, "conv2": conv2, "moe": layer.init(k3)}

    def features(p, imgs):
        x = imgs[..., None]                              # [B, 28, 28, 1]
        x = jax.lax.conv_general_dilated(
            x, p["conv1"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
        x = jax.lax.conv_general_dilated(
            x, p["conv2"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)                               # [B, 7, 7, C]
        return x.reshape(x.shape[0], 1, -1)              # [B, 1, M]

    def loss_fn(p, imgs, labels, key, top_k=None, training=True):
        feats = features(p, imgs)
        out, l_aux = layer(p["moe"], feats, key=key, top_k=top_k,
                           training=training)
        logits = jax.nn.log_softmax(out[:, 0, :], axis=1)
        nll = -jnp.mean(logits[jnp.arange(labels.shape[0]), labels])
        return nll + 0.01 * l_aux, logits

    import functools

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
    for epoch in range(args.epochs):
        for i in range(0, len(xtr) - bs + 1, bs):
            key, sk = jax.random.split(key)
            params, loss = train_step(
                params, jnp.asarray(xtr[i:i + bs]),
                jnp.asarray(ytr[i:i + bs]), sk, args.top)
            if (i // bs) % 20 == 0:
                log(f"epoch {epoch} step {i//bs}: loss = {float(loss):.4f}")
        # dynamic top-k at eval (reference moe_mnist.py:104-123)
        accs = {}
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
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
