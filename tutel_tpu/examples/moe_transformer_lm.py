"""Train a decoder-only Transformer-MoE language model.

The framework-native counterpart of the reference's fairseq-MoE recipe
(reference examples/fairseq_moe/README + fairseq_patch.diff): a causal LM
whose every `--moe_every`-th FFN is a MoE layer, aux loss weighted by
--l_aux_wt, trained with Adam under a lax.scan driver.

Corpus: --data_file (one byte-token document) if given, else a synthetic
structured corpus (arithmetic-progression byte patterns; no egress here).

Run: python -m tutel_tpu.examples.moe_transformer_lm --steps 50 [--device cpu]
"""

import argparse
import time

import numpy as np


def make_corpus(args):
    if args.data_file:
        data = np.frombuffer(open(args.data_file, "rb").read(),
                             dtype=np.uint8).astype(np.int32)
        return data
    rng = np.random.RandomState(0)
    chunks = []
    for _ in range(512):
        start, step = rng.randint(0, 256), rng.randint(1, 7)
        chunks.append((start + step * np.arange(64)) % 256)
    return np.concatenate(chunks).astype(np.int32)


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
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    cfg = TransformerMoEConfig(
        vocab_size=256, max_len=args.seq_len, model_dim=args.model_dim,
        num_heads=args.num_heads, num_layers=args.num_layers,
        ffn_hidden=args.hidden, moe_every=args.moe_every,
        num_local_experts=args.num_experts, top_k=args.top,
        expert_hidden=args.hidden, dtype=dtype)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))

    corpus = make_corpus(args)
    n_tok = args.batch_size * (args.seq_len + 1)
    starts = np.random.RandomState(1).randint(
        0, len(corpus) - args.seq_len - 1, size=(args.steps, args.batch_size))
    try:
        from tutel_tpu import csrc
        batches = csrc.sample_windows(
            corpus, starts.reshape(-1).astype(np.int64),
            args.seq_len + 1).reshape(args.steps, args.batch_size, -1)
    except Exception:
        batches = np.stack([
            np.stack([corpus[s:s + args.seq_len + 1] for s in row])
            for row in starts])                 # [steps, B, T+1]
    batches = jnp.asarray(batches)

    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    def step(carry, batch):
        params, opt_state, key = carry
        key, sk = jax.random.split(key)
        (loss, (nll, l_aux)), grads = jax.value_and_grad(
            model.loss, has_aux=True)(params, batch, key=sk,
                                      l_aux_wt=args.l_aux_wt)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), (loss, nll, l_aux)

    @jax.jit
    def train(params, opt_state, batches):
        (params, opt_state, _), stats = lax.scan(
            step, (params, opt_state, jax.random.PRNGKey(7)), batches)
        return params, opt_state, stats

    t0 = time.perf_counter()
    params, opt_state, (losses, nlls, l_auxs) = train(
        params, opt_state, batches)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    for i in range(0, args.steps, max(1, args.steps // 10)):
        log(f"STEP-{i}: loss = {float(losses[i]):.4f}, "
            f"nll = {float(nlls[i]):.4f}, l_aux = {float(l_auxs[i]):.5f}")
    tok_s = args.steps * args.batch_size * args.seq_len / dt
    log(f"[Summary] {args.steps} steps in {dt:.1f}s "
        f"(incl. compile), ~{tok_s:.0f} tokens/s; "
        f"final loss = {float(losses[-1]):.4f}")
    if args.checkpoint_path:
        from tutel_tpu import checkpoint
        state = {}
        for i, layer in model.moe_layers.items():
            state[f"block{i}"] = checkpoint.serial.unflatten_state(
                layer.state_dict(params["blocks"][i]["moe"]))
        checkpoint.save_state(args.checkpoint_path, state)
        log(f"MoE checkpoint saved to {args.checkpoint_path}.")
    return [float(l) for l in losses]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--seq_len", type=int, default=128)
    parser.add_argument("--model_dim", type=int, default=128)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--moe_every", type=int, default=2)
    parser.add_argument("--num_experts", type=int, default=4)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--l_aux_wt", type=float, default=0.01)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--data_file", type=str, default="")
    parser.add_argument("--checkpoint_path", type=str, default="")
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
