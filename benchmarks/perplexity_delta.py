"""Quantization perplexity-delta report (BASELINE.md north-star row:
'Perplexity vs FP16 baseline within stated quantization delta').

Trains the Transformer-MoE LM on a structured synthetic corpus, then
evaluates held-out nll with fp32 vs INT8 vs INT4 expert weights —
weight-only AND integer-domain activation paths (W8A8 / W4A8,
activation_bits=8 through the model's expert_kwargs) — and prints the
deltas (the docs/RESULTS.md table source).

Run: python benchmarks/perplexity_delta.py [--steps 400]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--vocab", type=int, default=127)
    parser.add_argument("--seq", type=int, default=32)
    parser.add_argument("--model_dim", type=int, default=64)
    parser.add_argument("--experts", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    from tutel_tpu.ops import quant

    V, T = args.vocab, args.seq

    def make_cfg(activation_bits=0):
        return TransformerMoEConfig(
            vocab_size=V, max_len=T, model_dim=args.model_dim,
            num_heads=4, num_layers=2, ffn_hidden=2 * args.model_dim,
            moe_every=1, num_local_experts=args.experts, top_k=2,
            expert_hidden=2 * args.model_dim,
            expert_kwargs={"activation_bits": activation_bits}
            if activation_bits else None)

    model = TransformerMoE(make_cfg(), group=jax.devices()[:1])
    # Same params, integer-domain (int8 activation) expert GEMMs.
    model_a8 = TransformerMoE(make_cfg(8), group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))

    def corpus(key, n):
        start = jax.random.randint(key, (n, 1), 0, V)

        def step(c, _):
            return (c * 7 + 3) % V, c
        _, toks = jax.lax.scan(step, start, None, length=T)
        return jnp.swapaxes(toks[..., 0], 0, 1)

    train = corpus(jax.random.PRNGKey(1), 64)
    held = corpus(jax.random.PRNGKey(2), 64)

    @jax.jit
    def train_step(p, tokens, key):
        l, g = jax.value_and_grad(
            lambda p: model.loss(p, tokens, key=key, training=True)[0])(p)
        return jax.tree.map(lambda a, b: a - 0.05 * b, p, g), l

    key = jax.random.PRNGKey(3)
    for i in range(args.steps):
        key, sk = jax.random.split(key)
        params, l = train_step(params, train, sk)

    def eval_nll(p, m=None):
        return float((m or model).loss(p, held, training=False)[1][0])

    def quantized(bits):
        qp = jax.tree.map(lambda x: x, params)
        for i in model.moe_layers:
            blk = dict(qp["blocks"][i])
            moe_params = dict(blk["moe"])
            moe_params["experts"] = quant.quantize_expert_params(
                moe_params["experts"], bits=bits)
            blk["moe"] = moe_params
            qp["blocks"][i] = blk
        return qp

    nll = eval_nll(params)
    out = {"metric": "lm_nll_quant_delta", "uniform_nll": round(
        math.log(V), 4), "fp32_nll": round(nll, 4)}
    for bits in (8, 4):
        qp = quantized(bits)
        q = eval_nll(qp)
        out[f"int{bits}_nll"] = round(q, 4)
        out[f"int{bits}_delta"] = round(q - nll, 4)
        out[f"int{bits}_ppl_ratio"] = round(math.exp(q - nll), 4)
        # Integer-domain activation path: same quantized weights, int8
        # activations on the MXU (W8A8 / W4A8).
        qa = eval_nll(qp, model_a8)
        tag = f"w{bits}a8"
        out[f"{tag}_nll"] = round(qa, 4)
        out[f"{tag}_delta"] = round(qa - nll, 4)
        out[f"{tag}_ppl_ratio"] = round(math.exp(qa - nll), 4)

    # INT8 KV cache (round 4): the cache only exists on the DECODE
    # path, so its delta is measured by teacher-forcing the held-out
    # corpus through apply_decode (kv_bits=8 vs the full-precision
    # cache) with the same trained fp32 weights.
    def decode_nll(kv_bits):
        import dataclasses
        m = TransformerMoE(dataclasses.replace(make_cfg(),
                                               kv_bits=kv_bits),
                           group=jax.devices()[:1])

        @jax.jit
        def run(p, toks):
            cache = m.init_cache(toks.shape[0])
            n = toks.shape[0]

            def body(c, i):
                logits, c, _ = m.apply_decode(
                    p, jnp.take(toks, i, axis=1), c,
                    jnp.full((n,), i, jnp.int32))
                lp = jax.nn.log_softmax(logits, axis=-1)
                tgt = jnp.take(toks, i + 1, axis=1)
                return c, -jnp.take_along_axis(
                    lp, tgt[:, None], axis=-1).mean()
            _, nls = jax.lax.scan(body, cache,
                                  jnp.arange(toks.shape[1] - 1))
            return nls.mean()
        return float(run(params, held))

    d0 = decode_nll(0)
    out["decode_fp_nll"] = round(d0, 4)
    for kvb in (8, 4):
        dq = decode_nll(kvb)
        out[f"kv{kvb}_nll"] = round(dq, 4)
        out[f"kv{kvb}_delta"] = round(dq - d0, 4)
        out[f"kv{kvb}_ppl_ratio"] = round(math.exp(dq - d0), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
