"""Profile one LM serving decode chunk and print top device ops.

The 2k-window serving rows (docs/RESULTS.md) sit far above the
KV-read roofline, so something besides the attention read dominates.
This captures an xprof trace of exactly the chunk the engine
dispatches (16 apply_decode steps under lax.scan, donated cache) at
the bench_lm_serving config and prints the top ops by self time.

Run: python benchmarks/profile_lm_decode.py [--kv_bits 8] [--top_n 30]
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
    from tutel_tpu.ops import quant
    from tutel_tpu.serving import _maybe_fuse_expert_stream

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    cfg = TransformerMoEConfig(
        vocab_size=args.vocab, max_len=args.max_len,
        model_dim=args.model_dim, num_heads=args.num_heads,
        num_layers=args.num_layers, ffn_hidden=4 * args.model_dim,
        moe_every=2, num_local_experts=args.experts, top_k=2,
        capacity_factor=0.0, expert_hidden=args.expert_hidden,
        dtype=dtype, kv_bits=args.kv_bits,
        num_kv_heads=args.num_kv_heads)
    model = TransformerMoE(cfg, group=jax.devices()[:1])

    @jax.jit
    def make_params(key):
        return model.init(key)

    params = make_params(jax.random.PRNGKey(0))
    if args.bits:
        params = dict(params)
        params["blocks"] = [
            ({**blk, "moe": {**blk["moe"], "experts":
              quant.quantize_expert_params(blk["moe"]["experts"],
                                           bits=args.bits)}}
             if "moe" in blk else blk) for blk in params["blocks"]]
        params["blocks"] = [
            ({**blk, "moe": _maybe_fuse_expert_stream(
                blk["moe"], model.moe_layers.get(i))}
             if "moe" in blk else blk)
            for i, blk in enumerate(params["blocks"])]

    b = args.batch
    cache = jax.jit(lambda: model.init_cache(b))()
    pos0 = jnp.full((b,), args.pos, jnp.int32)
    tok0 = jnp.zeros((b,), jnp.int32)
    cap = max(2 * b // args.experts, 8)
    ov = {"capacity_override": cap}

    def chunk(params, kv, tok, pos, key):
        def body(carry, _):
            kv, tok, pos, k = carry
            logits, kv, _aux = model.apply_decode(
                params, tok, kv, pos, moe_overrides=ov,
                attn_len=args.attn_len or None)
            k, sk = jax.random.split(k)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (kv, nxt, pos + 1, k), nxt

        (kv, tok, pos, _), toks = jax.lax.scan(
            body, (kv, tok, pos, key), None, length=args.chunk)
        return kv, tok, pos, toks

    fn = jax.jit(chunk, donate_argnums=(1, 2, 3))
    kv, tok, pos, toks = fn(params, cache, tok0, pos0,
                            jax.random.PRNGKey(1))
    jax.block_until_ready(toks)

    logdir = args.logdir or tempfile.mkdtemp(prefix="lm_decode_prof_")
    with jax.profiler.trace(logdir):
        for i in range(args.reps):
            kv, tok, pos, toks = fn(params, kv, tok, pos,
                                    jax.random.PRNGKey(2 + i))
        jax.block_until_ready(toks)
    print(f"trace in {logdir}")
    table = summarize_xplane(logdir, args.top_n)
    print(table if isinstance(table, str) else str(table)[:8000])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--model_dim", type=int, default=1024)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_kv_heads", type=int, default=0)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--experts", type=int, default=32)
    p.add_argument("--expert_hidden", type=int, default=2048)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--kv_bits", type=int, default=8)
    p.add_argument("--pos", type=int, default=1700)
    p.add_argument("--attn_len", type=int, default=0)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--top_n", type=int, default=30)
    p.add_argument("--logdir", type=str, default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
