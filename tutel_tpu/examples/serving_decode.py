"""Continuous-batching decode serving, single-layer and full-model.

Beyond-reference example (the reference stops at the layer; this repo's
serving engines are its production decode path — see docs/RESULTS.md
for measured numbers):

  * `MoeDecodeEngine` drives a MOELayer over embedding-space states with
    SPECULATIVE dropless capacity: chunks run at a small multiple of the
    average per-expert load with a traced needed-capacity probe, and the
    rare chunk whose routing overflows the speculation replays exactly
    (measured 4.05x per device chunk vs the worst-case buffer at
    256 slots / 128 experts).
  * `LmDecodeEngine` serves a whole Transformer-MoE LM: prompt prefill
    on admission, KV-cache chunked decode, bucketed attention windows
    (reads only ceil(live/bucket)*bucket cache positions — exact), and
    the same speculation opt-in.

Run: python -m tutel_tpu.examples.serving_decode [--device cpu]
"""

import argparse

import numpy as np


def build_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--experts", type=int, default=16)
    p.add_argument("--model_dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--requests", type=int, default=48)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--spec", type=float, default=8.0)
    p.add_argument("--device", type=str, default="")
    return p.parse_args(argv)


def run(args, log=print):
    import jax
    import jax.numpy as jnp
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    from tutel_tpu import moe
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    from tutel_tpu.serving import (LmDecodeEngine, LmRequest,
                                   MoeDecodeEngine, Request)

    # -- single-layer engine: speculative capacity + residual state ----
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": args.experts,
                 "hidden_size_per_expert": 2 * args.model_dim},
        model_dim=args.model_dim, seeds=(1, 1, 1),
        group=jax.devices()[:1])
    params = layer.init(jax.random.PRNGKey(0))
    eng = MoeDecodeEngine(layer, params, max_batch=args.batch,
                          speculative_capacity=args.spec,
                          state_update="residual_norm")
    reqs = [Request(uid=i,
                    state=np.asarray(jax.random.normal(
                        jax.random.fold_in(jax.random.PRNGKey(1), i),
                        (args.model_dim,))),
                    remaining=12 + i % 5)
            for i in range(args.requests)]
    finals = eng.run(reqs, chunk=args.chunk)
    log(f"MoeDecodeEngine: {eng.stats['finished']} requests finished, "
        f"{eng.stats['tokens']} tokens, "
        f"{eng.stats['spec_retries']} speculation retries "
        f"(speculated cap {eng._spec_cap(args.batch, args.batch)} vs "
        f"worst {args.batch})")
    assert len(finals) == args.requests

    # -- full-model engine: prefill + windowed KV decode ----------------
    cfg = TransformerMoEConfig(
        vocab_size=211, max_len=96, model_dim=64, num_heads=4,
        num_layers=2, ffn_hidden=128, moe_every=2,
        num_local_experts=args.experts // 2, top_k=2,
        expert_hidden=128, capacity_factor=0.0)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    mp = model.init(jax.random.PRNGKey(2))
    lm = LmDecodeEngine(model, mp, max_batch=8,
                        moe_overrides={"capacity_override": 8},
                        attn_bucket=16,
                        sampler={"temperature": 0.8, "top_k": 40,
                                 "seed": 0})
    rng = np.random.RandomState(0)
    lreqs = [LmRequest(uid=i,
                       prompt=rng.randint(0, cfg.vocab_size,
                                          size=4 + i % 3).astype(np.int32),
                       max_new_tokens=24)
             for i in range(12)]
    outs = lm.run(lreqs, chunk=args.chunk)
    log(f"LmDecodeEngine: {lm.stats['finished']} requests finished, "
        f"{lm.stats['tokens']} tokens generated "
        f"(attention windows <= {lm.attn_bucket}-position buckets)")
    assert len(outs) == 12 and all(len(v) for v in outs.values())
    return eng.stats, lm.stats


if __name__ == "__main__":
    run(build_args())
