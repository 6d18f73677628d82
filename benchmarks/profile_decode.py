"""Capture and summarize a device profile of the dropless decode step.

Runs the same setup as bench_dropless_decode, traces a few steps with
jax.profiler, then parses the xplane proto (xprof) and prints the top ops
by self time — the tool the reference lacks (SURVEY.md section 5).

Run: python benchmarks/profile_decode.py --experts 128 [--top_n 25]
"""

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def summarize_xplane(logdir, top_n=25):
    from xprof.convert import raw_to_tool_data as rtd
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    return data


def run(args):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tutel_tpu import moe, system
    from tutel_tpu.ops import quant

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    if args.gate == "expert_choice":
        gate_cfg = {"type": "expert_choice", "gate_noise": 0.0,
                    "capacity_factor": float(args.top)}
    else:
        gate_cfg = {"type": "top", "k": args.top, "capacity_factor": 0.0}
    layer = moe.moe_layer(
        gate_type=gate_cfg,
        experts={"type": "ffn", "num_experts_per_device": args.experts,
                 "hidden_size_per_expert": args.hidden,
                 "has_fc1_bias": False, "has_fc2_bias": False},
        model_dim=args.model_dim, seeds=(1, 1, 1), dtype=dtype,
        group=jax.devices()[:1])

    @jax.jit
    def make_params():
        p = layer.init(jax.random.PRNGKey(0))
        if args.bits:
            p = dict(p)
            p["experts"] = quant.quantize_expert_params(p["experts"],
                                                        bits=args.bits)
            from tutel_tpu.ops.fused_ffn_pallas import \
                prepare_fused_ffn_params
            p["experts"] = prepare_fused_ffn_params(p["experts"])
        return p

    params = make_params()
    jax.block_until_ready(jax.tree.leaves(params))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.tokens, args.model_dim)).astype(dtype)
    if args.gate == "expert_choice":
        cap = max(1, args.top * args.tokens // args.experts)
    else:
        cap = max(layer.resolve_capacity(params, x, top_k=args.top), 8)

    @jax.jit
    def loop(params, xx):
        def step(i, carry):
            xx, acc = carry
            out, _ = layer(params, xx + (acc * 1e-20).astype(dtype),
                           key=jax.random.fold_in(jax.random.PRNGKey(2), i),
                           capacity_override=cap)
            return (xx, acc + jnp.sum(out.astype(jnp.float32)) * 1e-9)
        return lax.fori_loop(0, args.iters, step, (xx, jnp.float32(0)))

    r = loop(params, x)
    jax.block_until_ready(r)

    logdir = args.logdir or tempfile.mkdtemp(prefix="tutel_prof_")
    with system.profile_trace(logdir):
        r = loop(params, x)
        jax.block_until_ready(r)
    print(f"trace written to {logdir}")
    try:
        import json
        data = summarize_xplane(logdir, args.top_n)
        out = json.loads(data) if isinstance(data, (str, bytes)) else data
        print(type(out))
        print(str(out)[:4000])
    except Exception as e:
        print(f"xplane summary failed ({type(e).__name__}: {e}); "
              f"inspect {logdir} with tensorboard/xprof manually")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gate", type=str, default="top")
    parser.add_argument("--experts", type=int, default=128)
    parser.add_argument("--model_dim", type=int, default=2048)
    parser.add_argument("--hidden", type=int, default=2048)
    parser.add_argument("--tokens", type=int, default=256)
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--bits", type=int, default=4)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--top_n", type=int, default=25)
    parser.add_argument("--logdir", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
