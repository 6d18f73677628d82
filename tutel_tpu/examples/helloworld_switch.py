"""Dynamic-switching demo (reference: tutel/examples/helloworld_switch.py).

Tutel's flagship capability: change capacity_factor / top_k / adaptive_r /
a2a_ffn_overlap_degree at EVERY forward call with no recompilation penalty.
Under XLA this is realized by the compiled-variant cache: the first call at
each static config compiles, every later call at any previously-seen
config is a dict lookup. This script cycles through configs and prints
per-call wall time so the warm-call costs are visible.

Run: python -m tutel_tpu.examples.helloworld_switch --steps 24 [--device cpu]
"""

import argparse
import time


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe

    dtype = jnp.bfloat16 if (args.dtype == "bfloat16") else jnp.float32
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": args.num_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1), dtype=dtype,
        parallel_type="adaptive:1", group=jax.devices())
    params = layer.shard_params(layer.init(jax.random.PRNGKey(1)))
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size, args.num_tokens, args.model_dim)).astype(dtype)

    # the per-call config cycle (reference helloworld_switch randomizes
    # top_k / capacity_factor / r per step)
    configs = [
        {"top_k": 2, "capacity_factor": 1.0},
        {"top_k": 1, "capacity_factor": 1.0},
        {"top_k": 2, "capacity_factor": 2.0},
        {"top_k": 2, "capacity_factor": 0.0},    # dropless
        {"top_k": 1, "capacity_factor": -1.2},   # capped dropless
    ]
    if layer.sharded_count > 1:
        configs += [{"top_k": 2, "capacity_factor": 1.0, "adaptive_r": r}
                    for r in layer.valid_rs if r > 0]

    timings = {}
    key = jax.random.PRNGKey(3)
    for i in range(args.steps):
        cfg = configs[i % len(configs)]
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        out, l_aux = layer(params, x, key=sk, **cfg)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        name = str(sorted(cfg.items()))
        state = "compile" if name not in timings else "cached"
        timings.setdefault(name, []).append(dt)
        log(f"STEP-{i} {cfg} [{state}]: {dt*1e3:.2f} ms, "
            f"l_aux={float(l_aux):.5f}")

    log("\n[Summary] first-call (compile) vs steady-state per config:")
    for name, ts in timings.items():
        warm = ts[1:] or ts
        log(f"  {name}: first {ts[0]*1e3:.1f} ms, "
            f"warm avg {sum(warm)/len(warm)*1e3:.2f} ms over {len(warm)}")
    # every revisited config must be >10x faster than its first call
    slow = {n: ts for n, ts in timings.items()
            if len(ts) > 1 and ts[1] > ts[0] / 2}
    return timings, slow


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_tokens", type=int, default=512)
    parser.add_argument("--model_dim", type=int, default=1024)
    parser.add_argument("--hidden_size", type=int, default=1024)
    parser.add_argument("--num_experts", type=int, default=2)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
