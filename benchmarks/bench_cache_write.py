"""Isolate the KV-cache write cost of one decode step.

The round-4b profile of the 2k-window serving chunk
(benchmarks/profile_lm_decode.py) shows an aggregate `scatter` row of
~795 us/step — 24% of the 53.85 ms kv8 chunk — while the bytes
actually written per step are tiny (64 rows x 1 KB per tensor). This
bench times the write pattern in isolation at the serving config so
candidate replacements (fused scatters, one-hot masked updates, a
Pallas DMA write kernel) can be compared against the measured cost,
not the guessed one.

Variants:
  scatter      — the production pattern: one `.at[rows, pos].set` per
                 tensor (k, v int8 [B,T,D]; k_s, v_s f32 [B,kvh,T]),
                 4 layers = 16 scatters/step.
  fused        — k+v stored as one [B,T,2,D] array, k_s+v_s as one
                 [B,2,kvh,T]: 8 scatters/step.
  onehot_scale — values via scatter, scales via a full-array
                 where(iota == pos) select (scales are only ~4 MB).
  pallas       — ops/kv_write_pallas.write_step: one batched RMW
                 kernel per step writing k, v AND their scale columns
                 (scales handled in-kernel via 128-lane windows).

Prints one JSON line per variant: us/step by loop differencing
(n vs 3n chained steps inside one jit; distinct inputs per run).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--kvh", type=int, default=8)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--n", type=int, default=320,
                   help="base step count for differencing; 3n must "
                        "stay below max_len")
    p.add_argument("--variants", type=str,
                   default="scatter,fused,onehot_scale,pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    b, t, d, kvh, L = (args.batch, args.max_len, args.d, args.kvh,
                       args.layers)

    def time_variant(step, carry_init, n):
        """us per step: slope of n vs 3n chained steps (min of 3 tries
        per endpoint — the differenced quantity must dwarf the tunnel's
        30-450 ms RTT jitter, so pick n so 2n steps >= ~0.5 s)."""

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnums=(1,))
        def go(carry, steps):
            def body(i, carry):
                return step(i, carry)
            return jax.lax.fori_loop(0, steps, body, carry)

        def run(steps, seed):
            carry = jax.tree.map(
                lambda x: x + jnp.asarray(seed, x.dtype), carry_init())
            t0 = time.time()
            carry = go(carry, steps)
            leaf = jax.tree.leaves(carry)[0]
            # force completion by fetching a scalar
            float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
            return time.time() - t0

        run(n, 0)                       # compile n
        run(3 * n, 1)                   # compile 3n
        t1 = min(run(n, 2 + i) for i in range(3))
        t3 = min(run(3 * n, 9 + i) for i in range(3))
        return (t3 - t1) / (2 * n) * 1e6

    rows = jnp.arange(b)
    results = {}

    def fresh_vals(key, shape, dt):
        return jnp.zeros(shape, dt)

    variants = args.variants.split(",")

    if "scatter" in variants:
        def init():
            return {
                "kv": [fresh_vals(0, (b, t, d), jnp.int8)
                       for _ in range(2 * L)],
                "sc": [fresh_vals(0, (b, kvh, t), jnp.float32)
                       for _ in range(2 * L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step(i, c):
            pos = c["pos"]
            val = jnp.full((b, d), i, jnp.int8)
            sval = jnp.full((b, kvh), i, jnp.float32)
            c["kv"] = [x.at[rows, pos].set(val) for x in c["kv"]]
            c["sc"] = [x.at[rows, :, pos].set(sval) for x in c["sc"]]
            c["pos"] = pos + 1
            return c

        results["scatter"] = time_variant(step, init, args.n)

    if "vals_only" in variants:
        def init_v():
            return {
                "kv": [fresh_vals(0, (b, t, d), jnp.int8)
                       for _ in range(2 * L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step_v(i, c):
            pos = c["pos"]
            val = jnp.full((b, d), i, jnp.int8)
            c["kv"] = [x.at[rows, pos].set(val) for x in c["kv"]]
            c["pos"] = pos + 1
            return c

        results["vals_only"] = time_variant(step_v, init_v, args.n)

    if "scales_only" in variants:
        def init_s():
            return {
                "sc": [fresh_vals(0, (b, kvh, t), jnp.float32)
                       for _ in range(2 * L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step_s(i, c):
            pos = c["pos"]
            sval = jnp.full((b, kvh), i, jnp.float32)
            c["sc"] = [x.at[rows, :, pos].set(sval) for x in c["sc"]]
            c["pos"] = pos + 1
            return c

        results["scales_only"] = time_variant(step_s, init_s, args.n)

    if "fused" in variants:
        def init_f():
            return {
                "kv": [fresh_vals(0, (b, t, 2, d), jnp.int8)
                       for _ in range(L)],
                "sc": [fresh_vals(0, (b, 2, kvh, t), jnp.float32)
                       for _ in range(L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step_f(i, c):
            pos = c["pos"]
            val = jnp.full((b, 2, d), i, jnp.int8)
            sval = jnp.full((b, 2, kvh), i, jnp.float32)
            c["kv"] = [x.at[rows, pos].set(val) for x in c["kv"]]
            c["sc"] = [x.at[rows, :, :, pos].set(sval) for x in c["sc"]]
            c["pos"] = pos + 1
            return c

        results["fused"] = time_variant(step_f, init_f, args.n)

    if "onehot_scale" in variants:
        def init_o():
            return {
                "kv": [fresh_vals(0, (b, t, d), jnp.int8)
                       for _ in range(2 * L)],
                "sc": [fresh_vals(0, (b, kvh, t), jnp.float32)
                       for _ in range(2 * L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step_o(i, c):
            pos = c["pos"]
            val = jnp.full((b, d), i, jnp.int8)
            sval = jnp.full((b, kvh), i, jnp.float32)
            c["kv"] = [x.at[rows, pos].set(val) for x in c["kv"]]
            hit = (jnp.arange(t)[None, None, :]
                   == pos[:, None, None])                  # [B,1,T]
            c["sc"] = [jnp.where(hit, sval[..., None], x)
                       for x in c["sc"]]
            c["pos"] = pos + 1
            return c

        results["onehot_scale"] = time_variant(step_o, init_o, args.n)

    if "pallas" in variants:
        from tutel_tpu.ops.kv_write_pallas import write_step

        def init_p():
            return {
                "kv": [fresh_vals(0, (b, t, d), jnp.int8)
                       for _ in range(2 * L)],
                "sc": [fresh_vals(0, (b, kvh, t), jnp.float32)
                       for _ in range(2 * L)],
                "pos": jnp.zeros((b,), jnp.int32),
            }

        def step_p(i, c):
            pos = c["pos"]
            val = jnp.full((b, d), i, jnp.int8)
            sval = jnp.full((b, kvh), i, jnp.float32)
            kv, sc = [], []
            for j in range(L):
                rc, cc = write_step(
                    [c["kv"][2 * j], c["kv"][2 * j + 1]], [val, val],
                    pos, col_caches=[c["sc"][2 * j], c["sc"][2 * j + 1]],
                    cols=[sval, sval])
                kv += rc
                sc += cc
            c["kv"], c["sc"] = kv, sc
            c["pos"] = pos + 1
            return c

        results["pallas"] = time_variant(step_p, init_p, args.n)

    for k, v in results.items():
        print(json.dumps({"metric": "kv_cache_write_us_per_step",
                          "variant": k, "value": round(v, 1),
                          "unit": "us",
                          "config": {"batch": b, "max_len": t, "d": d,
                                     "kvh": kvh, "layers": L,
                                     "platform":
                                     jax.devices()[0].platform}}))


if __name__ == "__main__":
    main()
