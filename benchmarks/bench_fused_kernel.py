"""Fused-FFN kernel micro-benchmark: variant sweep on real TPU.

Times ONLY the fused whole-expert kernel (plus its host-side activation
relayout/quantize, which is part of every real step) at the north-star
config — 128 experts, 2048^2 INT4, capacity rows from the 256-token
dropless probe — by loop differencing: the kernel output feeds the next
iteration's input inside one lax.scan, two chained lengths (n, 3n) are
timed, and the slope is the per-step device time. Each timed run gets a
fresh input so the remote execution cache can't serve repeats.

Used to rank unpack/chunk variants against the measured 733 GB/s
pure-stream ceiling (docs/RESULTS.md roofline table).

Run: python benchmarks/bench_fused_kernel.py --variant w4a8 --chunk 512
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experts", type=int, default=128)
    p.add_argument("--dim", type=int, default=2048)   # K = H = N
    p.add_argument("--rows", type=int, default=12)    # capacity rows
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--chunk", type=int, default=0)
    p.add_argument("--variant", type=str, default="w4a8",
                   choices=["w4a8", "weight_only", "ceiling",
                            "touch", "unpack"])
    p.add_argument("--split_dot", type=int, default=-1,
                   help="-1 = library default")
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--tries", type=int, default=3)
    args = p.parse_args()

    if args.split_dot >= 0:
        os.environ["TUTEL_TPU_FUSED_SPLIT_DOT"] = str(args.split_dot)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tutel_tpu.ops import quant
    from tutel_tpu.ops import fused_ffn_pallas as fp

    e, d, c = args.experts, args.dim, args.rows
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        w1 = jax.random.normal(k1, (e, d, d), jnp.float32) * 0.05
        w2 = jax.random.normal(k2, (e, d, d), jnp.float32) * 0.05
        q1 = quant.quantize(w1, bits=args.bits)
        q2 = quant.quantize(w2, bits=args.bits)
        return fp.prepare_fused_ffn(q1, q2)
    stream = build(jax.random.PRNGKey(0))
    chunk = args.chunk or None

    if args.variant == "ceiling":
        # Pure-stream ceiling: identical grid + whole-expert BlockSpec
        # as the fused kernel, but the body only touches one row per
        # tile — measures the achievable weight-stream bandwidth with
        # (near-)zero compute riding on it. Directly comparable to the
        # fused variants because it uses the same chain harness.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        t_all, kr, bw = stream.t1 + stream.t2, stream.kr, stream.bw

        def _ceiling_kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((1, bw), jnp.float32)
            for t in range(t_all):
                acc = acc + w_ref[0, t, 0:1, :].astype(jnp.float32)
            o_ref[0] = x_ref[0] + (jnp.sum(acc) * 1e-30).astype(
                x_ref.dtype)

        def fn(x, stream, chunk=None):
            ee, cc, kk = x.shape
            return pl.pallas_call(
                _ceiling_kernel,
                grid=(ee,),
                in_specs=[
                    pl.BlockSpec((1, cc, kk), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, t_all, kr, bw),
                                 lambda i: (i, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, cc, kk), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((ee, cc, kk), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, stream.wstream)
    elif args.variant in ("touch", "unpack"):
        # Round-4 verdict item: bound the INT4 unpack's true cost.
        #   touch:  stream + a full-array VPU reduction of the PACKED
        #           bytes (reads every byte, no nibble arithmetic)
        #   unpack: stream + the production _unpack_i8 nibble expansion
        #           + the same-style reduction over the UNPACKED array
        # unpack - touch isolates the nibble arithmetic; ceiling - touch
        # isolates the cost of merely touching every byte on the VPU.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        t_all, kr, bw = stream.t1 + stream.t2, stream.kr, stream.bw
        do_unpack = args.variant == "unpack"

        # unpack in the production kernel's column-chunk discipline —
        # a whole-tile unpack temporary blows the 16 MB VMEM budget.
        # The forcing consumption is a 1-row MXU dot (ones @ tile): a
        # VPU jnp.sum reduction measured 356 GB/s — 2x slower than the
        # full production kernel — i.e. the reduction, not the unpack,
        # dominated that variant; the MXU consumes the unpacked tile
        # exactly like production's dots but at 1/12th the rows.
        ch = args.chunk or 512

        def _touch_kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((1, ch), jnp.int32)
            for t in range(t_all):
                for j in range(bw // ch):
                    w = w_ref[0, t, :, j * ch:(j + 1) * ch]
                    if do_unpack:
                        w = fp._unpack_i8(w, args.bits)
                    ones = jnp.ones((1, w.shape[0]), jnp.int8)
                    acc = acc + jax.lax.dot_general(
                        ones, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[0] = x_ref[0] + (jnp.sum(acc).astype(jnp.float32)
                                   * 1e-30).astype(x_ref.dtype)

        def fn(x, stream, chunk=None):
            ee, cc, kk = x.shape
            return pl.pallas_call(
                _touch_kernel,
                grid=(ee,),
                in_specs=[
                    pl.BlockSpec((1, cc, kk), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, t_all, kr, bw),
                                 lambda i: (i, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, cc, kk), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((ee, cc, kk), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, stream.wstream)
    else:
        fn = fp.fused_ffn_w8a8 if args.variant == "w4a8" else \
            fp.fused_ffn_quant

    def chain(n):
        # stream MUST be a jit argument: a closed-over 537 MB pytree
        # embeds as HLO constants and overwhelms the remote compile
        # channel (CLAUDE.md).
        @jax.jit
        def run(stream, x):
            def body(x, _):
                out = fn(x, stream, chunk=chunk)
                nxt = (out[:, :, :d] * 0.05).astype(dtype)
                return nxt, None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y[0, 0, :8])
        return run

    run_n, run_3n = chain(args.n), chain(3 * args.n)

    def sample(run, seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (e, c, d),
                              dtype) * 0.1
        t0 = time.perf_counter()
        float(run(stream, x))
        return time.perf_counter() - t0

    # warm compiles
    sample(run_n, 1000)
    sample(run_3n, 2000)
    seeds = iter(range(10, 10000))
    t_n = min(sample(run_n, next(seeds)) for _ in range(args.tries))
    t_3n = min(sample(run_3n, next(seeds)) for _ in range(args.tries))
    step = (t_3n - t_n) / (2 * args.n)
    sweep_mb = stream.wstream.size / 1e6
    print(json.dumps({
        "metric": "fused_kernel_step_ms",
        "value": round(step * 1e3, 4),
        "unit": "ms",
        "gbps": round(sweep_mb / 1e3 / step, 1),
        "config": {"variant": args.variant, "chunk": chunk or "auto",
                   "split_dot": args.split_dot, "experts": e, "dim": d,
                   "rows": c, "bits": args.bits,
                   "sweep_mb": round(sweep_mb, 1)},
    }))


if __name__ == "__main__":
    main()
