"""Collective bandwidth microbenchmark (reference:
tutel/examples/bandwidth_test.py:28-47).

Measures achieved GB/s for AllToAll / AllReduce / AllGather / ReduceScatter
over the device mesh. Algorithmic bandwidth convention matches the
reference: bytes = payload size, time = wall per op (chained in-jit so the
measurement is device time, not dispatch latency).

Run: python -m tutel_tpu.examples.bandwidth_test --size_mb 64 [--device cpu]
"""

import argparse
import time

import numpy as np


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    devices = jax.devices()
    if args.num_devices:
        devices = devices[:args.num_devices]
    w = len(devices)
    mesh = Mesh(np.asarray(devices), ("x",))
    n = args.size_mb * 1024 * 1024 // 4 // (w * w) * (w * w)
    # per-device block is [w, n/(w*w)] so the a2a split axis divides w
    x = jnp.arange(n, dtype=jnp.float32).reshape(w * w, -1)

    ops = {
        "AllToAll": lambda t: lax.all_to_all(
            t, "x", split_axis=0, concat_axis=0, tiled=True),
        "AllReduce": lambda t: lax.psum(t, "x"),
        "AllGather": lambda t: lax.all_gather(
            t, "x", axis=0, tiled=True)[: t.shape[0]],
        "ReduceScatter": lambda t: jnp.tile(lax.psum_scatter(
            t, "x", scatter_dimension=0, tiled=True), (w, 1)),
    }
    results = {}
    for name, op in ops.items():
        def chained(t):
            def body(i, acc):
                return op(acc * 1.0000001)
            return lax.fori_loop(0, args.iters, body, t)
        f = jax.jit(jax.shard_map(chained, mesh=mesh, in_specs=P("x"),
                                  out_specs=P("x"), check_vma=False))
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.iters
        gbs = x.size * 4 / dt / 1e9
        results[name] = gbs
        log("[%s] % 10.3f GB/s  (%.3f ms, %d devices, %d MB)" %
            (name, gbs, dt * 1e3, w, x.size * 4 // 2**20))
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size_mb", type=int, default=64)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--num_devices", type=int, default=0)
    run(parser.parse_args())


if __name__ == "__main__":
    main()
