"""Variable-length collective demo (reference:
tutel/examples/nccl_all_to_all_v.py and nccl_all_gather_v.py).

Each device sends (device_id + 1) rows to every peer via
`net.batch_all_to_all_v`, then gathers its valid rows with
`net.batch_all_gather_v`, printing the exchanged blocks.

Run: python -m tutel_tpu.examples.all_to_all_v [--device cpu]
(use XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh)
"""

import argparse

import numpy as np


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from tutel_tpu import net

    devices = jax.devices()
    w = len(devices)
    mesh = Mesh(np.asarray(devices), ("x",))
    cap = args.capacity

    # device d's buffer: rows for peer p hold value 100*d + p
    blocks, counts = [], []
    for d in range(w):
        c = d + 1
        b = np.zeros((cap, args.cols), np.float32)
        for p in range(w):
            b[p * c:(p + 1) * c] = 100 * d + p
        blocks.append(b)
        counts.append(np.full((w,), c, np.int32))
    x = jnp.asarray(np.concatenate(blocks, 0))
    cs = jnp.asarray(np.concatenate(counts, 0))

    def body(xs, c):
        out, recv = net.batch_all_to_all_v(xs, c.reshape(-1), "x",
                                           output_size=cap)
        total = jnp.sum(recv)
        gathered, gcounts = net.batch_all_gather_v(
            out, total, "x", output_size=cap * w)
        return out, recv, gathered, gcounts

    out, recv, gathered, gcounts = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P("x"), P("x"), P(), P()), check_vma=False))(x, cs)
    out = np.asarray(out).reshape(w, cap, args.cols)
    recv = np.asarray(recv).reshape(w, w)
    for d in range(w):
        log(f"[device {d}] recv_counts = {recv[d].tolist()}, rows:")
        off = 0
        for s in range(w):
            rows = out[d, off:off + recv[d][s]]
            log(f"  from {s}: {rows[:, 0].tolist()}")
            off += recv[d][s]
    log(f"[all_gather_v] per-device valid rows = "
        f"{np.asarray(gcounts).tolist()}")
    return out, recv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--capacity", type=int, default=64)
    parser.add_argument("--cols", type=int, default=4)
    parser.add_argument("--device", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
