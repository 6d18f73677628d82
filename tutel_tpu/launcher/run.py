"""Multi-host launcher (reference: tutel/launcher/run.py:6-35).

The reference maps OpenMPI env vars onto `torch.distributed.run` and
re-execs. The TPU-native equivalent maps the same launch conventions onto
`jax.distributed.initialize` env vars and execs the target module — one
process per host (JAX drives all local chips from a single process, so
there is no per-device process spawn and no NUMA/CUDA sandbox step,
reference launcher/execl.py:17-42).

Accepted sources for (coordinator, world, rank), first match wins:
  1. explicit flags --coordinator/--nnodes/--node_rank
  2. OpenMPI:  OMPI_COMM_WORLD_SIZE / OMPI_COMM_WORLD_RANK +
               MASTER_ADDR[:MASTER_PORT]
  3. TPU pod metadata (jax.distributed.initialize() with no args)

Usage:
    mpiexec -host h1,h2 python3 -m tutel_tpu.launcher.run \
        -m tutel_tpu.examples.helloworld --batch_size=16
"""

import argparse
import os
import sys


def resolve_env(args, env=None):
    """Compute the TUTEL_TPU_* bootstrap env (pure; testable)."""
    env = dict(env if env is not None else os.environ)
    out = {}
    if args.coordinator:
        out["TUTEL_TPU_COORDINATOR"] = args.coordinator
        out["TUTEL_TPU_NUM_PROCESSES"] = str(args.nnodes)
        out["TUTEL_TPU_PROCESS_ID"] = str(args.node_rank)
    elif "OMPI_COMM_WORLD_SIZE" in env:
        host = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "8799")
        out["TUTEL_TPU_COORDINATOR"] = f"{host}:{port}"
        out["TUTEL_TPU_NUM_PROCESSES"] = env["OMPI_COMM_WORLD_SIZE"]
        out["TUTEL_TPU_PROCESS_ID"] = env["OMPI_COMM_WORLD_RANK"]
    # else: leave empty -> jax.distributed.initialize() auto-detects the
    # TPU pod topology from the runtime metadata.
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", dest="module", type=str, required=True)
    parser.add_argument("--coordinator", type=str, default="")
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node_rank", type=int, default=0)
    args, rest = parser.parse_known_args(argv)

    os.environ.update(resolve_env(args))
    os.environ.setdefault("TUTEL_TPU_AUTO_DISTRIBUTED", "1")
    cmd = [sys.executable, "-m", args.module] + rest
    os.execl(sys.executable, *cmd)


if __name__ == "__main__":
    main()
