"""Multi-process (multi-host) helloworld: one JAX process per host.

Launched through the launcher (reference: tutel/launcher/run.py:6-35 +
examples run under mpiexec, README.md:127-138):

    OMPI_COMM_WORLD_SIZE=2 OMPI_COMM_WORLD_RANK=r MASTER_PORT=p \
        python -m tutel_tpu.launcher.run -m \
        tutel_tpu.examples.helloworld_multiprocess

Each process rendezvouses via `jax.distributed.initialize`
(system.maybe_init_distributed), sees the *global* device view, and runs
the same SPMD training step; inputs and parameters are constructed as
global arrays with each process contributing its addressable shards.
Losses print identically on every rank — tests/test_launcher_e2e.py
asserts this across 2 localhost CPU processes.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--model_dim", type=int, default=32)
    parser.add_argument("--hidden_size", type=int, default=64)
    parser.add_argument("--num_steps", type=int, default=3)
    parser.add_argument("--use_2dh", action="store_true",
                        help="hierarchical 2DH all-to-all on a "
                             "(dcn=hosts, ici=local devices) mesh — "
                             "with >1 process the DCN leg crosses a "
                             "real process boundary")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tutel_tpu import moe, system

    env = system.init_data_model_parallel()   # rendezvous + global view
    devices = env.devices
    print(f"[rank {jax.process_index()}] world={len(devices)} devices, "
          f"{jax.process_count()} processes", flush=True)

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim, seeds=(1, 1, 1), group=devices,
        use_2dh=args.use_2dh,
        num_hosts=jax.process_count() if args.use_2dh else None)
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))

    # global input, identical on every process; sharded over the EP axes
    mesh = layer._mesh(max(layer.adaptive_degree, 1))
    host_x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1),
                          (args.num_samples, args.model_dim)))
    x = jax.make_array_from_callback(
        host_x.shape, NamedSharding(mesh, P(layer._ep_axes())),
        lambda idx: host_x[idx])

    lr = 1e-2
    for step in range(args.num_steps):
        def loss_fn(p):
            out, l_aux = layer(p, x, key=jax.random.PRNGKey(2),
                               training=True)
            return jnp.mean(out.astype(jnp.float32) ** 2) + l_aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                              params, grads)
        print(f"STEP-{step}: loss = {float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
