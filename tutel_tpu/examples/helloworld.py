"""Single-file MoE training benchmark (reference:
tutel/examples/helloworld.py).

Same model: a single MoE layer; loss = nll(log_softmax(sum(y, -1)), 0) over
the token axis; SGD(lr=1e-5); fixed seeds; per-step loss / step_time /
TFLOPS printout with the reference's formula (helloworld.py:149-150).

Run:  python -m tutel_tpu.examples.helloworld --batch_size 16
          --num_tokens 1024 --model_dim 2048 --hidden_size 2048
          --num_local_experts 2 --dtype float32 --top 2 [--device cpu]
"""

import argparse
import time


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_tokens", type=int, default=512)
    parser.add_argument("--model_dim", type=int, default=2048)
    parser.add_argument("--hidden_size", type=int, default=2048)
    parser.add_argument("--num_local_experts", type=int, default=2)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--fp32_gate", default=False, action="store_true")
    parser.add_argument("--top", type=int, default=2)
    parser.add_argument("--l_aux_wt", type=float, default=0.0)
    parser.add_argument("--a2a_ffn_overlap_degree", type=int, default=1)
    parser.add_argument("--num_steps", type=int, default=100)
    parser.add_argument("--parallel_type", type=str, default="adaptive:1")
    parser.add_argument("--checkpoint_path", type=str, default="")
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--use_2dh", default=False, action="store_true")
    parser.add_argument("--eval", default=False, action="store_true")
    parser.add_argument("--capacity_factor", type=float, default=1.0)
    parser.add_argument("--megablocks_size", type=int, default=0)
    parser.add_argument("--expert_type", type=str, default="ffn")
    parser.add_argument("--num_devices", type=int, default=0)
    parser.add_argument("--use_scan", default=False, action="store_true",
                        help="run all steps inside one jit via lax.scan; "
                        "step_time is then pure device time (excludes "
                        "per-step host dispatch latency)")
    return parser.parse_args(argv)


def run(args, log=print):
    """Build the model and run the training loop; returns per-step losses."""
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from tutel_tpu import moe, system

    dtype = {"float32": jnp.float32, "float64": jnp.float64,
             "float16": jnp.float16, "bfloat16": jnp.bfloat16}[args.dtype]
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    devices = jax.devices()
    if args.num_devices:
        devices = devices[:args.num_devices]
    env = system.init_data_model_parallel(devices=devices)

    layer = moe.moe_layer(
        gate_type={"type": "top", "k": args.top, "fp32_gate": args.fp32_gate,
                   "capacity_factor": args.capacity_factor},
        experts={"type": args.expert_type,
                 "num_experts_per_device": args.num_local_experts,
                 "hidden_size_per_expert": args.hidden_size},
        model_dim=args.model_dim,
        seeds=(1, 1, 1),
        a2a_ffn_overlap_degree=args.a2a_ffn_overlap_degree,
        parallel_type=args.parallel_type,
        use_2dh=args.use_2dh,
        dtype=dtype,
        group=env,
    )
    params = layer.init(jax.random.PRNGKey(1))
    if args.checkpoint_path:
        # reference helloworld.py:103-108: resume when the file exists.
        import os
        from tutel_tpu import checkpoint, system as _system
        path = _system.apply_rank_size_from_pattern(
            args.checkpoint_path, rank=0, size=1)
        if os.path.exists(path):
            params = layer.load_state_dict(
                params, checkpoint.serial.flatten_state(
                    checkpoint.load_state(path)))
            log(f"Checkpoint loaded from {path}.")
    params = layer.shard_params(params)

    num_global_experts = layer.num_global_experts
    local_count = sum(int(p.size) for _, p in
                      layer.get_parameter_iterator(params, "local_experts"))
    shared_count = sum(int(p.size) for _, p in
                       layer.get_parameter_iterator(params, "gate"))
    log("[Statistics] param count for MoE local_experts = %s, "
        "param count for MoE gate = %s." % (local_count, shared_count))

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch_size, args.num_tokens, args.model_dim),
                          dtype=jnp.float32).astype(dtype)
    y_label = jnp.zeros((args.batch_size,), dtype=jnp.int32)

    def loss_fn(params, x, key):
        out, l_aux = layer(params, x, key=key, training=not args.eval,
                           megablocks_size=args.megablocks_size)
        logits = jax.nn.log_softmax(
            jnp.sum(out.astype(jnp.float32), axis=2), axis=1)
        loss = -jnp.mean(logits[jnp.arange(logits.shape[0]), y_label])
        if args.l_aux_wt:
            loss = loss + args.l_aux_wt * l_aux
        return loss

    lr = 1e-5

    @jax.jit
    def train_step(params, x, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, key)
        new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                                  params, grads)
        return new_params, loss

    @jax.jit
    def eval_step(params, x, key):
        return loss_fn(params, x, key)

    tuples = (env.global_size, args.dtype, args.model_dim, args.hidden_size,
              args.batch_size * args.num_tokens, args.num_local_experts,
              args.top, args.a2a_ffn_overlap_degree, args.parallel_type,
              devices[0].platform)
    log("[Benchmark] world_size = %s, dtype = %s, model_dim = %s, "
        "hidden_size = %s, samples = %s, num_local_experts = %s, topK = %s, "
        "a2a_ffn_overlap_degree = %s, parallel_type = `%s`, device = `%s`"
        % tuples)

    if args.use_scan:
        # One jit for the whole loop: the TPU-idiomatic training driver.
        # Key sequence matches the per-step loop below exactly.
        from jax import lax

        def one_step(carry, _):
            params, key = carry
            key, step_key = jax.random.split(key)
            if args.eval:
                loss = loss_fn(params, x, step_key)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, x,
                                                          step_key)
                params = jax.tree.map(
                    lambda p, g: p - lr * g.astype(p.dtype), params, grads)
            return (params, key), loss

        def make_run_all(length):
            @jax.jit
            def run_all(params, key):
                (params, _), losses = lax.scan(
                    one_step, (params, key), None, length=length)
                return params, losses
            return run_all

        run_all = make_run_all(args.num_steps)
        new_params, losses_arr = run_all(params, jax.random.PRNGKey(1))
        float(losses_arr[-1])                           # compile + run
        # Timing by loop differencing: run n steps and 3n steps and take
        # the slope. This cancels the fixed per-dispatch cost exactly —
        # on a remote-attached device the dispatch round-trip is both
        # large and variable, so a single-loop measurement carries an
        # unknowable additive error. Inputs differ per run (a repeated
        # identical (executable, args) pair may be served from cache),
        # and completion is forced by fetching a scalar.
        run_all3 = make_run_all(3 * args.num_steps)
        _, l3 = run_all3(new_params, jax.random.PRNGKey(3))
        float(l3[-1])                                   # compile + run

        def timed(fn, p, seed):
            t0 = time.perf_counter()
            _, ls = fn(p, jax.random.PRNGKey(seed))
            float(ls[-1])
            return time.perf_counter() - t0

        t1 = min(timed(run_all, new_params, 5), timed(run_all, new_params, 7))
        t3 = min(timed(run_all3, new_params, 9), timed(run_all3, new_params, 11))
        average_time = max(t3 - t1, 1e-9) / (2 * args.num_steps)
        params = new_params
        losses = [float(l) for l in losses_arr]
        mm_ceof = 1 if args.eval else 3
        cap_ceof = min(args.top, num_global_experts)
        tflops = (args.batch_size * args.num_tokens * args.model_dim *
                  args.hidden_size) * 4 * mm_ceof * cap_ceof * 1e-12 \
            / average_time
        for i, loss_f in enumerate(losses):
            log("STEP-%s: loss = %.5f, step_time = %.6f sec, "
                "perf = %.2f tflops." % (i, loss_f, average_time, tflops))
        log("\n[Summary] Average synchronized step_time = %s sec."
            % average_time)
        if args.checkpoint_path:
            from tutel_tpu import checkpoint, system as _system
            path = _system.apply_rank_size_from_pattern(
                args.checkpoint_path, rank=0, size=1)
            checkpoint.save_state(path, checkpoint.serial.unflatten_state(
                layer.state_dict(params)))
            log(f"Checkpoint saved to {path}.")
        return losses, average_time

    average_time, losses = 0.0, []
    key = jax.random.PRNGKey(1)
    for i in range(args.num_steps):
        key, step_key = jax.random.split(key)
        t_start = time.perf_counter()
        if args.eval:
            loss = eval_step(params, x, step_key)
            jax.block_until_ready(loss)
        else:
            params, loss = train_step(params, x, step_key)
            jax.block_until_ready(loss)
        t_stop = time.perf_counter()

        mm_ceof = 1 if args.eval else 3
        cap_ceof = min(args.top, num_global_experts)
        step_time = t_stop - t_start
        tflops = (args.batch_size * args.num_tokens * args.model_dim *
                  args.hidden_size) * 4 * mm_ceof * cap_ceof * 1e-12 / step_time
        loss_f = float(loss)
        losses.append(loss_f)
        log("STEP-%s: loss = %.5f, step_time = %.6f sec, perf = %.2f tflops."
            % (i, loss_f, step_time, tflops))
        if i + 10 >= args.num_steps:
            average_time += step_time

    average_time /= min(10, args.num_steps)
    log("\n[Summary] Average synchronized step_time = %s sec." % average_time)

    if args.checkpoint_path:
        from tutel_tpu import checkpoint, system as _system
        path = _system.apply_rank_size_from_pattern(
            args.checkpoint_path, rank=0, size=1)
        checkpoint.save_state(
            path, checkpoint.serial.unflatten_state(layer.state_dict(params)))
        log(f"Checkpoint saved to {path}.")
    return losses, average_time


def main():
    args = build_args()
    run(args)


if __name__ == "__main__":
    main()
