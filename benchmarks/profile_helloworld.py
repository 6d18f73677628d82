"""Profile the helloworld training step and print top device ops.

Run: python benchmarks/profile_helloworld.py [--steps 5]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from profile_decode import summarize_xplane  # noqa: E402


def run(args):
    import jax
    from tutel_tpu import system
    from tutel_tpu.examples import helloworld

    dtype = "bfloat16" if jax.devices()[0].platform == "tpu" else "float32"
    hw_args = helloworld.build_args([
        "--batch_size", str(args.batch_size),
        "--num_tokens", str(args.num_tokens),
        "--model_dim", str(args.model_dim),
        "--hidden_size", str(args.hidden_size),
        "--num_local_experts", "2", "--top", "2",
        "--dtype", dtype, "--num_steps", str(args.steps), "--use_scan"])
    # warm (compiles)
    helloworld.run(hw_args, log=lambda *a, **k: None)
    logdir = args.logdir or tempfile.mkdtemp(prefix="tutel_prof_hw_")
    with system.profile_trace(logdir):
        helloworld.run(hw_args, log=lambda *a, **k: None)
    print(f"trace written to {logdir}")
    try:
        import json
        data = summarize_xplane(logdir)
        if isinstance(data, (str, bytes)):
            data = json.loads(data)
        rows = data[0]["rows"] if isinstance(data, list) else []
        print(f"{'op':70s} {'n':>4s} {'avg_us':>9s} {'dev%':>6s} "
              f"{'GB/s':>7s} {'bound':>5s}")
        for r in rows[: args.top_n]:
            c = [cell.get("v") for cell in r["c"]]
            print(f"{str(c[3])[:70]:70s} {int(c[4]):4d} {c[6]:9.1f} "
                  f"{c[9]*100:6.2f} {c[15]:7.1f} {str(c[17]):>5s}")
    except Exception as e:
        print(f"xplane summary failed ({type(e).__name__}: {e})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_tokens", type=int, default=1024)
    parser.add_argument("--model_dim", type=int, default=2048)
    parser.add_argument("--hidden_size", type=int, default=2048)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--top_n", type=int, default=20)
    parser.add_argument("--logdir", type=str, default="")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
