"""AOT compile-matrix probe: which (C, chunk) configs of the fused
FFN kernels actually fit VMEM on v5e?

The vmem_bytes / vmem_bytes_w8a8 ladders are conservative estimates;
this probe compiles the real kernels through libtpu (no hardware) at a
grid of row counts and chunk widths so the ladder can be calibrated to
measured compile outcomes instead of guesses. Prints one line per cell.

Run: python benchmarks/aot_vmem_probe.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import topologies
    from tutel_tpu.ops import quant
    from tutel_tpu.ops import fused_ffn_pallas as fp

    devs = list(topologies.get_topology_desc("v5e:2x4", "tpu").devices)
    rep = NamedSharding(Mesh(np.array(devs[:1]), ("d",)), P())

    def spec(a, dtype=None):
        if hasattr(a, "shape"):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep)
        return jax.ShapeDtypeStruct(a, dtype, sharding=rep)

    e_, k = 8, 2048
    fc1 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, k, k), jnp.float32)}, bits=4)["fc1_w"]
    stream = fp.prepare_fused_ffn(fc1, fc1)
    assert stream is not None

    for variant, fn, est in (
            ("weight_only", fp.fused_ffn_quant, fp.vmem_bytes),
            ("w4a8", fp.fused_ffn_w8a8, fp.vmem_bytes_w8a8)):
        for c in (32, 64, 128, 256, 512):
            for chunk in (512, 1024, 2048):
                def f(x, w, sb):
                    st = dataclasses.replace(stream, wstream=w, sb=sb)
                    return fn(x, st, chunk=chunk)
                try:
                    txt = jax.jit(f).lower(
                        spec((e_, c, k), jnp.bfloat16),
                        spec(stream.wstream), spec(stream.sb)
                    ).compile().as_text()
                    ok = "tpu_custom_call" in txt
                    msg = "OK" if ok else "NO-KERNEL"
                except Exception as ex:
                    msg = f"FAIL: {type(ex).__name__}: {str(ex)[:90]}"
                print(f"{variant} c={c} chunk={chunk} "
                      f"est={est(stream, c, jnp.bfloat16, chunk)/2**20:.1f}MB"
                      f" -> {msg}", flush=True)


if __name__ == "__main__":
    main()
