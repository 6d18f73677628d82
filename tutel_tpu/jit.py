"""Runtime kernel compilation facade (reference: tutel/jit.py,
tutel/impls/jit_compiler.py).

The reference JIT-compiles CUDA source strings (NVRTC/nvcc). On TPU,
runtime kernels are Pallas functions compiled by XLA — `compile` wraps
jax.jit and `pallas_kernel` builds a simple elementwise Pallas kernel from
a jnp function, covering the "define a custom kernel at runtime" use case
without source-string templating.
"""

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

compile = jax.jit


def pallas_kernel(fn, interpret=None):
    """Lift an elementwise jnp function into a Pallas TPU kernel.

    Example: double = jit.pallas_kernel(lambda x: x * 2); double(arr)
    """
    def kernel(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    def call(x):
        interp = (jax.devices()[0].platform != "tpu"
                  if interpret is None else interpret)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                                   if interp else pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY
                                   if interp else pltpu.VMEM),
            interpret=interp,
        )(x)
    return call
