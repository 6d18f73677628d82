"""tutel_tpu — a TPU-native Mixture-of-Experts framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
microsoft/tutel (reference: /root/reference): optimized sparse MoE dispatch,
dynamic capacity_factor / top-k / parallelism switching without recompilation
penalty, hierarchical (ICI x DCN) all-to-all, dropless grouped-GEMM experts
with fused INT8/INT4 dequantization, and elastic checkpointing.

Public facades (mirroring the reference's `tutel.moe` / `tutel.net` /
`tutel.system`, see reference tutel/__init__.py:4 and tutel/moe.py:6-12):

    from tutel_tpu import moe, net, system
"""

__version__ = "0.1.0"

from . import system  # noqa: F401  (session + mesh bootstrap)
from . import moe  # noqa: F401
from . import net  # noqa: F401
