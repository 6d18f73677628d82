"""Measured-cost config autotuning.

The reference ships "parted", an experimental SPMD auto-partitioner that
searches per-op sharding states with measured wall-clock costs
(reference tutel/parted/spmdx.py, solver.py, patterns.py). On TPU, XLA's
GSPMD already solves op-level partitioning from sharding annotations, so
the honest equivalent keeps only the part GSPMD cannot decide: *measured*
selection among semantically-equal parallelism configs of the MoE layer
(adaptive_r, a2a overlap degree, 2DH on/off, capacity bucket) — the same
role as parted's Program.execute cost probe (reference spmdx.py:133-176,
executor.py:106-115), without the mpiexec subprocess choreography.
"""

from .tuner import tune, tune_moe, moe_candidates, ConfigStore  # noqa: F401
