"""Parted: SPMD auto-partitioning for single-program graphs.

TPU-native re-conception of the reference's experimental "parted"
subsystem (reference tutel/parted/spmdx.py:17-597, solver.py:19-144,
patterns.py:12-129). Same capability: describe a computation as a graph
of einsum-style nodes, search per-node sharding states, and emit a
runnable distributed program. The division of labor is TPU-first:

  * the reference hand-codegens torch programs with explicit collectives
    chosen from 7 primitive rules; here the chosen plan is expressed as
    `jax.lax.with_sharding_constraint` annotations on a device mesh and
    **GSPMD inserts the collectives** — the solver ranks plans with an
    analytical collective-cost model (bytes over the mesh axis), and can
    re-rank the top candidates by measured wall-clock of the compiled
    programs (the reference's measured-cost loop, without mpiexec
    subprocesses: the programs are jit-compiled variants in-process);
  * sharding states mirror the reference vocabulary: dim index >= 0
    (partitioned along that output dim), -1 (replicated), -2 (ZeRO: a
    parameter stored sharded on its leading dim and all-gathered on use).

See tests/test_parted.py for the end-to-end flow: spec -> solve ->
compile -> numerics equal to the unsharded program, with the expected
collectives visible in the compiled HLO.
"""

from .spmdx import (  # noqa: F401
    Graph, Node, Parser, Config, init, data, param, custom, optimize,
    compile as compile_graph, session,
)
from . import solver  # noqa: F401
