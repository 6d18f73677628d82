"""Graph IR + program emission for the parted SPMD partitioner.

The IR is the reference's einsum-like spec language (reference
tutel/parted/spmdx.py:70-119: `"NM = NK, KM+"` — left of `=` the output
dims, comma-separated inputs on the right, trailing `+` marks a sum
reduction over the dims that vanish from the output). Nodes are data
(activations entering per step), params (weights), and ops (einsum specs
or custom jnp functions). Shape and FLOP inference come from the spec.

Program emission is where the TPU-native design departs from the
reference's codegen (spmdx.py:419-516): a plan maps each node to a
sharding state; `compile()` returns a `Program` whose jitted function
evaluates the graph with `with_sharding_constraint` at every node —
GSPMD materializes the collectives the reference emitted by hand.
"""

import itertools
import string
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


class _Session:
    def __init__(self):
        self.mesh = None
        self.axis = "p"
        self.world = 1


session = _Session()


def init(devices=None, axis_name="p"):
    """Create the partitioning session over a 1-D device mesh.

    reference spmdx.py:17-36 `init(backend_name)`; the jax backend is the
    only one here, so the argument is the device list."""
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    session.mesh = Mesh(np.array(devices), (axis_name,))
    session.axis = axis_name
    session.world = len(devices)
    return session


class Parser:
    """Parse `"NM = NK, KM+"` into per-operand dim letters.

    reference spmdx.py:70-119 (Mapper2D/Parser). Reduce markers: `+` is
    sum over the letters present in inputs but absent from the output.
    """

    def __init__(self, ir: str):
        left, rights = ir.split("=")
        left, rights = left.strip(), rights.strip()
        self.reduce_type = ""
        # the reduce marker may trail either side of the '='
        if rights and rights[-1] in "+<>[]":
            rights, self.reduce_type = rights[:-1], rights[-1]
        if left and left[-1] in "+<>[]":
            left, self.reduce_type = left[:-1], left[-1]
        self.out_dims = list(left.strip())
        self.in_dims = [list(r.strip()) for r in rights.split(",")]
        in_letters = set(itertools.chain.from_iterable(self.in_dims))
        self.reduce_axes = sorted(in_letters - set(self.out_dims))
        if self.reduce_axes and not self.reduce_type:
            raise ValueError(
                f"spec '{ir}' drops dims {self.reduce_axes} without a "
                "reduce marker (append '+')")

    def einsum_expr(self):
        lower = {c: c.lower() for c in set(
            itertools.chain.from_iterable(self.in_dims + [self.out_dims]))}
        ins = ",".join("".join(lower[c] for c in d) for d in self.in_dims)
        return f"{ins}->{''.join(lower[c] for c in self.out_dims)}"


class Node:
    def __init__(self, name, op_type, shape, dtype, ir=None, inputs=(),
                 fn=None):
        self.name = name
        self.op_type = op_type            # 'data' | 'param' | 'op'
        self.shape = tuple(int(s) for s in shape)
        self.dtype = dtype
        self.ir = ir
        self.parser = Parser(ir) if ir else None
        self.inputs: List[Node] = list(inputs)
        self.fn = fn
        self.consumers: List[Node] = []
        for i in self.inputs:
            i.consumers.append(self)

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    def flops(self):
        """2 * prod(all letter extents) for reduce-einsums, else out size."""
        if self.parser is None or not self.parser.reduce_axes:
            return self.size
        extents = dict(self.letter_extents())
        total = 1
        for v in extents.values():
            total *= v
        return 2 * total

    def letter_extents(self):
        assert self.parser is not None
        out = {}
        for dims, node in zip(self.parser.in_dims, self.inputs):
            assert len(dims) == len(node.shape), (self.name, dims,
                                                  node.shape)
            for letter, extent in zip(dims, node.shape):
                prev = out.setdefault(letter, int(extent))
                assert prev == int(extent), (
                    f"{self.name}: dim {letter} mismatch {prev} vs {extent}")
        return out

    def __repr__(self):
        return f"Node({self.name}:{self.op_type}{list(self.shape)})"


class Graph:
    def __init__(self, outputs: Sequence[Node]):
        self.outputs = list(outputs)
        self.nodes = self._toposort()

    def _toposort(self):
        seen, order = set(), []

        def visit(n):
            if id(n) in seen:
                return
            seen.add(id(n))
            for i in n.inputs:
                visit(i)
            order.append(n)

        for o in self.outputs:
            visit(o)
        return order


_counter = itertools.count()


def data(shape, dtype="float32", name=None):
    """Per-step input tensor (reference spmdx.py:584 `Tensor`)."""
    return Node(name or f"data{next(_counter)}", "data", shape, dtype)


def param(shape, dtype="float32", name=None):
    """Trainable parameter (ZeRO state -2 becomes legal for these)."""
    return Node(name or f"param{next(_counter)}", "param", shape, dtype)


def custom(ir, inputs, dtype=None, name=None, fn=None):
    """Op node from an einsum-style spec (reference spmdx.py:183-253
    `Custom`). `fn` overrides the default jnp.einsum evaluation (it still
    must match the spec's shapes)."""
    parser = Parser(ir)
    extents = {}
    for dims, node in zip(parser.in_dims, inputs):
        for letter, extent in zip(dims, node.shape):
            extents[letter] = int(extent)
    shape = tuple(extents[c] for c in parser.out_dims)
    return Node(name or f"op{next(_counter)}", "op", shape,
                dtype or inputs[0].dtype, ir=ir, inputs=inputs, fn=fn)


# ---------------------------------------------------------------------------
# Sharding states and plan application
# ---------------------------------------------------------------------------

REPLICATED = -1
ZERO = -2      # stored sharded on leading dim, gathered on use (params)


class Config(dict):
    """node name -> state (dim index, REPLICATED, or ZERO)."""

    @staticmethod
    def default(graph: Graph):
        return Config({n.name: REPLICATED for n in graph.nodes})


def _spec_for(node: Node, state: int, axis: str):
    from jax.sharding import PartitionSpec as P
    if state == REPLICATED:
        return P()
    if state == ZERO:
        spec = [None] * len(node.shape)
        spec[0] = axis
        return P(*spec)
    spec = [None] * len(node.shape)
    spec[state] = axis
    return P(*spec)


def compile(outputs, config: Config):
    """Emit a runnable SPMD program for the chosen plan.

    Returns a Program: calling it evaluates the graph under jit with
    every node constrained to its planned sharding; GSPMD inserts the
    collectives (the reference's codegen + primitive connectors,
    backend/torch/config.py:35-75, collapse into these constraints).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    assert session.mesh is not None, "call parted.init() first"
    graph = Graph(outputs if isinstance(outputs, (list, tuple))
                  else [outputs])
    mesh, axis = session.mesh, session.axis

    leaves = [n for n in graph.nodes if n.op_type in ("data", "param")]

    def run(*arrays):
        env = {}
        for node, arr in zip(leaves, arrays):
            c = jax.lax.with_sharding_constraint(
                arr, NamedSharding(mesh, _spec_for(
                    node, config.get(node.name, REPLICATED), axis)))
            env[node.name] = c
        for node in graph.nodes:
            if node.op_type != "op":
                continue
            ins = [env[i.name] for i in node.inputs]
            if node.fn is not None:
                val = node.fn(*ins)
            else:
                val = jnp.einsum(node.parser.einsum_expr(), *ins)
            state = config.get(node.name, REPLICATED)
            env[node.name] = jax.lax.with_sharding_constraint(
                val, NamedSharding(mesh, _spec_for(node, state, axis)))
        outs = [env[o.name] for o in graph.outputs]
        return outs[0] if len(outs) == 1 else tuple(outs)

    fn = jax.jit(run)
    return Program(fn, graph, config, leaves)


class Program:
    """Compiled plan (reference spmdx.py:133-176 `Program`): callable,
    inspectable (compiled HLO), and timeable."""

    def __init__(self, fn, graph, config, leaves):
        self.fn = fn
        self.graph = graph
        self.config = config
        self.leaves = leaves

    def __call__(self, *arrays):
        return self.fn(*arrays)

    def example_inputs(self, seed=0):
        import jax
        import jax.numpy as jnp
        keys = jax.random.split(jax.random.PRNGKey(seed),
                                max(len(self.leaves), 1))
        return [jax.random.normal(k, n.shape, jnp.float32) * 0.1
                for k, n in zip(keys, self.leaves)]

    def compiled_text(self):
        args = self.example_inputs()
        return self.fn.lower(*args).compile().as_text()

    def execute(self, steps=5, warmup=2, seed=0):
        """Measured average step time (reference executor.py:47-115's
        5-warmup/5-avg loop, in-process)."""
        import time
        import jax
        import jax.numpy as jnp

        def force(out):
            # scalar fetch: completion-safe even on remote device channels
            return float(jnp.sum(jax.tree.leaves(out)[0]))

        args = self.example_inputs(seed)
        for _ in range(warmup):
            force(self.fn(*args))
        t0 = time.perf_counter()
        for _ in range(steps):
            force(self.fn(*args))
        return (time.perf_counter() - t0) / steps


def optimize(outputs, top_k=1, measure=False, max_candidates=8):
    """Search sharding plans (reference spmdx.py:528-543 `optimize` +
    solver.solve_partition). Analytical ranking by modeled collective
    bytes; optionally re-rank the best `max_candidates` by measured step
    time of the compiled programs."""
    from . import solver as solver_mod

    graph = Graph(outputs if isinstance(outputs, (list, tuple))
                  else [outputs])
    ranked = solver_mod.solve_partition(graph, session.world)
    if measure:
        timed = []
        for cost, cfg in ranked[:max_candidates]:
            prog = compile(graph.outputs, cfg)
            timed.append((prog.execute(), cfg))
        timed.sort(key=lambda t: t[0])
        ranked = timed
    return ranked[:top_k] if top_k else ranked
