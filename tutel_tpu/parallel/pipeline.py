"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2.3: "ABSENT — no
pipeline-stage scheduling anywhere in the repo"); this is a
beyond-reference capability, designed TPU-first:

  * one `shard_map` over a `pp` mesh axis; stage s owns its stage's
    parameters (stacked pytree leaves sharded on the leading dim);
  * the microbatch rotation is a `lax.scan` over n_micro + S - 1 ticks.
    At tick t, stage s processes microbatch (t - s); activations move to
    stage s+1 via `lax.ppermute` — ICI neighbor traffic, which is
    exactly what a TPU torus is built for;
  * bubbles are masked with `where`, so the schedule is fully static
    (no data-dependent control flow) and differentiable end-to-end —
    `jax.grad` through the scan gives the standard GPipe backward
    schedule for free;
  * `remat=True` wraps each stage application in `jax.checkpoint`
    (recompute activations in backward — the GPipe memory trade).

Stages must be shape-preserving (standard transformer blocks);
embed/unembed live outside the pipelined middle. A stage function may
be a MoE block: a single-device-configured `MOELayer` composes directly
(its world_size==1 forward contains no collectives, so each pipeline
stage owns its experts locally — EP *within* a stage composes by
layout: experts of stage s live on stage s's device row).

Example
-------
    mesh = jax.make_mesh((4,), ("pp",))
    fn = pipeline(stage_fn, num_stages=4, mesh=mesh, n_micro=8)
    y = fn(stacked_params, x)          # x: [batch, ...]
    # training: losses = jax.grad(lambda p: loss(fn(p, x)))(params)
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def stack_stage_params(per_stage_params):
    """Stack a list of per-stage parameter pytrees along a new leading
    stage dim — the layout `pipeline` expects (sharded over `pp`)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def _gpipe_local(stage_fn, axis, num_stages, n_micro, remat, has_aux,
                 params_local, x_micro):
    """Per-device GPipe schedule; call inside shard_map over `axis`.

    params_local: this stage's params (leading stage dim of size 1).
    x_micro: [n_micro, mb, ...] microbatched input, replicated.
    Returns ([n_micro, mb, ...], aux_sum) — outputs valid on every
    device (masked psum replicates the last stage's collection).
    """
    sid = lax.axis_index(axis)
    params_local = jax.tree.map(
        lambda p: jnp.squeeze(p, axis=0), params_local)

    apply_fn = stage_fn
    if not has_aux:
        def apply_fn(p, x):
            return stage_fn(p, x), jnp.zeros((), jnp.float32)
    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    ticks = n_micro + num_stages - 1
    state0 = jnp.zeros_like(x_micro[0])
    outs0 = jnp.zeros_like(x_micro)

    def tick(carry, t):
        state, outs, aux = carry
        # stage 0 injects microbatch t (bubble ticks keep rotating state;
        # their results are masked out at collection)
        inj = lax.dynamic_index_in_dim(
            x_micro, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        state = jnp.where((sid == 0) & (t < n_micro), inj, state)

        y, a = apply_fn(params_local, state)

        # this device's tick is a real microbatch iff 0 <= t - sid < n_micro
        m = t - sid
        valid = (m >= 0) & (m < n_micro)
        aux = aux + jnp.where(valid, a.astype(jnp.float32), 0.0)

        # last stage collects microbatch m
        oidx = jnp.clip(m, 0, n_micro - 1)
        collect = (sid == num_stages - 1) & valid
        outs = jnp.where(
            collect,
            lax.dynamic_update_index_in_dim(outs, y, oidx, 0), outs)

        # rotate activations to the next stage (ICI neighbor hop)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
        state = lax.ppermute(y, axis, perm)
        return (state, outs, aux), None

    (state, outs, aux), _ = lax.scan(
        tick, (state0, outs0, jnp.zeros((), jnp.float32)),
        jnp.arange(ticks))

    # replicate: only the last stage holds the collected outputs; each
    # stage holds its own share of the aux sum
    outs = lax.psum(
        jnp.where(sid == num_stages - 1, outs, jnp.zeros_like(outs)),
        axis)
    aux = lax.psum(aux, axis) / n_micro
    return outs, aux


def pipeline(stage_fn, num_stages, mesh, axis="pp", n_micro=None,
             remat=False, has_aux=False):
    """Build a pipelined version of `stage_fn` over `mesh` axis `axis`.

    stage_fn(stage_params, x) -> y (or (y, aux_scalar) with
    has_aux=True, e.g. a MoE block returning its l_aux). Must be
    shape-preserving in x.

    Returns fn(stacked_params, x) -> y (or (y, aux_mean)):
      stacked_params: pytree with leading stage dim == num_stages
        (see `stack_stage_params`), sharded over `axis`;
      x: [batch, ...] — split into n_micro microbatches (batch must be
        divisible); outputs are re-concatenated and replicated.
    """
    if mesh.shape[axis] != num_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape[axis]}, "
            f"need num_stages={num_stages}")
    nm = n_micro or num_stages

    local = functools.partial(
        _gpipe_local, stage_fn, axis, num_stages, nm, remat, has_aux)

    other = tuple(a for a in mesh.axis_names if a != axis)

    def fn(stacked_params, x):
        b = x.shape[0]
        if b % nm:
            raise ValueError(
                f"batch {b} not divisible by n_micro={nm}")
        xm = x.reshape((nm, b // nm) + x.shape[1:])
        pspecs = jax.tree.map(lambda _: P(axis), stacked_params)
        shmapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(pspecs, P()),
            out_specs=(P(), P()),
            check_vma=False)
        outs, aux = shmapped(stacked_params, xm)
        y = outs.reshape((b,) + x.shape[1:])
        return (y, aux) if has_aux else y

    return fn
