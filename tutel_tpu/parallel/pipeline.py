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

__all__ = ["pipeline", "pipeline_1f1b", "stack_stage_params"]


def stack_stage_params(per_stage_params):
    """Stack a list of per-stage parameter pytrees along a new leading
    stage dim — the layout `pipeline` expects (sharded over `pp`)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def _is_spec(x):
    return x is None or isinstance(x, P)


def _full_param_specs(stacked_params, axis, stage_param_specs):
    """Prepend the stage axis to per-stage param specs (P(axis) for all
    leaves when no per-stage specs are given — PP-only, params
    replicated within a stage row)."""
    if stage_param_specs is None:
        return jax.tree.map(lambda _: P(axis), stacked_params)
    leaves, treedef = jax.tree.flatten(stacked_params)
    specs = jax.tree.flatten(stage_param_specs, is_leaf=_is_spec)[0]
    assert len(leaves) == len(specs), (len(leaves), len(specs))
    return jax.tree.unflatten(
        treedef, [P(axis, *(s or ())) for s in specs])


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


def _1f1b_local(stage_fn, loss_fn, axis, num_stages, n_micro, has_aux,
                data_axes, data_world, params_local, x_micro,
                stage_param_specs=None):
    """Per-device 1F1B training schedule; call inside shard_map.

    Interleaved forward/backward in lockstep SPMD: every tick each
    stage runs one (masked) forward slot and one (masked) backward
    slot, with both ppermutes issued unconditionally so collectives
    stay uniform across devices. Timing (double-slot ticks):

        fwd of micro m at stage s:   t = m + s
        bwd of micro m at stage s:   t = m + 2(S-1) - s

    so at most 2(S-1-s)+1 microbatch activations are in flight at
    stage s — bounded by the stage count, NOT by n_micro (the 1F1B
    memory property; GPipe-through-jax.grad stashes all n_micro).
    Backward recomputes the stage forward from the stashed *input*
    (activation recomputation, as in 1F1B-with-remat), so the stash
    holds one input per in-flight microbatch and nothing else.

    Returns (loss_sum, aux_sum, grads_local) — sums over this stage's
    microbatches; the caller psums/normalizes.
    """
    sid = lax.axis_index(axis)
    params_local = jax.tree.map(
        lambda p: jnp.squeeze(p, axis=0), params_local)

    def apply2(p, x):
        if has_aux:
            return stage_fn(p, x)
        return stage_fn(p, x), jnp.zeros((), jnp.float32)

    ticks = n_micro + 2 * (num_stages - 1)
    depth = 2 * (num_stages - 1) + 1          # stash slots; see timing
    mb_shape = x_micro.shape[1:]
    zeros_state = jnp.zeros(mb_shape, x_micro.dtype)
    stash0 = jnp.zeros((depth,) + mb_shape, x_micro.dtype)
    gacc0 = jax.tree.map(jnp.zeros_like, params_local)

    def tick(carry, t):
        fwd_state, bwd_state, stash, gacc, loss_acc, aux_acc = carry

        # ---- forward slot: micro m_f enters at stage 0, flows along
        m_f = t - sid
        valid_f = (m_f >= 0) & (m_f < n_micro)
        inj = lax.dynamic_index_in_dim(
            x_micro, jnp.clip(m_f, 0, n_micro - 1), 0, keepdims=False)
        x_in = jnp.where(sid == 0, inj, fwd_state)
        y, _ = apply2(params_local, x_in)
        slot_f = jnp.clip(m_f, 0, n_micro - 1) % depth
        stash = jnp.where(
            valid_f,
            lax.dynamic_update_index_in_dim(stash, x_in, slot_f, 0),
            stash)

        # ---- backward slot: recompute fwd from the stashed input,
        # seed the cotangent (loss grad at the last stage, the
        # ppermuted downstream grad elsewhere), accumulate param grads
        m_b = t - 2 * (num_stages - 1) + sid
        valid_b = (m_b >= 0) & (m_b < n_micro)
        slot_b = jnp.clip(m_b, 0, n_micro - 1) % depth
        x_b = lax.dynamic_index_in_dim(stash, slot_b, 0, keepdims=False)
        (y_b, aux_b), vjp_fn = jax.vjp(apply2, params_local, x_b)
        # the training loss is a mean over microbatches — seed 1/n_micro
        g_loss = jax.grad(lambda yy: loss_fn(yy))(y_b) / n_micro
        g_y = jnp.where(sid == num_stages - 1, g_loss, bwd_state)
        g_y = jnp.where(valid_b, g_y, jnp.zeros_like(g_y))
        # the stage's aux output is REPLICATED across the data axes
        # (the MoE body pmeans l_aux over its expert axes); under
        # manual per-device vjp each replica would seed the full
        # cotangent and the psum in the pmean transpose would
        # overcount data_world-fold — divide it out (shard_map's own
        # transpose does this via the P() out-spec in the GPipe path)
        aux_ct = jnp.where(
            valid_b, jnp.float32(1.0 / (n_micro * data_world)), 0.0)
        dp, dx = vjp_fn((g_y, aux_ct))
        gacc = jax.tree.map(lambda a, d: a + d, gacc, dp)

        last = sid == num_stages - 1
        loss_acc = loss_acc + jnp.where(
            valid_b & last, loss_fn(y_b).astype(jnp.float32), 0.0)
        aux_acc = aux_acc + jnp.where(
            valid_b, aux_b.astype(jnp.float32), 0.0)

        # ---- uniform collectives: activations forward, grads backward
        fwd_perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
        bwd_perm = [(i, (i - 1) % num_stages) for i in range(num_stages)]
        fwd_state = lax.ppermute(
            jnp.where(valid_f, y, jnp.zeros_like(y)), axis, fwd_perm)
        bwd_state = lax.ppermute(dx, axis, bwd_perm)

        return (fwd_state, bwd_state, stash, gacc, loss_acc,
                aux_acc), None

    carry0 = (zeros_state, zeros_state, stash0, gacc0,
              jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    (_, _, _, gacc, loss_acc, aux_acc), _ = lax.scan(
        tick, carry0, jnp.arange(ticks))

    # loss is computed per data shard (tokens sharded over data_axes
    # within the last stage's row) — sum the shards; aux is already
    # pmean'd across the expert axes inside the stage body
    loss = lax.psum(loss_acc, (axis,) + data_axes) / n_micro
    aux = lax.psum(aux_acc, axis) / n_micro
    if data_axes:
        aux = lax.pmean(aux, data_axes)
        # params replicated over a data axis see only that shard's
        # tokens — their grads are partial sums; param leaves sharded
        # over the axis (e.g. experts over 'e') already got the full
        # gradient through the a2a and must NOT be summed again
        gl, treedef = jax.tree.flatten(gacc)
        if stage_param_specs is None:
            specs = [()] * len(gl)
        else:
            specs = [tuple(a for s in (sp or ()) if s is not None
                           for a in ((s,) if isinstance(s, str) else s))
                     for sp in jax.tree.flatten(
                         stage_param_specs, is_leaf=_is_spec)[0]]
        gl = [lax.psum(g, tuple(a for a in data_axes if a not in sp))
              if any(a not in sp for a in data_axes) else g
              for g, sp in zip(gl, specs)]
        gacc = jax.tree.unflatten(treedef, gl)
    grads = jax.tree.map(lambda g: g[None], gacc)
    return loss, aux, grads


def pipeline_1f1b(stage_fn, loss_fn, num_stages, mesh, axis="pp",
                  n_micro=None, has_aux=False, data_spec=None,
                  stage_param_specs=None):
    """1F1B (one-forward-one-backward) pipelined *training step*.

    The reference has no pipeline parallelism at all (SURVEY.md §2.3);
    `pipeline` above gives the GPipe schedule via jax.grad, whose
    activation stash grows with n_micro. This explicit schedule
    interleaves each microbatch's backward with later microbatches'
    forwards, so at most 2(num_stages-1)+1 activations are live per
    stage regardless of n_micro, and parameter gradients accumulate
    per-stage on the device that owns them.

    stage_fn(stage_params, x) -> y (or (y, aux_scalar) with
    has_aux=True); must be shape-preserving. loss_fn(y) -> scalar is
    applied to each final-stage microbatch output.

    PP x EP / PP x DP composition: `data_spec` (a PartitionSpec over
    the per-microbatch dims, e.g. P('e')) shards tokens over further
    mesh axes within each stage row, and `stage_param_specs` (pytree of
    per-stage specs, e.g. P('e') on expert leaves) shards stage params
    — use MOELayer.local_forward as the stage body so its expert
    collectives ride the same mesh's ('e','r','g') axes.

    Returns fn(stacked_params, x) -> (loss, grads):
      loss = mean_micro loss_fn(y_m) + mean_micro sum_stage aux  (the
      same total `pipeline(...)` + jax.grad differentiates);
      grads: pytree like stacked_params (stage-sharded over `axis`).

    With `data_spec`, loss_fn sees each TOKEN SHARD of a microbatch
    and the shard losses are SUMMED — write loss_fn additive over rows
    (a token-sum, like summed cross-entropy; divide by the global
    token count inside it for mean semantics). A mean-style loss_fn
    over the shard would be implicitly scaled by the number of data
    shards. The gradients always match the loss actually returned.
    """
    if mesh.shape[axis] != num_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape[axis]}, "
            f"need num_stages={num_stages}")
    nm = n_micro or num_stages
    data_axes = tuple(a for s in (data_spec or ()) if s is not None
                      for a in ((s,) if isinstance(s, str) else s))

    data_world = 1
    for a in data_axes:
        data_world *= mesh.shape[a]
    local = functools.partial(
        _1f1b_local, stage_fn, loss_fn, axis, num_stages, nm, has_aux,
        data_axes, data_world, stage_param_specs=stage_param_specs)

    def fn(stacked_params, x):
        b = x.shape[0]
        if b % nm:
            raise ValueError(f"batch {b} not divisible by n_micro={nm}")
        xm = x.reshape((nm, b // nm) + x.shape[1:])
        pspecs = _full_param_specs(stacked_params, axis,
                                   stage_param_specs)
        xspec = P(None, *(data_spec or P()))
        shmapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(pspecs, xspec),
            out_specs=(P(), P(), pspecs),
            check_vma=False)
        loss, aux, grads = shmapped(stacked_params, xm)
        return loss + aux, grads

    return fn


def pipeline(stage_fn, num_stages, mesh, axis="pp", n_micro=None,
             remat=False, has_aux=False, data_spec=None,
             stage_param_specs=None):
    """Build a pipelined version of `stage_fn` over `mesh` axis `axis`.

    stage_fn(stage_params, x) -> y (or (y, aux_scalar) with
    has_aux=True, e.g. a MoE block returning its l_aux). Must be
    shape-preserving in x.

    PP x EP / PP x DP composition: `data_spec` (PartitionSpec over the
    per-microbatch dims, e.g. P('e')) shards tokens over further mesh
    axes within each stage row; `stage_param_specs` (pytree of
    per-stage specs) shards stage params — use MOELayer.local_forward
    as the stage body so its expert collectives ride the same mesh.

    Returns fn(stacked_params, x) -> y (or (y, aux_mean)):
      stacked_params: pytree with leading stage dim == num_stages
        (see `stack_stage_params`), sharded over `axis`;
      x: [batch, ...] — split into n_micro microbatches (batch must be
      divisible); outputs are re-concatenated and replicated across
      the stage axis (sharded over `data_spec` axes, if any).
    """
    if mesh.shape[axis] != num_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape[axis]}, "
            f"need num_stages={num_stages}")
    nm = n_micro or num_stages

    local = functools.partial(
        _gpipe_local, stage_fn, axis, num_stages, nm, remat, has_aux)

    def fn(stacked_params, x):
        b = x.shape[0]
        if b % nm:
            raise ValueError(
                f"batch {b} not divisible by n_micro={nm}")
        xm = x.reshape((nm, b // nm) + x.shape[1:])
        pspecs = _full_param_specs(stacked_params, axis,
                                   stage_param_specs)
        xspec = P(None, *(data_spec or P()))
        shmapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(pspecs, xspec),
            out_specs=(xspec, P()),
            check_vma=False)
        outs, aux = shmapped(stacked_params, xm)
        y = outs.reshape((b,) + x.shape[1:])
        return (y, aux) if has_aux else y

    return fn
