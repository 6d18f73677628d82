"""Pipeline parallelism (GPipe over a `pp` mesh axis).

Beyond-reference capability (SURVEY.md §2.3 marks PP ABSENT in the
reference). Tested in the reference's own style: pipelined execution
must be *equal* to the plain sequential stage chain, including
gradients and MoE aux losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tutel_tpu.parallel.pipeline import (pipeline, pipeline_1f1b,
                                         stack_stage_params)


def _mesh(n, axis="pp"):
    return jax.sharding.Mesh(np.array(jax.devices()[:n]), (axis,))


def _mlp_params(key, n_stages, dim, hidden):
    ks = jax.random.split(key, n_stages)
    per_stage = [
        {"w1": jax.random.normal(k, (dim, hidden)) * 0.1,
         "w2": jax.random.normal(jax.random.fold_in(k, 1),
                                 (hidden, dim)) * 0.1}
        for k in ks]
    return per_stage


def _mlp_stage(p, x):
    return x + jax.nn.gelu(x @ p["w1"]) @ p["w2"]


def _sequential(stage_fn, per_stage, x):
    for p in per_stage:
        x = stage_fn(p, x)
    return x


def test_pipeline_matches_sequential():
    n_stages, dim, hidden = 4, 16, 32
    per_stage = _mlp_params(jax.random.PRNGKey(0), n_stages, dim, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, dim))

    fn = pipeline(_mlp_stage, n_stages, _mesh(n_stages), n_micro=8)
    got = fn(stack_stage_params(per_stage), x)
    want = _sequential(_mlp_stage, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_grads_match_sequential():
    n_stages, dim, hidden = 4, 8, 16
    per_stage = _mlp_params(jax.random.PRNGKey(2), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, dim))
    fn = pipeline(_mlp_stage, n_stages, _mesh(n_stages), n_micro=4)

    def loss_pp(p):
        return jnp.sum(fn(p, x) ** 2)

    def loss_seq(stacked_p):
        per = [jax.tree.map(lambda l: l[i], stacked_p)
               for i in range(n_stages)]
        return jnp.sum(_sequential(_mlp_stage, per, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g_pp, g_seq)


def test_pipeline_remat_matches():
    n_stages, dim, hidden = 2, 8, 16
    per_stage = _mlp_params(jax.random.PRNGKey(4), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, dim))
    f0 = pipeline(_mlp_stage, n_stages, _mesh(n_stages), n_micro=4)
    f1 = pipeline(_mlp_stage, n_stages, _mesh(n_stages), n_micro=4,
                  remat=True)
    g0 = jax.grad(lambda p: jnp.sum(f0(p, x) ** 2))(stacked)
    g1 = jax.grad(lambda p: jnp.sum(f1(p, x) ** 2))(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
        g0, g1)


def test_pipeline_moe_stage_with_aux():
    """A MoE block as a pipeline stage: each stage owns its experts
    locally (EP-within-stage by layout); outputs and the accumulated
    l_aux equal the sequential per-microbatch chain."""
    from tutel_tpu import moe

    n_stages, dim = 2, 16
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 32},
        model_dim=dim, seeds=(1, 1, 1), group=jax.devices()[:1])
    per_stage = [layer.init(jax.random.PRNGKey(10 + i))
                 for i in range(n_stages)]
    key = jax.random.PRNGKey(42)

    def stage(p, x):
        out, l_aux = layer(p, x, key=key)
        return x + out, l_aux

    x = jax.random.normal(jax.random.PRNGKey(6), (12, dim))
    n_micro = 3
    fn = pipeline(stage, n_stages, _mesh(n_stages), n_micro=n_micro,
                  has_aux=True)
    got, got_aux = fn(stack_stage_params(per_stage), x)

    # sequential reference: chain stages per microbatch (l_aux is
    # batch-composition dependent, so the reference must microbatch too)
    mb = x.shape[0] // n_micro
    outs, auxes = [], []
    for i in range(n_micro):
        xi = x[i * mb:(i + 1) * mb]
        for p in per_stage:
            xi, a = stage(p, xi)
            auxes.append(a)
        outs.append(xi)
    want = jnp.concatenate(outs, axis=0)
    want_aux = sum(jnp.float32(a) for a in auxes) / n_micro

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got_aux), float(want_aux),
                               rtol=1e-5)


def _loss(y):
    return jnp.sum(y ** 2)


def test_1f1b_matches_sequential_grads():
    n_stages, dim, hidden, n_micro = 4, 8, 16, 6
    per_stage = _mlp_params(jax.random.PRNGKey(2), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(3), (24, dim))

    fn = pipeline_1f1b(_mlp_stage, _loss, n_stages, _mesh(n_stages),
                       n_micro=n_micro)
    loss1, g1 = jax.jit(fn)(stacked, x)

    def loss_seq(sp):
        per = [jax.tree.map(lambda l: l[i], sp) for i in range(n_stages)]
        xm = x.reshape(n_micro, -1, dim)

        def chain(xi):
            for p in per:
                xi = _mlp_stage(p, xi)
            return xi
        return jnp.mean(jax.vmap(lambda xi: _loss(chain(xi)))(xm))

    loss2, g2 = jax.value_and_grad(loss_seq)(stacked)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5), g1, g2)


def test_1f1b_n_micro_not_multiple_of_stages():
    n_stages, dim, hidden, n_micro = 2, 8, 16, 5
    per_stage = _mlp_params(jax.random.PRNGKey(8), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(9), (20, dim))
    fn = pipeline_1f1b(_mlp_stage, _loss, n_stages, _mesh(n_stages),
                       n_micro=n_micro)
    loss1, _ = jax.jit(fn)(stacked, x)

    def loss_seq(sp):
        per = [jax.tree.map(lambda l: l[i], sp) for i in range(n_stages)]
        xm = x.reshape(n_micro, -1, dim)

        def chain(xi):
            for p in per:
                xi = _mlp_stage(p, xi)
            return xi
        return jnp.mean(jax.vmap(lambda xi: _loss(chain(xi)))(xm))

    np.testing.assert_allclose(float(loss1), float(loss_seq(stacked)),
                               rtol=1e-6)


def test_1f1b_moe_stage_with_aux():
    """MoE stages: l_aux flows into the 1F1B loss and its gradients."""
    from tutel_tpu import moe

    n_stages, dim, n_micro = 2, 16, 3
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 4,
                 "hidden_size_per_expert": 32},
        model_dim=dim, seeds=(1, 1, 1), group=jax.devices()[:1])
    per_stage = [layer.init(jax.random.PRNGKey(10 + i))
                 for i in range(n_stages)]
    key = jax.random.PRNGKey(42)

    def stage(p, xx):
        out, l_aux = layer(p, xx, key=key)
        return xx + out, l_aux

    x = jax.random.normal(jax.random.PRNGKey(6), (12, dim))
    fn = pipeline_1f1b(stage, _loss, n_stages, _mesh(n_stages),
                       n_micro=n_micro, has_aux=True)
    loss1, g1 = jax.jit(fn)(stack_stage_params(per_stage), x)

    def loss_seq(sp):
        per = [jax.tree.map(lambda l: l[i], sp) for i in range(n_stages)]
        xm = x.reshape(n_micro, -1, dim)
        total = 0.0
        for i in range(n_micro):
            xi = xm[i]
            for p in per:
                xi, a = stage(p, xi)
                total = total + a
            total = total + _loss(xi)
        return total / n_micro

    loss2, g2 = jax.value_and_grad(loss_seq)(
        stack_stage_params(per_stage))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5), g1, g2)


def test_1f1b_bounded_activation_memory():
    """The 1F1B property: activation stash is bounded by the stage
    count, not n_micro. AOT-compile both schedules for a real v5e:2x4
    topology at n_micro=32 and inspect the compiled buffers:
    GPipe-through-jax.grad carries a per-tick residual stack with
    leading dim = n_micro + S - 1 (its largest buffer), while the
    explicit 1F1B schedule's largest buffer is just the replicated
    input batch — its stash is 2S-1 slots."""
    import re
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
        devs = topo.devices
    except Exception as e:
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    n_stages, dim, hidden, n_micro = 8, 512, 1024, 32
    ticks_gp = n_micro + n_stages - 1
    mesh = jax.sharding.Mesh(np.array(devs), ("pp",))
    per_stage = _mlp_params(jax.random.PRNGKey(0), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(1), (n_micro * 64, dim))

    def max_f32_buffer(txt):
        best, shape = 0, None
        for m in re.finditer(r"f32\[([0-9,]+)\]", txt):
            dims = [int(d) for d in m.group(1).split(",")]
            n = int(np.prod(dims))
            if n > best:
                best, shape = n, dims
        return best, shape

    f_1f1b = pipeline_1f1b(_mlp_stage, _loss, n_stages, mesh,
                           n_micro=n_micro)
    t1 = jax.jit(f_1f1b).lower(stacked, x).compile().as_text()

    f_gp = pipeline(_mlp_stage, n_stages, mesh, n_micro=n_micro)

    def gp_loss(p, x):
        y = f_gp(p, x)
        ym = y.reshape(n_micro, -1, dim)
        return jnp.mean(jax.vmap(_loss)(ym))

    t0 = jax.jit(jax.value_and_grad(gp_loss)).lower(stacked, x)\
        .compile().as_text()

    b1, s1 = max_f32_buffer(t1)
    b0, s0 = max_f32_buffer(t0)
    # GPipe's biggest buffer is the tick-indexed residual stack
    assert s0[0] == ticks_gp, (s0, ticks_gp)
    # 1F1B's biggest buffer must be well under it (measured: 4.2 MB
    # replicated input vs 10.2 MB residual stack at this config)
    assert b1 < 0.5 * b0, (s1, s0)


def _pp_ep_setup():
    """2 pipeline stages x 4-device EP rows on one ('pp','e','r','g')
    mesh: each stage's experts are sharded over its row via
    MOELayer.local_forward (true PP x EP composition — the reference
    has neither)."""
    from jax.sharding import PartitionSpec as P
    from tutel_tpu import moe

    devs = np.array(jax.devices()).reshape(2, 4, 1, 1)
    mesh = jax.sharding.Mesh(devs, ("pp", "e", "r", "g"))
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0,
                   "gate_noise": 0.0},
        experts={"type": "ffn", "num_experts_per_device": 2,
                 "hidden_size_per_expert": 32},
        model_dim=16, seeds=(1, 1, 1), group=jax.devices()[:4])
    per_stage = [layer.init(jax.random.PRNGKey(10 + i)) for i in range(2)]
    key = jax.random.PRNGKey(42)
    local = layer.local_forward(capacity_factor=1.0)

    def stage(p, xx):
        out, l_aux = local(p, xx, key)
        return xx + out, l_aux

    specs = {"gates": jax.tree.map(lambda _: None,
                                   per_stage[0]["gates"]),
             "experts": jax.tree.map(lambda _: P("e"),
                                     per_stage[0]["experts"])}
    x = jax.random.normal(jax.random.PRNGKey(6), (48, 16))
    return mesh, layer, per_stage, key, stage, specs, x, P


def test_pp_ep_forward_matches_layer():
    mesh, layer, per_stage, key, stage, specs, x, P = _pp_ep_setup()
    n_micro = 3
    fn = pipeline(stage, 2, mesh, n_micro=n_micro, has_aux=True,
                  data_spec=P("e"), stage_param_specs=specs)
    got, got_aux = jax.jit(fn)(stack_stage_params(per_stage), x)
    got = np.asarray(jax.device_get(got))

    mb = x.shape[0] // n_micro
    outs, auxes = [], []
    for i in range(n_micro):
        xi = x[i * mb:(i + 1) * mb]
        for p in per_stage:
            o, a = layer(p, xi, key=key)   # the layer's own 4-dev EP
            xi = xi + o
            auxes.append(float(a))
        outs.append(np.asarray(jax.device_get(xi)))
    np.testing.assert_allclose(got, np.concatenate(outs), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(float(got_aux),
                               sum(auxes) / n_micro, rtol=1e-5)


def test_pp_ep_1f1b_grads_match_sequential():
    mesh, layer, per_stage, key, stage, specs, x, P = _pp_ep_setup()
    n_micro = 3
    stacked = stack_stage_params(per_stage)

    fn = pipeline_1f1b(stage, _loss, 2, mesh, n_micro=n_micro,
                       has_aux=True, data_spec=P("e"),
                       stage_param_specs=specs)
    loss1, g1 = jax.jit(fn)(stacked, x)

    def seq_loss(sp):
        per = [jax.tree.map(lambda l: l[i], sp) for i in range(2)]
        mb = x.shape[0] // n_micro
        total = 0.0
        for i in range(n_micro):
            xi = x[i * mb:(i + 1) * mb]
            for p in per:
                o, a = layer(p, xi, key=key)
                xi = xi + o
                total = total + a
            total = total + _loss(xi)
        return total / n_micro

    loss2, g2 = jax.value_and_grad(seq_loss)(stacked)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=3e-5, atol=3e-5), g1, g2)


def test_pipeline_validates_shapes():
    n_stages, dim, hidden = 2, 8, 8
    per_stage = _mlp_params(jax.random.PRNGKey(7), n_stages, dim, hidden)
    fn = pipeline(_mlp_stage, n_stages, _mesh(n_stages), n_micro=4)
    with pytest.raises(ValueError, match="not divisible"):
        fn(stack_stage_params(per_stage),
           jnp.zeros((10, dim)))
    with pytest.raises(ValueError, match="mesh axis"):
        pipeline(_mlp_stage, 3, _mesh(2), n_micro=2)


def test_1f1b_data_parallel_tokens():
    """PP x DP: tokens sharded over a 'd' axis within each stage row;
    grads match the sequential token-sum reference (loss_fn must be
    additive over rows — see the pipeline_1f1b docstring)."""
    from jax.sharding import PartitionSpec as P

    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("pp", "d"))
    n_stages, dim, hidden, n_micro = 2, 8, 16, 3
    per_stage = _mlp_params(jax.random.PRNGKey(0), n_stages, dim, hidden)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, dim))

    fn = pipeline_1f1b(_mlp_stage, _loss, n_stages, mesh,
                       n_micro=n_micro, data_spec=P("d"),
                       stage_param_specs={"w1": None, "w2": None})
    loss1, g1 = jax.jit(fn)(stacked, x)

    def loss_seq(sp):
        per = [jax.tree.map(lambda l: l[i], sp) for i in range(n_stages)]
        xm = x.reshape(n_micro, -1, dim)

        def chain(xi):
            for p in per:
                xi = _mlp_stage(p, xi)
            return xi
        return jnp.mean(jax.vmap(lambda xi: _loss(chain(xi)))(xm))

    loss2, g2 = jax.value_and_grad(loss_seq)(stacked)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=2e-5, atol=2e-5), g1, g2)
