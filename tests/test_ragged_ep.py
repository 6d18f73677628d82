"""True-dropless ragged EP (ops/ragged_ep.py) vs the padded dropless path.

Both compute the same math; ragged ships only routed tokens through
lax.ragged_all_to_all (SURVEY.md section 7 step 6's full form)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe


def _layer(postscore=True, nle=2, hidden=64, model_dim=32):
    return moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
        experts={"type": "ffn", "num_experts_per_device": nle,
                 "hidden_size_per_expert": hidden},
        model_dim=model_dim, seeds=(1, 1, 1), is_postscore=postscore,
        group=jax.devices()[:8])


@pytest.mark.parametrize("postscore", [True, False])
def test_ragged_matches_padded(postscore):
    layer = _layer(postscore)
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    ref, la1 = layer(params, x)
    out, la2 = layer(params, x, use_ragged_ep=True)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel
    assert abs(float(la1) - float(la2)) < 1e-6


def test_ragged_imbalanced_routing():
    """Biased gate -> heavy expert imbalance; the ragged path must carry
    the load exactly (max_recv generous)."""
    layer = _layer()
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    # bias the gate toward expert 0 so one device gets most tokens
    g0 = dict(params["gates"][0])
    g0["wg"] = g0["wg"].at[:, 0].add(3.0)
    params = dict(params)
    params["gates"] = [g0]
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    ref, _ = layer(params, x)
    out, _ = layer(params, x, use_ragged_ep=True, max_recv=1024)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


def test_ragged_skewed_routing_default_bound():
    """Advisor round-1 high finding: with a gate collapsed toward expert 0
    the old default max_recv (2*top_k*local) silently truncated (~0.39 rel
    error). The default now probes the real receive bound, so no explicit
    max_recv is needed even under full collapse."""
    layer = _layer()
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    g0 = dict(params["gates"][0])
    g0["wg"] = g0["wg"].at[:, 0].add(30.0)     # full collapse onto expert 0
    params = dict(params)
    params["gates"] = [g0]
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    ref, _ = layer(params, x)
    out, _ = layer(params, x, use_ragged_ep=True)   # default sizing
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


def test_resolve_max_recv_under_jit():
    """resolve_max_recv gives a tight bucketed bound usable as max_recv
    inside an enclosing jit; worst case is never exceeded."""
    layer = _layer()
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    bound = layer.resolve_max_recv(params, x)
    assert 0 < bound <= 2 * 256           # top_k * global tokens
    ref, _ = layer(params, x)

    @jax.jit
    def run(p, xx):
        out, _ = layer(p, xx, use_ragged_ep=True, max_recv=bound)
        return out
    out = run(params, x)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


def test_ragged_guard_rails():
    layer = _layer()
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    with pytest.raises(AssertionError):
        layer(params, x, use_ragged_ep=True, capacity_factor=1.0)


def test_ragged_training_grads_match_padded():
    """Ragged EP differentiates (custom-VJP ragged exchanges +
    permutation gathers); grads match the padded dropless path."""
    layer = _layer()
    params = layer.shard_params(layer.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    key = jax.random.PRNGKey(5)
    cap = layer.resolve_capacity(params, x, training=True)

    def loss(p, ragged):
        kwargs = dict(use_ragged_ep=True, max_recv=1024) if ragged \
            else dict(capacity_override=cap)
        out, l_aux = layer(p, x, key=key, training=True, **kwargs)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3 + l_aux

    g_pad = jax.grad(lambda p: loss(p, False))(params)
    g_rag = jax.grad(lambda p: loss(p, True))(params)
    for (n1, a), (n2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_pad),
            jax.tree_util.tree_leaves_with_path(g_rag)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(n1))


@pytest.mark.parametrize("bits", [8, 4])
def test_ragged_ep_quantized(bits):
    """INT8/INT4 weights through the ragged EP path (fused-dequant kernel
    on the ragged layout) track the fp32 padded path within budget."""
    from tutel_tpu.ops import quant
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    ref, _ = layer(layer.shard_params(params), x)
    qp = dict(params)
    qp["experts"] = quant.quantize_expert_params(params["experts"],
                                                 bits=bits)
    qp = layer.shard_params(qp)
    out, _ = layer(qp, x, use_ragged_ep=True, max_recv=1024)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < (0.05 if bits == 8 else 0.3), rel


def test_ragged_ep_on_2dh_mesh_matches_flat_and_single_device():
    """True-dropless ragged EP on the hierarchical ('dcn','ici') mesh
    (round-3 lift): both exchanges ride the tier-scoped 2DH ragged a2a
    and the result equals the flat ragged path and single-device."""
    from tutel_tpu import moe

    def make(n, use_2dh):
        return moe.moe_layer(
            gate_type={"type": "top", "k": 2, "capacity_factor": 0.0},
            experts={"type": "ffn", "num_experts_per_device": 8 // n,
                     "hidden_size_per_expert": 48},
            model_dim=24, seeds=(1, 1, 1), use_2dh=use_2dh,
            num_hosts=2 if use_2dh else None, group=jax.devices()[:n])

    x = jax.random.normal(jax.random.PRNGKey(3), (64, 24))
    l1 = make(1, False)
    params = l1.init(jax.random.PRNGKey(0))
    ref, _ = l1(params, x)
    lf, lh = make(8, False), make(8, True)
    pf, ph = lf.shard_params(params), lh.shard_params(params)
    out_f, _ = lf(pf, x, use_ragged_ep=True,
                  max_recv=lf.resolve_max_recv(pf, x))
    bound = lh.resolve_max_recv(ph, x)
    out_h, _ = lh(ph, x, use_ragged_ep=True, max_recv=bound)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref),
                               atol=5e-5)

    def loss(p, xx):
        o, la = lh(p, xx, training=True, use_ragged_ep=True,
                   max_recv=bound)
        return jnp.mean(o ** 2) + 0.01 * la

    g = jax.jit(jax.grad(loss))(ph, x)
    assert all(bool(jnp.all(jnp.isfinite(leaf)))
               for leaf in jax.tree.leaves(g))
