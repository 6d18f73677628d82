"""Prove the a2a/FFN overlap actually overlaps — at the HLO level.

The reference's async split all-to-all exists to hide communication
behind expert compute (reference custom_kernel.cpp:520-654,
overlap.py:8-67). Here the same property must come from XLA: the layer
compiles overlap-degree variants with async all-to-all enabled
(impls/moe_layer.py `_compiler_options`), and this test AOT-compiles the
8-device EP program for a real v5e:2x4 TPU topology (no hardware needed —
libtpu compiles ahead-of-time) and inspects the *scheduled* HLO:

  * degree 2: at least one all-to-all-start/-done pair must have compute
    ops scheduled inside its in-flight window (comm hidden behind FFN);
  * degree 1: the strict a2a -> FFN -> a2a dependency chain admits no
    such interleaving — the same assertion must find nothing, so this
    test FAILS if overlap ever degenerates to the sequential schedule.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe
from tutel_tpu.impls.moe_layer import _VariantCfg


def _topology_devices():
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
        return list(topo.devices)
    except Exception as e:  # no libtpu in this environment
        pytest.skip(f"TPU AOT topology unavailable: {e}")


def _scheduled_hlo(devs, overlap):
    layer = moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": 1,
                 "hidden_size_per_expert": 2048},
        model_dim=1024, seeds=(1, 1, 1), dtype=jnp.bfloat16,
        a2a_ffn_overlap_degree=overlap, group=devs)
    cfg = _VariantCfg(
        gate_index=0, top_k=2, capacity=512, adaptive_r=1,
        overlap_degree=overlap, megablocks_size=0, training=False,
        use_2dh=False, batch_prioritized=False)
    fn = jax.jit(layer._build_forward(cfg))
    params = jax.eval_shape(lambda: layer.init(jax.random.PRNGKey(0)))
    x = jax.ShapeDtypeStruct((4096, 1024), jnp.bfloat16)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return fn.lower(params, x, key).compile(
        compiler_options=layer._compiler_options(cfg)).as_text()


def _ops_inside_async_windows(txt):
    """Count compute ops scheduled between an all-to-all-start and its
    -done in the sequential schedule (is_scheduled=true modules list ops
    in execution order)."""
    assert "is_scheduled=true" in txt.splitlines()[0]
    inter = in_flight = 0
    for ln in txt.splitlines():
        if "all-to-all-start" in ln:
            in_flight += 1
        elif "all-to-all-done" in ln:
            in_flight = max(0, in_flight - 1)
        elif in_flight and ("dot(" in ln or "fusion(" in ln):
            inter += 1
    return inter


def test_overlap_degree2_schedules_compute_inside_a2a():
    devs = _topology_devices()
    txt = _scheduled_hlo(devs, overlap=2)
    assert len(re.findall(r"all-to-all-start", txt)) > 0, (
        "async all-to-all was not enabled for the overlap variant")
    inter = _ops_inside_async_windows(txt)
    assert inter > 0, (
        "overlap degenerated to a sequential schedule: no compute is "
        "issued while an all-to-all is in flight")


def test_degree1_has_no_interleaving():
    """The control: without chunking there is nothing to hide behind, so
    the same detector must find no compute inside async windows."""
    devs = _topology_devices()
    txt = _scheduled_hlo(devs, overlap=1)
    assert _ops_inside_async_windows(txt) == 0


def _ops_inside_permute_windows(txt):
    """Count dot/fusion ops scheduled while a collective-permute is in
    flight (same discipline as `_ops_inside_async_windows`, for the
    ring-attention K/V rotation)."""
    assert "is_scheduled=true" in txt.splitlines()[0]
    inter = in_flight = 0
    for ln in txt.splitlines():
        if "collective-permute-start" in ln:
            in_flight += 1
        elif "collective-permute-done" in ln:
            in_flight = max(0, in_flight - 1)
        elif in_flight and ("dot(" in ln or "fusion(" in ln):
            inter += 1
    return inter


def test_ring_permute_overlaps_dots():
    """Ring attention's K/V rotation must hide behind the step's
    score/PV dots (round 5: the scan body issues the ppermute BEFORE
    the dots, which have no data dependence on it). AOT-compiles the
    ring-SP LM for a 16-device v5e:4x4 axis — the pod-scale shape the
    scan form exists for — and asserts the scheduled HLO puts compute
    inside collective-permute start/done windows."""
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc("v5e:4x4", "tpu")
        devs = list(topo.devices)
    except Exception as e:
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    n = len(devs)
    cfg = TransformerMoEConfig(
        vocab_size=512, max_len=16 * n, model_dim=512, num_heads=4,
        num_kv_heads=2, num_layers=2, ffn_hidden=128, moe_every=2,
        num_local_experts=1, top_k=2, capacity_factor=1.0,
        expert_hidden=128, dtype=jnp.bfloat16)
    model = TransformerMoE(cfg, group=devs)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    tokens = jax.ShapeDtypeStruct((2, 16 * n), jnp.int32)
    txt = jax.jit(
        lambda p, tok: model.apply_seqpar(p, tok, attn_mode="ring")
    ).lower(params, tokens).compile(compiler_options={
        "xla_tpu_enable_latency_hiding_scheduler": "True"}).as_text()
    assert "collective-permute-start" in txt, (
        "ring rotation was not lowered as an async collective-permute")
    inter = _ops_inside_permute_windows(txt)
    assert inter > 0, (
        "ring schedule degenerated: no dot/fusion is issued while a "
        "K/V rotation is in flight")
