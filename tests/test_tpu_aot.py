"""AOT TPU-compile evidence — no hardware needed.

libtpu compiles ahead-of-time for a topology descriptor
(jax.experimental.topologies), which validates two things the virtual
CPU mesh cannot:

  * Mosaic kernel lowering: the integer-domain grouped GEMMs
    (ops/w8a8_pallas.py) and the fused whole-expert streams
    (ops/fused_ffn_pallas.py) compile through the real TPU toolchain
    at production sizes (VMEM budgets, i8 dot lowering, in-kernel INT4
    unpack) — interpret-mode tests alone can't show this (Mosaic has
    rejected i8/i16 ops in this environment before).
  * Multi-host readiness (reference custom_kernel.cpp:656-738 2DH):
    v5e:4x4 is a genuine 4-process topology, so the 2DH / ragged-EP /
    overlap / expert-choice variants compiling for it — with the 2DH
    collectives split into intra-host (ICI) and cross-host (DCN)
    groups — is the strongest pre-hardware evidence for the >=85%
    multi-host scaling target (SURVEY.md §6).
"""

import dataclasses
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tutel_tpu import moe
from tutel_tpu.impls.moe_layer import _VariantCfg
from tutel_tpu.ops import quant
from tutel_tpu.ops.quant import QuantizedWeight
from tutel_tpu.ops import fused_ffn_pallas as fp
from tutel_tpu.ops import w8a8_pallas


def _topology(name):
    try:
        from jax.experimental import topologies
        return list(topologies.get_topology_desc(name, "tpu").devices)
    except Exception as e:  # no libtpu in this environment
        pytest.skip(f"TPU AOT topology unavailable: {e}")


def _replicated(devs):
    return NamedSharding(Mesh(np.array(devs[:1]), ("d",)), P())


def _spec(arr_or_shape, dtype, sharding):
    if hasattr(arr_or_shape, "shape"):
        return jax.ShapeDtypeStruct(arr_or_shape.shape, arr_or_shape.dtype,
                                    sharding=sharding)
    return jax.ShapeDtypeStruct(arr_or_shape, dtype, sharding=sharding)


# ---------------------------------------------------------------------------
# Mosaic kernel lowering at production sizes.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 4])
def test_integer_grouped_gemm_mosaic_compiles(bits):
    """W8A8 / W4A8 grouped GEMM lowers through Mosaic for v5e at the
    2048x2048 production config (the advisor's VMEM concern and the
    round-2 'never compiled on TPU' gap, at the compile level)."""
    rep = _replicated(_topology("v5e:2x4"))
    e_, c, k, n = 8, 512, 2048, 2048
    qw = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, k, n), jnp.float32)}, bits=bits)["fc1_w"]

    def f(x, v, s):
        q = QuantizedWeight(values=v, scales=s, bits=bits, orig_k=k,
                            blocks=qw.blocks)
        return w8a8_pallas.grouped_gemm_w8a8(x, q)

    txt = jax.jit(f).lower(
        _spec((e_, c, k), jnp.bfloat16, rep),
        _spec(qw.values, None, rep),
        _spec(qw.scales, None, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


# INT4 qualifies at the 2048x2048 north-star expert; INT8's whole-
# expert block exceeds the 5 MB stream budget there (the two-call
# fallback serves it) and is compiled at its largest qualifying size.
# C=128 is the north-star decode batch (1024 decode tokens / 8 local
# experts); larger C fails the callers' 15 MB vmem_bytes ladder and
# takes the two-call fallback (test_fused_vmem_ladder_rejects_large_c).
@pytest.mark.parametrize("bits,k,h", [(4, 2048, 2048), (8, 1024, 1024)])
def test_fused_ffn_stream_mosaic_compiles(bits, k, h):
    """The fused whole-expert weight-only FFN kernel compiles for v5e."""
    rep = _replicated(_topology("v5e:2x4"))
    e_, c = 8, 128
    fc1 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, k, h), jnp.float32)}, bits=bits)["fc1_w"]
    fc2 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, h, k), jnp.float32)}, bits=bits)["fc1_w"]
    stream = fp.prepare_fused_ffn(fc1, fc2)
    assert stream is not None

    def f(x, w, sb):
        st = dataclasses.replace(stream, wstream=w, sb=sb)
        return fp.fused_ffn_quant(x, st)

    txt = jax.jit(f).lower(
        _spec((e_, c, k), jnp.bfloat16, rep),
        _spec(stream.wstream, None, rep),
        _spec(stream.sb, None, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_fused_w8a8_stream_mosaic_compiles():
    """The round-3 integer-domain fused stream (W4A8: INT4 wire bytes,
    in-kernel unpack to int8, int32 MXU accumulation, hidden
    re-quantized in VMEM) compiles for v5e at production size."""
    rep = _replicated(_topology("v5e:2x4"))
    e_, c, k, h = 8, 128, 2048, 2048
    fc1 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, k, h), jnp.float32)}, bits=4)["fc1_w"]
    fc2 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, h, k), jnp.float32)}, bits=4)["fc1_w"]
    stream = fp.prepare_fused_ffn(fc1, fc2)
    assert stream is not None

    def f(x, w, sb):
        st = dataclasses.replace(stream, wstream=w, sb=sb)
        return fp.fused_ffn_w8a8(x, st)

    txt = jax.jit(f).lower(
        _spec((e_, c, k), jnp.bfloat16, rep),
        _spec(stream.wstream, None, rep),
        _spec(stream.sb, None, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_fused_swiglu_stream_mosaic_compiles():
    """The 3-phase SwiGLU stream (llama_ffn experts) compiles for v5e."""
    rep = _replicated(_topology("v5e:2x4"))
    e_, c, k, h = 8, 128, 2048, 2048

    def q(shape):
        return quant.quantize_expert_params(
            {"fc1_w": jnp.zeros(shape, jnp.float32)}, bits=4)["fc1_w"]

    stream = fp.prepare_fused_swiglu(q((e_, k, h)), q((e_, k, h)),
                                     q((e_, h, k)))
    assert stream is not None

    def f(x, w, sb):
        st = dataclasses.replace(stream, wstream=w, sb=sb)
        return fp.fused_swiglu_quant(x, st)

    txt = jax.jit(f).lower(
        _spec((e_, c, k), jnp.bfloat16, rep),
        _spec(stream.wstream, None, rep),
        _spec(stream.sb, None, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


@pytest.mark.parametrize("d,nh,t,dtype", [
    (1024, 8, 2048, jnp.bfloat16),    # the LM serving bench config
    (4096, 32, 2048, jnp.bfloat16),   # VMEM-guard regime: wc must shrink
])
def test_decode_attn_mosaic_compiles(d, nh, t, dtype):
    """The flash-decode attention kernel (the production TPU attention
    path of LmDecodeEngine) lowers through Mosaic for v5e at production
    sizes, including the shrunken-slab config the VMEM guard picks at
    bf16 model_dim=4096 (512-row slabs would be ~16.8 MB)."""
    from tutel_tpu.ops import decode_attn_pallas as dap
    rep = _replicated(_topology("v5e:2x4"))
    b, hd = 64, d // nh
    wc = dap.pick_wc(t, d, jnp.dtype(dtype).itemsize, nh=nh)
    assert wc is not None
    if d >= 4096:
        assert wc <= 256, "guard must shrink the slab at this size"

    def f(q, k, v, pos):
        return dap.decode_attn(q, k, v, pos, attn_len=t, wc=wc)

    txt = jax.jit(f).lower(
        _spec((b, nh, hd), dtype, rep),
        _spec((b, t, d), dtype, rep),      # flat production layout
        _spec((b, t, d), dtype, rep),
        _spec((b,), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_fused_vmem_ladder_rejects_large_c():
    """At C=512 the whole-expert stream needs ~18 MB of VMEM (> the
    16 MB/core limit — a direct kernel call fails XLA's scoped-vmem
    check), so the production entry's vmem_bytes ladder must refuse the
    fused kernel and the two-call fallback must still compile for TPU.
    This is exactly the failure interpret-mode tests cannot see."""
    rep = _replicated(_topology("v5e:2x4"))
    e_, c, k, h = 8, 512, 2048, 2048
    fc1 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, k, h), jnp.float32)}, bits=4)["fc1_w"]
    fc2 = quant.quantize_expert_params(
        {"fc1_w": jnp.zeros((e_, h, k), jnp.float32)}, bits=4)["fc1_w"]
    stream = fp.prepare_fused_ffn(fc1, fc2)
    assert stream is not None
    assert all(fp.vmem_bytes_w8a8(stream, c, jnp.bfloat16, ch)
               > 15 * 1024 * 1024 for ch in (512, 256, 128)), (
        "estimator accepts a config XLA rejects — ladder is unsafe")

    def f(x, v1, s1, v2, s2, w, sb):
        params = {
            "fc1_w": QuantizedWeight(values=v1, scales=s1, bits=4,
                                     orig_k=k, blocks=1),
            "fc2_w": QuantizedWeight(values=v2, scales=s2, bits=4,
                                     orig_k=h, blocks=1),
            "fused_stream": dataclasses.replace(stream, wstream=w, sb=sb),
        }
        return w8a8_pallas.w8a8_ffn(x, params, None, jax.nn.gelu, k)

    txt = jax.jit(f).lower(
        _spec((e_, c, k), jnp.bfloat16, rep),
        _spec(fc1.values, None, rep), _spec(fc1.scales, None, rep),
        _spec(fc2.values, None, rep), _spec(fc2.scales, None, rep),
        _spec(stream.wstream, None, rep),
        _spec(stream.sb, None, rep)).compile().as_text()
    assert "tpu_custom_call" in txt  # two-call kernels still Mosaic


# ---------------------------------------------------------------------------
# Multi-host (4-process v5e:4x4) readiness.
# ---------------------------------------------------------------------------

def _layer_hlo(devs, *, use_2dh=False, num_hosts=None, ragged=0,
               overlap=1, expert_choice=False, model_dim=256, hidden=512,
               experts_per_device=1, parallel_type="adaptive:1",
               adaptive_r=1):
    if expert_choice:
        gate = {"type": "expert_choice", "capacity_factor": 1.0,
                "gate_noise": 0.0}
    else:
        gate = {"type": "top", "k": 2, "capacity_factor": 1.0}
    layer = moe.moe_layer(
        gate_type=gate,
        experts={"type": "ffn",
                 "num_experts_per_device": experts_per_device,
                 "hidden_size_per_expert": hidden},
        model_dim=model_dim, seeds=(1, 1, 1), dtype=jnp.bfloat16,
        use_2dh=use_2dh, num_hosts=num_hosts,
        parallel_type=parallel_type,
        a2a_ffn_overlap_degree=overlap, group=devs)
    cfg = _VariantCfg(
        gate_index=0, top_k=2, capacity=128, adaptive_r=adaptive_r,
        overlap_degree=overlap, megablocks_size=0, training=False,
        use_2dh=use_2dh, batch_prioritized=False,
        ragged_max_recv=ragged, expert_choice=expert_choice)
    fn = jax.jit(layer._build_forward(cfg))
    params = jax.eval_shape(lambda: layer.init(jax.random.PRNGKey(0)))
    x = jax.ShapeDtypeStruct((len(devs) * 128, model_dim), jnp.bfloat16)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return fn.lower(params, x, key).compile(
        compiler_options=layer._compiler_options(cfg)).as_text(), devs


def _collective_groups(txt, opname):
    """[(line, [[ids...], ...])] for each `opname` with replica_groups."""
    out = []
    for ln in txt.splitlines():
        if opname not in ln or "replica_groups=" not in ln:
            continue
        m = re.search(r"replica_groups=\{(\{[^=]*\})\}", ln)
        if not m:
            continue
        groups = [[int(v) for v in g.split(",") if v.strip()]
                  for g in re.findall(r"\{([\d,]+)\}", m.group(1))]
        out.append((ln, groups))
    return out


def test_2dh_emits_separate_ici_and_dcn_collectives_on_4_hosts():
    """On the genuine 4-process v5e:4x4 topology the 2DH path must
    decompose into an intra-host exchange (every replica group within
    one process) and a cross-host exchange (groups spanning all 4
    processes) — each traffic phase rides its own fabric tier."""
    devs = _topology("v5e:4x4")
    txt, devs = _layer_hlo(devs, use_2dh=True, num_hosts=4)
    proc_of = {i: d.process_index for i, d in enumerate(devs)}
    a2as = (_collective_groups(txt, "all-to-all")
            + _collective_groups(txt, "ragged-all-to-all"))
    assert a2as, "2DH program contains no all-to-all"
    intra = inter = 0
    for _, groups in a2as:
        spans = [len({proc_of[i] for i in g}) for g in groups]
        if all(s == 1 for s in spans):
            intra += 1
        elif all(s == len(g) for g, s in zip(groups, spans)):
            inter += 1
    assert intra >= 1, f"no intra-host (ICI) exchange phase:\n{a2as}"
    assert inter >= 1, f"no cross-host (DCN) exchange phase:\n{a2as}"


def test_ragged_ep_compiles_for_4_hosts():
    """True-dropless ragged EP (lax.ragged_all_to_all) lowers for a
    real multi-host TPU target."""
    devs = _topology("v5e:4x4")
    txt, _ = _layer_hlo(devs, ragged=2048)
    assert "ragged-all-to-all" in txt


def test_ragged_ep_2dh_is_tier_scoped_on_4_hosts():
    """Ragged EP on the 2DH mesh (round-3 lift) must route its
    exchanges through intra-host AND cross-host ragged phases, with no
    flat world-sized ragged a2a."""
    devs = _topology("v5e:4x4")
    txt, devs = _layer_hlo(devs, use_2dh=True, num_hosts=4, ragged=2048)
    proc_of = {i: d.process_index for i, d in enumerate(devs)}
    raggeds = _collective_groups(txt, "ragged-all-to-all")
    assert raggeds, "2DH ragged-EP program contains no ragged a2a"
    intra = inter = flat = 0
    for _, groups in raggeds:
        spans = [len({proc_of[i] for i in g}) for g in groups]
        if all(s == 1 for s in spans):
            intra += 1
        elif all(len(g) == s for g, s in zip(groups, spans)):
            inter += 1
        if any(len(g) == len(devs) for g in groups):
            flat += 1
    assert intra >= 1 and inter >= 1 and flat == 0, raggeds


def test_overlap_compiles_for_4_hosts():
    """The chunked a2a/FFN overlap variant compiles multi-host with
    async all-to-all enabled."""
    devs = _topology("v5e:4x4")
    txt, _ = _layer_hlo(devs, overlap=2)
    assert re.findall(r"all-to-all-start", txt), (
        "async all-to-all was not enabled for the overlap variant")


def test_expert_choice_ep_compiles_for_4_hosts():
    """The round-3 EC O(capacity) ragged exchange lowers for a real
    multi-host TPU target (score gather + two ragged a2a legs)."""
    devs = _topology("v5e:4x4")
    txt, _ = _layer_hlo(devs, expert_choice=True)
    assert "ragged-all-to-all" in txt, (
        "EC EP must move activations via the ragged exchange")
    _assert_no_activation_gather(txt)


def _assert_no_activation_gather(txt):
    """No all-gather may carry a token-scale [S, M] operand — only the
    [s, E] score shard (E=1 per-device here) and the TP weight/bias
    regathers (leading dim = experts, not tokens) are allowed."""
    for ln, groups in _collective_groups(txt, "all-gather"):
        for a, b in re.findall(r"bf16\[(\d+),(\d+)\]", ln):
            assert not (int(a) >= 128 and int(b) == 256), (
                f"activation all-gather leaked: {ln}")


def test_expert_choice_2dh_ragged_is_tier_scoped_on_4_hosts():
    """EC on the 2DH mesh routes its ragged exchange hierarchically:
    the compiled 4-host program must contain ragged-all-to-alls whose
    replica groups stay within one process (ICI phase) AND ones whose
    groups span processes (DCN phase) — no flat 16-way ragged a2a."""
    devs = _topology("v5e:4x4")
    txt, devs = _layer_hlo(devs, use_2dh=True, num_hosts=4,
                           expert_choice=True)
    proc_of = {i: d.process_index for i, d in enumerate(devs)}
    raggeds = _collective_groups(txt, "ragged-all-to-all")
    assert raggeds, "EC 2DH program contains no ragged-all-to-all"
    intra = inter = flat = 0
    for _, groups in raggeds:
        spans = [len({proc_of[i] for i in g}) for g in groups]
        if all(s == 1 for s in spans):
            intra += 1
        elif all(len(g) == s for g, s in zip(groups, spans)):
            inter += 1
        if any(len(g) == len(devs) for g in groups):
            flat += 1
    assert intra >= 1, f"no intra-host ragged phase:\n{raggeds}"
    assert inter >= 1, f"no cross-host ragged phase:\n{raggeds}"
    assert flat == 0, "flat world-sized ragged a2a leaked into 2DH EC"
    _assert_no_activation_gather(txt)


def test_expert_choice_tp_compiles_for_4_hosts():
    """EC x expert-slicing TP (round-3 lift: slice holders as exchange
    replicas, partial sums on the combine) lowers for a real multi-host
    TPU target — 16 chips, 8 experts sliced 2-way."""
    devs = _topology("v5e:4x4")
    txt, _ = _layer_hlo(devs, expert_choice=True, experts_per_device=-2,
                        parallel_type="adaptive:2", adaptive_r=2)
    assert "ragged-all-to-all" in txt, (
        "EC TP must move activations via the ragged exchange")
    _assert_no_activation_gather(txt)


def test_seqpar_lm_compiles_for_4_hosts():
    """The round-4 sequence-parallel (Ulysses) LM forward — SP x EP on
    one mesh — lowers for the genuine 4-process v5e:4x4 topology: the
    head<->sequence all-to-all pair and the MoE dispatch/combine a2a
    must all appear, spanning the full 16-device SP world."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    devs = _topology("v5e:4x4")
    n = len(devs)
    cfg = TransformerMoEConfig(
        vocab_size=512, max_len=16 * n, model_dim=16 * n, num_heads=n,
        num_layers=2, ffn_hidden=128, moe_every=2, num_local_experts=1,
        top_k=2, capacity_factor=1.0, expert_hidden=128,
        dtype=jnp.bfloat16)
    model = TransformerMoE(cfg, group=devs)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0)))
    tokens = jax.ShapeDtypeStruct((2, 8 * n), jnp.int32)
    txt = jax.jit(
        lambda p, tok: model.apply_seqpar(p, tok)).lower(
        params, tokens).compile().as_text()
    a2as = _collective_groups(txt, "all-to-all")
    assert len(a2as) >= 2, "SP program lost its all-to-all pair"
    proc_of = {i: d.process_index for i, d in enumerate(devs)}
    spanning = [g for _, groups in a2as for g in groups
                if len({proc_of[i] for i in g}) > 1]
    assert spanning, "no all-to-all spans hosts on the 4-host SP mesh"


def test_kv_write_step_mosaic_compiles():
    """The fused RMW cache-write kernel (ops/kv_write_pallas) lowers
    through Mosaic for v5e at the LM serving sizes for every cache
    dtype it serves: int8 values + f32 scale columns (kv8), the
    half-width packed slab (kv4), and bf16 rows — with the caches
    donated so the aliasing survives to the executable."""
    from tutel_tpu.ops.kv_write_pallas import write_step
    rep = _replicated(_topology("v5e:2x4"))
    b, t, d, h = 64, 2048, 1024, 8

    def f(ck, cv, ks, vs, nk, nv, nks, nvs, pos):
        return write_step([ck, cv], [nk, nv], pos,
                          col_caches=[ks, vs], cols=[nks, nvs])

    for dt, dd in ((jnp.int8, d), (jnp.bfloat16, d), (jnp.int8, d // 2)):
        txt = jax.jit(f, donate_argnums=(0, 1, 2, 3)).lower(
            _spec((b, t, dd), dt, rep), _spec((b, t, dd), dt, rep),
            _spec((b, h, t), jnp.float32, rep),
            _spec((b, h, t), jnp.float32, rep),
            _spec((b, dd), dt, rep), _spec((b, dd), dt, rep),
            _spec((b, h), jnp.float32, rep),
            _spec((b, h), jnp.float32, rep),
            _spec((b,), jnp.int32, rep)).compile().as_text()
        assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_decode_attn_int4_kv_mosaic_compiles():
    """The INT4 KV-cache variant (nibble-packed slabs, int32-domain
    split-half unpack in VMEM, scale folding unchanged) lowers through
    Mosaic for v5e at the LM serving size — the unpack concat on the
    lane dim is the part interpret mode cannot validate."""
    from tutel_tpu.ops import decode_attn_pallas as dap
    rep = _replicated(_topology("v5e:2x4"))
    b, nh, hd, t = 64, 8, 128, 2048
    d = nh * hd
    wc = dap.pick_wc(t, d, 1, nh=nh, quantized=True, kv_bits=4)
    assert wc is not None

    def f(q, k, v, ks, vs, pos):
        return dap.decode_attn(q, k, v, pos, k_scale=ks, v_scale=vs,
                               attn_len=t, wc=wc, kv_bits=4)

    txt = jax.jit(f).lower(
        _spec((b, nh, hd), jnp.bfloat16, rep),
        _spec((b, t, d // 2), jnp.int8, rep),
        _spec((b, t, d // 2), jnp.int8, rep),
        _spec((b, nh, t), jnp.float32, rep),
        _spec((b, nh, t), jnp.float32, rep),
        _spec((b,), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_ring_attention_lm_compiles_for_4_hosts():
    """Ring-attention SP x EP on the genuine 4-process v5e:4x4
    topology, in the layout Ulysses CANNOT run: 4 query heads on a
    16-device SP world, grouped-query attention (2 KV heads). The
    lowered program must rotate K/V blocks with collective-permutes
    that cross hosts (the ring spans the DCN boundary)."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig
    devs = _topology("v5e:4x4")
    n = len(devs)
    cfg = TransformerMoEConfig(
        vocab_size=512, max_len=16 * n, model_dim=512, num_heads=4,
        num_kv_heads=2, num_layers=2, ffn_hidden=128, moe_every=2,
        num_local_experts=1, top_k=2, capacity_factor=1.0,
        expert_hidden=128, dtype=jnp.bfloat16)
    model = TransformerMoE(cfg, group=devs)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    tokens = jax.ShapeDtypeStruct((2, 8 * n), jnp.int32)
    txt = jax.jit(
        lambda p, tok: model.apply_seqpar(p, tok, attn_mode="ring")
    ).lower(params, tokens).compile().as_text()
    perms = [ln for ln in txt.splitlines() if "collective-permute" in ln
             and "source_target_pairs" in ln]
    assert perms, "ring program lost its K/V collective-permute rotation"
    proc_of = {i: d.process_index for i, d in enumerate(devs)}
    import re as _re
    crossing = False
    for ln in perms:
        pairs = _re.findall(r"\{(\d+),(\d+)\}", ln)
        if any(proc_of[int(a)] != proc_of[int(b)] for a, b in pairs):
            crossing = True
    assert crossing, "no collective-permute crosses hosts on the ring"


def test_decode_attn_int8_kv_mosaic_compiles():
    """The INT8 KV-cache variant of the flash-decode kernel (int8
    slabs + per-(head, pos) scale slabs, dequant folded into the
    score/softmax tiles) lowers through Mosaic for v5e at the LM
    serving size."""
    from tutel_tpu.ops import decode_attn_pallas as dap
    rep = _replicated(_topology("v5e:2x4"))
    b, nh, hd, t = 64, 8, 128, 2048
    d = nh * hd
    wc = dap.pick_wc(t, d, 1, nh=nh, quantized=True)
    assert wc is not None

    def f(q, k, v, ks, vs, pos):
        return dap.decode_attn(q, k, v, pos, k_scale=ks, v_scale=vs,
                               attn_len=t, wc=wc)

    txt = jax.jit(f).lower(
        _spec((b, nh, hd), jnp.bfloat16, rep),
        _spec((b, t, d), jnp.int8, rep),      # flat production layout
        _spec((b, t, d), jnp.int8, rep),
        _spec((b, nh, t), jnp.float32, rep),
        _spec((b, nh, t), jnp.float32, rep),
        _spec((b,), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt, "Mosaic kernel was not emitted"


def test_prefill_attn_mosaic_compiles():
    """The flash prefill-attention kernel (round 5) lowers through
    Mosaic for v5e at the serving sizes, in all three cache forms —
    bf16, INT8 (+scale slabs), and the INT4 nibble-split pair of
    calls — with the chunk offset TRACED (the prefill scan's form;
    interpret mode missed a real block-spec violation here once, so
    the real lowering is load-bearing)."""
    from tutel_tpu.ops import decode_attn_pallas as dap
    rep = _replicated(_topology("v5e:2x4"))
    b, tq, nh, kvh, hd, t = 64, 128, 8, 2, 128, 2048

    def f8(q, k, v, ks, vs, start):
        return dap.prefill_attn(q, k, v, start, k_scale=ks, v_scale=vs,
                                attn_len=1792, kv_bits=8)

    txt = jax.jit(f8).lower(
        _spec((b, tq, nh, hd), jnp.bfloat16, rep),
        _spec((b, t, kvh * hd), jnp.int8, rep),
        _spec((b, t, kvh * hd), jnp.int8, rep),
        _spec((b, kvh, t), jnp.float32, rep),
        _spec((b, kvh, t), jnp.float32, rep),
        _spec((), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt

    def f4(q, k, v, ks, vs, start):
        return dap.prefill_attn(q, k, v, start, k_scale=ks, v_scale=vs,
                                attn_len=1792, kv_bits=4)

    txt = jax.jit(f4).lower(
        _spec((b, tq, nh, hd), jnp.bfloat16, rep),
        _spec((b, t, kvh * hd // 2), jnp.int8, rep),
        _spec((b, t, kvh * hd // 2), jnp.int8, rep),
        _spec((b, kvh, t), jnp.float32, rep),
        _spec((b, kvh, t), jnp.float32, rep),
        _spec((), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt

    def ff(q, k, v, start):
        return dap.prefill_attn(q, k, v, start, attn_len=1792)

    txt = jax.jit(ff).lower(
        _spec((b, tq, nh, hd), jnp.bfloat16, rep),
        _spec((b, t, nh * hd), jnp.bfloat16, rep),
        _spec((b, t, nh * hd), jnp.bfloat16, rep),
        _spec((), jnp.int32, rep)).compile().as_text()
    assert "tpu_custom_call" in txt
