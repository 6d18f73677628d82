"""Fused KV-cache RMW write kernel (ops/kv_write_pallas.write_step).

Oracle: NumPy fancy-index writes. The kernel is the production write
path for QUANTIZED caches on TPU (the lane-dim scale scatter XLA
lowers catastrophically — docs/RESULTS.md round-4b); these tests pin
interpret-mode exactness over every window-position case (first row,
tile-interior, tile-boundary, last row) plus the end-to-end equality
of the kernel write path vs the XLA scatter path through whole decode
steps. The Mosaic lowering itself is pinned by
tests/test_tpu_aot.py::test_kv_write_step_mosaic_compiles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.ops.kv_write_pallas import write_step, _WROW, _WCOL


def _oracle(caches, rows, pos, col_caches, cols):
    pn = np.asarray(pos)
    b = pn.shape[0]
    outs_r, outs_c = [], []
    for c, r in zip(caches, rows):
        e = np.asarray(c).copy()
        e[np.arange(b), pn] = np.asarray(r)
        outs_r.append(e)
    for c, s in zip(col_caches, cols):
        e = np.asarray(c).copy()
        e[np.arange(b), :, pn] = np.asarray(s)
        outs_c.append(e)
    return outs_r, outs_c


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float32])
def test_write_step_matches_numpy_oracle(dtype):
    rng = np.random.RandomState(0)
    b, t, d, h = 6, 4 * _WCOL, 256, 4

    def mk(shape, dt):
        if dt == jnp.int8:
            return jnp.asarray(rng.randint(-100, 100, shape), dt)
        return jnp.asarray(rng.randn(*shape), dt)

    ck, cv = mk((b, t, d), dtype), mk((b, t, d), dtype)
    ks = mk((b, h, t), jnp.float32)
    vs = mk((b, h, t), jnp.float32)
    nk, nv = mk((b, d), dtype), mk((b, d), dtype)
    nks, nvs = mk((b, h), jnp.float32), mk((b, h), jnp.float32)
    # cover: row 0, tile-interior, row-tile boundary, lane-tile
    # boundary, last row
    pos = jnp.asarray([0, 3, _WROW, _WCOL, 2 * _WCOL - 1, t - 1],
                      jnp.int32)
    (ok, ov), (oks, ovs) = write_step(
        [ck, cv], [nk, nv], pos, col_caches=[ks, vs], cols=[nks, nvs],
        interpret=True)
    (ek, ev), (eks, evs) = _oracle([ck, cv], [nk, nv], pos,
                                   [ks, vs], [nks, nvs])
    np.testing.assert_array_equal(np.asarray(ok), ek)
    np.testing.assert_array_equal(np.asarray(ov), ev)
    np.testing.assert_array_equal(np.asarray(oks), eks)
    np.testing.assert_array_equal(np.asarray(ovs), evs)


def test_write_step_rows_only_and_packed_width():
    """Float mode (no scale caches) and the INT4 packed half-width."""
    rng = np.random.RandomState(1)
    b, t, d = 4, 256, 128                       # packed width D/2
    ck = jnp.asarray(rng.randint(-100, 100, (b, t, d)), jnp.int8)
    nk = jnp.asarray(rng.randint(-100, 100, (b, d)), jnp.int8)
    pos = jnp.asarray(rng.randint(0, t, b), jnp.int32)
    (ok,), cc = write_step([ck], [nk], pos, interpret=True)
    assert cc == []
    (ek,), _ = _oracle([ck], [nk], pos, [], [])
    np.testing.assert_array_equal(np.asarray(ok), ek)


def test_write_step_gqa_scale_height():
    """kvh=2 scale caches (GQA) — sublane height below the tile."""
    rng = np.random.RandomState(2)
    b, t, h = 4, 2 * _WCOL, 2
    ks = jnp.asarray(rng.randn(b, h, t), jnp.float32)
    nks = jnp.asarray(rng.randn(b, h), jnp.float32)
    pos = jnp.asarray([0, 1, _WCOL - 1, 2 * _WCOL - 1], jnp.int32)
    rr, (oks,) = write_step([], [], pos, col_caches=[ks], cols=[nks],
                            interpret=True)
    assert rr == []
    _, (eks,) = _oracle([], [], pos, [ks], [nks])
    np.testing.assert_array_equal(np.asarray(oks), eks)


def test_kernel_write_path_equals_scatter_path_end_to_end(monkeypatch):
    """Whole decode chains: TUTEL_TPU_DECODE_ATTN=1 (interpret kernels,
    incl. the RMW write path for the quantized cache) == the XLA
    scatter path, for kv8 and packed kv4."""
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    for kv_bits in (8, 4):
        cfg = TransformerMoEConfig(
            vocab_size=97, max_len=128, model_dim=256, num_heads=2,
            num_layers=2, ffn_hidden=512, moe_every=2,
            num_local_experts=2, top_k=1, capacity_factor=0.0,
            expert_hidden=256, dtype=jnp.float32, kv_bits=kv_bits)
        model = TransformerMoE(cfg, group=jax.devices()[:1])
        params = model.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0,
                                  cfg.vocab_size)
        ov = {"capacity_factor": 8.0}

        def chain():
            cache = model.init_cache(2)
            pos = jnp.zeros((2,), jnp.int32)
            outs = []
            for i in range(7):
                lg, cache, _ = model.apply_decode(
                    params, toks[:, i], cache, pos, moe_overrides=ov)
                outs.append(lg)
                pos = pos + 1
            return jnp.stack(outs, 1), cache

        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "0")
        ref, cache_ref = chain()
        monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "1")
        out, cache_kern = chain()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # layer 0 sees bit-identical inputs on both paths, so its
        # stored cache must be byte-identical — the write MECHANISM is
        # exact. (Deeper layers' inputs differ by ulps between the
        # attention paths, so only closeness holds there.)
        np.testing.assert_array_equal(np.asarray(cache_kern[0]["k"]),
                                      np.asarray(cache_ref[0]["k"]))
        np.testing.assert_array_equal(np.asarray(cache_kern[0]["k_s"]),
                                      np.asarray(cache_ref[0]["k_s"]))
        for ck, cr in zip(cache_kern[1:], cache_ref[1:]):
            np.testing.assert_allclose(np.asarray(ck["k_s"]),
                                       np.asarray(cr["k_s"]),
                                       rtol=1e-5, atol=1e-6)


def test_write_kernel_survives_attention_vmem_fallback(monkeypatch):
    """Round-5 review finding: the fused RMW write must stay engaged
    even when the flash-decode kernel's VMEM ladder rejects the model
    (pick_wc -> None downgrades the ATTENTION to XLA) — the write
    kernel's budget is independent, and the XLA lane-dim scale scatter
    it replaces is the documented catastrophic lowering."""
    import tutel_tpu.ops.kv_write_pallas as kwp
    import tutel_tpu.ops.decode_attn_pallas as dap
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    monkeypatch.setenv("TUTEL_TPU_DECODE_ATTN", "")
    # force the interpret kernel mode, then fail the attention ladder
    monkeypatch.setattr(
        TransformerMoE, "_attn_kernel_mode", lambda self, d: "interpret")
    monkeypatch.setattr(dap, "pick_wc", lambda *a, **k: None)
    calls = {"n": 0}
    orig = kwp.write_step

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)
    monkeypatch.setattr(kwp, "write_step", counting)

    cfg = TransformerMoEConfig(
        vocab_size=61, max_len=128, model_dim=128, num_heads=2,
        num_layers=2, ffn_hidden=64, moe_every=2, num_local_experts=2,
        top_k=1, expert_hidden=64, kv_bits=8)
    model = TransformerMoE(cfg, group=jax.devices()[:1])
    params = model.init(jax.random.PRNGKey(0))
    cache = model.init_cache(2)
    logits, cache, _ = model.apply_decode(
        params, jnp.zeros((2,), jnp.int32), cache,
        jnp.zeros((2,), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
    assert calls["n"] >= 1, (
        "attention VMEM fallback must not disable the RMW write kernel")
