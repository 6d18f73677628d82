"""Collectives facade: a2a conventions, variable-length collectives, ZeRO.

Run on the 8-virtual-device CPU mesh (conftest), mirroring the reference's
2-process collective tests (reference tests/test_tutel.py) and its
nccl_all_to_all_v / all_gather_v example semantics."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
import optax
import pytest

from tutel_tpu import net


def _mesh(w=8, name="x"):
    return Mesh(np.asarray(jax.devices()[:w]), (name,))


def test_all_to_all_dim_convention():
    """all_to_all(y, 1, 0) then (0, 1) must be the identity, and the (1,0)
    result must equal the reference's chunk/concat ordering."""
    w = 4
    mesh = _mesh(w)
    e, c, m = 8, 2, 3
    x = jnp.arange(w * e * c * m, dtype=jnp.float32).reshape(w * e, c, m)

    def body(xs):
        y = net.all_to_all(xs, 1, 0, "x")
        z = net.all_to_all(y, 0, 1, "x")
        return y, z

    y, z = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("x"), out_specs=(P("x"), P("x"))))(x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    # Reference ordering: device d's output rows = concat over sources s of
    # s's chunk d (E/w rows each) along the capacity dim.
    xs = np.asarray(x).reshape(w, e, c, m)
    per_dev = []
    for d in range(w):
        chunks = [xs[s, d * (e // w):(d + 1) * (e // w)] for s in range(w)]
        per_dev.append(np.concatenate(chunks, axis=1))
    expect = np.concatenate(per_dev, axis=0)
    np.testing.assert_array_equal(np.asarray(y), expect)


def test_batch_all_to_all_v():
    w = 4
    mesh = _mesh(w)
    n, m = 16, 2   # 16 rows per device
    x = jnp.arange(w * n * m, dtype=jnp.float32).reshape(w * n, m)
    # device d sends 4 rows to every peer
    counts = jnp.tile(jnp.full((w,), n // w, jnp.int32), (w,))

    def body(xs, cs):
        out, recv = net.batch_all_to_all_v(xs, cs.reshape(-1), "x")
        return out, recv

    out, recv = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P("x"), P("x"))))(x, counts)
    recv = np.asarray(recv).reshape(w, w)
    assert (recv == n // w).all()
    # equal counts degenerate to a flat all_to_all over dim 0
    expect = jax.jit(jax.shard_map(
        lambda xs: net.simple_all_to_all(xs, "x"), mesh=mesh,
        in_specs=P("x"), out_specs=P("x")))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_batch_all_to_all_v_uneven():
    """Ragged path: device d sends d+1 rows to each peer."""
    w = 4
    mesh = _mesh(w)
    cap, m = 32, 2
    rows = []
    counts = []
    for d in range(w):
        c = d + 1
        block = np.full((cap, m), -1, np.float32)
        # rows for peer p carry value 100*d + p
        for p in range(w):
            block[p * c:(p + 1) * c] = 100 * d + p
        rows.append(block)
        counts.append(np.full((w,), c, np.int32))
    x = jnp.asarray(np.concatenate(rows, 0))
    cs = jnp.asarray(np.concatenate(counts, 0))

    def body(xs, c):
        out, recv = net.batch_all_to_all_v(xs, c.reshape(-1), "x",
                                           output_size=cap)
        return out, recv

    out, recv = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P("x"), P("x"))))(x, cs)
    out = np.asarray(out).reshape(w, cap, m)
    recv = np.asarray(recv).reshape(w, w)
    for d in range(w):
        np.testing.assert_array_equal(recv[d], np.arange(1, w + 1))
        off = 0
        for s in range(w):
            got = out[d, off:off + s + 1]
            assert (got == 100 * s + d).all(), (d, s, got)
            off += s + 1


def test_batch_all_gather_v():
    w = 4
    mesh = _mesh(w)
    cap, m = 8, 2
    blocks, counts = [], []
    for d in range(w):
        b = np.full((cap, m), -1, np.float32)
        b[: d + 1] = d
        blocks.append(b)
        counts.append(d + 1)
    x = jnp.asarray(np.concatenate(blocks, 0))
    cs = jnp.asarray(np.array(counts, np.int32))

    def body(xs, c):
        out, cnts = net.batch_all_gather_v(xs, c[0], "x", output_size=16)
        return out, cnts

    out, cnts = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P(), P()), check_vma=False))(x, cs)
    np.testing.assert_array_equal(np.asarray(cnts), [1, 2, 3, 4])
    out = np.asarray(out)
    off = 0
    for d in range(w):
        assert (out[off:off + d + 1] == d).all()
        off += d + 1


def test_zero_optimizer_matches_single_device():
    """ZeRO-1 sharded Adam == plain Adam on replicated params."""
    w = 8
    mesh = _mesh(w)
    params = {"a": jnp.arange(12.0).reshape(3, 4) / 10,
              "b": jnp.arange(5.0)}
    grads = {"a": jnp.ones((3, 4)) * 0.1, "b": jnp.ones((5,)) * 0.2}

    inner = optax.adam(1e-2)
    ref_state = inner.init(params)
    updates, _ = inner.update(grads, ref_state, params)
    expect = optax.apply_updates(params, updates)

    opt = net.ZeroOptimizer(optax.adam(1e-2), axis="x")

    def body(p, g):
        state = opt.init(p, w)
        newp, _ = opt.step(p, g, state, w)
        return newp

    got = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False))(params, grads)
    for k in params:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(expect[k]), rtol=1e-5,
                                   atol=1e-6)


def test_pre_post_expert_permute_oracle_and_roundtrip():
    """reference communicate.py:606-622 vocabulary: source-major rows ->
    expert-major blocks and back. Checked against a literal NumPy
    transcription of the reference's view/permute chain, plus the
    round-trip identity and the w=1 no-op."""
    from tutel_tpu import net
    rng = np.random.default_rng(0)
    for w, l, d1, rest in ((4, 6, 3, (5,)), (2, 8, 4, ()), (8, 2, 1, (2, 3))):
        x = jnp.asarray(rng.standard_normal((w * l, d1) + rest), jnp.float32)
        y = net.pre_expert_permute(x, w)
        xn = np.asarray(x)
        want = xn.reshape((w, l, d1) + rest)
        want = np.moveaxis(want, 0, 1).reshape((l, w * d1) + rest)
        np.testing.assert_array_equal(np.asarray(y), want)
        back = net.post_expert_permute(y, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    x = jnp.ones((4, 3))
    assert net.pre_expert_permute(x, 1) is x
    assert net.post_expert_permute(x, 1) is x


def test_batch_all_to_all_v_2dh_matches_flat():
    """Hierarchical ragged a2a (beyond-reference; ragged analogue of
    custom_kernel.cpp:656-738's 2DH) is element-identical to the flat
    exchange over the (outer, inner) tuple — random counts, skewed
    counts with zeros, and the recv_counts contract."""
    from functools import partial
    from tutel_tpu import net
    O, I, W, M = 2, 4, 8, 3
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(O, I), ("dcn", "ici"))
    P = jax.sharding.PartitionSpec
    rng = np.random.default_rng(0)

    def run(counts, n):
        rows = rng.standard_normal((W, n, M)).astype(np.float32)

        def body(t, c):
            t, c = t[0], c[0]
            flat, rcf = net.batch_all_to_all_v(
                t, c, ("dcn", "ici"), output_size=n, native=False)
            hier, rch = net.batch_all_to_all_v_2dh(
                t, c, "dcn", "ici", output_size=n, native=False)
            return flat[None], hier[None], rcf[None], rch[None]

        f = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(("dcn", "ici")),) * 2,
            out_specs=(P(("dcn", "ici")),) * 4))
        flat, hier, rcf, rch = f(jnp.asarray(rows), jnp.asarray(counts))
        np.testing.assert_array_equal(np.asarray(rcf), np.asarray(rch))
        for d in range(W):
            tot = int(np.asarray(rcf)[d].sum())
            np.testing.assert_array_equal(
                np.asarray(hier)[d][:tot], np.asarray(flat)[d][:tot])

    run(rng.integers(0, 4, size=(W, W)).astype(np.int32), 24)
    skew = np.zeros((W, W), np.int32)
    skew[:, 3] = 5
    skew[0, 0] = 7
    run(skew, 40)
