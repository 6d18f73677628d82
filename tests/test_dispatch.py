"""Encode/decode dispatch vs a NumPy oracle, including gradients.

Oracle = the scalar-loop spec of the reference CPU dispatch kernels
(reference tutel/custom/custom_kernel.cpp:280-323): for each (k, token),
dispatched[expert*C + location, :] (+)= gate * input[token, :] when
location < capacity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu.ops import routing, dispatch, ragged


def _routed(s=32, e=4, top_k=2, capacity=None, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(s, e).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    cap = capacity if capacity is not None else s * top_k
    crit, _ = routing.extract_critical(jnp.asarray(scores), top_k, capacity=cap)
    x = rng.randn(s, 16).astype(np.float32)
    return x, crit


def oracle_encode(x, crit, is_postscore=True):
    k, s = np.asarray(crit.indices).shape
    e, c, m = crit.num_global_experts, crit.capacity, x.shape[1]
    out = np.zeros((e, c, m), dtype=x.dtype)
    idx = np.asarray(crit.indices)
    loc = np.asarray(crit.locations)
    gates = np.asarray(crit.gates)
    for kk in range(k):
        for t in range(s):
            if 0 <= loc[kk, t] < c:
                g = 1.0 if is_postscore else gates[kk, t]
                out[idx[kk, t], loc[kk, t]] += g * x[t]
    return out


def oracle_decode(y, crit, is_postscore=True):
    k, s = np.asarray(crit.indices).shape
    e, c, m = y.shape
    out = np.zeros((s, m), dtype=y.dtype)
    idx = np.asarray(crit.indices)
    loc = np.asarray(crit.locations)
    gates = np.asarray(crit.gates)
    for kk in range(k):
        for t in range(s):
            if 0 <= loc[kk, t] < c:
                g = gates[kk, t] if is_postscore else 1.0
                out[t] += g * y[idx[kk, t], loc[kk, t]]
    return out


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("postscore", [True, False])
@pytest.mark.parametrize("capacity", [None, 8])  # None = dropless, 8 = drops
def test_encode_decode_match_oracle(top_k, postscore, capacity):
    x, crit = _routed(top_k=top_k, capacity=capacity)
    y = dispatch.fast_encode(jnp.asarray(x), crit, is_postscore=postscore)
    np.testing.assert_allclose(np.asarray(y),
                               oracle_encode(x, crit, postscore),
                               rtol=1e-6, atol=1e-6)

    rng = np.random.RandomState(1)
    eo = rng.randn(*y.shape).astype(np.float32)
    z = dispatch.fast_decode(jnp.asarray(eo), crit, is_postscore=postscore)
    np.testing.assert_allclose(np.asarray(z),
                               oracle_decode(eo, crit, postscore),
                               rtol=1e-5, atol=1e-5)


def test_encode_onehot_matches_scatter():
    x, crit = _routed(top_k=2, capacity=8)
    a = dispatch.fast_encode(jnp.asarray(x), crit)
    b = dispatch.fast_encode_onehot(jnp.asarray(x), crit)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_encode_decode_roundtrip_identity():
    # With capacity >= needed and an identity expert, decode(encode(x)) == x
    # when gates sum to 1 (top-2 normalized).
    x, crit = _routed(top_k=2)
    y = dispatch.fast_encode(jnp.asarray(x), crit)
    z = dispatch.fast_decode(y, crit)
    np.testing.assert_allclose(np.asarray(z), x, rtol=1e-5, atol=1e-5)


def test_dispatch_gradients():
    """Autodiff through encode/expert/decode must match numeric grads —
    covers the reference's bwd_data and bwd_gate kernels
    (reference jit_kernels/sparse.py:38-133) via JAX autodiff."""
    x, crit = _routed(s=16, e=4, top_k=2, capacity=6)

    def f(x_, gates_):
        crit2 = crit._replace(gates=gates_)
        y = dispatch.fast_encode(x_, crit2)
        y = y * 2.0 + 1.0  # stand-in expert
        out = dispatch.fast_decode(y, crit2)
        return jnp.sum(out ** 2)

    gx, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), crit.gates)

    eps = 1e-3
    xg = np.asarray(x)
    for (i, j) in [(0, 0), (3, 7), (15, 15)]:
        xp, xm = xg.copy(), xg.copy()
        xp[i, j] += eps
        xm[i, j] -= eps
        num = (f(jnp.asarray(xp), crit.gates) -
               f(jnp.asarray(xm), crit.gates)) / (2 * eps)
        np.testing.assert_allclose(float(gx[i, j]), float(num),
                                   rtol=2e-2, atol=2e-2)

    g = np.asarray(crit.gates)
    for (kk, t) in [(0, 0), (1, 5)]:
        gp, gm = g.copy(), g.copy()
        gp[kk, t] += eps
        gm[kk, t] -= eps
        num = (f(jnp.asarray(x), jnp.asarray(gp)) -
               f(jnp.asarray(x), jnp.asarray(gm))) / (2 * eps)
        np.testing.assert_allclose(float(gg[kk, t]), float(num),
                                   rtol=2e-2, atol=2e-2)


def test_ragged_matches_padded():
    """Sorted-ragged dropless layout == padded layout at sufficient capacity
    for an arbitrary per-expert (linear) transform."""
    x, crit = _routed(s=32, e=4, top_k=2)
    rng = np.random.RandomState(2)
    w = rng.randn(4, 16, 16).astype(np.float32)

    # Padded path.
    y = dispatch.fast_encode(jnp.asarray(x), crit)
    y = jnp.einsum("ecm,emn->ecn", y, jnp.asarray(w))
    out_padded = dispatch.fast_decode(y, crit)

    # Ragged path.
    rd = ragged.make_ragged(crit)
    rows = ragged.encode_ragged(jnp.asarray(x), rd)
    from tutel_tpu.ops import grouped_gemm
    rows = grouped_gemm.grouped_gemm(rows, jnp.asarray(w), rd.group_sizes)
    out_ragged = ragged.decode_ragged(rows, rd)

    np.testing.assert_allclose(np.asarray(out_padded), np.asarray(out_ragged),
                               rtol=1e-4, atol=1e-4)


def test_megablocks_ffn_matches_dense():
    """megablocks grouped-GEMM FFN == dense batched FFN on the padded buffer
    (reference ffn.py:70-81 equivalence)."""
    from tutel_tpu.ops import grouped_gemm

    x, crit = _routed(s=32, e=4, top_k=1, capacity=16)
    y = dispatch.fast_encode(jnp.asarray(x), crit)

    rng = np.random.RandomState(5)
    m, h = 16, 24
    params = {
        "fc1_w": jnp.asarray(rng.randn(4, m, h).astype(np.float32)),
        "fc1_b": jnp.asarray(rng.randn(4, h).astype(np.float32)),
        "fc2_w": jnp.asarray(rng.randn(4, h, m).astype(np.float32)),
        "fc2_b": jnp.asarray(rng.randn(4, m).astype(np.float32)),
    }

    class Ctx:
        megablocks_size = 4
        dispatch_count = crit.dispatch_count
        adaptive_degree = 1

    out = grouped_gemm.megablocks_ffn(y, params, Ctx(), jax.nn.relu, m)

    dense = jnp.einsum("ecm,emh->ech", y, params["fc1_w"])
    dense = jax.nn.relu(dense + params["fc1_b"][:, None, :])
    dense = jnp.einsum("ech,ehm->ecm", dense, params["fc2_w"])
    dense = dense + params["fc2_b"][:, None, :]
    # Rows beyond each expert's (rounded) count are zero in the input; the
    # dense path still adds biases there, so compare only occupied rows.
    counts = np.asarray(crit.dispatch_count)
    for e in range(4):
        n = min(counts[e], 16)
        np.testing.assert_allclose(np.asarray(out)[e, :n],
                                   np.asarray(dense)[e, :n],
                                   rtol=1e-4, atol=1e-4)


def test_gather_path_matches_scatter_oracle():
    """The gather-only hot path (inverse-permutation encode, custom-VJP
    decode) must match the direct scatter/gather executable spec bit-for-bit,
    including with drops and prescore gating."""
    import jax
    import jax.numpy as jnp
    from tutel_tpu.ops import dispatch, routing

    rng = np.random.RandomState(5)
    s, m, e, k, cap = 33, 16, 8, 2, 3   # small capacity forces drops
    x = rng.randn(s, m).astype(np.float32)
    scores = jax.nn.softmax(jnp.asarray(rng.randn(s, e).astype(np.float32)),
                            axis=1)
    crit, _ = routing.extract_critical(scores, k, capacity=cap, loss_fn=None)
    for postscore in (True, False):
        a = dispatch.fast_encode(jnp.asarray(x), crit, is_postscore=postscore)
        b = dispatch.fast_encode_scatter(jnp.asarray(x), crit,
                                         is_postscore=postscore)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
        eo = rng.randn(e, cap, m).astype(np.float32)
        c1 = dispatch.fast_decode(jnp.asarray(eo), crit,
                                  is_postscore=postscore)
        c2 = dispatch.fast_decode_gather(jnp.asarray(eo), crit,
                                         is_postscore=postscore)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-6, atol=1e-6)


def test_dispatch_fuzz_vs_scatter_oracle():
    """Randomized (S, E, K, capacity) configs incl. heavy drops: the
    gather-only hot path must match the scatter spec bit-for-bit, and a
    full encode->decode round trip must preserve undropped tokens."""
    import jax
    import jax.numpy as jnp
    from tutel_tpu.ops import dispatch, routing

    rng = np.random.RandomState(7)
    for trial in range(10):
        s = int(rng.randint(2, 50))
        e = int(rng.choice([1, 2, 4, 8]))
        k = int(rng.randint(1, 4))
        cap = int(rng.randint(1, s + 3))
        m = int(rng.choice([4, 16]))
        scores = jax.nn.softmax(
            jnp.asarray(rng.randn(s, e).astype(np.float32)), axis=1)
        crit, _ = routing.extract_critical(scores, k, capacity=cap,
                                           loss_fn=None)
        x = jnp.asarray(rng.randn(s, m).astype(np.float32))
        for ps in (True, False):
            a = dispatch.fast_encode(x, crit, is_postscore=ps)
            b = dispatch.fast_encode_scatter(x, crit, is_postscore=ps)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"t{trial} ps={ps}")
            eo = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
            c1 = dispatch.fast_decode(eo, crit, is_postscore=ps)
            c2 = dispatch.fast_decode_gather(eo, crit, is_postscore=ps)
            np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"t{trial} ps={ps}")


def test_dispatcher_restores_original_dtype():
    """dispatch_dtype compresses the payload but decode hands back the
    caller's dtype (reference GatingDecoder original_dtype restore)."""
    import jax
    import jax.numpy as jnp
    from tutel_tpu.ops.dispatch import TutelMoeFastDispatcher

    d = TutelMoeFastDispatcher(num_global_experts=4, capacity=4,
                               model_dim=8, dispatch_dtype=jnp.bfloat16)
    d.update(indices_=[[0, 1, 2, 3]], locations_=[[0, 0, 0, 0]],
             gates_=[[1.0, 1.0, 1.0, 1.0]])
    x = jnp.ones((4, 8), jnp.float32)
    enc = d.encode(x)
    assert enc.dtype == jnp.bfloat16
    out = d.decode(enc)
    assert out.dtype == jnp.float32
