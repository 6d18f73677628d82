"""Native C++ oracle vs the XLA dispatch path.

The portable core of the reference's test strategy: the CPU kernel is the
executable spec the accelerated kernels must match (reference
tests/test_tutel.py:85-92 CPU==CUDA; here C++ oracle == XLA gathers)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import csrc
from tutel_tpu.ops import dispatch, routing

pytestmark = pytest.mark.skipif(not csrc.available(),
                                reason="no native toolchain")


def _crit(s=33, e=8, k=2, cap=3, seed=0):
    rng = np.random.RandomState(seed)
    scores = jax.nn.softmax(
        jnp.asarray(rng.randn(s, e).astype(np.float32)), axis=1)
    crit, _ = routing.extract_critical(scores, k, capacity=cap, loss_fn=None)
    return crit


def test_native_forward_matches_xla():
    crit = _crit()
    s, m = 33, 16
    x = np.random.RandomState(1).randn(s, m).astype(np.float32)
    for use_gates in (True, False):
        ref = csrc.dispatch_forward(
            np.asarray(crit.gates), np.asarray(crit.indices),
            np.asarray(crit.locations), x, crit.capacity,
            crit.num_global_experts, use_gates=use_gates)
        got = dispatch.fast_encode(jnp.asarray(x), crit,
                                   is_postscore=not use_gates)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6,
                                   atol=1e-6)


def test_native_backward_data_matches_decode():
    crit = _crit(seed=2)
    e, c, m = crit.num_global_experts, crit.capacity, 16
    disp = np.random.RandomState(3).randn(e, c, m).astype(np.float32)
    ref = csrc.dispatch_backward_data(
        np.asarray(crit.gates), np.asarray(crit.indices),
        np.asarray(crit.locations), disp, 33, use_gates=True)
    got = dispatch.fast_decode(jnp.asarray(disp), crit, is_postscore=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_native_backward_gate_matches_vjp():
    crit = _crit(seed=4)
    s, m = 33, 16
    e, c = crit.num_global_experts, crit.capacity
    x = np.random.RandomState(5).randn(s, m).astype(np.float32)
    disp = np.random.RandomState(6).randn(e, c, m).astype(np.float32)

    def f(gates):
        c2 = crit._replace(gates=gates)
        return jnp.sum(dispatch.fast_decode(jnp.asarray(disp), c2,
                                            is_postscore=True)
                       * jnp.asarray(x))
    got = jax.grad(f)(crit.gates)
    ref = csrc.dispatch_backward_gate(
        np.asarray(crit.indices), np.asarray(crit.locations), disp, x)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_native_cumsum_matches_routing():
    crit = _crit(s=50, e=4, k=2, cap=1000, seed=7)
    locs, counts = csrc.cumsum_locations(np.asarray(crit.indices), 4)
    np.testing.assert_array_equal(locs, np.asarray(crit.locations))
    np.testing.assert_array_equal(counts, np.asarray(crit.dispatch_count))


def test_sample_windows():
    corpus = np.arange(100, dtype=np.int32)
    out = csrc.sample_windows(corpus, np.asarray([0, 10, 90]), 10)
    np.testing.assert_array_equal(out[1], np.arange(10, 20))
    np.testing.assert_array_equal(out[2], np.arange(90, 100))
