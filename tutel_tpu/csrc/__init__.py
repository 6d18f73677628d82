"""Native (C++) components, built on demand with the system toolchain.

The reference ships a C++/CUDA extension (reference
tutel/custom/custom_kernel.cpp) built by setup.py; here the native pieces
are host-side (TPU compute lives in XLA/Pallas): the CPU dispatch oracle
and the corpus batch sampler. `lib()` compiles the shared object once per
environment and loads it via ctypes — no pybind/torch dependency.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "dispatch_cpu.cpp")


def _build(out_path):
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", out_path, _SRC],
        check=True, capture_output=True)


def lib():
    """Load (building if needed) the native library; None if no toolchain."""
    global _LIB
    if _LIB is not None:
        return _LIB
    cache = os.environ.get(
        "TUTEL_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "tutel_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libtutel_tpu_cpu.so")
    if not os.path.exists(so) or (os.path.getmtime(so)
                                  < os.path.getmtime(_SRC)):
        tmp = so + ".tmp"
        _build(tmp)
        os.replace(tmp, so)
    _LIB = ctypes.CDLL(so)
    return _LIB


def _i64(x):
    return ctypes.c_int64(int(x))


def _ptr(a, dt):
    a = np.ascontiguousarray(a, dtype=dt)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_void_p))


def dispatch_forward(gates, indices, locations, x, capacity, experts,
                     use_gates=True):
    """CPU oracle for ops.dispatch.fast_encode (kernel_type=0)."""
    L = lib()
    k, s = np.asarray(indices).shape
    m = np.asarray(x).shape[1]
    out = np.zeros((experts * capacity, m), np.float32)
    g, gp = _ptr(gates, np.float32)
    i, ip = _ptr(indices, np.int32)
    l, lp = _ptr(locations, np.int32)
    xx, xp = _ptr(x, np.float32)
    L.dispatch_forward_f32(
        gp, ip, lp, xp, out.ctypes.data_as(ctypes.c_void_p),
        _i64(k), _i64(s), _i64(m), _i64(capacity), _i64(experts),
        ctypes.c_int(1 if use_gates else 0))
    return out.reshape(experts, capacity, m)


def dispatch_backward_data(gates, indices, locations, dispatched,
                           num_samples, use_gates=True):
    """CPU oracle for the decode/bwd-data gather (kernel_type=1)."""
    L = lib()
    k, s = np.asarray(indices).shape
    e, c, m = np.asarray(dispatched).shape
    out = np.zeros((num_samples, m), np.float32)
    g, gp = _ptr(gates, np.float32)
    i, ip = _ptr(indices, np.int32)
    l, lp = _ptr(locations, np.int32)
    d, dp = _ptr(np.asarray(dispatched).reshape(e * c, m), np.float32)
    L.dispatch_backward_data_f32(
        gp, ip, lp, dp, out.ctypes.data_as(ctypes.c_void_p),
        _i64(k), _i64(s), _i64(m), _i64(c), _i64(e),
        ctypes.c_int(1 if use_gates else 0))
    return out


def dispatch_backward_gate(indices, locations, dispatched, x):
    """CPU oracle for the gate-gradient dots (kernel_type=2)."""
    L = lib()
    k, s = np.asarray(indices).shape
    e, c, m = np.asarray(dispatched).shape
    out = np.zeros((k, s), np.float32)
    i, ip = _ptr(indices, np.int32)
    l, lp = _ptr(locations, np.int32)
    d, dp = _ptr(np.asarray(dispatched).reshape(e * c, m), np.float32)
    xx, xp = _ptr(x, np.float32)
    L.dispatch_backward_gate_f32(
        out.ctypes.data_as(ctypes.c_void_p), ip, lp, dp, xp,
        _i64(k), _i64(s), _i64(m), _i64(c), _i64(e))
    return out


def cumsum_locations(indices, experts):
    """CPU oracle for the location-assignment cumsum
    (reference fast_cumsum_sub_one)."""
    L = lib()
    k, s = np.asarray(indices).shape
    locations = np.zeros((k, s), np.int32)
    counts = np.zeros((experts,), np.int32)
    i, ip = _ptr(indices, np.int32)
    L.cumsum_locations(
        ip, locations.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        _i64(k), _i64(s), _i64(experts))
    return locations, counts


def sample_windows(corpus, offsets, window):
    """Gather [len(offsets), window] int32 windows from a flat corpus."""
    L = lib()
    corpus = np.ascontiguousarray(corpus, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    out = np.empty((len(offsets), window), np.int32)
    assert offsets.max() + window <= len(corpus)
    L.sample_windows_i32(
        corpus.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        _i64(len(offsets)), _i64(window))
    return out


def available():
    try:
        lib()
        return True
    except Exception:
        return False
