"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's strategy of testing distributed behavior without a
cluster (reference tests/test_tutel.py runs 2 procs on one node); here we use
XLA's host-platform device-count override so DP/EP/MP/overlap invariance is
testable on a single machine (SURVEY.md section 4).

Note: this container force-registers a tunneled TPU backend via
sitecustomize; `jax.config.update` below overrides it (the env var alone is
not enough) — it must run before any backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
