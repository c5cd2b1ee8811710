"""Test harness: 8 virtual CPU devices so multi-chip sharding semantics are
exercised without TPU hardware (the analog of the reference's TP=1
single-process degraded mode, scripts/run_cls_gpt3_1.3b.sh:14-16 — except we
test the *real* multi-device path).

The environment may pre-register a remote-TPU PJRT plugin at interpreter
start (sitecustomize) and force it via jax.config; tests must run locally on
CPU, so we flip the platform selection back before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
