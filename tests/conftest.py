"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the env before JAX initializes its backends (SURVEY.md §4.6):
distributed tests need `--xla_force_host_platform_device_count=8`, and CPU
keeps the suite deterministic/fast. Real-TPU checks live behind the `tpu`
marker and are exercised by bench.py / the driver, not CI.
"""

import os

# The axon sitecustomize force-sets JAX_PLATFORMS=axon (real TPU tunnel) in
# every interpreter; plain env setdefault is not enough — override hard, and
# again via jax.config after import (register() re-asserts the plugin).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu3dsad-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# SURVEY.md §5 sanitizer analogue: TPU3DSAD_DEBUG=1 turns on NaN trapping
# and internal invariant checks for a hardened (slower) CI pass.
if os.environ.get("TPU3DSAD_DEBUG") == "1":
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_enable_checks", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _isolate_runtime_config():
    """apply_runtime_config (called by run_detector/evaluate/CLIs) sets
    process-global knobs — ops tier, fast grouping, matmul precision. An
    e2e test running it must not leak those into later tests (caught live:
    the alphabetically-later ops/test_fast_grouping global-switch test saw
    e2e's fast_grouping=True default)."""
    from tpu3dsad import ops

    impl = ops.get_default_impl()
    fast = ops.get_fast_grouping()
    prec = jax.config.jax_default_matmul_precision
    yield
    ops.set_default_impl(impl)
    ops.set_fast_grouping(fast)
    if jax.config.jax_default_matmul_precision != prec:
        jax.config.update("jax_default_matmul_precision", prec)
