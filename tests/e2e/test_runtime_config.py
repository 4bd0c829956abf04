"""apply_runtime_config must fully REVERT process-global state (ADVICE r3
low #3): a second Config in the same process — the bench-comparing-configs
scenario the function was added for — must not inherit the previous run's
sorted mode / pallas tier / fp32 precision."""

import jax
import pytest

from tpu3dsad import ops, train_lib
from tpu3dsad.config import Config, apply_overrides


@pytest.fixture(autouse=True)
def _restore_globals():
    impl, fast, mode = (
        ops.get_default_impl(),
        ops.get_fast_grouping(),
        ops.get_fast_mode(),
    )
    prec = jax.config.jax_default_matmul_precision
    yield
    ops.set_default_impl(impl)
    ops.set_fast_grouping(fast)
    ops.set_fast_mode(mode)
    jax.config.update("jax_default_matmul_precision", prec or "default")


def test_second_config_reverts_first(monkeypatch):
    monkeypatch.delenv("TPU3DSAD_OPS_IMPL", raising=False)
    monkeypatch.delenv("TPU3DSAD_FAST_MODE", raising=False)
    exotic = apply_overrides(
        Config(),
        ["ops_impl=pallas", "ops_fast_mode=sorted", "ops_fast_grouping=false",
         "train.bf16_matmul=false"],
    )
    train_lib.apply_runtime_config(exotic)
    assert ops.get_default_impl() == "pallas"
    assert ops.get_fast_mode() == "sorted"
    assert not ops.get_fast_grouping()
    assert jax.config.jax_default_matmul_precision == "highest"

    train_lib.apply_runtime_config(Config())  # plain defaults
    assert ops.get_default_impl() == "xla"
    assert ops.get_fast_mode() == "approx"
    assert ops.get_fast_grouping()
    assert jax.config.jax_default_matmul_precision == "default"


def test_train_meta_resume_warning(tmp_path):
    """ADVICE r3 low #4: resuming under a steps_per_call that changes
    steps_per_epoch must warn; same value must not."""
    d = str(tmp_path / "ckpt")
    assert train_lib.check_and_record_train_meta(d, 96, 16, resumed=False) is None
    # same rounding on resume: silent
    assert train_lib.check_and_record_train_meta(d, 96, 16, resumed=True) is None
    # different rounding on resume: warn — and the ORIGINAL baseline stays
    # on disk, so the mismatch keeps warning instead of inverting
    w = train_lib.check_and_record_train_meta(d, 100, 1, resumed=True)
    assert w and "96" in w and "100" in w
    w2 = train_lib.check_and_record_train_meta(d, 100, 1, resumed=True)
    assert w2 and "96" in w2
    # going back to the original steps_per_call: silent again
    assert train_lib.check_and_record_train_meta(d, 96, 16, resumed=True) is None


def test_matmul_precision_env_precedence(monkeypatch):
    """ADVICE r4: bf16_matmul=True (the dataclass default, 'unspecified')
    must not stomp a user's global JAX_DEFAULT_MATMUL_PRECISION; an
    explicit bf16_matmul=false still owns the global."""
    monkeypatch.setenv("JAX_DEFAULT_MATMUL_PRECISION", "highest")
    train_lib.apply_runtime_config(Config())
    assert jax.config.jax_default_matmul_precision == "highest"
    # explicit fp32-parity request wins regardless of the env var
    monkeypatch.setenv("JAX_DEFAULT_MATMUL_PRECISION", "default")
    train_lib.apply_runtime_config(
        apply_overrides(Config(), ["train.bf16_matmul=false"])
    )
    assert jax.config.jax_default_matmul_precision == "highest"
    # no env var: the config default applies
    monkeypatch.delenv("JAX_DEFAULT_MATMUL_PRECISION")
    train_lib.apply_runtime_config(Config())
    assert jax.config.jax_default_matmul_precision == "default"


def test_round_steps_per_epoch():
    """ADVICE r4: spe < k must clamp k (no epoch oversampling), not round
    the epoch UP to k."""
    assert train_lib.round_steps_per_epoch(100, 1) == (100, 1)
    assert train_lib.round_steps_per_epoch(100, 16) == (96, 16)
    assert train_lib.round_steps_per_epoch(96, 16) == (96, 16)
    # tiny dataset, big k: k clamps to spe — epoch stays 5 steps
    assert train_lib.round_steps_per_epoch(5, 16) == (5, 5)
    assert train_lib.round_steps_per_epoch(1, 16) == (1, 1)


def test_env_var_precedence(monkeypatch):
    monkeypatch.setenv("TPU3DSAD_OPS_IMPL", "pallas")
    # cfg default ('xla' == unspecified): the env default wins
    train_lib.apply_runtime_config(Config())
    assert ops.get_default_impl() == "pallas"
    # explicit non-default cfg value beats the env var
    monkeypatch.setenv("TPU3DSAD_OPS_IMPL", "xla")
    train_lib.apply_runtime_config(
        apply_overrides(Config(), ["ops_impl=pallas"])
    )
    assert ops.get_default_impl() == "pallas"


def test_force_platform_from_env():
    """The shared TPU3DSAD_PLATFORM helper (all three CLIs route through
    it) must pin the JAX platform in a fresh process BEFORE backend init —
    the axon sitecustomize otherwise force-registers the tunneled TPU and
    a dead tunnel hangs init >150s."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "from tpu3dsad.utils.platform import force_platform_from_env\n"
         "import jax\n"
         "assert force_platform_from_env() == 'cpu'\n"
         "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
         "print('ok')"],
        capture_output=True, text=True, timeout=120,
        env={"TPU3DSAD_PLATFORM": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert r.stdout.strip() == "ok"


def test_force_platform_noop_when_unset(monkeypatch):
    from tpu3dsad.utils.platform import force_platform_from_env

    monkeypatch.delenv("TPU3DSAD_PLATFORM", raising=False)
    assert force_platform_from_env() is None
