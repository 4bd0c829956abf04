"""bench.py backend-init retry (VERDICT r3 next-round item #3).

BENCH_r03.json recorded rc=1 because the first ``jax.devices()`` touch died
on a transient axon-tunnel outage.  These tests simulate probe failures via
the injectable ``_probe`` hook and pin the bounded-retry contract: N
attempts, recovery mid-sequence, and a clean TUNNEL_DOWN JSON line +
exit code 3 on final failure.
"""

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_retry_recovers_after_transient_failures():
    bench = _load_bench()
    calls = []

    def probe():
        calls.append(1)
        return len(calls) >= 3  # fail twice, then the tunnel comes back

    ok = bench._backend_ready(attempts=3, backoff_s=0, _probe=probe)
    assert ok
    assert len(calls) == 3


def test_retry_gives_up_after_attempts():
    bench = _load_bench()
    calls = []

    def probe():
        calls.append(1)
        return False

    ok = bench._backend_ready(attempts=3, backoff_s=0, _probe=probe)
    assert not ok
    assert len(calls) == 3


def test_probe_exception_counts_as_failure():
    bench = _load_bench()
    calls = []

    def probe():
        calls.append(1)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired("jax", 1)  # the hang case
        return True

    ok = bench._backend_ready(attempts=2, backoff_s=0, _probe=probe)
    assert ok
    assert len(calls) == 2


def test_tunnel_down_emits_json_and_rc3():
    """End-to-end: an unimportable jax probe → TUNNEL_DOWN line, exit 3."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import importlib.util\n"
        "spec = importlib.util.spec_from_file_location('bench_mod', %r)\n"
        "b = importlib.util.module_from_spec(spec); spec.loader.exec_module(b)\n"
        "b._backend_ready = lambda *a, **k: False\n"
        "b._require_backend()\n" % (str(REPO), str(REPO / "bench.py"))
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 3, r.stderr
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["value"] is None
    assert "TUNNEL_DOWN" in line["error"]
    # the headline failure record stays useful: it carries the last
    # driver-captured number, clearly labeled as such (value stays null)
    assert line["last_measured"]["value"] == 233.6
    assert "BENCH_r02" in line["last_measured"]["source"]
