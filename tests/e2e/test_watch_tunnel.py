"""Edge-logic regression tests for bench/watch_tunnel.sh (code-review r5).

The watcher is the round's measurement-debt insurance: it must survive a
tunnel FLAP (probe up, suite's own probe down -> suite rc=3) by resuming
the watch instead of exiting 0 with nothing collected, and in
ONESHOT=0 mode it must run once per down->up TRANSITION — not re-launch
the multi-hour legs on every 240s probe (each re-run's `tee` would
truncate already-banked evidence JSONLs).

Driven with TPU3DSAD_WATCH_PROBE + stub suite/legs scripts at a 1s
interval; no JAX, no tunnel.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
WATCHER = os.path.join(REPO, "bench", "watch_tunnel.sh")


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    os.chmod(path, 0o755)


def _run_watcher(tmp_path, probe, oneshot, timeout_s):
    suite = tmp_path / "suite.sh"
    legs = tmp_path / "legs.sh"
    calls = tmp_path / "ncalls"
    legs_log = tmp_path / "legs.log"
    # suite: rc=3 on the first two calls (flap), rc=0 afterwards
    _write(
        str(suite),
        "#!/bin/bash\n"
        f"n=$(cat {calls} 2>/dev/null || echo 0)\n"
        f"echo $((n+1)) > {calls}\n"
        '[ "$n" -lt 2 ] && exit 3\nexit 0\n',
    )
    _write(str(legs), f"#!/bin/bash\necho ran >> {legs_log}\nexit 0\n")
    env = dict(
        os.environ,
        TPU3DSAD_WATCH_PROBE=probe,
        TPU3DSAD_WATCH_INTERVAL="1",
        TPU3DSAD_WATCH_MAX_HOURS="1",
        TPU3DSAD_WATCH_ONESHOT=oneshot,
        TPU3DSAD_WATCH_SUITE=str(suite),
        TPU3DSAD_WATCH_LEGS=str(legs),
    )
    r = subprocess.run(
        ["timeout", str(timeout_s), "bash", WATCHER],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    ncalls = int(calls.read_text()) if calls.exists() else 0
    nlegs = len(legs_log.read_text().splitlines()) if legs_log.exists() else 0
    return r, ncalls, nlegs


def test_flap_retries_then_single_run(tmp_path):
    """Suite rc=3 twice (flap) -> keep watching; then one full run; then
    ONESHOT=0 steady-state must NOT re-run on further up-probes."""
    r, ncalls, nlegs = _run_watcher(tmp_path, probe="true", oneshot="0",
                                    timeout_s=15)
    assert ncalls == 3, r.stdout  # 2 flap retries + 1 success, no more
    assert nlegs == 1, r.stdout   # legs ran exactly once
    assert "tunnel up (already ran)" in r.stdout
    assert "resuming watch" in r.stdout


def test_oneshot_exits_zero_after_success(tmp_path):
    """ONESHOT=1: flap twice, succeed once, exit 0 (not the flap exit)."""
    r, ncalls, nlegs = _run_watcher(tmp_path, probe="true", oneshot="1",
                                    timeout_s=15)
    assert r.returncode == 0, (r.returncode, r.stdout)
    assert ncalls == 3 and nlegs == 1
    assert "oneshot done" in r.stdout


def test_down_probe_never_runs_suite(tmp_path):
    """A down tunnel must only log and loop — no suite/legs launches."""
    r, ncalls, nlegs = _run_watcher(tmp_path, probe="false", oneshot="1",
                                    timeout_s=5)
    assert ncalls == 0 and nlegs == 0
    assert "tunnel down" in r.stdout
