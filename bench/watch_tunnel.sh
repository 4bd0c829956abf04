#!/bin/bash
# Tunnel watcher + auto-runner (VERDICT r4 #1).
#
# The axon TPU tunnel goes down for hours at a time (the outage spanned
# the entire r3-close -> r4 window), and jax.devices() HANGS >150s on a
# dead tunnel rather than raising — so every probe runs in a bounded
# subprocess. This script loops: probe every PROBE_INTERVAL seconds; on
# the FIRST success it touches $UP_MARKER and runs the staged measurement
# suite + training legs unattended, so a recovery at any hour of a round
# costs zero measurement time (an outage that ends at hour 30 of a
# 36-hour round must not cost 30 hours of data).
#
# Usage:
#   nohup bench/watch_tunnel.sh >/tmp/tunnel_watch.log 2>&1 &
#   # or under the harness: run_in_background with a generous timeout.
#
# Environment knobs (all optional):
#   TPU3DSAD_WATCH_INTERVAL   seconds between probes        (default 240)
#   TPU3DSAD_WATCH_MAX_HOURS  give up after this many hours (default 36)
#   TPU3DSAD_WATCH_SUITE      suite script to run on success
#                             (default bench/run_r5_tpu_suite.sh)
#   TPU3DSAD_WATCH_LEGS       training-legs script ('' to skip)
#                             (default bench/run_r5_training_legs.sh)
#   TPU3DSAD_WATCH_ONESHOT    1 = exit after the first successful run
#                             (default 1; 0 = keep watching for regressions)
#   TPU3DSAD_WATCH_PROBE      override the probe command (testing only)
set -u -o pipefail
cd "$(dirname "$0")/.."

INTERVAL="${TPU3DSAD_WATCH_INTERVAL:-240}"
MAX_HOURS="${TPU3DSAD_WATCH_MAX_HOURS:-36}"
SUITE="${TPU3DSAD_WATCH_SUITE:-bench/run_r5_tpu_suite.sh}"
LEGS="${TPU3DSAD_WATCH_LEGS:-bench/run_r5_training_legs.sh}"
ONESHOT="${TPU3DSAD_WATCH_ONESHOT:-1}"
UP_MARKER=/tmp/TUNNEL_UP
DONE_MARKER=/tmp/TUNNEL_RUNS_DONE
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

log() { echo "[watch $(date -u +%H:%M:%S)] $*"; }

probe() {
  # Bounded subprocess: a hung tunnel must not hang the watcher.
  if [ -n "${TPU3DSAD_WATCH_PROBE:-}" ]; then
    bash -c "$TPU3DSAD_WATCH_PROBE" >/dev/null 2>&1
  else
    timeout 120 python -u -c "import jax; print(jax.devices())" >/dev/null 2>&1
  fi
}

log "watching tunnel: interval=${INTERVAL}s max=${MAX_HOURS}h suite=$SUITE legs=${LEGS:-<none>}"
was_up=0   # edge detector: run the suite only on a down->up transition
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then
    if [ "$was_up" = "1" ]; then
      # ONESHOT=0 steady-state: tunnel still up after a completed run —
      # do NOT re-launch (a re-run would monopolize the chip and its
      # `tee` would truncate already-banked evidence JSONLs).
      log "tunnel up (already ran); next probe in ${INTERVAL}s"
      sleep "$INTERVAL"; continue
    fi
    log "TUNNEL UP"
    touch "$UP_MARKER"
    log "running suite: $SUITE"
    bash "$SUITE" > /tmp/tunnel_suite.log 2>&1
    suite_rc=$?
    log "suite rc=$suite_rc (log /tmp/tunnel_suite.log)"
    if [ "$suite_rc" = "3" ]; then
      # The suite's own probe failed: the tunnel flapped between our
      # probe and the suite's. Nothing was measured — keep watching.
      log "tunnel flapped before the suite started; resuming watch"
      rm -f "$UP_MARKER"
      sleep "$INTERVAL"; continue
    fi
    if [ -n "$LEGS" ]; then
      log "running legs: $LEGS"
      bash "$LEGS" > /tmp/tunnel_legs.log 2>&1
      log "legs rc=$? (log /tmp/tunnel_legs.log)"
    fi
    touch "$DONE_MARKER"
    [ "$ONESHOT" = "1" ] && { log "oneshot done; exiting"; exit 0; }
    was_up=1
  else
    log "tunnel down; next probe in ${INTERVAL}s"
    rm -f "$UP_MARKER"
    was_up=0
  fi
  sleep "$INTERVAL"
done
log "deadline reached without a successful run"
exit 3
