"""Regression tests for bench/compare_legs.py (the r5 leg-A decision tool).

The tool aligns two train.py stdout JSONLs by eval epoch and attaches the
nearest preceding train-row pos_ratio to each — the pre-registered
decision rule for the density-sampling hypothesis reads its table, so a
row-alignment or pos_ratio-window bug would silently corrupt the verdict.
Driven via subprocess on synthetic JSONLs; no JAX.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
TOOL = os.path.join(REPO, "bench", "compare_legs.py")


def _leg(path, evals, pos_ratios):
    """Write a minimal train-stdout JSONL: one train row per epoch (with
    the given pos_ratio), an eval row at each epoch in `evals`, plus the
    non-JSON banner lines train.py interleaves."""
    rows = ["=== config ==="]
    n_epochs = max(evals) + 1
    for ep in range(n_epochs):
        rows.append(json.dumps({
            "step": 6 * (ep + 1), "train/epoch": ep,
            "train/loss": 50.0 - ep, "train/pos_ratio": pos_ratios(ep),
        }))
        rows.append(json.dumps({"epoch": ep, "epoch_time_s": 1.0}))
        if ep in evals:
            rows.append(json.dumps({
                "step": 6 * (ep + 1), "eval/epoch": ep,
                "eval/mAP@0.25": 0.01 * ep, "eval/mAP@0.5": 0.001 * ep,
                "eval/AR@0.25": 0.1, "eval/AR@0.5": 0.05,
            }))
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _run(*argv):
    return subprocess.run(
        [sys.executable, TOOL, *argv], capture_output=True, text=True
    )


def test_aligns_shared_eval_epochs_and_pos_ratio(tmp_path):
    c = tmp_path / "control.jsonl"
    t = tmp_path / "treatment.jsonl"
    # control evals at 24/49/74; treatment (cut earlier) at 24/49 only —
    # the table must align on the shared {24, 49}.
    _leg(c, evals=[24, 49, 74], pos_ratios=lambda ep: 0.01)
    _leg(t, evals=[24, 49], pos_ratios=lambda ep: 0.04)
    r = _run(str(c), str(t))
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    header, body = lines[0].split("\t"), [l.split("\t") for l in lines[1:]]
    assert [row[0] for row in body] == ["24", "49"]
    # pos_ratio columns: control 0.01, treatment 0.04 (4x separation —
    # exactly what the decision rule reads)
    ci, ti = header.index("pos_ratio(C)"), header.index("pos_ratio(T)")
    assert all(row[ci] == "0.0100" for row in body)
    assert all(row[ti] == "0.0400" for row in body)
    # metric columns come from the right arm's eval row at that epoch
    mi = header.index("mAP@0.25(C)")
    assert body[0][mi] == "0.2400" and body[1][mi] == "0.4900"


def test_pos_ratio_window_is_nearest_preceding_rows(tmp_path):
    c = tmp_path / "c.jsonl"
    t = tmp_path / "t.jsonl"
    # pos_ratio ramps with epoch: the epoch-9 eval must average the 5
    # train rows at epochs 5..9 (0.05..0.09 -> 0.07), not the whole leg.
    _leg(c, evals=[9], pos_ratios=lambda ep: 0.01 * ep)
    _leg(t, evals=[9], pos_ratios=lambda ep: 0.01)
    r = _run(str(c), str(t))
    assert r.returncode == 0, r.stderr
    header, row = (l.split("\t") for l in r.stdout.strip().splitlines())
    assert row[header.index("pos_ratio(C)")] == "0.0700"


def test_no_shared_epochs_is_an_error(tmp_path):
    c = tmp_path / "c.jsonl"
    t = tmp_path / "t.jsonl"
    _leg(c, evals=[24], pos_ratios=lambda ep: 0.01)
    _leg(t, evals=[49], pos_ratios=lambda ep: 0.01)
    r = _run(str(c), str(t))
    assert r.returncode == 1
    assert "no shared eval epochs" in r.stderr


def test_missing_metric_renders_dash(tmp_path):
    c = tmp_path / "c.jsonl"
    t = tmp_path / "t.jsonl"
    _leg(c, evals=[24], pos_ratios=lambda ep: 0.01)
    _leg(t, evals=[24], pos_ratios=lambda ep: 0.01)
    r = _run(str(c), str(t), "--metrics", "mAP@0.25,not_a_metric")
    assert r.returncode == 0, r.stderr
    header, row = (l.split("\t") for l in r.stdout.strip().splitlines())
    assert row[header.index("not_a_metric(C)")] == "-"
