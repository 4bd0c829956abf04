"""Side-by-side trajectory comparison of two training-leg JSONLs.

Built for the r5 leg-A hypothesis test (VERDICT r4 #4): does
foreground-biased proposal sampling (`model.proposal_sampling=density`)
move pos_ratio / AR@0.5 / mAP@0.5 vs plain FPS at identical budget?
Generic over any pair of train.py stdout captures though — it aligns the
eval rows by epoch and attaches the nearest preceding train-row
pos_ratio to each.

Usage:
    python bench/compare_legs.py control.jsonl treatment.jsonl \
        [--metrics mAP@0.25,mAP@0.5,AR@0.5]

Pre-registered decision rule for the r5 leg (recorded before the arms
finished): the density hypothesis is VALIDATED if, at the matched final
eval epoch, the treatment arm shows (a) train pos_ratio >= 2x control
and (b) a visibly higher AR@0.5 or mAP@0.5 trajectory; it is KILLED if
neither separates.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_rows(path):
    evals, trains = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if any(k.startswith("eval/") for k in row):
                evals.append(row)
            elif any(k.startswith("train/") for k in row):
                trains.append(row)
    return evals, trains


def pos_ratio_near(trains, epoch):
    """Mean train/pos_ratio over the 5 train rows closest before `epoch`."""
    prior = [t for t in trains if t.get("train/epoch", -1) <= epoch]
    tail = prior[-5:]
    vals = [t["train/pos_ratio"] for t in tail if "train/pos_ratio" in t]
    return sum(vals) / len(vals) if vals else None


def table(control, treatment, metrics):
    c_evals, c_trains = load_rows(control)
    t_evals, t_trains = load_rows(treatment)
    c_by_ep = {r["eval/epoch"]: r for r in c_evals if "eval/epoch" in r}
    t_by_ep = {r["eval/epoch"]: r for r in t_evals if "eval/epoch" in r}
    shared = sorted(set(c_by_ep) & set(t_by_ep))
    if not shared:
        print("no shared eval epochs", file=sys.stderr)
        return 1

    cols = ["epoch", "pos_ratio(C)", "pos_ratio(T)"]
    for m in metrics:
        cols += [f"{m}(C)", f"{m}(T)"]
    print("\t".join(cols))
    for ep in shared:
        c, t = c_by_ep[ep], t_by_ep[ep]
        row = [
            str(ep),
            _fmt(pos_ratio_near(c_trains, ep)),
            _fmt(pos_ratio_near(t_trains, ep)),
        ]
        for m in metrics:
            key = f"eval/{m}"
            row += [_fmt(c.get(key)), _fmt(t.get(key))]
        print("\t".join(row))
    return 0


def _fmt(v):
    return f"{v:.4f}" if isinstance(v, (int, float)) else "-"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("control")
    p.add_argument("treatment")
    p.add_argument("--metrics", default="mAP@0.25,mAP@0.5,AR@0.25,AR@0.5")
    a = p.parse_args(argv)
    return table(a.control, a.treatment, a.metrics.split(","))


if __name__ == "__main__":
    raise SystemExit(main())
