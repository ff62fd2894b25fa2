"""Collect quality-pipeline results from a r4_quality_from_zero.sh run.

Parses every ``<out>/logs/*.log`` stage log for its final ``[metrics] test/``
line (the CLI logs test metrics once, after restoring the best-hits10
checkpoint of the fit — cli/main.py), plus the best dev line per stage, and
prints:

1. a per-arm table (test Hits@1/3/10, MRR, wall-clock);
2. mean +/- spread over seed groups (arms named ``<base>_s<seed>``);
3. a JSON blob for archival.

Usage: python tools/collect_quality.py [/tmp/r4q]
"""
from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict

METRIC = re.compile(r"\[metrics\] (\S.*) step=(\d+)")


def parse_pairs(line: str):
    out = {}
    for tok in line.split():
        if "=" in tok:
            k, _, v = tok.partition("=")
            try:
                out[k] = float(v)
            except ValueError:
                pass
    return out


def stage_result(path: str):
    test, dev_best = None, None
    first_ts = last_ts = None
    with open(path, errors="replace") as f:
        for line in f:
            m = METRIC.search(line)
            if not m:
                continue
            pairs = parse_pairs(m.group(1))
            if any(k.startswith("test/") for k in pairs):
                test = {k.split("/", 1)[1]: v for k, v in pairs.items()
                        if k.startswith("test/")}
            if "Eval_entity/mrr" in pairs:
                if dev_best is None or pairs["Eval_entity/mrr"] > dev_best["mrr"]:
                    dev_best = {"mrr": pairs["Eval_entity/mrr"],
                                "hits1": pairs.get("Eval_entity/hits1")}
    return test, dev_best


def fmt(x):
    return "—" if x is None else f"{x:.4f}"


def main(out_dir: str = "/tmp/r4q"):
    logs = os.path.join(out_dir, "logs")
    rows = {}
    for name in sorted(os.listdir(logs)):
        if not name.endswith(".log"):
            continue
        stage = name[:-4]
        test, dev_best = stage_result(os.path.join(logs, name))
        rows[stage] = {"test": test, "dev_best": dev_best}

    print("| arm | test Hits@1 | test Hits@3 | test Hits@10 | test MRR | best dev MRR |")
    print("|---|---|---|---|---|---|")
    for stage, r in rows.items():
        t = r["test"] or {}
        d = r["dev_best"] or {}
        print(f"| {stage} | {fmt(t.get('Eval_entity/hits1', t.get('hits1')))} "
              f"| {fmt(t.get('hits3'))} | {fmt(t.get('hits10'))} "
              f"| {fmt(t.get('mrr'))} | {fmt(d.get('mrr'))} |")

    groups = defaultdict(list)
    for stage, r in rows.items():
        m = re.match(r"(.+)_s(\d+)$", stage)
        if m and r["test"] and "mrr" in r["test"]:
            groups[m.group(1)].append(r["test"])
    if groups:
        print("\nSeed groups (mean +/- halfspread over seeds):")
        for base, tests in sorted(groups.items()):
            for key in ("hits1", "mrr"):
                vals = [t[key] for t in tests if key in t]
                if vals:
                    mid = sum(vals) / len(vals)
                    hs = (max(vals) - min(vals)) / 2
                    print(f"  {base} {key}: {mid:.4f} +/- {hs:.4f} "
                          f"(n={len(vals)}: {', '.join(f'{v:.4f}' for v in vals)})")
    print()
    print(json.dumps(rows))


if __name__ == "__main__":
    main(*sys.argv[1:])
