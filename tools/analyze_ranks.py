"""Explain a MARS eval rank distribution (the Hits@k-flatness analysis).

Reads the ``test_ranks.npz`` dumped by the eval instrumentation
(train/trainer.py evaluate: per-example rank, score-tie group size, mode)
plus the MARS train/test JSONs, and prints the round-5 root-cause tables
(RESULTS.md "Hits@k anatomy"):

  - rank histogram (bimodality check: mass at 1-5 vs uniform tail)
  - per-mode Hits@1/10, median rank
  - conditioning on train/test (question, answer) pair overlap — the
    memorization split: H@1 | seen vs H@1 | unseen
  - answer-entity train frequency bands

Usage:
  python tools/analyze_ranks.py /tmp/r5/poly30_s7/test_ranks.npz \
      --mars_dir /root/reference/MarT/dataset/MARS [--split test]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_split(mars_dir: str, split: str):
    with open(os.path.join(mars_dir, f"{split}.json")) as f:
        return [json.loads(line) for line in f]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", help="test_ranks.npz from an eval run")
    ap.add_argument("--mars_dir", required=True)
    ap.add_argument("--split", default="test",
                    help="which split the ranks were dumped for")
    args = ap.parse_args()

    d = np.load(args.npz)
    r = d["ranks"].astype(np.int64)
    mode = d["mode"]
    tie = d["tie"]
    train = load_split(args.mars_dir, "train")
    split = load_split(args.mars_dir, args.split)
    assert len(split) == len(r), (len(split), len(r))
    n = len(r)

    print(f"n={n}  H@1={np.mean(r == 1):.4f}  H@10={np.mean(r <= 10):.4f}  "
          f"MRR={np.mean(1.0 / r):.4f}  median={np.median(r):.0f}  "
          f"tie_frac={np.mean(tie > 1):.4f}")

    print("\nrank histogram (fraction):")
    for lo, hi in [(1, 1), (2, 3), (4, 5), (6, 10), (11, 50), (51, 100),
                   (101, 500), (501, 1000), (1001, 10**6)]:
        m = ((r >= lo) & (r <= hi)).mean()
        print(f"  {lo:>5}-{hi:<7} {m:.4f}")
    wrong = r[r > 1]
    if len(wrong):
        print(f"given rank>1: median={np.median(wrong):.0f} "
              f"frac<=100={np.mean(wrong <= 100):.4f} "
              f"(uniform over 2063 would be {100 / 2063:.4f})")

    print("\nper mode:")
    for m in sorted(set(mode.tolist())):
        rm = r[mode == m]
        print(f"  mode{m}: n={len(rm):4d} H@1={np.mean(rm == 1):.3f} "
              f"H@10={np.mean(rm <= 10):.3f} median={np.median(rm):.0f}")

    qa_train = set((e["question"], e["answer"]) for e in train)
    ans_freq: dict = {}
    for e in train:
        ans_freq[e["answer"]] = ans_freq.get(e["answer"], 0) + 1
    seen = np.array([(e["question"], e["answer"]) in qa_train for e in split])
    freq = np.array([ans_freq.get(e["answer"], 0) for e in split])

    print(f"\n(q,a) pair overlap with train: {seen.mean():.4f}")
    for name, m in (("seen", seen), ("unseen", ~seen)):
        if m.sum():
            print(f"  H@1 | {name}: {np.mean(r[m] == 1):.4f}  "
                  f"H@10: {np.mean(r[m] <= 10):.4f}  "
                  f"median: {np.median(r[m]):.0f}  n={m.sum()}")
    pred = seen.mean() * np.mean(r[seen] == 1) if seen.sum() else 0.0
    print(f"memorization-model H@1 prediction "
          f"(seen_frac x H@1|seen): {pred:.4f}")

    print("\nanswer train-frequency bands:")
    for lo, hi in [(0, 0), (1, 2), (3, 10), (11, 10**9)]:
        m = (freq >= lo) & (freq <= hi)
        if m.sum():
            print(f"  freq {lo}-{hi}: n={m.sum():4d} "
                  f"H@1={np.mean(r[m] == 1):.3f} "
                  f"H@10={np.mean(r[m] <= 10):.3f} "
                  f"median={np.median(r[m]):.0f}")


if __name__ == "__main__":
    main()
