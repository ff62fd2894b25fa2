"""Head-to-head: this repo's libkgsampler.so vs the reference's prebuilt
OpenKE Base.so (/root/reference/M-KGE/IKRL_TransAE/release/Base.so), loaded
through the SAME ctypes conventions (DATA_/TrainDataLoader.py:41-121).

Measures triples/s on the MarKG batch spec the IKRL recipe uses (batch 326
= 33307//102 nbatches-style, neg_ent 25, neg_rel 25, bern=1, filter=1) and
cross-checks the sampling DISTRIBUTION between the two libraries:
  - positives valid and present in the train set,
  - filtered negatives absent from the train set,
  - per-relation head-vs-tail corruption rate (the Bernoulli split).

  python tools/race_base_so.py [--batches 200] [--threads 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE_SO = "/root/reference/M-KGE/IKRL_TransAE/release/Base.so"


def run_loader(lib_path, data_dir, batch_size, neg_ent, neg_rel, threads,
               batches, warmup=10):
    from mkg_analogy_tpu.native.api import KGSamplerLib, NativeTrainLoader

    loader = NativeTrainLoader(
        data_dir, batch_size=batch_size, neg_ent=neg_ent, neg_rel=neg_rel,
        bern_flag=True, filter_flag=True, threads=threads,
        lib=KGSamplerLib(lib_path),
    )
    for _ in range(warmup):
        loader.sample_normal()
    t0 = time.perf_counter()
    for _ in range(batches):
        loader.sample_normal()
    dt = time.perf_counter() - t0
    rate = batches * batch_size / dt
    return loader, rate


def distribution_stats(loader, train_set, n_rel, batches=200):
    """Corruption-side rates per relation + filtering validity."""
    bs = loader.batch_size
    head_corrupt = np.zeros(n_rel)
    tail_corrupt = np.zeros(n_rel)
    bad_pos = bad_neg = 0
    cols = 1 + loader.neg_ent + loader.neg_rel
    for _ in range(batches):
        b = loader.sample_normal()
        h = b["batch_h"].reshape(cols, bs)
        t = b["batch_t"].reshape(cols, bs)
        r = b["batch_r"].reshape(cols, bs)
        for i in range(bs):
            pos = (int(h[0, i]), int(t[0, i]), int(r[0, i]))
            if pos not in train_set:
                bad_pos += 1
            # entity-negative rows: 1..neg_ent
            for row in range(1, 1 + loader.neg_ent):
                trip = (int(h[row, i]), int(t[row, i]), int(r[row, i]))
                if trip in train_set:
                    bad_neg += 1
                if h[row, i] != h[0, i]:
                    head_corrupt[pos[2]] += 1
                elif t[row, i] != t[0, i]:
                    tail_corrupt[pos[2]] += 1
    tot = head_corrupt + tail_corrupt
    frac = np.divide(head_corrupt, tot, out=np.zeros_like(head_corrupt),
                     where=tot > 0)
    return dict(head_frac=frac, counts=tot, bad_pos=bad_pos, bad_neg=bad_neg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=300)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=326)
    ap.add_argument("--markg", default="/root/reference/MarT/dataset/MarKG")
    ap.add_argument("--workdir", default="/tmp/mkg_openke_race")
    args = ap.parse_args()

    from mkg_analogy_tpu.data.openke_tools import write_id_files
    from mkg_analogy_tpu.data.readers import MarKG
    from mkg_analogy_tpu.native.build import build

    markg = MarKG(args.markg)
    os.makedirs(args.workdir, exist_ok=True)
    write_id_files(args.workdir, markg)
    train_set = {(h, t, r) for h, r, t in markg.triples_as_ids()}

    results = {}
    loaders = {}
    for name, lib in (("kgsampler", build()), ("Base.so", BASE_SO)):
        loader, rate = run_loader(lib, args.workdir, args.batch_size, 25, 25,
                                  args.threads, args.batches)
        results[name] = rate
        loaders[name] = loader
        print(f"{name:12s} {rate:12.0f} triples/s "
              f"({args.batches} batches x {args.batch_size}, 25+25 neg, "
              f"bern+filter, {args.threads} threads)")

    print(f"speedup kgsampler / Base.so = "
          f"{results['kgsampler'] / results['Base.so']:.2f}x")

    # distribution cross-check (fewer batches; python-side accounting is slow)
    stats = {n: distribution_stats(loaders[n], train_set,
                                   markg.num_relations, batches=60)
             for n in loaders}
    for n, s in stats.items():
        print(f"{n:12s} bad_pos={s['bad_pos']} bad_filtered_neg={s['bad_neg']}")
    a, b = stats["kgsampler"], stats["Base.so"]
    both = (a["counts"] > 200) & (b["counts"] > 200)
    diff = np.abs(a["head_frac"][both] - b["head_frac"][both])
    print(f"bern head-corruption fraction: {int(both.sum())} relations "
          f"compared, max |delta|={diff.max():.4f}, "
          f"mean |delta|={diff.mean():.4f}")
    print(json.dumps({
        "kgsampler_tps": round(results["kgsampler"]),
        "base_so_tps": round(results["Base.so"]),
        "speedup": round(results["kgsampler"] / results["Base.so"], 3),
        "bern_max_delta": round(float(diff.max()), 4),
        "kgsampler_bad": [int(a["bad_pos"]), int(a["bad_neg"])],
        "base_so_bad": [int(b["bad_pos"]), int(b["bad_neg"])],
    }))


if __name__ == "__main__":
    main()
