"""Capture and summarize a device trace of the flagship train step.

Runs a few steps under jax.profiler with a Perfetto trace, then aggregates
per-op durations from the trace json — a text-only substitute for the
TensorBoard profiler when working headless.

  python tools/profile_step.py [--batch 32] [--out /tmp/mkg_profile]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "unsafe_rbg")

from mkg_analogy_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="/tmp/mkg_profile")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from __graft_entry__ import _synthetic_batch
    from mkg_analogy_tpu.core.mesh import make_mesh
    from mkg_analogy_tpu.models.unimo import TextConfig, UnimoConfig, UnimoForMaskedLM
    from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig

    vocab_size, n_analogy = 19712, 2063

    class _V:
        analogy_entity_ids = np.arange(n_analogy, dtype=np.int32) + 8192
        analogy_relation_ids = np.arange(27, dtype=np.int32) + 19484
        r_token_id = 19676
        entity_id_st, entity_id_ed = 8192, 19484
        relation_id_st, relation_id_ed = 19484, 19676
        padded_vocab_size = vocab_size

    mesh = make_mesh()
    model = UnimoForMaskedLM(UnimoConfig(text=TextConfig(vocab_size=vocab_size)))
    trainer = MarTTrainer(model, _V(), TrainConfig(batch_size=args.batch),
                          mesh=mesh)
    batch = _synthetic_batch(args.batch, 128, vocab_size, 224, n_analogy)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, total_steps=100)
    step = jax.jit(trainer._train_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    with mesh:
        db = trainer._put_batch(batch)
        for _ in range(3):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        jax.profiler.start_trace(args.out, create_perfetto_trace=True)
        for _ in range(3):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.out, "**", "*.json.gz"),
                              recursive=True))
    if not traces:
        print("no perfetto trace found under", args.out)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    dur_by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            dur_by_name[name] += ev["dur"]
            total += ev["dur"]
    print(f"trace: {traces[-1]}  total traced op-us: {total:.0f}")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/1000:10.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
