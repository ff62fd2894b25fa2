"""Attribute device trace time to HLO fusion contents.

Compiles the flagship train step, dumps its HLO, runs a few profiled
steps, then buckets per-fusion device time by the dominant op (dot/conv
shape) inside each fusion — the shape-level view the raw trace lacks.

  python tools/attr_trace.py [--batch 32] [--fwdonly]
"""
from __future__ import annotations

import argparse, glob, gzip, json, os, re, sys
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
    ap.add_argument("--fused", action="store_true",
                    help="trace with the Pallas fused attention kernel")
    ap.add_argument("--fwdonly", action="store_true")
    ap.add_argument("--out", default="/tmp/mkg_attr")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from __graft_entry__ import _synthetic_batch
    from mkg_analogy_tpu.core.mesh import make_mesh
    from mkg_analogy_tpu.models.unimo import TextConfig, UnimoConfig, UnimoForMaskedLM
    from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig

    if args.fused:
        from mkg_analogy_tpu.models import common
        common.set_fused_attention(True)

    vocab_size, n_analogy = 19712, 2063

    class _V:
        analogy_entity_ids = np.arange(n_analogy, dtype=np.int32) + 8192
        analogy_relation_ids = np.arange(27, dtype=np.int32) + 19484
        r_token_id = 19676
        entity_id_st, entity_id_ed = 8192, 19484
        relation_id_st, relation_id_ed = 19484, 19676
        padded_vocab_size = vocab_size

    B = args.batch
    mesh = make_mesh()
    model = UnimoForMaskedLM(UnimoConfig(text=TextConfig(vocab_size=vocab_size)))
    trainer = MarTTrainer(model, _V(), TrainConfig(batch_size=B), mesh=mesh)
    batch = _synthetic_batch(B, 128, vocab_size, 224, n_analogy)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, total_steps=1000)
    rng = jax.random.PRNGKey(1)
    if args.fwdonly:
        def stp(state, b, r):
            loss, m = trainer._finetune_loss(state.params, b, r)
            return state, m
        step = jax.jit(stp)
    else:
        step = jax.jit(trainer._train_step, donate_argnums=0)

    with mesh:
        db = trainer._put_batch(batch)
        lowered = step.lower(state, db, rng)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        with open("/tmp/mkg_attr_hlo.txt", "w") as f:
            f.write(hlo)
        for _ in range(3):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        jax.profiler.start_trace(args.out, create_perfetto_trace=True)
        for _ in range(3):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        jax.profiler.stop_trace()

    # --- parse HLO: fusion name -> dominant op summary
    # computation bodies: match "%name (" blocks? Simpler: collect per-line
    # calls: `%fusion.N = ... fusion(...), kind=..., calls=%fused_computation.N`
    calls = {}
    for mline in re.finditer(r"%?([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%?([\w.\-]+)", hlo):
        calls[mline.group(1)] = mline.group(2)
    # computation -> list of (op, line)
    comp_ops = defaultdict(list)
    cur = None
    for line in hlo.splitlines():
        mm = re.match(r"\s*%?([\w.\-]+)\s+\(", line)
        if not line.startswith(" ") and "{" in line:
            mc = re.search(r"%?([\w.\-]+)\s*\(", line)
            cur = mc.group(1) if mc else None
        if cur and ("dot(" in line or " dot(" in line or "convolution(" in line):
            comp_ops[cur].append(line.strip()[:200])

    # --- trace durations
    tr = sorted(glob.glob(os.path.join(args.out, "**", "*.json.gz"), recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if "TPU" in n]
    dur = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            n = e.get("name", "?")
            if n.startswith("jit_") or n in ("0", "1", "2"):
                continue
            dur[n] += e["dur"]
    total = sum(dur.values())
    print(f"device op time {total/3000:.2f} ms/step over 3 steps")

    def summarize(name):
        comp = calls.get(name) or calls.get("%" + name)
        if comp is None:
            return ""
        ops = comp_ops.get(comp, [])
        if not ops:
            return "(elementwise)"
        # extract shapes from first dot/conv
        s = ops[0]
        shp = re.findall(r"(\w+\[[\d,]*\])", s)
        kind = "conv" if "convolution(" in s else "dot"
        return f"{kind} {' x '.join(shp[:3])}" + (f" (+{len(ops)-1} more)" if len(ops) > 1 else "")

    # bucket by summary
    buckets = defaultdict(float)
    for n, d in dur.items():
        base = n
        summ = summarize(base)
        key = summ if summ else re.sub(r"[.\d]+$", "", n)
        buckets[key] += d
    for k, d in sorted(buckets.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d/3000:8.3f} ms/step {100*d/total:5.1f}%  {k[:150]}")


if __name__ == "__main__":
    main()
