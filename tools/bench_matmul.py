"""Calibrate the achievable matmul envelope on THIS chip for the exact
GEMM shapes of the flagship train step.

The step-anatomy MFU numbers (tools/attr_trace.py, RESULTS.md) divide by
the v5e datasheet peak (197 TFLOP/s bf16). This tool measures what the
hardware actually sustains per shape, using the **device profiler** for
timing. Wall-clock timing is untrustworthy here: on the axon tunnel
backend `jax.block_until_ready` does not await device completion (an
un-donated 8192^3 GEMM loop "benchmarks" at 69 PFLOP/s), and donated
loops pay a per-dispatch host round-trip; the train-step benches stay
honest only because their donated TrainState serializes dispatches at
~25 steps/s where the RTT is amortized. Profiler event durations are
device-side ground truth either way.

  python tools/bench_matmul.py
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mkg_analogy_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

# (M, K, N, tag) — the step's GEMM population (text tower M=32*128,
# vision M=32*99; fwd/dgrad/wgrad orientations)
SHAPES = [
    (8192, 8192, 8192, "square-peak"),
    (4096, 768, 768, "text qkv/out fwd"),
    (4096, 768, 3072, "text fc1 fwd"),
    (4096, 3072, 768, "text fc2 fwd"),
    (768, 4096, 768, "text proj wgrad"),
    (3072, 4096, 768, "text fc wgrad"),
    (3168, 768, 768, "vision qkv/out fwd"),
    (3168, 768, 3072, "vision fc1 fwd"),
]

N_CHAIN = 8
N_CALLS = 4


def device_dot_time_us(trace_dir):
    tr = sorted(glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                          recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if "TPU" in n]
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            n = e.get("name", "?")
            if n.startswith(("fusion", "convolution", "dot", "%fusion")):
                total += e["dur"]
    return total


def bench(m, k, n):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    if n >= k:
        @jax.jit
        def run(out, b):
            for _ in range(N_CHAIN):
                out = jnp.dot(out, b, preferred_element_type=jnp.float32)[
                    :, :k
                ].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            return out
        n_gemms = N_CHAIN
    else:
        @jax.jit
        def run(out, b):
            for _ in range(N_CHAIN):
                out = jnp.dot(out, b, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                ) * jnp.bfloat16(1e-3)
                out = jnp.dot(out, b.T, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                ) * jnp.bfloat16(1e-3)
            return out
        n_gemms = 2 * N_CHAIN

    import numpy as np

    out = run(a, b)
    np.asarray(out[:1, :1])  # ensure compiled + executed

    trace_dir = f"/tmp/mkg_mm_trace_{m}x{k}x{n}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    out = a
    for _ in range(N_CALLS):
        out = run(out, b)
    np.asarray(out[:1, :1])  # drain the device queue before stop_trace
    jax.profiler.stop_trace()

    us = device_dot_time_us(trace_dir)
    flops = 2.0 * m * k * n * n_gemms * N_CALLS
    return flops / (us * 1e-6) / 1e12 if us else float("nan")


def main():
    for m, k, n, tag in SHAPES:
        try:
            tf = bench(m, k, n)
            print(json.dumps({"shape": f"{m}x{k}x{n}", "tag": tag,
                              "tflops": round(tf, 1),
                              "pct_datasheet": round(tf / 197 * 100, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"shape": f"{m}x{k}x{n}", "tag": tag,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
