"""Calibrate the achievable matmul envelope on THIS chip for the exact
GEMM shapes of the flagship train step.

The step-anatomy MFU numbers (tools/attr_trace.py, RESULTS.md) divide by
the v5e datasheet peak (197 TFLOP/s bf16). This measures what the chip
actually sustains per shape, with a method that survives the axon tunnel's
timing quirks (`jax.block_until_ready` does not await device completion
here, and the profiler drops chain events): each measurement jits a
serial GEMM chain of length N via ``lax.fori_loop`` (every iteration
consumes the previous output — XLA cannot parallelize or elide it), forces
completion with a host readback of a reduction, and the per-GEMM time is
taken **differentially** between two chain lengths so dispatch + tunnel
RTT + readback cancel:

    t_per_gemm = (t(N2) - t(N1)) / (N2 - N1)

  python tools/bench_matmul.py [--n1 100] [--n2 300] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mkg_analogy_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax

# (M, K, N, tag) — the step's GEMM population (text tower M=32*128,
# vision M=32*99; fwd/dgrad/wgrad orientations) + a large square anchor
SHAPES = [
    (4096, 4096, 4096, "square anchor"),
    (4096, 768, 768, "text qkv/out fwd"),
    (4096, 768, 3072, "text fc1 fwd"),
    (4096, 3072, 768, "text fc2 fwd"),
    (768, 4096, 768, "text proj wgrad"),
    (3072, 4096, 768, "text fc wgrad"),
    (3168, 768, 768, "vision qkv/out fwd"),
    (3168, 768, 3072, "vision fc1 fwd"),
]


def make_chain(m, k, n, length):
    """Serial chain: out (m,k) @ b (k,n) -> (m,n), fold back to (m,k).
    When n < k the fold pads with zeros; when n >= k it slices. Either way
    iteration i+1 depends on iteration i's full output."""

    @jax.jit
    def run(out, b):
        def body(_, out):
            y = jnp.dot(out, b, preferred_element_type=jnp.float32)
            y = (y * jnp.float32(1e-3)).astype(jnp.bfloat16)
            if n >= k:
                return y[:, :k]
            return jnp.pad(y, ((0, 0), (0, k - n)))

        return lax.fori_loop(0, length, body, out)

    return run


def timed(run, a, b):
    out = run(a, b)
    # host readback of a scalar forces the whole chain to completion
    s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    t0 = time.perf_counter()
    out = run(a, b)
    s += float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    t1 = time.perf_counter()
    assert np.isfinite(s)
    return t1 - t0


def bench(m, k, n, n1, n2, reps):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16) * jnp.bfloat16(1e-2)
    b = jax.random.normal(key, (k, n), jnp.bfloat16) * jnp.bfloat16(1e-2)
    flops = 2.0 * m * k * n
    # Scale chain length so the DIFFERENTIAL (n2 - n1) of ideal-speed GEMMs
    # spans >= ~60 ms of device time — the tunnel's host-readback jitter is
    # several ms, and a fixed 100-GEMM differential of 24 us GEMMs (2.4 ms)
    # drowns in it (observed: negative / 13x-datasheet readings).
    ideal_s = flops / 197e12
    scale = max(1.0, 60e-3 / (ideal_s * (n2 - n1)))
    n1, n2 = int(n1 * scale), int(n2 * scale)
    r1 = make_chain(m, k, n, n1)
    r2 = make_chain(m, k, n, n2)
    t1 = min(timed(r1, a, b) for _ in range(reps))
    t2 = min(timed(r2, a, b) for _ in range(reps))
    per_gemm = (t2 - t1) / (n2 - n1)
    return flops / per_gemm / 1e12, per_gemm * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=100)
    ap.add_argument("--n2", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    for m, k, n, tag in SHAPES:
        try:
            tf, us = bench(m, k, n, args.n1, args.n2, args.reps)
            print(json.dumps({"shape": f"{m}x{k}x{n}", "tag": tag,
                              "us_per_gemm": round(us, 2),
                              "tflops": round(tf, 1),
                              "pct_datasheet": round(tf / 197 * 100, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"shape": f"{m}x{k}x{n}", "tag": tag,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
