"""Attention lowering vs sequence length: Pallas fused kernel vs the XLA
einsum path (the production default), forward+backward, on the real TPU.

This quantifies the claim the kernel is kept for — at the recipe's L=128
XLA wins (the score tensor fits comfortably and relayout copies are cheap),
while at long sequence the fused kernel avoids materializing the
(B, H, L, L) probs/score traffic entirely. Referenced by RESULTS.md's
"fused attention" verdict.

  python tools/bench_attention_seq.py [--lens 128,512,1024,2048] [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "unsafe_rbg")
from mkg_analogy_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def einsum_attn(q, k, v, mask, num_heads, boundary, w0, w1, rate=0.0,
                key=None):
    """The production lowering of models/common.py:AttentionCore._einsum
    (incl. the swapped-orientation dropout draw), packed inputs reshaped
    to (B, L, h, d)."""
    from mkg_analogy_tpu.ops.masks import analogy_score_multiplier

    b, lq, hd = q.shape
    d = hd // num_heads
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, lq, num_heads, d)
    vh = v.reshape(b, lq, num_heads, d)
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    mult = analogy_score_multiplier(boundary, lq, w0, w1, text_len=lq,
                                    row_start=0)
    scores = scores * mult.astype(scores.dtype)
    bias = (1.0 - mask[:, None, None, :]) * -10000.0
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    if rate > 0.0:
        keep = jax.random.bernoulli(
            key, 1.0 - rate, (b, num_heads, lq, lq)
        ).swapaxes(-1, -2)
        probs = jnp.where(keep, probs / (1.0 - rate), jnp.zeros_like(probs))
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return ctx.reshape(b, lq, hd)


def fused_attn(q, k, v, mask, num_heads, boundary, w0, w1, rate=0.0,
               key=None):
    from mkg_analogy_tpu.kernels.attention import fused_attention

    seed = None
    if rate > 0.0:
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    return fused_attention(
        q, k, v, mask, num_heads,
        boundary=boundary, w0=jnp.clip(w0, 0.0, 0.5),
        w1=jnp.clip(w1, 0.5, 1.0), text_len=q.shape[1], row_start=0,
        dropout_rate=rate, deterministic=rate <= 0.0, dropout_seed=seed,
        compute_dtype=jnp.bfloat16,
    )


def flash_attn(q, k, v, mask, num_heads, boundary, w0, w1, rate=0.0,
               key=None):
    from mkg_analogy_tpu.kernels.flash_attention import flash_attention

    seed = None
    if rate > 0.0:
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    return flash_attention(
        q, k, v, mask, num_heads,
        boundary=boundary, w0=jnp.clip(w0, 0.0, 0.5),
        w1=jnp.clip(w1, 0.5, 1.0), text_len=q.shape[1], row_start=0,
        dropout_rate=rate, deterministic=rate <= 0.0, dropout_seed=seed,
        compute_dtype=jnp.bfloat16,
    )


def jaxflash_attn(q, k, v, mask, num_heads, boundary, w0, w1, rate=0.0,
                  key=None):
    """jax.experimental's own TPU flash kernel — a speed-of-light envelope
    row (plain softmax attention: no analogy multiplier, no padding bias,
    no dropout; (B, H, L, D) layout, so the relayout transposes ARE
    counted, as on the einsum path)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jf,
    )

    b, lq, hd = q.shape
    d = hd // num_heads
    qh = q.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    out = jf(qh, kh, vh, sm_scale=float(d) ** -0.5)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, hd)


def bench_one(fn, num_heads, args_, iters, rate=0.0):
    q, k, v, mask, bnd, w0, w1 = args_
    key = jax.random.PRNGKey(3)

    def loss(q, w0, w1):
        out = fn(q, k, v, mask, num_heads, bnd, w0, w1, rate, key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    r = g(q, w0, w1)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(q, w0, w1)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="128,512,1024,2048")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dropout", type=float, default=0.0)
    args = ap.parse_args()

    rows = []
    for L in [int(x) for x in args.lens.split(",")]:
        rng = np.random.default_rng(0)
        B, hd = args.batch, args.heads * args.head_dim
        q = jnp.asarray(rng.standard_normal((B, L, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, L, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, L, hd)), jnp.bfloat16)
        mask = jnp.ones((B, L), jnp.float32)
        bnd = jnp.full((B,), L // 2, jnp.int32)
        w0 = jnp.asarray([0.3], jnp.float32)
        w1 = jnp.asarray([0.6], jnp.float32)
        pack = (q, k, v, mask, bnd, w0, w1)
        row = {"L": L, "B": B, "dropout": args.dropout}
        for name, fn in (("xla_ms", einsum_attn), ("fused_ms", fused_attn),
                         ("flash_ms", flash_attn),
                         ("jaxflash_ms", jaxflash_attn)):
            if name == "jaxflash_ms" and args.dropout > 0:
                continue  # envelope row is dropout-free by construction
            try:
                row[name] = round(
                    bench_one(fn, args.heads, pack, args.iters,
                              rate=args.dropout), 3
                )
            except Exception as e:  # e.g. VMEM exhaustion at long L
                row[name] = f"error: {type(e).__name__}"
        if isinstance(row.get("xla_ms"), float) and isinstance(
            row.get("fused_ms"), float
        ):
            row["speedup"] = round(row["xla_ms"] / row["fused_ms"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
