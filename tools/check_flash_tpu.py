"""Real-TPU correctness check for the fused attention kernels.

Covers what interpret mode cannot: the Mosaic lowering itself and the
hardware-PRNG dropout path (pltpu.prng_*). Checks, for both the
single-block and flash kernels:

1. deterministic forward vs the XLA einsum reference (bf16 tolerance);
2. deterministic grads (q, w0, w1) vs autodiff of the einsum path;
3. dropout: same-seed determinism, keep-fraction, mean-preservation, and
   a central finite-difference probe of the custom VJP *through* the
   dropout mask (any fwd/bwd mask mismatch shows up orders of magnitude
   above round-off).

Exits non-zero on failure; prints one JSON line per check.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.kernels.attention import fused_attention
from mkg_analogy_tpu.kernels.flash_attention import flash_attention
from mkg_analogy_tpu.ops.masks import analogy_score_multiplier, attention_bias

H, D = 12, 64
FAILED = []


def report(name, ok, detail):
    print(json.dumps({"check": name, "ok": bool(ok), **detail}), flush=True)
    if not ok:
        FAILED.append(name)


def einsum_reference(q, k, v, mask, boundary, w0, w1):
    b, l, hd = q.shape
    qh = q.reshape(b, l, H, D).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(b, l, H, D).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.reshape(b, l, H, D).transpose(0, 2, 1, 3).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (D ** -0.5)
    mult = analogy_score_multiplier(boundary, l, w0, w1, text_len=l,
                                    row_start=0)
    scores = scores * mult + attention_bias(mask)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, l, hd)


def make(b, l, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, l, H * D)), dtype)
    k = jnp.asarray(rng.standard_normal((b, l, H * D)), dtype)
    v = jnp.asarray(rng.standard_normal((b, l, H * D)), dtype)
    mask = np.ones((b, l), np.float32)
    mask[:, l - 7:] = 0.0
    return q, k, v, jnp.asarray(mask)


def kernel_fn(which, **over):
    base = dict(num_heads=H)
    if which == "flash":
        base.update(over)
        return lambda *a, **kw: flash_attention(*a, **{**base, **kw})
    over.pop("block_q", None), over.pop("block_k", None)
    base.update(over)
    return lambda *a, **kw: fused_attention(*a, **{**base, **kw})


def check_deterministic(which, b=8, l=128, **over):
    q, k, v, mask = make(b, l)
    bnd = jnp.full((b,), l // 3, jnp.int32)
    w0 = jnp.asarray([0.3]); w1 = jnp.asarray([0.7])
    fn = kernel_fn(which, **over)
    want = einsum_reference(q, k, v, mask, bnd, w0, w1)
    got = jax.jit(lambda *a: fn(*a, boundary=bnd, w0=w0, w1=w1,
                                text_len=l, deterministic=True))(q, k, v, mask)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    report(f"{which}_fwd_L{l}", err < 3e-2, {"max_abs_err": err})

    def loss(fn_, q, w0, w1):
        out = fn_(q, k, v, mask, boundary=bnd, w0=w0, w1=w1, text_len=l,
                  deterministic=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(
        lambda q, w0, w1: jnp.sum(
            einsum_reference(q, k, v, mask, bnd, w0, w1) ** 2),
        argnums=(0, 1, 2)))(q, w0, w1)
    g_got = jax.jit(jax.grad(
        lambda q, w0, w1: loss(fn, q, w0, w1), argnums=(0, 1, 2)))(q, w0, w1)
    errs = {}
    ok = True
    for name, a, bb in zip(("dq", "dw0", "dw1"), g_ref, g_got):
        e = float(jnp.max(jnp.abs(bb.astype(jnp.float32) - a)))
        rel = e / (float(jnp.max(jnp.abs(a))) + 1e-6)
        errs[name] = round(rel, 5)
        ok &= rel < 3e-2
    report(f"{which}_grads_L{l}", ok, errs)


def check_dropout(which, b=8, l=128, rate=0.25, **over):
    q, k, v, mask = make(b, l, dtype=jnp.float32)
    bnd = jnp.full((b,), l // 3, jnp.int32)
    w0 = jnp.asarray([0.3]); w1 = jnp.asarray([0.7])
    fn = kernel_fn(which, **over)

    def run(q, w0, seed):
        return fn(q, k, v, mask, boundary=bnd, w0=w0, w1=w1, text_len=l,
                  dropout_rate=rate, deterministic=False,
                  dropout_seed=seed, compute_dtype=jnp.float32)

    s0 = jnp.asarray(99, jnp.int32)
    o1 = jax.jit(run)(q, w0, s0)
    o2 = jax.jit(run)(q, w0, s0)
    same = bool(jnp.all(o1 == o2))
    o3 = jax.jit(run)(q, w0, jnp.asarray(100, jnp.int32))
    differs = float(jnp.max(jnp.abs(o1 - o3))) > 1e-4
    # mean preservation with v = ones
    vones = jnp.ones_like(v)
    fn_ones = kernel_fn(which, **over)
    outs = [jax.jit(lambda s: fn_ones(
        q, k, vones, mask, boundary=bnd, w0=w0, w1=w1, text_len=l,
        dropout_rate=rate, deterministic=False, dropout_seed=s,
        compute_dtype=jnp.float32))(jnp.asarray(s, jnp.int32))
        for s in range(12)]
    mean = float(jnp.mean(jnp.stack(outs)))
    report(f"{which}_dropout_fwd", same and differs and abs(mean - 1) < 0.05,
           {"same_seed_identical": same, "seed_varies": differs,
            "ones_mean": round(mean, 4)})

    # VJP-through-dropout check. The loss is a SINGLE output coordinate:
    # a summed loss over ~1e6 fp32 terms makes the finite-difference
    # numerator pure rounding noise (|L|~1e5, fp32 eps -> ~0.01 abs noise
    # per evaluation vs a derivative term of ~1e-2), which false-failed
    # this check in its first version. out[i,j,k] is O(1), so central
    # differences resolve the derivative to ~1e-5.
    eps = 1e-2
    ok = True
    errs = {}
    cases = [((0, 5, 17), (0, 9, 17)), ((3, 77, 401), (3, 12, 401))]
    cases = [(tuple(c % s for c, s in zip(o, q.shape)),
              tuple(c % s for c, s in zip(i, q.shape))) for o, i in cases]
    for n, (oidx, iidx) in enumerate(cases):
        coord = jax.jit(lambda q, w0: run(q, w0, s0)[oidx])
        gq, gw0 = jax.jit(jax.grad(
            lambda q, w0: run(q, w0, s0)[oidx], argnums=(0, 1)))(q, w0)
        dq = np.zeros(q.shape, np.float32); dq[iidx] = eps
        num = (float(coord(q + dq, w0)) - float(coord(q - dq, w0))) / (2 * eps)
        got = float(gq[iidx])
        err = abs(got - num) / (abs(num) + 1e-3)
        errs[f"dq{n}"] = round(err, 5)
        ok &= err < 2e-2
        # dw0 FD is reported but NOT gated: a single coordinate's w0
        # derivative is ~1e-3 while fp32 forward round-off gives the
        # central difference a noise floor of ~5e-4 at eps=1e-2 — the
        # probe is noise-limited for this operand. The authoritative w0
        # test is check_dropout_exact (AD vs AD on the extracted mask),
        # where single-kernel dw0 agrees to 0.0.
        numw = (float(coord(q, w0 + eps)) - float(coord(q, w0 - eps))) / (2 * eps)
        errw = abs(float(gw0[0]) - numw) / (abs(numw) + 1e-3)
        errs[f"dw0_{n}_fd_noise"] = round(errw, 5)
    report(f"{which}_dropout_vjp", ok, errs)


def check_dropout_exact(which, b=4, l=384, rate=0.25, **over):
    """Definitive dropout-VJP check (AD vs AD, no finite-difference noise).

    The keep-mask is a pure function of (seed, shapes, tile layout) — it
    never depends on q/k/v. So it can be *extracted* from the hardware:
    with q = 0 every score row is uniform over the valid columns
    (p = 1/n_valid), and a probe v that routes column g*D+j of head h to
    output coordinate h*D+j reads back keep*inv directly. With the exact
    hardware mask in hand, an XLA reference applying that same mask is
    differentiable end-to-end, and kernel-autodiff vs XLA-autodiff of the
    *identical function* must agree to fp32 round-off for ALL grads
    (q, k, v, w0, w1) — including the adaptive scalars whose per-coordinate
    finite-difference probe is noise-limited (derivative ~1e-3 vs fp32 FD
    resolution ~5e-4 at eps=1e-2)."""
    q, k, v, mask = make(b, l, dtype=jnp.float32)
    bnd = jnp.full((b,), l // 3, jnp.int32)
    w0 = jnp.asarray([0.3]); w1 = jnp.asarray([0.7])
    fn = kernel_fn(which, **over)
    s0 = jnp.asarray(99, jnp.int32)
    inv = 1.0 / (1.0 - rate)

    def run(q, k, v, w0, w1):
        return fn(q, k, v, mask, boundary=bnd, w0=w0, w1=w1, text_len=l,
                  dropout_rate=rate, deterministic=False, dropout_seed=s0,
                  compute_dtype=jnp.float32)

    runj = jax.jit(run)
    # --- extract the hardware keep-mask with zero-q probes ---
    n_valid = l - 7  # make() zeroes the last 7 columns of the pad mask
    qz = jnp.zeros_like(q)
    keep = np.zeros((b, H, l, l), bool)
    groups = (l + D - 1) // D
    for g in range(groups):
        vg = np.zeros((l, H * D), np.float32)
        for j in range(min(D, l - g * D)):
            vg[g * D + j, j::D] = float(n_valid)  # column j of every head
        out = np.asarray(runj(qz, k, jnp.broadcast_to(jnp.asarray(vg), v.shape),
                              w0, w1))
        for h in range(H):
            width = min(D, l - g * D)
            keep[:, h, :, g * D:g * D + width] = (
                out[:, :, h * D:h * D + width] > 0.5 * inv)
    frac = keep[:, :, :, :n_valid].mean()
    keepj = jnp.asarray(keep)

    def ref(q, k, v, w0, w1):
        qh = q.reshape(b, l, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(b, l, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(b, l, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (D ** -0.5)
        mult = analogy_score_multiplier(bnd, l, w0, w1, text_len=l,
                                        row_start=0)
        scores = scores * mult + attention_bias(mask)
        probs = jax.nn.softmax(scores, axis=-1)
        pd = jnp.where(keepj, probs * inv, 0.0)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", pd, vh)
        return ctx.transpose(0, 2, 1, 3).reshape(b, l, H * D)

    got = np.asarray(runj(q, k, v, w0, w1))
    want = np.asarray(jax.jit(ref)(q, k, v, w0, w1))
    fwd_rel = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-6))
    g_np = np.random.default_rng(5).standard_normal(got.shape).astype(np.float32)
    ct = jnp.asarray(g_np)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) * ct)

    gk = jax.jit(jax.grad(loss(run), argnums=(0, 1, 2, 3, 4)))(q, k, v, w0, w1)
    gr = jax.jit(jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4)))(q, k, v, w0, w1)
    # Tolerance is set by hardware, not by the kernels: fp32 matmuls run on
    # the MXU as bf16 passes at default precision (~4e-3 relative), and the
    # kernel and the XLA reference contract in different orders. Measured:
    # single-kernel dw0/dw1 agree to 0.0, everything else lands 1e-4..5e-3.
    errs, ok = {"fwd": round(fwd_rel, 7), "keep_frac": round(float(frac), 4)}, True
    ok &= fwd_rel < 1e-2 and abs(frac - (1 - rate)) < 0.02
    for name, a, bb in zip(("dq", "dk", "dv", "dw0", "dw1"), gk, gr):
        e = float(jnp.max(jnp.abs(a - bb)))
        rel = e / (float(jnp.max(jnp.abs(bb))) + 1e-6)
        errs[name] = round(rel, 6)
        ok &= rel < 1e-2
    report(f"{which}_dropout_exact_L{l}", ok, errs)


if __name__ == "__main__":
    for which in ("single", "flash"):
        check_deterministic(which, l=128)
        check_dropout(which, l=128)
    # flash-only: multi-tile grids incl. ragged edges, long L
    check_deterministic("flash", l=384, block_q=128, block_k=128)
    check_deterministic("flash", l=320, block_q=128, block_k=128)  # ragged
    check_dropout("flash", l=384, block_q=128, block_k=128)
    # The production auto-route region (models/common.py FLASH_AUTO_MIN_LEN):
    # fwd + VJP, with and without dropout, at L in {512, 1024, 2048}
    # (VERDICT r3 item 3).
    check_deterministic("flash", l=512, block_q=128, block_k=128)
    check_dropout("flash", l=512, block_q=128, block_k=128)
    check_deterministic("flash", b=4, l=1024, block_q=256, block_k=256)
    check_dropout("flash", b=4, l=1024, block_q=256, block_k=256)
    check_deterministic("flash", b=2, l=2048, block_q=256, block_k=512)
    check_dropout("flash", b=2, l=2048, block_q=256, block_k=512)
    # Exact same-mask VJP verification (extracted hardware dropout mask).
    check_dropout_exact("single", b=4, l=128)
    check_dropout_exact("flash", b=4, l=128)
    check_dropout_exact("flash", b=4, l=384, block_q=128, block_k=128)
    check_dropout_exact("flash", b=2, l=512, block_q=128, block_k=128)
    check_dropout_exact("flash", b=2, l=1024, block_q=256, block_k=256)
    check_dropout_exact("flash", b=1, l=2048, block_q=256, block_k=512)
    print(json.dumps({"failed": FAILED}))
    sys.exit(1 if FAILED else 0)
